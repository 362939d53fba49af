package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[AvroTable]] codec: lossless roundtrip (nulls, embedded
  * quotes/newlines, binary), per-partition file layout, and the
  * schema-first write rejecting unsupported types.
  */
class AvroTableSpec extends graft.SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))

  private val rows = Seq(
    Row(1L, "plain", 1.5, true, Array[Byte](1, 2, 3)),
    Row(2L, "with \"quotes\"\nand newline", null, false, null),
    Row(3L, null, -0.25, true, Array.empty[Byte]))

  test("roundtrip is lossless including nulls, newlines, and binary") {
    val dir = Files.createTempDirectory("avro-spec").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroTable.write(df, dir)
    assert(new java.io.File(dir, "_SUCCESS").isFile)
    val back = AvroTable.read(spark, dir, schema)
      .collect().sortBy(_.getLong(0))
    assert(back.length === 3)
    back.zip(rows).foreach { case (g, e) =>
      assert(g.getLong(0) === e.getLong(0))
      assert(Option(g.getString(1)) === Option(e.getString(1)))
      assert(Option(g.get(2)) === Option(e.get(2)))
      assert(g.getBoolean(3) === e.getBoolean(3))
      assert(Option(g.getAs[Array[Byte]](4)).map(_.toSeq) ===
        Option(e.getAs[Array[Byte]](4)).map(_.toSeq))
    }
  }

  test("one container file per non-empty partition") {
    val dir = Files.createTempDirectory("avro-spec").toString
    val df = spark.range(100).selectExpr("id", "cast(id as string) AS name",
      "cast(id as double) AS score", "id % 2 = 0 AS flag",
      "cast(null as binary) AS blob").repartition(4)
    AvroTable.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length === 4)
    assert(AvroTable.read(spark, dir, df.schema).count() === 100)
  }

  test("schema-first write rejects unsupported types") {
    val bad = spark.range(1).selectExpr("array(id) AS a")
    val e = intercept[IllegalArgumentException] {
      AvroTable.avroSchema(bad.schema, "row")
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
