package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** [[Compaction]]: plan determinism, bin fill bounds, and the
  * physical rewrite's file-count contract (one file per bin).
  */
class CompactionSpec extends graft.SparkSpec {

  private def stats(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("shard", "n_docs", "bytes")
  }

  test("sorted-fill plan is deterministic and quota-bounded") {
    // shards sized so the fill order (bytes desc, shard asc) matters:
    // ties on bytes break by shard id
    val st = stats(Seq((0L, 1L, 500L), (1L, 1L, 500L), (2L, 1L, 900L),
      (3L, 1L, 100L), (4L, 1L, 300L)))
    val planned = Compaction.plan(st, "shard", "bytes", 1000L)
      .orderBy("shard").collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("out_shard")).toMap
    // fill order: 2(900) cum0→bin0, 0(500) cum900→bin0, 1(500)
    // cum1400→bin1, 4(300) cum1900→bin1, 3(100) cum2200→bin2
    assert(planned === Map(2L -> 0L, 0L -> 0L, 1L -> 1L, 4L -> 1L, 3L -> 2L))
    // replay is identical (determinism, not an artifact of task order)
    val again = Compaction.plan(st, "shard", "bytes", 1000L)
      .orderBy("shard").collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("out_shard")).toMap
    assert(again === planned)
  }

  test("bins are contiguous and satisfy the cumulative quota " +
      "(prefix fill through bin b covers (b+1) targets)") {
    val st = stats((0L until 40L).map(i => (i, 1L, 100L + i)))
    val bins = Compaction.plan(st, "shard", "bytes", 1000L)
      .groupBy("out_shard").agg(sum("bytes").as("b"))
      .orderBy("out_shard").collect()
    assert(bins.map(_.getAs[Long]("out_shard")).toSeq ===
      (0L until bins.length.toLong), "bin ids must be dense from 0")
    var cum = 0L
    bins.dropRight(1).zipWithIndex.foreach { case (r, b) =>
      cum += r.getAs[Long]("b")
      // a single item may straddle a quota boundary, so individual
      // bins can undershoot — but the PREFIX never does: the first
      // item of bin b+1 only opened because cum fill passed (b+1)·T
      assert(cum >= (b + 1) * 1000L,
        s"prefix through bin $b underfilled at $cum")
    }
  }

  test("rewrite produces exactly one file per planned bin with the " +
      "planned row counts") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        (graft.functions.Hashing.h32(col("doc_id").cast("string")) % 16)
          .as("shard"),
        col("n_chars"))
    val st = docs.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
    val planned = Compaction.plan(st, "shard", "bytes", 4000L)
    val dir = Files.createTempDirectory("compact-spec").toString
    Compaction.rewrite(Compaction.assign(docs, planned, "shard"), dir)
    val binDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("out_shard="))
    val expected = planned.groupBy("out_shard")
      .agg(sum("n_docs").as("n")).collect()
      .map(r => r.getAs[Long]("out_shard") -> r.getAs[Long]("n")).toMap
    assert(binDirs.length === expected.size)
    binDirs.foreach { bd =>
      val files = bd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${bd.getName}: expected ONE file")
      val bin = bd.getName.stripPrefix("out_shard=").toLong
      assert(spark.read.parquet(bd.getAbsolutePath).count() === expected(bin))
    }
    // nothing lost
    assert(spark.read.parquet(dir).count() === docs.count())
  }
}
