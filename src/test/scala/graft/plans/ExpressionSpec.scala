package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.VectorFunctions

/** The native [[CosineSimilarity]] expression must be a drop-in for
  * the HOF composition — same values to the last bit (both sum in
  * ascending element order), or the DuckDB oracles would drift.
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[Array[Float]] =
    Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-5f, 5f)).map(_.toArray))
      .apply(Gen.Parameters.default, Seed(7L)).get

  test("native cosine equals the HOF composition bit-for-bit") {
    val pairs = vecs(200, 64).grouped(2).map(p => (p(0), p(1))).toSeq
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      VectorFunctions.cosineNative(col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
  }

  test("interpreted eval path (no codegen) agrees too") {
    // force the interpreted path by evaluating the expression directly
    val Seq((a, b)) = vecs(2, 8).grouped(2).map(p => (p(0), p(1))).toSeq
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val mk = (v: Array[Float]) => Literal.create(
      ArrayData.toArrayData(v),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val interpreted = CosineSimilarity(mk(a), mk(b)).eval(null)
      .asInstanceOf[Double]
    val viaSpark = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineNative(col("a"), col("b")))
      .as[Double].head()
    assert(interpreted == viaSpark)
  }

  test("handles nulls, mismatched lengths, and SQL registration") {
    val df = Seq(
      (Some(Array(1f, 0f)), Some(Array(1f, 0f, 9f))), // common-prefix compare
      (None, Some(Array(1f, 0f))))                    // null in -> null out
      .toDF("a", "b")
    val out = df.select(VectorFunctions.cosineNative(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(out.head.contains(1.0))
    assert(out(1).isEmpty)

    // the SparkSessionExtensions route: register and call from SQL
    org.apache.spark.sql.graft.ColumnBridge.register(
      spark, CosineSimilarity.description)
    val sqlVal = spark.sql(
      "SELECT cosine_sim(array(1.0f, 2.0f), array(2.0f, 4.0f)) AS c")
      .as[Double].head()
    assert(math.abs(sqlVal - 1.0) < 1e-15)
  }
}
