package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** [[QuantileSketch]] invariants: the bucket rule, the error
  * guarantee stated as an exact property (the estimate IS the true
  * quantile's bucket lower bound), and order-free mergeability — the
  * property that makes it a sketch rather than a percentile query.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bucketLow truncates to 3 significant digits, short values untouched") {
    val got = Seq(1L, 99L, 999L, 1000L, 1234L, 98765L, 1999999L)
      .toDF("v")
      .select(QuantileSketch.bucketLow(col("v")).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 99L, 999L, 1000L, 1230L, 98700L, 1990000L))
  }

  test("estimate equals the true quantile's bucket lower bound (<1% rel error)") {
    val values = (1 to 5000).map(i => (i.toLong * i.toLong) % 987654L + 1L)
    val df = values.toDF("v").withColumn("g", lit("all"))
    val sk = QuantileSketch.sketch(df, col("v"), Seq("g"))
    val est = QuantileSketch.quantiles(sk, Seq("g"), Seq(50, 90, 99))
      .select("q_pct", "est").as[(Int, Long)].collect().toMap
    val sorted = values.sorted
    for (q <- Seq(50, 90, 99)) {
      // lower quantile: smallest value whose rank reaches ceil(qN/100)
      val exact = sorted((q * values.size + 99) / 100 - 1)
      val wantBucket = Seq(exact).toDF("v")
        .select(QuantileSketch.bucketLow(col("v"))).as[Long].head()
      assert(est(q) == wantBucket,
        s"p$q: est ${est(q)} != bucketLow($exact) = $wantBucket")
      assert(est(q) <= exact && exact - est(q) <= exact / 100 + 1)
    }
  }

  test("sketches merge order-free: sketch(A union B) == sum of parts") {
    val a = (1 to 800).map(i => (i * 13L) % 4096L + 1L).toDF("v")
      .withColumn("g", lit("x"))
    val b = (1 to 700).map(i => (i * 29L) % 9999L + 1L).toDF("v")
      .withColumn("g", lit("x"))
    val whole = QuantileSketch.sketch(a.unionByName(b), col("v"), Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    val merged = QuantileSketch.sketch(a, col("v"), Seq("g"))
      .unionByName(QuantileSketch.sketch(b, col("v"), Seq("g")))
      .groupBy("g", "bucket").agg(sum("cnt").as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    assert(whole == merged)
  }

  test("sketch size is bounded by decades, not input size") {
    val big = (1 to 50000).map(i => (i * 7919L) % 1000000L + 1L).toDF("v")
      .withColumn("g", lit("x"))
    val n = QuantileSketch.sketch(big, col("v"), Seq("g")).count()
    // ≤ 9·10^(sig-1) buckets per decade × 6 decades at sig=3
    assert(n <= 900L * 6)
  }
}
