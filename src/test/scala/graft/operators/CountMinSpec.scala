package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 64

  // zipf-ish corpus: term t_i appears 100/i times, i = 1..40
  private lazy val items = (1 to 40).flatMap(i =>
    Seq.fill(100 / i)(s"t$i")).toDF("term")

  test("estimates never undercount and bound the overcount") {
    val sketch = CountMin.build(items, "term", D, W)
    val exact = items.groupBy("term").agg(count(lit(1)).as("n"))
    val est = CountMin.estimate(sketch, exact.select("term"), "term", D, W)
    val joined = exact.join(est, Seq("term"))
      .select("term", "n", "cms_est").as[(String, Long, Long)].collect()
    val n = items.count()
    assert(joined.nonEmpty)
    joined.foreach { case (t, ex, e) =>
      assert(e >= ex, s"$t undercounted: $e < $ex")
      // e/W ≈ 4.2% of N is the per-row expectation; min over D=4 rows
      // sits far inside 3x that on this corpus — a loose, stable bound
      assert(e - ex <= 3 * math.E * n / W,
        s"$t overcounted past the CMS bound: $e vs $ex (N=$n)")
    }
  }

  test("sketches merge by summing cells (partials compose)") {
    val (a, b) = (items.filter(Hashing32(col("term")) % 2 === 0),
      items.filter(Hashing32(col("term")) % 2 =!= 0))
    val merged = CountMin.build(a, "term", D, W)
      .unionByName(CountMin.build(b, "term", D, W))
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
    val whole = CountMin.build(items, "term", D, W)
    assert(merged.as[(Int, Long, Long)].collect().toSet ==
      whole.as[(Int, Long, Long)].collect().toSet)
  }

  private def Hashing32(c: org.apache.spark.sql.Column) =
    graft.functions.Hashing.h32(c)

  test("absent terms estimate zero or the ambient collision mass") {
    val sketch = CountMin.build(items, "term", D, W)
    val est = CountMin.estimate(sketch,
      Seq("never_seen_xyz").toDF("term"), "term", D, W)
      .select("cms_est").as[Long].head()
    // never negative, never undercounts its true count of 0 by design;
    // collisions may give it a small positive mass
    assert(est >= 0)
  }

  test("sketch size is bounded by depth x width regardless of corpus") {
    val sketch = CountMin.build(items, "term", D, W)
    assert(sketch.count() <= D.toLong * W)
  }
}
