package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The unrolled integer Newton isqrt: exact floor(√n) on the values
  * where float sqrt+floor goes wrong (perfect squares ±1) and across
  * the full long range the queries feed it.
  */
class IntMathSpec extends SparkSpec {
  import spark.implicits._

  private def ref(n: Long): Long = {
    if (n <= 0) return 0 // the production mapping for empty sources
    // binary-search reference, no floating point anywhere
    var lo = 0L; var hi = math.min(n, 3037000499L) + 1
    while (lo < hi) {
      val mid = lo + (hi - lo + 1) / 2
      if (mid <= n / mid && mid * mid <= n) lo = mid else hi = mid - 1
    }
    lo
  }

  test("isqrt is exact on adversarial values (squares, squares ± 1, primes, huge)") {
    val ns = (1L to 200L) ++
      (1L to 2000L by 13) ++
      Seq(1L, 2, 3, 4, 8, 15, 16, 17, 24, 25, 26).map(identity) ++
      (1L to 46341L by 997).flatMap(k => Seq(k * k - 1, k * k, k * k + 1)) ++
      Seq(3037000499L * 3037000499L, // largest representable square
        3037000499L * 3037000499L - 1,
        Long.MaxValue, Long.MaxValue - 1, 999999999999L)
    val df = (ns.distinct.filter(_ >= 1) ++ Seq(0L, -5L)).toDF("n")
    val got = IntMath.withIsqrt(df, "n", "w")
      .select($"n", $"w").as[(Long, Long)].collect()
    for ((n, w) <- got)
      assert(w == ref(n), s"isqrt($n) = $w, want ${ref(n)}")
  }

  test("the SQL-twin recurrence evaluates identically through Spark SQL") {
    // the DuckDB oracle runs isqrtSqlCtes; Spark can parse the same
    // fragment modulo the division operator — proving the chained
    // CTE text itself (not just an analogous computation) yields the
    // identical column
    val ctes = IntMath.isqrtSqlCtes("src", "tag", "n", "w")
      .replace("//", "div")
      .replace("<<", "<< ") // Spark parses << as shiftleft since 4.0
    val sql =
      s"""WITH src AS (
         |  SELECT id AS tag, (id * id * 97 + 11) AS n FROM range(1, 2000)),
         |$ctes
         |SELECT tag, n, w FROM isqf ORDER BY tag""".stripMargin
    val got = spark.sql(sql).as[(Long, Long, Long)].collect()
    assert(got.length == 1999)
    for ((_, n, w) <- got) assert(w == ref(n), s"isqrt($n) = $w")
  }
}
