package graft.functions

import org.apache.spark.sql.DataFrame

/** Exact integer math shared by engine and oracle where floats would
  * break cross-engine bit-identity. The flagship: `isqrt` —
  * floor(√n) by UNROLLED integer Newton iteration, expressed in
  * arithmetic both Spark SQL and DuckDB evaluate identically
  * (`length(bin(n))`, integer shifts, truncating integer division —
  * all proven hash-exact in earlier rounds). `floor(sqrt(x))` through
  * doubles is NOT that: for n just below a perfect square the
  * correctly-rounded double sqrt lands on the square root itself and
  * floors one too high — an off-by-one that poisons any hash gate.
  *
  * The recurrence: seed x₀ = 2^⌈bitlen/2⌉ (≥ √n, ≤ 2√n by the bit
  * bound), then x ← (x + n div x) div 2. From above the sequence
  * decreases monotonically to ⌊√n⌋ and then oscillates between ⌊√n⌋
  * and ⌊√n⌋+1 (e.g. n=8: 2→3→2…), so a fixed unroll lands on one of
  * the two regardless of parity and the final correction resolves it.
  * The correction is `x > n div x ⇒ x−1`, NOT `x² > n` — the square
  * of ⌊√n⌋+1 overflows int64 for n above ⌊√2⁶³⌋², silently wrapping
  * negative and skipping the correction; the division form is
  * overflow-free and equivalent (x = ⌊√n⌋+1 ⇔ n div x < x for the
  * two candidates the unroll can land on). Quadratic convergence
  * from a ≤2× seed reaches the oscillation zone in ≤ [[IsqrtSteps]]
  * steps for any positive int64.
  */
object IntMath {

  /** Newton steps in the unroll — enough for 63-bit inputs (error
    * squares each step from a ≤2× seed), with margin.
    */
  val IsqrtSteps = 9

  /** Append column `out` = floor(sqrt(`n`)) for long column `n`
    * (n ≤ 0 maps to 0 — the recurrence runs on `greatest(n, 1)` so a
    * zero input can never reach a 0-div-0 step, which would THROW
    * under ANSI mode rather than quietly null), as [[IsqrtSteps]]
    * chained integer-only expressions (chained `withColumn`, never a
    * self-embedding tree — a nested unroll would double the
    * expression per step).
    */
  def withIsqrt(df: DataFrame, n: String, out: String): DataFrame = {
    val g = s"greatest($n, cast(1 as bigint))"
    var d = df.withColumn(out, org.apache.spark.sql.functions.expr(
      s"shiftleft(cast(1 as bigint), cast((length(bin($g)) + 1) div 2 as int))"))
    for (_ <- 1 to IsqrtSteps)
      d = d.withColumn(out, org.apache.spark.sql.functions.expr(
        s"($out + $g div $out) div 2"))
    d.withColumn(out, org.apache.spark.sql.functions.expr(
      s"case when $n <= 0 then cast(0 as bigint) " +
        s"when $out > $n div $out then $out - 1 else $out end"))
  }

  /** The DuckDB twin: CTE fragments chaining the same recurrence.
    * `src` is the input CTE carrying columns `keep` (comma-joined
    * pass-through list) and `n`; the final fragment `isqf` exposes
    * `keep`, `n`, and `out` = floor(sqrt(n)).
    */
  def isqrtSqlCtes(src: String, keep: String, n: String,
                   out: String): String = {
    val g = s"greatest($n, CAST(1 AS BIGINT))"
    val seed =
      s"""isq0 AS (
         |  SELECT $keep, $n,
         |    (CAST(1 AS BIGINT) << ((length(bin($g)) + 1) // 2)) AS x
         |  FROM $src)"""
    val steps = (1 to IsqrtSteps).map { i =>
      s"""isq$i AS (
         |  SELECT $keep, $n, (x + $g // x) // 2 AS x FROM isq${i - 1})"""
    }
    val fin =
      s"""isqf AS (
         |  SELECT $keep, $n,
         |    (CASE WHEN $n <= 0 THEN CAST(0 AS BIGINT)
         |          WHEN x > $n // x THEN x - 1 ELSE x END) AS $out
         |  FROM isq$IsqrtSteps)"""
    (seed +: steps :+ fin).mkString(",\n")
  }
}
