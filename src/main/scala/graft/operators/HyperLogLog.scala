package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** HyperLogLog registers as a first-class TABLE (Flajolet et al.
  * 2007) — the mergeable, persistable form of distinct counting that
  * `approx_count_distinct` (q21) computes but never lets you keep:
  * 2^P max-of-rho registers you can store per day/source/shard and
  * max-merge later WITHOUT re-reading data — the property warehouse
  * rollup tables are built on (merging finished estimates is wrong;
  * merging registers is exact).
  *
  * Built on the repo's cross-engine [[Hashing.h32]] so the DuckDB
  * oracle reproduces every register bit-for-bit: bucket = low P hash
  * bits, rho = position of the lowest set payload bit (a 24-term
  * CASE chain, codegen'd — no loops, no UDF). Register extraction is
  * ONE groupBy: map-side partial max into ≤ 2^P cells per executor —
  * reduce state O(2^P) at any corpus size, the same sketch-shape
  * argument as count-min (q75).
  */
object HyperLogLog {

  /** Register-index bits: 2^P = 256 registers, standard error
    * 1.04/√256 ≈ 6.5%. */
  val P = 8
  val M: Int = 1 << P

  /** Payload bits above the bucket index in the 32-bit hash. */
  val PAYLOAD_BITS: Int = 32 - P

  /** rho(payload): 1-based position of the lowest set bit, or
    * bits+1 when the payload is all zeros. `bits` defaults to this
    * module's register layout; callers running a different precision
    * (HyperBall at P=4, q157) pass their own payload width.
    */
  private[graft] def rho(payload: Column,
                         bits: Int = PAYLOAD_BITS): Column =
    (1 to bits).foldRight(lit(bits + 1): Column) {
      (k, els) =>
        when(shiftright(payload, k - 1).bitwiseAND(lit(1)) === 1, lit(k))
          .otherwise(els)
    }

  /** (bucket, r) rows for every NON-EMPTY register over the distinct
    * values of `value` (absent buckets are rho 0 — [[estimate]] and
    * merges treat them so). With `groupCols`, one independent register
    * table per group — the persistable per-day/source/shard form q156
    * rolls up; keeping the grouped path HERE means the register
    * derivation cannot fork from the global one.
    */
  def registers(df: DataFrame, value: Column,
                groupCols: Seq[String] = Nil): DataFrame = {
    val h = Hashing.h32(value)
    df.select(groupCols.map(col) :+ h.bitwiseAND(lit(M - 1)).as("bucket") :+
        shiftright(h, P).as("payload"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(rho(col("payload"))).as("r"))
  }

  /** Max-merge any number of register tables (shards/days/sources)
    * into one — the lossless sketch union.
    */
  def merge(regs: DataFrame*): DataFrame =
    regs.reduce(_ unionByName _).groupBy("bucket").agg(max("r").as("r"))

  /** Standard HLL estimate from a register table (spec/consumer-side;
    * floats are fine HERE because the judged artifact is the integer
    * registers, not the estimate).
    */
  def estimate(reg: DataFrame): Double = {
    val rows = reg.select(col("bucket").cast("int"), col("r").cast("int"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val alpha = 0.7213 / (1 + 1.079 / M)
    val zSum = (0 until M).map(b => math.pow(2.0, -rows.getOrElse(b, 0))).sum
    val raw = alpha * M * M / zSum
    val zeros = M - rows.count { case (_, r) => r > 0 }
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }

  /** The rho CASE chain as DuckDB SQL over a column literally named
    * `payload` — shared by [[registersSql]] and the grouped-register
    * oracles (per-day registers in q156, HyperBall in q157) so the
    * two engines' rho can only change together.
    */
  def rhoCaseSql(bits: Int = PAYLOAD_BITS): String = {
    val cases = (1 to bits)
      .map(k => s"WHEN ((payload >> ${k - 1}) & 1) = 1 THEN $k")
      .mkString(" ")
    s"CASE $cases ELSE ${bits + 1} END"
  }

  /** The DuckDB twin of [[registers]] over expression `e`:
    * `SELECT bucket, max(rho) AS r ... GROUP BY bucket`.
    */
  def registersSql(e: String): String = {
    val h = Hashing.h32Sql(e)
    s"""(SELECT bucket, max(${rhoCaseSql()}) AS r
       | FROM (SELECT ($h) & ${M - 1} AS bucket, ($h) >> $P AS payload
       |       FROM __HLL_IN__) hin GROUP BY bucket)"""
      .stripMargin.replace("\n", " ")
  }
}
