package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic 32-bit hashing shared by the dedup/sketch operators.
  *
  * Built on md5 rather than Spark's `hash`/`xxhash64` because the
  * same value must be computable in the DuckDB oracle
  * (`('0x'||substr(md5(x),1,8))::BIGINT`) — md5 is the one hash both
  * engines expose with identical semantics. md5 is codegen'd in Spark
  * (commons-codec under whole-stage codegen), so this stays in the
  * compiled hot path; at 100 TB the per-row cost is dominated by the
  * shuffle it feeds either way.
  */
object Hashing {

  /** First 32 bits of md5(x) as an unsigned value in a long column. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL for [[h32]] over expression `e` — kept adjacent so the
    * two engines' definitions can only change together.
    */
  def h32Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  /** Seeded hash family h_k(x) = h32(k ++ ":" ++ x) — the MinHash
    * permutation family.
    */
  def seeded(seed: Int, c: Column): Column =
    h32(concat(lit(s"$seed:"), c))

  def seededSql(seed: Int, e: String): String =
    h32Sql(s"'$seed:' || $e")
}
