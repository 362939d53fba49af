package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged query: the Spark implementation paired with its DuckDB
  * oracle SQL (None → the driver records a weaker rows-only check).
  * Keeping both halves adjacent is what keeps column names/types in
  * lock-step — the driver's compare sorts columns by name and hashes
  * values, so every computed column must carry the same alias on both
  * sides.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, sql: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(fn, Some(sql))
}
