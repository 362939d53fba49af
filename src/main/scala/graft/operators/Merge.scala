package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction / CDC upsert: reduce a stream of keyed
  * versions (base snapshot ∪ updates) to the latest state per key —
  * the batch form of MERGE INTO ... WHEN MATCHED THEN UPDATE, and the
  * compaction step every snapshot-plus-changelog table layout
  * (Delta/Hudi/Iceberg-style) runs on read or on maintenance.
  *
  * Scale shape: ONE shuffle on the key, then an in-partition sort and
  * a streaming first-row-per-key window — no join, no driver state.
  * The window is `row_number` over (key | version desc), so per-key
  * work is O(versions of that key); a pathologically hot key (millions
  * of updates to one row) is exactly the skew AQE's partition split
  * handles, or pre-aggregate with [[Salting]]-style partials if the
  * changelog is adversarial. Version ties must be impossible by
  * construction — callers pass a total version order (e.g. commit
  * timestamp + a monotonic sequence number as the tiebreaker), which
  * is what any real CDC feed (binlog offset, LSN) provides.
  */
object Merge {

  /** Latest version per key from a unioned changelog. `versionCols`
    * orders versions lexicographically, newest first wins; it must be
    * a total order per key for the result to be deterministic.
    */
  def latestWins(changes: DataFrame, keys: Seq[String],
                 versionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
