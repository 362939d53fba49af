package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction — the write half of the q129 shard-balance
  * audit and the everyday 100 TB hygiene op: many undersized input
  * shards are re-binned into target-sized output shards and rewritten
  * as one file per bin.
  *
  * The PLAN is computed over per-input-shard METADATA (one row per
  * input shard — bytes, row count), never over the corpus: input
  * shards are laid into output bins in (bytes DESC, shard) order with
  * a cumulative byte quota, `out = cum_bytes_before div target` — a
  * deterministic sorted-fill that any engine reproduces from the
  * stats alone (the property the oracle checks; a production planner
  * swaps in first-fit-decreasing at the same seam, trading SQL
  * replayability for tighter bins). The ordering window runs over the
  * shard-count-bounded stats frame — the same layout-constant state
  * class as q129's share window — so the plan costs nothing at any
  * corpus size. This is the declarative form of what Delta/Iceberg
  * OPTIMIZE do on the driver over file metadata.
  *
  * The REWRITE is one hash exchange of the data by output shard (the
  * plan joins in as a broadcast of S rows) and a partitioned write —
  * exactly one file per bin, because each bin lives in exactly one
  * task after the exchange.
  */
object Compaction {

  /** Deterministic sorted-fill plan over per-shard stats: returns
    * `stats` + `out_shard`. `stats` must hold one row per input shard
    * — the window below is bounded by the shard layout constant.
    */
  def plan(stats: DataFrame, shardCol: String, bytesCol: String,
           targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.orderBy(col(bytesCol).desc, col(shardCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    stats
      .withColumn("cum_before",
        coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      // truncating div matches DuckDB // on the non-negative domain
      .withColumn("out_shard", expr(s"cum_before div $targetBytes"))
      .drop("cum_before")
  }

  /** DuckDB twin of [[plan]]'s assignment rule, as a window expression
    * over the stats CTE — kept adjacent so the rule can only change on
    * both engines together.
    */
  def planSql(shardCol: String, bytesCol: String, targetBytes: Long): String =
    s"(coalesce(sum($bytesCol) OVER (ORDER BY $bytesCol DESC, $shardCol " +
      s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
      s"// $targetBytes)::BIGINT"

  /** Tag each data row with its planned output shard. The plan side is
    * shard-count-bounded, so the join is a broadcast — no second
    * shuffle of the data beyond the compaction exchange itself.
    */
  def assign(df: DataFrame, planned: DataFrame, shardCol: String): DataFrame =
    df.join(broadcast(planned.select(col(shardCol), col("out_shard"))),
      Seq(shardCol))

  /** Physical rewrite: one parquet file per output bin under `dir`
    * (bin dirs via partitionBy; one file per bin because the exchange
    * hash-routes each bin to a single task).
    */
  def rewrite(assigned: DataFrame, dir: String): Unit =
    assigned
      .repartition(col("out_shard"))
      .write.partitionBy("out_shard").mode("overwrite").parquet(dir)
}
