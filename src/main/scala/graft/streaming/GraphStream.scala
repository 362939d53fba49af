package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphIndex

/** Continuous connectivity gate — the streaming × graph cell: each
  * arriving edge batch's endpoint nodes are degree-censused against
  * the PRE-batch committed [[GraphIndex]] state ("how connected is
  * this node already?" — the gate that spots a first-time
  * participant, a suddenly-hot hub, or a freshly-purged identity
  * reporting 0), then the batch's OWN edge sums fold in as a tagged
  * delta — O(batch) per batch at any graph size.
  *
  * Exactly-once shape (the [[SketchStream]] ordering): the census
  * lands as one `_SUCCESS`-committed `deg.bN` dir BEFORE the tagged
  * fold, so a replayed batch never censuses a state that already
  * contains itself; the fold is absorbed by tag — live delta dir, or
  * the resolved generation's `_folded.json` after a merge consumed
  * it. Edge weights are SUMS (not idempotent), so the absorb is what
  * keeps a checkpoint-lagged redelivery from double-counting — and
  * across a PURGE boundary it is what keeps the replay from
  * resurrecting a deleted node's edges (q315).
  */
final class GraphStream(spark: SparkSession, indexRoot: String,
                        outRoot: String) {

  private val sink = new BatchDirs(spark, outRoot, "deg.b")

  /** The `foreachBatch` body: census the batch's endpoint nodes
    * against the pre-batch state, then fold the edges. Returns false
    * when both halves were already committed (replay absorbed).
    */
  def processBatch(edges: DataFrame, batchId: Long): Boolean = {
    val target = sink.target(batchId)
    val tag = s"b$batchId"
    val censused = sink.committed(target)
    val ingested = GraphIndex.folded(indexRoot, tag)
    if (censused && ingested) return false
    if (!censused) {
      graft.sources.Artifacts.notePublish()
      val endpoints = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node")))
        .distinct()
      GraphIndex.degrees(spark, endpoints, indexRoot)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").parquet(target.toString)
    }
    // fold strictly after the census commit: a crash here replays as
    // fold-only against the still-unchanged state
    if (!ingested) {
      GraphIndex.fold(spark, edges, indexRoot, tag)
    }
    true
  }

  /** Every committed batch's census so far
    * (node, out_deg, w_total, batch_id).
    */
  def results(): DataFrame = {
    val dirs = sink.paths
    require(dirs.nonEmpty, s"no committed batches under $outRoot yet")
    spark.read.parquet(dirs: _*)
  }

  def committedBatches: Seq[Long] = sink.ids
}
