package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SketchIndex

/** Continuous frequency gate — the streaming × sketch cell: each
  * arriving batch's distinct keys are estimated against the PRE-batch
  * committed [[SketchIndex]] state ("how hot is this key already?" —
  * the hot-key detector feeding [[graft.operators.Salting]] and
  * per-source quotas), then the batch's OWN d·w-cell sketch folds in
  * as a tagged delta — O(d·w) per batch at any corpus size, sketch
  * linearity's gift to the maintenance plane. Estimates are monotone
  * across batches (cell sums only grow), and the judged twin (q300)
  * proves the growth lands at exactly the batch boundary: a key
  * batch 0 hammered estimates higher from batch 1 on.
  *
  * Exactly-once shape: estimates land as one `_SUCCESS`-committed
  * `est.bN` dir BEFORE the tagged delta append, so a replayed batch
  * never estimates against a state that already contains itself; the
  * append is absorbed by tag — live delta dir, or the resolved
  * generation's `_folded.json` after a merge/purge consumed it
  * (cell sums are NOT idempotent, so the closure is what keeps a
  * checkpoint-lagged redelivery from double-counting).
  */
final class SketchStream(spark: SparkSession, indexRoot: String,
                         outRoot: String, term: String) {

  private val sink = new BatchDirs(spark, outRoot, "est.b")

  /** The `foreachBatch` body: estimate against the pre-batch state,
    * then fold. Returns false when both halves were already committed
    * (replay absorbed), true when this call committed either.
    */
  def processBatch(items: DataFrame, batchId: Long): Boolean = {
    val target = sink.target(batchId)
    val tag = s"b$batchId"
    val estimated = sink.committed(target)
    val ingested = SketchIndex.folded(indexRoot, tag)
    if (estimated && ingested) return false
    if (!estimated) {
      graft.sources.Artifacts.notePublish()
      SketchIndex.estimate(spark, items, term, indexRoot)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").parquet(target.toString)
    }
    // fold strictly after the estimate commit: a crash here replays
    // as fold-only against the still-unchanged state
    if (!ingested) {
      SketchIndex.appendDelta(spark, items, term, indexRoot, tag)
    }
    true
  }

  /** Every committed batch's estimates so far
    * (term, cms_est, n_total, batch_id).
    */
  def results(): DataFrame = {
    val dirs = sink.paths
    require(dirs.nonEmpty, s"no committed batches under $outRoot yet")
    spark.read.parquet(dirs: _*)
  }

  def committedBatches: Seq[Long] = sink.ids
}
