package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.BpeIndex

/** Continuous token census + memo growth — the streaming × tokenizer
  * cell: each arriving document micro-batch is tokenized against the
  * PRE-batch committed [[BpeIndex]] memo state (base ∪ deltas so
  * far), the per-doc census lands as one `_SUCCESS`-committed
  * `census.bN` dir, and the batch's UNSEEN words' derived
  * segmentations fold in as a tagged memo delta — so every later
  * batch pays the cheap memo join for this batch's vocabulary instead
  * of the R-round merge fold. The memo is pure cache (every row
  * derives from the frozen merges), so unlike [[LexStream]] the delta
  * timing cannot move RESULTS — the judged boundary evidence is the
  * census's `n_memo_hits` column: a word introduced by batch b counts
  * as a memo hit from batch b+1 onward, exactly at the boundary
  * (q295's proof burden, the cost-plane twin of q283's
  * collection-stats shift).
  *
  * Exactly-once shape: the census commits BEFORE the fold (a crash
  * between them replays fold-only against the still-unchanged memo),
  * and the fold is absorbed by tag — live delta dir, or the resolved
  * generation's `_folded.json` after a [[BpeIndex.purgeWords]]
  * consumed it (the PII closure: a checkpoint-lagged redelivery
  * cannot resurrect purged word strings).
  */
final class BpeStream(spark: SparkSession, indexRoot: String,
                      outRoot: String, id: String, text: String) {

  private val sink = new BatchDirs(spark, outRoot, "census.b")

  /** The `foreachBatch` body: census against the pre-batch memo
    * state, then fold the unseen tail. Returns false when both halves
    * were already committed (replay absorbed), true when this call
    * committed either.
    */
  def processBatch(docs: DataFrame, batchId: Long): Boolean = {
    val target = sink.target(batchId)
    val tag = s"b$batchId"
    val censused = sink.committed(target)
    val ingested = BpeIndex.folded(indexRoot, tag)
    if (censused && ingested) return false
    // one shared derivation for both halves (census + unseen tail),
    // both materialized inside the call (ProbeCache) — on a partial
    // replay (census committed, fold lost) the memo is unchanged by
    // construction, so the recomputed unseen tail is the same frame
    val (census, unseen) =
      BpeIndex.censusAndUnseen(spark, docs, id, text, indexRoot)
    if (!censused) {
      graft.sources.Artifacts.notePublish()
      census.write.mode("overwrite").parquet(target.toString)
    }
    // fold strictly after the census commit: the census must reflect
    // the PRE-batch memo (a batch never counts its own words as hits)
    if (!ingested) {
      BpeIndex.foldMemo(spark, unseen, indexRoot, tag)
    }
    true
  }

  /** Every committed batch's census so far (id, n_words, n_subwords,
    * n_memo_hits).
    */
  def results(): DataFrame = {
    val dirs = sink.paths
    require(dirs.nonEmpty, s"no committed batches under $outRoot yet")
    spark.read.parquet(dirs: _*)
  }

  def committedBatches: Seq[Long] = sink.ids
}
