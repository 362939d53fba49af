package graft.operators

import org.apache.spark.sql.DataFrame

/** The shared probe-cache contract of the five persisted index
  * families (DedupIndex, SimIndex, FirstSeenIndex, LexIndex,
  * PqIndex).
  *
  * A probe derives a keyed frame from its batch (banding, bucket
  * keys, sub-vector splits …) that feeds BOTH the driver-side
  * touched-partition collect and the probe join — and callers then
  * reference the probe RESULT several more times (jaccardFor reads
  * its candidate set three times; eval queries union multiple
  * probes). Two naive lifecycles both fail:
  *
  *   - persist the batch frame and never release → executor storage
  *     leaks on every library call (the r10 advice item);
  *   - release right after the collect → every later consumption of
  *     the returned LAZY plan re-derives the batch side from scratch
  *     (the r11 regression: q91 5.0→19.1 s, q246 4.5→32.4 s —
  *     jaccardFor re-signed the corpus-sized batch ~4× per query).
  *
  * The contract that gives callers a cheap plan AND a released
  * cache: the probe persists the batch frame, MATERIALIZES its
  * probe-result frame through [[materialize]] (an eager
  * `localCheckpoint` — the result is computed once, its lineage is
  * severed, and the returned frame is a plain RDD scan that can
  * never re-derive the batch side), and only then unpersists the
  * batch frame. Probe results are candidate-/batch-bounded — never
  * corpus-sized — so the checkpoint blocks are small, disk-backed
  * under memory pressure, and swept by Spark's context cleaner when
  * the frame is garbage collected.
  *
  * Corollaries, pinned by CachePolicySpec:
  *   - a probe NEVER persists or unpersists a caller-provided frame
  *     (r11's `probeBanded` evicted DedupStream's batch cache);
  *   - the returned frame is deterministic even for
  *     non-deterministic batch inputs — the touched-partition filter
  *     and the join consumed the SAME single evaluation, so the
  *     pruning set can't silently drop rows of a re-evaluation.
  */
private[graft] object ProbeCache {

  /** Eagerly compute `result` once and return it lineage-free (a
    * local checkpoint). Call BEFORE releasing the batch-side cache
    * the plan depends on.
    */
  def materialize(result: DataFrame): DataFrame =
    result.localCheckpoint(eager = true)
}
