package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimIndex

/** Continuous similarity search: a stream of new vectors probed per
  * micro-batch against a PUBLISHED [[SimIndex]] generation under
  * `foreachBatch` — the retrieval/near-dup-alerting shape (every
  * arriving embedding answers "what does the corpus already hold
  * like this?") run continuously. Simpler than [[DedupStream]] by
  * design: the index is static between re-publishes, so batches
  * never pair with each other and there is no tail state — each
  * batch's top-k lands as one `_SUCCESS`-committed dir keyed by
  * batch id (the [[VersionedSink]] idempotence trick), so an
  * at-least-once replay overwrites identical bytes and is absorbed.
  *
  * Index re-publishes are picked up at the NEXT batch boundary
  * ([[SimIndex.resolve]] runs per probe) — a batch is scored against
  * exactly one committed generation, never a half-written one (the
  * versioned-dir commit guarantees it), which is the consistency a
  * serving system actually wants: per-request snapshot isolation,
  * not mid-request index mutation.
  */
final class AnnStream(spark: SparkSession, indexRoot: String,
                      outRoot: String, id: String, vec: String, k: Int,
                      // the probe seam: any committed-index top-k with
                      // the shared (spark, batch, id, vec, k, root)
                      // shape — SimIndex by default, PqIndex.probeTopK
                      // for the streaming × PQ cell (AnnStreamSpec
                      // proves both ≡ their direct probes)
                      probeFn: (SparkSession, DataFrame, String, String,
                        Int, String) => DataFrame = AnnStream.DefaultProbe) {

  private val sink = new BatchDirs(spark, outRoot, "topk.b")

  /** The `foreachBatch` body. Returns false when this batch id is
    * already committed (replay absorbed), true when this call
    * committed it.
    */
  def processBatch(batch: DataFrame, batchId: Long): Boolean = {
    val target = sink.target(batchId)
    if (sink.committed(target)) return false
    graft.sources.Artifacts.notePublish()
    probeFn(spark, batch, id, vec, k, indexRoot)
      .write.mode("overwrite").parquet(target.toString)
    true
  }

  /** Every committed batch's top-k results so far, in the probe's own
    * schema (SimIndex: cos_sim; PqIndex: adc_d2). Before any batch
    * commits, the empty frame's schema is derived by PLANNING the
    * probe over an empty query batch — which works for any probeFn,
    * default or custom (the reference-identity guard this replaces
    * confused callers passing `probeFn = SimIndex.probeTopK`
    * explicitly, the documented default). The plan needs a committed
    * index generation to resolve; absent one, the error says to probe
    * a batch first.
    */
  def results(): DataFrame = {
    val dirs = sink.paths
    if (dirs.isEmpty) {
      val emptyBatch = spark.range(0).select(
        col("id").cast("long").as(id),
        array().cast("array<float>").as(vec))
      val schema =
        try probeFn(spark, emptyBatch, id, vec, k, indexRoot).schema
        catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalStateException(
              s"no committed batches under $outRoot yet and the probe " +
                "could not plan an empty batch against the index at " +
                s"$indexRoot — probe at least one batch before reading " +
                "results()", e)
        }
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.parquet(dirs: _*)
  }

  def committedBatches: Seq[Long] = sink.ids
}

object AnnStream {
  /** The default probe ([[SimIndex.probeTopK]]). */
  val DefaultProbe: (SparkSession, DataFrame, String, String, Int,
    String) => DataFrame = SimIndex.probeTopK
}
