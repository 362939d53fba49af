package graft.streaming

import org.apache.hadoop.fs.Path
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

  private def fs =
    new Path(outRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committed(p: Path): Boolean =
    fs.exists(new Path(p, "_SUCCESS"))

  private def batchDirs: Seq[(Long, Path)] = {
    val base = new Path(outRoot)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("topk.b") && name.length > 6 &&
          name.drop(6).forall(_.isDigit))
        Some((name.drop(6).toLong, st.getPath))
      else None
    }.filter(d => committed(d._2)).sortBy(_._1)
  }

  /** The `foreachBatch` body. Returns false when this batch id is
    * already committed (replay absorbed), true when this call
    * committed it.
    */
  def processBatch(batch: DataFrame, batchId: Long): Boolean = {
    val target = new Path(outRoot, s"topk.b$batchId")
    if (committed(target)) return false
    graft.sources.Artifacts.notePublish()
    probeFn(spark, batch, id, vec, k, indexRoot)
      .write.mode("overwrite").parquet(target.toString)
    true
  }

  /** Every committed batch's top-k results so far, in the probe's own
    * schema (SimIndex: cos_sim; PqIndex: adc_d2). Before any batch
    * commits, the empty frame can only carry the DEFAULT probe's
    * shape — for a custom probe the schema lives in the committed
    * batch dirs, so reading before the first commit raises a clear
    * error rather than handing back columns the probe never produces.
    */
  def results(): DataFrame = {
    val dirs = batchDirs.map(_._2.toString)
    if (dirs.isEmpty) {
      // reference equality against the shared default instance — an
      // inline eta-expansion of SimIndex.probeTopK would never compare
      // equal, so the default lives as one companion val. (Passing
      // `probeFn = SimIndex.probeTopK` EXPLICITLY therefore also takes
      // this guard path before the first batch — omit the parameter
      // for the default probe.)
      require(probeFn eq AnnStream.DefaultProbe,
        s"no committed batches under $outRoot yet — a custom-probe " +
          "stream's result schema comes from its batch dirs; probe at " +
          "least one batch before reading results() (for the SimIndex " +
          "probe, omit the probeFn parameter)")
      spark.range(0).select(col("id").as("query_id"),
        col("id").as("index_id"), lit(0.0).as("cos_sim"),
        col("id").as("rnk"))
    } else spark.read.parquet(dirs: _*)
  }

  def committedBatches: Seq[Long] = batchDirs.map(_._1)
}

object AnnStream {
  /** The default probe as ONE shared function instance, so the
    * empty-results guard can tell default from custom by reference
    * (every `SimIndex.probeTopK _` eta-expansion is a fresh object).
    */
  val DefaultProbe: (SparkSession, DataFrame, String, String, Int,
    String) => DataFrame = SimIndex.probeTopK
}
