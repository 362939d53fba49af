package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.FirstSeenIndex

/** [[NoveltyStream]]: the continuous novelty gate — per-batch scoring
  * against the pre-batch committed first-seen state, O(batch) tagged
  * folds at the batch boundary, replay absorption, and the
  * crash-window (scored committed, fold missing) replaying as
  * fold-only.
  */
class NoveltyStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "d"))
    .toDF("doc_id", "s")
  private lazy val b0 = Seq(
    (10L, "b"), (10L, "e"), (11L, "e"), (11L, "n"), (12L, "a"))
    .toDF("doc_id", "s")
  private lazy val b1 = Seq(
    (20L, "e"), (20L, "z"), (21L, "z"), (21L, "n"), (21L, "q"))
    .toDF("doc_id", "s")

  private def freshRoots(): (String, String) = (
    Files.createTempDirectory("nvstream-idx").toString,
    Files.createTempDirectory("nvstream-out").toString)

  test("per-batch census ≡ one global first-occurrence pass; fold boundary honored; replays absorbed") {
    val (idxRoot, outRoot) = freshRoots()
    FirstSeenIndex.publish(base, idxRoot)
    val ns = new NoveltyStream(spark, idxRoot, outRoot)
    assert(ns.processBatch(b0, 0))
    assert(!ns.processBatch(b0, 0), "redelivery not absorbed")
    assert(ns.processBatch(b1, 1))
    assert(ns.committedBatches == Seq(0L, 1L))
    val got = ns.results()
      .as[(Long, Long, Long)].collect().toSet
    // global first-occurrence over base ∪ b0 ∪ b1 restricted to the
    // streamed docs, by hand: "e" first in doc 10, "n" in 11, "z" in
    // 20, "q" in 21; "a"/"b" belong to the base
    assert(got == Set(
      (10L, 2L, 1L), (11L, 2L, 1L), (12L, 1L, 0L),
      (20L, 2L, 1L), (21L, 3L, 1L)),
      s"stream census diverges: $got")
    // batch-1's view proves the fold boundary: "e" (introduced by
    // batch 0) is SEEN — a stream that skipped the fold would have
    // marked doc 20's "e" novel
    assert(FirstSeenIndex.folded(idxRoot, "b0") &&
      FirstSeenIndex.folded(idxRoot, "b1"))
  }

  test("crash between score and fold replays as fold-only, never a re-score") {
    val (idxRoot, outRoot) = freshRoots()
    FirstSeenIndex.publish(base, idxRoot)
    val ns = new NoveltyStream(spark, idxRoot, outRoot)
    assert(ns.processBatch(b0, 0))
    val before = ns.results().as[(Long, Long, Long)].collect().toSet
    // simulate the crash window: the scored dir committed but the
    // fold didn't (delete it as if the process died between the two)
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    rm(new java.io.File(new java.io.File(idxRoot, "deltas"), "batch-b0"))
    assert(!FirstSeenIndex.folded(idxRoot, "b0"))
    val scoredDir = new java.io.File(outRoot, "scored.b0")
    val mtime = scoredDir.lastModified()
    // the replay must restore the fold WITHOUT touching the census —
    // re-scoring after a (partial or prior) fold would see the
    // batch's own shingles as already-seen and zero its novelty
    assert(ns.processBatch(b0, 0))
    assert(FirstSeenIndex.folded(idxRoot, "b0"))
    assert(scoredDir.lastModified() == mtime, "replay re-scored the batch")
    assert(ns.results().as[(Long, Long, Long)].collect().toSet == before)
  }

  test("runs under a real foreachBatch micro-batch query (file source)") {
    val (idxRoot, outRoot) = freshRoots()
    FirstSeenIndex.publish(base, idxRoot)
    val ns = new NoveltyStream(spark, idxRoot, outRoot)
    val inDir = Files.createTempDirectory("nvstream-in")
    def jsonOf(rows: Seq[(Long, String)]): String =
      rows.map { case (d, s) => s"""{"doc_id":$d,"s":"$s"}""" }.mkString("\n")
    Files.writeString(inDir.resolve("f0.json"),
      jsonOf(Seq((10L, "b"), (10L, "e"), (11L, "e"), (11L, "n"), (12L, "a"))))
    val stream = spark.readStream
      .schema("doc_id LONG, s STRING")
      .json(inDir.toString)
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        ns.processBatch(b, id); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("nvstream-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(inDir.resolve("f1.json"),
        jsonOf(Seq((20L, "e"), (20L, "z"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = ns.results().as[(Long, Long, Long)].collect().toSet
    // doc 20's "e" must be SEEN through batch 0's fold
    assert(got.contains((20L, 2L, 1L)), s"fold boundary lost: $got")
    assert(got.contains((10L, 2L, 1L)) && got.contains((12L, 1L, 0L)))
  }
}
