package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 100),   // 100 bytes -> frames at 0 and 64
    (2L, "b" * 10),    // shorter than a frame -> one clamped frame
    (3L, "c" * 300))   // capped at maxFrames
    .toDF("doc_id", "text")

  private lazy val media = Multimodal.mediaTable(docs, "doc_id", "text")

  test("decodeMeta runs the stub codec per partition with exact metadata") {
    val out = Multimodal.decodeMeta(media, "doc_id")
      .collect().map(d => d.media_id -> d).toMap
    assert(out(1L).n_bytes == 100)
    assert((out(1L).width, out(1L).height) == ((101, 101)))  // 100%640+1, 100%480+1
    assert(out(2L).n_bytes == 10)
    assert(out(3L).n_bytes == 300)
  }

  test("sampleFrames: stride positions, short-doc clamp, maxFrames cap") {
    val frames = Multimodal.sampleFrames(media, "doc_id", 32, 64, 4)
      .select(col("doc_id"), col("f"), length(col("frame")).as("len"))
      .as[(Long, Int, Int)].collect().toSeq.sorted
    // doc 1 (100B): frames at bytes 1..32 and 65..96, both full
    assert(frames.filter(_._1 == 1L) == Seq((1L, 0, 32), (1L, 1, 32)))
    // doc 2 (10B): one clamped frame
    assert(frames.filter(_._1 == 2L) == Seq((2L, 0, 10)))
    // doc 3 (300B): (300-32) div 64 = 4 -> capped at maxFrames = 4
    assert(frames.filter(_._1 == 3L).map(_._2) == Seq(0, 1, 2, 3))
  }

  test("fitWithin preserves aspect ratio, never upscales, floors at 1") {
    val (w, h) = Multimodal.fitWithin(col("w"), col("h"), 320, 240)
    val out = Seq((640, 480), (100, 50), (1000, 10), (2, 2000))
      .toDF("w", "h").select(w.as("fw"), h.as("fh"))
      .as[(Int, Int)].collect().toSeq
    assert(out == Seq((320, 240), (100, 50), (320, 3), (1, 240)))
  }

  test("frame-dup pairing drops hot frame buckets (q93 df cap)") {
    // a constant frame shared by EVERY media row — the black-frame /
    // boilerplate-header degenerate case. Each doc: 32 constant bytes
    // then 32 unique bytes; frame=stride=32 samples exactly those two.
    val n = 150
    val corpus = spark.range(n).selectExpr(
      "id AS doc_id",
      "concat(repeat('Z', 32), lpad(cast(id AS string), 32, 'x')) AS text")
    // capped: the constant frame's df (150) exceeds maxDf (100), so it
    // never reaches the self-join; unique frames pair nothing
    val capped = graft.queries.PipelineQueries.frameDupePairs(
      corpus, 32, 32, 2, 1L, maxDf = 100L)
    assert(capped.count() == 0L)
    // uncapped control: the same corpus explodes to n·(n−1)/2 pairs —
    // the quadratic blowup the cap exists to prevent
    val uncapped = graft.queries.PipelineQueries.frameDupePairs(
      corpus, 32, 32, 2, 1L, maxDf = 1000L)
    assert(uncapped.count() == n.toLong * (n - 1) / 2)
  }
}
