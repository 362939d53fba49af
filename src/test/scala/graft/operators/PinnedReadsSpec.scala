package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pinned read paths for the four families FleetSnapshot r15 did not
  * cover: DedupIndex.probeAt, FirstSeenIndex.probeAt/scoreAt,
  * SketchIndex.estimateAt, BpeIndex.tokenizeAt/memoLookupAt — each
  * serves a generation EXACTLY as committed (no deltas, no tombstone
  * or ban mask, the SimIndex.probeTopKAt contract) and keeps the
  * bucket-pruned scan shape of its live twin.
  */
class PinnedReadsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- dedup

  private val K = 16; private val BANDS = 4; private val R = 4

  private def doc(i: Int) =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"

  private lazy val indexDocs =
    (0 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
  private lazy val freshDocs = Seq(
    (1000L, doc(5)),
    (1001L, "completely unrelated payload nothing shared at all here"))
    .toDF("doc_id", "text")
  private lazy val sigI =
    Dedup.minhashSignatures(indexDocs, "doc_id", "text", K)
  private lazy val sigN =
    Dedup.minhashSignatures(freshDocs, "doc_id", "text", K)

  test("DedupIndex.probeAt serves the pinned generation exactly — a " +
    "later purge never reaches it; the live probe loses the id") {
    val root = Files.createTempDirectory("dedupidx").toString
    val g1 = DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    val before = DedupIndex.probeAt(spark, sigN, "doc_id", BANDS, R, g1)
      .as[(Long, Long)].collect().toSet
    assert(before.contains((1000L, 5L)))
    // purge doc 5 from the live root: tombstone + compact
    DedupIndex.addTombstones(spark, Seq(5L).toDF("doc_id"), "doc_id", root)
    DedupIndex.compact(spark, root)
    val live = DedupIndex.probe(spark, sigN, "doc_id", BANDS, R, root)
      .as[(Long, Long)].collect().toSet
    assert(!live.exists(_._2 == 5L), "live probe still serves purged id")
    val pinned = DedupIndex.probeAt(spark, sigN, "doc_id", BANDS, R, g1)
      .as[(Long, Long)].collect().toSet
    assert(pinned == before,
      "pinned probe drifted — post-snapshot state leaked in")
  }

  test("DedupIndex.probeAt keeps the static bucket partition filter") {
    val root = Files.createTempDirectory("dedupidx").toString
    val g1 = DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    val p = DedupIndex.probeAtPlan(spark, sigN, "doc_id", BANDS, R, g1)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined,
      s"pinned probe scan lost its bucket partition filter:\n${p.take(1500)}")
  }

  // ------------------------------------------------------ firstSeen

  private lazy val fsBase = Seq(
    (1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "d"))
    .toDF("doc_id", "s")
  private lazy val fsBatch = Seq(
    (10L, "b"), (10L, "e"), (11L, "e"), (11L, "n"), (12L, "a"))
    .toDF("doc_id", "s")

  test("FirstSeenIndex.probeAt ignores later folds AND purges; " +
    "scoreAt scores novelty against the pinned world") {
    val root = Files.createTempDirectory("fsidx").toString
    val g1 = FirstSeenIndex.publish(fsBase, root)
    val before = FirstSeenIndex.probeAt(spark, fsBatch, g1)
      .select($"doc_id", $"s", $"seen_doc")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(before == Set(
      (10L, "b", Some(1L)), (10L, "e", None), (11L, "e", None),
      (11L, "n", None), (12L, "a", Some(1L))))
    // post-pin state: a fold introduces "e", a purge removes doc 1
    // (holder of "a" and "b")
    FirstSeenIndex.fold(spark, Seq((7L, "e")).toDF("doc_id", "s"), root)
    FirstSeenIndex.addTombstones(spark, Seq(1L).toDF("doc_id"),
      "doc_id", root)
    val live = FirstSeenIndex.probe(spark, fsBatch, root)
      .select($"doc_id", $"s", $"seen_doc")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(live.contains((10L, "e", Some(7L))), "live probe missed the fold")
    // probe-time purge masking drops the purged holder's rows (the
    // recorded min) — reassignment happens at mergeCompact's repair
    assert(live.contains((10L, "b", None)) && live.contains((12L, "a", None)),
      "live probe still serves rows held by the purged doc")
    val pinned = FirstSeenIndex.probeAt(spark, fsBatch, g1)
      .select($"doc_id", $"s", $"seen_doc")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(pinned == before,
      "pinned probe drifted — post-snapshot state leaked in")
    // scoreAt = scoreBatch over the pinned annotation: "e" is novel
    // (doc 10 first), "n" novel, b/a seen pre-pin
    val scores = FirstSeenIndex.scoreAt(spark, fsBatch, g1)
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, nov) => d -> ((n, nov)) }.toMap
    assert(scores(10L) == ((2L, 1L)), s"doc 10 score wrong: $scores")
    assert(scores(11L) == ((2L, 1L)), s"doc 11 score wrong: $scores")
    assert(scores(12L) == ((1L, 0L)), s"doc 12 score wrong: $scores")
  }

  test("FirstSeenIndex.probeAt keeps the static pbucket filter") {
    val root = Files.createTempDirectory("fsidx").toString
    val g1 = FirstSeenIndex.publish(fsBase, root)
    val one = Seq((10L, "b")).toDF("doc_id", "s")
    val p = FirstSeenIndex.probeAtPlan(spark, one, g1)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"pinned probe scan lost its pbucket filter:\n${p.take(1500)}")
  }

  // --------------------------------------------------------- sketch

  private def terms(xs: (String, Int)*) =
    xs.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("term")

  test("SketchIndex.estimateAt serves the pinned cells — a later " +
    "delta never inflates it, and geometry comes from the pinned " +
    "generation's own params") {
    val root = Files.createTempDirectory("cms").toString
    val g1 = SketchIndex.publish(terms("a" -> 5, "b" -> 2), "term",
      4, 64, root)
    SketchIndex.appendDelta(spark, terms("a" -> 3, "c" -> 7), "term",
      root, tag = "b0")
    val live = SketchIndex.estimate(spark,
        Seq("a", "c").toDF("term"), "term", root)
      .select("term", "cms_est").as[(String, Long)].collect().toMap
    assert(live("a") == 8L && live("c") == 7L)
    val pinned = SketchIndex.estimateAt(spark,
        Seq("a", "c").toDF("term"), "term", g1)
      .select("term", "cms_est").as[(String, Long)].collect().toMap
    assert(pinned("a") == 5L && pinned("c") == 0L,
      s"pinned estimate saw post-snapshot deltas: $pinned")
    val n = SketchIndex.estimateAt(spark, Seq("a").toDF("term"),
        "term", g1)
      .select("n_total").as[Long].head()
    assert(n == 7L, s"pinned n_total wrong: $n")
  }

  // ------------------------------------------------------------ bpe

  private lazy val bpeTrain = Seq(
    (1L, "abab abc abc abab cab"),
    (2L, "abc abab bc bc cab"),
    (3L, "abab abc dd dd dd")).toDF("doc_id", "text")
  private lazy val bpeBatch = Seq(
    (10L, "abc abab zz"),
    (11L, "ababab cab qq abc")).toDF("doc_id", "text")

  test("BpeIndex.tokenizeAt/memoLookupAt serve the pinned tokenizer " +
    "— memo folds and word purges committed since never reach them") {
    val root = Files.createTempDirectory("bpeidx").toString
    val g1 = BpeIndex.publish(bpeTrain, "doc_id", "text", R, root)
    val before = BpeIndex.tokenizeAt(spark, bpeBatch, "doc_id", "text", g1)
      .as[(Long, Long, Long)].collect().toSet
    val liveBefore = BpeIndex.tokenize(spark, bpeBatch, "doc_id",
        "text", root)
      .as[(Long, Long, Long)].collect().toSet
    assert(before == liveBefore, "pinned ≠ live on an untouched root")
    // post-pin state: fold the batch's unseen words into the memo,
    // then purge a trained word
    val seg = Seq(("zz", 2L), ("ababab", 3L), ("qq", 2L))
      .toDF("word", "n_sub")
    BpeIndex.foldMemo(spark, seg, root, tag = "b0")
    BpeIndex.purgeWords(spark, Seq("cab").toDF("word"), root)
    val pinnedMemo = BpeIndex.memoLookupAt(spark,
        Seq("zz", "cab", "abc").toDF("word"), g1)
      .as[(String, Long)].collect().toMap
    assert(!pinnedMemo.contains("zz"),
      "pinned memo lookup saw a post-snapshot fold")
    assert(pinnedMemo.contains("cab"),
      "pinned memo lookup lost a word purged after the pin")
    val liveMemo = BpeIndex.memoLookup(spark,
        Seq("zz", "cab", "abc").toDF("word"), root)
      .as[(String, Long)].collect().toMap
    assert(liveMemo.contains("zz") && !liveMemo.contains("cab"))
    val pinned = BpeIndex.tokenizeAt(spark, bpeBatch, "doc_id", "text", g1)
      .as[(Long, Long, Long)].collect().toSet
    assert(pinned == before,
      "pinned tokenize drifted — post-snapshot state leaked in")
  }

  test("BpeIndex pinned paths keep the static pbucket filter") {
    val root = Files.createTempDirectory("bpeidx").toString
    val g1 = BpeIndex.publish(bpeTrain, "doc_id", "text", R, root)
    val p1 = BpeIndex.memoLookupAtPlan(spark,
        Seq("abc").toDF("word"), g1)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p1).isDefined,
      s"pinned memo lookup lost its pbucket filter:\n${p1.take(1500)}")
    val p2 = BpeIndex.tokenizeAtPlan(spark, bpeBatch, "doc_id",
        "text", g1)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p2).isDefined,
      s"pinned tokenize lost its pbucket filter:\n${p2.take(1500)}")
  }
}
