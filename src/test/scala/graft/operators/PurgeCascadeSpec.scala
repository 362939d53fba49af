package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cross-family purge orchestrator: one deletion set fans to all
  * seven persisted index families, and afterwards the purged id is
  * unfindable through EVERY probe path — the compliance property each
  * family proves individually (q246/q258/q262/q271/q281/q296/q299),
  * asserted here through the single composed call (the tokenizer arm
  * via the derived unique-vocabulary word set; the sketch arm via the
  * exact occurrence subtraction).
  */
class PurgeCascadeSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16; private val BANDS = 4; private val R = 4
  private val BITS = 8; private val TABLES = 4
  private val M = 4; private val DSUB = 4; private val KS = 8
  private val ITERS = 2
  private val DIM = M * DSUB

  private def doc(i: Int) =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"

  private def vec(seed: Long, perturb: Float): Array[Float] =
    Array.tabulate(DIM) { i =>
      val h = (seed * 31 + i) * 2654435761L
      ((h % 1000).toFloat / 1000.0f) + (if (i == 0) perturb else 0.0f)
    }

  // one shared id space 0..39: the purged "user" owns doc/vector 5
  private lazy val docs =
    (0 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
  private lazy val vecs =
    (0 until 40).map(i => (i.toLong, vec(i.toLong, 0.0f)))
      .toDF("vec_id", "embedding")

  test("one purge call propagates to all seven families' probe paths") {
    val roots = Seq.fill(7)(Files.createTempDirectory("cascade").toString)
    val Seq(dRoot, sRoot, pRoot, fRoot, lRoot, bRoot, cRoot) = roots
    DedupIndex.publish(
      Dedup.minhashSignatures(docs, "doc_id", "text", K),
      "doc_id", BANDS, R, dRoot)
    SimIndex.publish(vecs, "vec_id", "embedding", BITS, TABLES, sRoot)
    PqIndex.publish(vecs, "vec_id", "embedding", M, DSUB, KS, ITERS, pRoot)
    FirstSeenIndex.publish(
      Dedup.shingleSet(docs, "doc_id", "text", 3), fRoot)
    LexIndex.publish(docs, "doc_id", "text", lRoot)
    BpeIndex.publish(docs, "doc_id", "text", R, bRoot)
    SketchIndex.publish(docs.select(
        explode(split($"text", " ")).as("term")),
      "term", 4, 64, cRoot)

    val ids = Seq(5L).toDF("id")
    val targets = Seq(
      PurgeCascade.dedup(dRoot, "id"),
      PurgeCascade.sim(sRoot, "id"),
      PurgeCascade.pq(pRoot, "id"),
      PurgeCascade.firstSeen(fRoot, "id"),
      PurgeCascade.lex(lRoot, "id"),
      PurgeCascade.bpe(bRoot, docs, "id"),
      PurgeCascade.sketch(cRoot, docs, "id"))
    val reports = PurgeCascade.purge(spark, ids, targets)

    assert(reports.map(_.family) ==
      Seq("dedup", "sim", "pq", "firstSeen", "lex", "bpe", "sketch"))
    assert(reports.forall(_.newVersion.nonEmpty))
    // compaction reset every tombstone log (probes stop paying the
    // anti-join; the rows are physically gone from the serving gen)
    for (r <- roots.take(5))
      assert(Tombstones.get(spark, r).isEmpty,
        s"tombstones not reset under $r")

    // dedup: an exact redelivery of doc 5 must surface NO candidate
    val redelivered = Seq((1000L, doc(5))).toDF("doc_id", "text")
    val cand = DedupIndex.probe(spark,
        Dedup.minhashSignatures(redelivered, "doc_id", "text", K),
        "doc_id", BANDS, R, dRoot)
      .as[(Long, Long)].collect().toSet
    assert(!cand.exists(_._2 == 5L), s"dedup resurfaced 5: $cand")

    // sim + pq: a near-copy query of vector 5 must not retrieve it
    val q5 = Seq((2000L, vec(5L, 0.001f))).toDF("vec_id", "embedding")
    val simHits = SimIndex.probeTopK(spark, q5, "vec_id", "embedding",
        3, sRoot)
      .select($"index_id").as[Long].collect().toSet
    assert(!simHits.contains(5L), s"sim resurfaced 5: $simHits")
    val pqHits = PqIndex.probeTopK(spark, q5, "vec_id", "embedding",
        3, pRoot)
      .select($"index_id").as[Long].collect().toSet
    assert(!pqHits.contains(5L), s"pq resurfaced 5: $pqHits")

    // first-seen: no shingle may still credit doc 5 as first holder
    val probe5 = FirstSeenIndex.probe(spark,
        Dedup.shingleSet(redelivered, "doc_id", "text", 3), fRoot)
      .select($"seen_doc").as[Option[Long]].collect().toSet
    assert(!probe5.contains(Some(5L)),
      s"first-seen still credits purged doc 5: $probe5")

    // lexical: a query built from doc 5's own distinctive term must
    // not retrieve it
    val lexHits = LexIndex.bm25TopK(spark,
        Seq((0L, "token5")).toDF("query_id", "term"),
        "query_id", "term", 10, lRoot)
      .select($"index_id").as[Long].collect().toSet
    assert(!lexHits.contains(5L), s"lex resurfaced 5: $lexHits")

    // bpe: doc 5's unique tokens left the memo; its SHARED word
    // (word5 also lives in docs 18/31, i % 13 == 5) must survive —
    // purging it would gut the memo for the survivors
    val memoWords = BpeIndex.memoAll(spark, bRoot)
      .select($"word").as[String].collect().toSet
    for (w <- Seq("token5", "filler35", "tail155", "end5"))
      assert(!memoWords.contains(w), s"bpe memo still stores $w")
    assert(memoWords.contains("word5"),
      "bpe purge dropped a word shared with surviving docs")
    // and tokenize results are unchanged by construction
    val redeliveredTok = BpeIndex.tokenize(spark,
        Seq((3000L, doc(5))).toDF("doc_id", "text"),
        "doc_id", "text", bRoot)
      .as[(Long, Long, Long)].collect().toSet
    val freshRoot = Files.createTempDirectory("cascade").toString
    BpeIndex.publish(docs, "doc_id", "text", R, freshRoot)
    assert(redeliveredTok == BpeIndex.tokenize(spark,
      Seq((3000L, doc(5))).toDF("doc_id", "text"),
      "doc_id", "text", freshRoot)
      .as[(Long, Long, Long)].collect().toSet,
      "word purge changed tokenize results")

    // sketch: doc 5's unique token reads 0 after the subtraction and
    // the shared word's estimate matches a survivor-only build
    val skEst = SketchIndex.estimate(spark,
        Seq("token5", "word5").toDF("term"), "term", cRoot)
      .select($"term", $"cms_est").as[(String, Long)].collect().toMap
    assert(skEst("token5") == 0L, s"sketch still counts token5: $skEst")
    val skFresh = Files.createTempDirectory("cascade").toString
    SketchIndex.publish(docs.filter($"doc_id" =!= 5L)
        .select(explode(split($"text", " ")).as("term")),
      "term", 4, 64, skFresh)
    assert(skEst == SketchIndex.estimate(spark,
      Seq("token5", "word5").toDF("term"), "term", skFresh)
      .select($"term", $"cms_est").as[(String, Long)].collect().toMap,
      "sketch subtraction diverged from the survivor build")
  }

  test("purge(ban = true): one call forgets AND stays forgotten across families") {
    val Seq(dRoot, sRoot, gRoot) =
      Seq.fill(3)(Files.createTempDirectory("cascade-ban").toString)
    DedupIndex.publish(
      Dedup.minhashSignatures(docs, "doc_id", "text", K),
      "doc_id", BANDS, R, dRoot)
    SimIndex.publish(vecs, "vec_id", "embedding", BITS, TABLES, sRoot)
    GraphIndex.publish(
      (0 until 39).flatMap(i =>
        Seq((i.toLong, (i + 1).toLong, 1L), ((i + 1).toLong, i.toLong, 1L)))
        .toDF("src", "dst", "w"), gRoot)
    val targets = Seq(
      PurgeCascade.dedup(dRoot, "id"),
      PurgeCascade.sim(sRoot, "id"),
      PurgeCascade.graph(gRoot, "id"))
    PurgeCascade.purge(spark, Seq(5L).toDF("id"), targets, ban = true)
    // every family's durable ban landed (tombstones are already reset)
    assert(DedupIndex.bans(spark, dRoot).nonEmpty)
    assert(SimIndex.bans(spark, sRoot).nonEmpty)
    assert(GraphIndex.bans(spark, gRoot).nonEmpty)
    // the backfill attempts: each family's ingestion path must gate.
    // A FULLY banned batch commits no delta at all (an empty
    // partitioned dir would break every later append-log read)
    SimIndex.appendDelta(vecs.filter($"vec_id" === 5L),
      "vec_id", "embedding", sRoot, tag = "backfill")
    assert(SimIndex.deltas(sRoot).isEmpty,
      "an entirely-banned backfill committed a delta dir")
    // a MIXED batch commits only its legit rows
    SimIndex.appendDelta(vecs.filter($"vec_id" === 5L || $"vec_id" === 7L),
      "vec_id", "embedding", sRoot, tag = "backfill2")
    assert(spark.read.parquet(SimIndex.deltas(sRoot).head)
      .filter($"index_id" === 5L).count() == 0,
      "sim backfill re-entered after a banned cascade")
    GraphIndex.fold(spark,
      Seq((5L, 9L, 1L), (9L, 5L, 1L)).toDF("src", "dst", "w"), gRoot,
      tag = "backfill")
    val nbrs = GraphIndex.neighbors(spark, Seq(5L, 9L).toDF("node"), gRoot)
      .select($"node", $"nbr").as[(Long, Long)].collect().toSet
    assert(!nbrs.exists(p => p._1 == 5L || p._2 == 5L),
      "graph backfill re-entered after a banned cascade")
  }

  test("Targets are stateless values — one Target serves two cascades") {
    // the two no-tombstone arms (bpe, sketch) used to stage the
    // deletion frame in the Target itself, making a Target single-use;
    // the frame now flows through purge into compact, so the SAME
    // Target values run a second cascade with a different deletion set
    val bRoot = Files.createTempDirectory("cascade").toString
    val cRoot = Files.createTempDirectory("cascade").toString
    BpeIndex.publish(docs, "doc_id", "text", R, bRoot)
    SketchIndex.publish(docs.select(
        explode(split($"text", " ")).as("term")),
      "term", 4, 64, cRoot)
    val targets = Seq(
      PurgeCascade.bpe(bRoot, docs, "id"),
      PurgeCascade.sketch(cRoot, docs, "id"))
    PurgeCascade.purge(spark, Seq(5L).toDF("id"), targets)
    PurgeCascade.purge(spark, Seq(7L).toDF("id"), targets)
    val memoWords = BpeIndex.memoAll(spark, bRoot)
      .select($"word").as[String].collect().toSet
    for (w <- Seq("token5", "end5", "token7", "end7"))
      assert(!memoWords.contains(w),
        s"bpe memo still stores $w after the second cascade")
    // exact-subtraction check: both purges applied ≡ a never-ingested
    // build over the survivors (estimates may carry collision bias at
    // w=64 — the comparison is bit-equality with the survivor world,
    // not zero)
    val probeTerms = Seq("token5", "token7", "alpha").toDF("term")
    val skEst = SketchIndex.estimate(spark, probeTerms, "term", cRoot)
      .select($"term", $"cms_est").as[(String, Long)].collect().toMap
    val skFresh = Files.createTempDirectory("cascade").toString
    SketchIndex.publish(docs.filter($"doc_id" =!= 5L && $"doc_id" =!= 7L)
        .select(explode(split($"text", " ")).as("term")),
      "term", 4, 64, skFresh)
    assert(skEst == SketchIndex.estimate(spark, probeTerms, "term", skFresh)
      .select($"term", $"cms_est").as[(String, Long)].collect().toMap,
      "two chained subtractions diverged from the survivor build")
    assert(skEst("alpha") == 38L, s"sketch lost survivor mass: $skEst")
  }

  test("vacuumAll drops every generation but the compacted head") {
    val root = Files.createTempDirectory("cascade").toString
    DedupIndex.publish(
      Dedup.minhashSignatures(docs, "doc_id", "text", K),
      "doc_id", BANDS, R, root)
    val t = Seq(PurgeCascade.dedup(root, "id"))
    PurgeCascade.purge(spark, Seq(5L).toDF("id"), t)
    assert(VersionedDirs.versionsOf(root).size == 2,
      "purge without vacuum must keep the prior generation for " +
        "pinned readers")
    PurgeCascade.vacuumAll(t)
    assert(VersionedDirs.versionsOf(root).size == 1)
  }
}
