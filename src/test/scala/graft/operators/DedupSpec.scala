package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),    // near dup of 1
    (4L, "completely different content about spark engines here"))
    .toDF("doc_id", "text")

  test("exactGroups collapses exact duplicates to min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 3)
    val dup = g.filter(col("n_copies") === 2)
      .select("keep_id").as[Long].collect()
    assert(dup.toSeq == Seq(1L))
  }

  test("jaccardPairs finds near-dups above threshold, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)))
    assert(!keys.exists { case (a, b) => a == 4L || b == 4L })
    assert(pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 1.0)
  }

  test("jaccardFor scores exactly the listed candidates, matching jaccardPairs") {
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val scored = Dedup.jaccardFor(cands, docs, "doc_id", "text",
        minJaccard = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // identical docs -> 1.0; near-dup agrees with the full-corpus path
    assert(scored((1L, 2L)) == 1.0)
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.0,
        maxDf = 1000)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(scored((1L, 3L)) == full((1L, 3L)))
    // unlisted pairs (2,3) never appear; listed-but-disjoint (1,4) drops out
    assert(!scored.contains((2L, 3L)) && !scored.contains((1L, 4L)))
  }

  test("minhash signatures of identical docs are identical; LSH pairs them") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", k = 16)
    val rows = sig.filter(col("doc_id").isin(1L, 2L)).drop("doc_id")
      .collect().map(_.toSeq)
    assert(rows(0) == rows(1))
    val cands = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
  }

  test("minhashEstimate is 1.0 for identical docs") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", k = 16)
    val cands = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 4)
    val est = Dedup.minhashEstimate(cands, sig, "doc_id", k = 16)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("est_sim").as[Double].collect()
    assert(est.toSeq == Seq(1.0))
  }

  test("winnowing: shared run >= k+w-1 chars guarantees a shared fingerprint") {
    val k = 8; val w = 4
    val shared = "zqxjkvbw marker run of text" // 27 chars > k+w-1 = 11
    val d = Seq(
      (1L, s"first document begins $shared and then diverges completely"),
      (2L, s"totally other opening words $shared with a different ending"),
      (3L, "no overlap with anything else at all here"))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(d, "doc_id", "text", k, w)
      .as[(Long, Long)].collect().toSeq
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)      // guarantee property
    assert((byDoc(1L) & byDoc(3L)).isEmpty)       // unrelated docs don't collide
  }

  test("winnowing: short docs yield one whole-doc window; sub-k docs none") {
    val d = Seq((1L, "abcdefghij"), (2L, "abc")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(d, "doc_id", "text", k = 8, w = 16)
      .as[(Long, Long)].collect().toSeq
    // doc 1: 3 gram positions, all < w -> exactly one min-of-all fingerprint
    assert(fp.count(_._1 == 1L) == 1)
    // doc 2: shorter than k -> no grams, no rows
    assert(!fp.exists(_._1 == 2L))
  }

  test("q61 span dedup: injected preamble survives only in its first doc") {
    val r = graft.SparkEntry.queries("q61_span_dedup")(spark, sf0001)
      .select("doc_id", "n_removed")
      .as[(Long, Long)].collect().toMap
    val injected = r.keys.filter(_ % 10 == 0).toSeq.sorted
    // the corpus-first occurrence keeps the preamble span; every later
    // injected doc must lose at least that one span
    assert(injected.tail.forall(r(_) >= 1L),
      s"injected docs missing removals: ${injected.tail.filter(r(_) < 1L)}")
  }

  test("simhash: identical docs share fingerprints; near-dups are close") {
    val fp = Dedup.simhash(docs, "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(3L)) < hamming(fp(1L), fp(4L)))
  }

  test("incrementalCandidates pairs the batch with the index, never index with itself") {
    // index: docs 1 (and its exact dup 2) + unrelated 4; new batch:
    // doc 101 = exact copy of 1, doc 102 = unrelated
    val index = docs.filter(col("doc_id").isin(1L, 2L, 4L))
    val fresh = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "fresh unrelated text that matches nothing indexed today"))
      .toDF("doc_id", "text")
    val sigI = Dedup.minhashSignatures(index, "doc_id", "text", 16)
    val sigN = Dedup.minhashSignatures(fresh, "doc_id", "text", 16)
    val cands = Dedup.incrementalCandidates(sigN, sigI, "doc_id", 4, 4)
      .as[(Long, Long)].collect().toSet
    // the redelivered copy hits BOTH identical index docs
    assert(cands == Set((101L, 1L), (101L, 2L)), s"got $cands")
    // crucially: the index pair (1, 2) — identical docs — is absent:
    // the index is never re-deduped against itself
  }
}
