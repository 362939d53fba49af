package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.LexIndex

/** The streaming lexical gate: per-batch probe ≡ a direct probe of
  * the pre-batch committed state, ingestion shifts the collection
  * stats at the batch boundary, and at-least-once redelivery is
  * absorbed through both the committed topk dir and the tagged delta.
  */
class LexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def doc(i: Int) =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"

  private def docsDF(r: Range) =
    r.map(i => (i.toLong, doc(i))).toDF("doc_id", "text")

  // the stream's own tokenizer — a literal split here could silently
  // diverge from LexStream.termBags if tokenization ever changes
  private def bags(r: Range) =
    docsDF(r).select($"doc_id".as("query_id"),
        explode(graft.functions.TextFunctions.words($"text")).as("term"))
      .filter(length($"term") > 0).distinct()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id", $"index_id", $"n_hit", $"score", $"rnk")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("per-batch probe ≡ direct probe of the pre-batch state; stats shift at the boundary") {
    val idxRoot = Files.createTempDirectory("lexstream").toString
    val outRoot = Files.createTempDirectory("lexstream").toString
    LexIndex.publish(docsDF(0 until 20), "doc_id", "text", idxRoot)
    val ls = new LexStream(spark, idxRoot, outRoot, "doc_id", "text", K)
    assert(ls.processBatch(docsDF(20 until 30), 0))
    assert(ls.processBatch(docsDF(30 until 40), 1))

    // world 0: a never-streamed index over docs < 20
    val w0 = Files.createTempDirectory("lexstream").toString
    LexIndex.publish(docsDF(0 until 20), "doc_id", "text", w0)
    val want0 = rows(LexIndex.bm25TopK(spark, bags(20 until 30),
      "query_id", "term", K, w0))
    // world 1: a never-streamed index over docs < 30 — batch 0's
    // ingestion must have shifted N/Σdl/df to exactly this
    val w1 = Files.createTempDirectory("lexstream").toString
    LexIndex.publish(docsDF(0 until 30), "doc_id", "text", w1)
    val want1 = rows(LexIndex.bm25TopK(spark, bags(30 until 40),
      "query_id", "term", K, w1))

    val got = rows(ls.results())
    assert(got == (want0 ++ want1))
    // and the stats REALLY shifted: scoring batch 1 against the
    // un-grown base must differ (otherwise the boundary proof is void)
    val stale = rows(LexIndex.bm25TopK(spark, bags(30 until 40),
      "query_id", "term", K, w0))
    assert(stale != want1,
      "batch-1 scores identical against grown and un-grown corpus")
  }

  private def rmAll(x: java.io.File): Unit = {
    Option(x.listFiles()).foreach(_.foreach(rmAll)); x.delete(); ()
  }

  test("a banned doc re-submitted after purge+compact is gated: no rows, no stats shift") {
    val idxRoot = Files.createTempDirectory("lexstream").toString
    val outRoot = Files.createTempDirectory("lexstream").toString
    LexIndex.publish(docsDF(0 until 10), "doc_id", "text", idxRoot)
    val s = new LexStream(spark, idxRoot, outRoot, "doc_id", "text", K)
    // purge + ban doc 3; compaction resets tombstones, ban survives
    LexIndex.addTombstones(spark, Seq(3L).toDF("doc_id"), "doc_id",
      idxRoot)
    LexIndex.mergeCompact(spark, idxRoot)
    LexIndex.addBans(spark, Seq(3L).toDF("doc_id"), "doc_id", idxRoot)
    // the backfill re-submits doc 3 beside a legit doc
    s.processBatch(docsDF(3 to 3).unionByName(docsDF(20 to 20)), 0)
    // gate proof: the appended delta holds ONLY the legit doc's rows
    // and stats — a leaked ban would shift N by 2, not 1
    val delta = spark.read.parquet(LexIndex.deltas(idxRoot).head)
    assert(delta.filter($"index_id" === 3L).count() == 0,
      "banned doc's postings entered the delta")
    val probed = rows(s.results())
    assert(!probed.exists(_._1 == 3L),
      "banned doc served as a query through the gate")
    // and a later probe never sees doc 3 as a hit
    val later = rows(LexIndex.bm25TopK(spark, bags(21 to 21),
      "query_id", "term", K, idxRoot))
    assert(!later.exists(_._2 == 3L), s"banned doc ranked again: $later")
  }

  test("redelivery and a probe-committed/append-lost crash both replay safely") {
    val idxRoot = Files.createTempDirectory("lexstream").toString
    val outRoot = Files.createTempDirectory("lexstream").toString
    LexIndex.publish(docsDF(0 until 20), "doc_id", "text", idxRoot)
    val ls = new LexStream(spark, idxRoot, outRoot, "doc_id", "text", K)
    assert(ls.processBatch(docsDF(20 until 30), 0))
    val committed = rows(ls.results())
    // full redelivery: both halves committed — absorbed, nothing moves
    assert(!ls.processBatch(docsDF(20 until 30), 0))
    assert(rows(ls.results()) == committed)
    assert(LexIndex.deltas(idxRoot).size == 1)
    // crash window: probe committed, append never ran (delta AND
    // marker both absent) — replay must re-append WITHOUT rescoring
    // (the probe dir is not rewritten, so the batch never scores
    // against a corpus containing itself)
    rmAll(new java.io.File(LexIndex.deltas(idxRoot).head))
    rmAll(new java.io.File(outRoot, "ingested.b0"))
    assert(ls.processBatch(docsDF(20 until 30), 0))
    assert(LexIndex.deltas(idxRoot).size == 1)
    assert(rows(ls.results()) == committed)
  }

  test("replay absorption survives compactions: _folded.json covers the marker-lost sliver, the marker is durable forever") {
    val idxRoot = Files.createTempDirectory("lexstream").toString
    val outRoot = Files.createTempDirectory("lexstream").toString
    LexIndex.publish(docsDF(0 until 20), "doc_id", "text", idxRoot)
    val ls = new LexStream(spark, idxRoot, outRoot, "doc_id", "text", K)
    ls.processBatch(docsDF(20 until 30), 0)
    LexIndex.mergeCompact(spark, idxRoot)
    assert(LexIndex.deltas(idxRoot).isEmpty)
    // marker-lost crash sliver: the delta dir is gone but the
    // generation folded it — _folded.json absorbs the replay, and the
    // absorbed replay SELF-HEALS the marker
    rmAll(new java.io.File(outRoot, "ingested.b0"))
    assert(!ls.processBatch(docsDF(20 until 30), 0))
    assert(new java.io.File(outRoot, "ingested.b0").exists())
    assert(LexIndex.deltas(idxRoot).isEmpty)
    // a second compaction: since r13 the ledger is CUMULATIVE (tags
    // never prune), so BOTH defenses now survive any number of merges
    // — the ledger at the operator and the marker at the stream. The
    // marker remains load-bearing as the faster check and as
    // defense-in-depth for a root whose sidecar was rebuilt.
    LexIndex.appendDelta(docsDF(30 until 40), "doc_id", "text", idxRoot,
      tag = "b1")
    LexIndex.mergeCompact(spark, idxRoot)
    assert(LexIndex.appended(idxRoot, "b0"),
      "cumulative ledger pruned a consumed tag")
    assert(!ls.processBatch(docsDF(20 until 30), 0))
    assert(LexIndex.deltas(idxRoot).isEmpty)
    // marker alone (ledger sidecar lost — e.g. a generation restored
    // from a backup without it): still absorbed
    val gen = LexIndex.resolve(idxRoot).get
    rmAll(new java.io.File(gen, "_folded.json"))
    assert(!ls.processBatch(docsDF(20 until 30), 0))
    assert(LexIndex.deltas(idxRoot).isEmpty,
      "durable marker failed to absorb without the ledger")
  }
}
