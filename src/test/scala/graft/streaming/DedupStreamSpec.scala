package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupIndex

/** [[DedupStream]]: continuous NEW × PRIOR near-dedup with
  * exactly-once batch commits, replay absorption, and tail-to-base
  * index compaction.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16; private val BANDS = 4; private val R = 4

  private def doc(i: Int) =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"

  private def streamIn(dir: String) =
    new DedupStream(spark, dir, "doc_id", "text", K, BANDS, R)

  test("matches surface across batches, never within one (NEW × PRIOR only)") {
    val dir = Files.createTempDirectory("dstream").toString
    val s = streamIn(dir)
    // batch 0 contains an INTERNAL duplicate pair (7 and 107 share
    // text) — the stream must not pair them: intra-batch dedup is the
    // batch operators' job (q24), the stream's contract is new-vs-index
    val b0 = ((0 until 10).map(i => (i.toLong, doc(i))) :+ (107L, doc(7)))
      .toDF("doc_id", "text")
    assert(s.processBatch(b0, 0))
    assert(s.matches().count() == 0)
    // batch 1 redelivers doc 3 under a new id → exactly one cross-batch
    // candidate, against the indexed original
    val b1 = ((10 until 20).map(i => (i.toLong, doc(i))) :+ (1003L, doc(3)))
      .toDF("doc_id", "text")
    assert(s.processBatch(b1, 1))
    val m = s.matches().as[(Long, Long)].collect().toSet
    assert(m.contains((1003L, 3L)), s"missing redelivery match: $m")
    assert(!m.exists { case (a, b) => a == 107L || b == 107L },
      s"intra-batch pair leaked: $m")
    assert(s.committedBatches == Seq(0L, 1L))
  }

  test("replay of a committed batch is absorbed byte-for-byte") {
    val dir = Files.createTempDirectory("dstream").toString
    val s = streamIn(dir)
    val b0 = (0 until 8).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val b1 = Seq((100L, doc(2))).toDF("doc_id", "text")
    assert(s.processBatch(b0, 0))
    assert(s.processBatch(b1, 1))
    val before = s.matches().as[(Long, Long)].collect().toSet
    assert(!s.processBatch(b1, 1)) // at-least-once delivery replays it
    assert(s.matches().as[(Long, Long)].collect().toSet == before)
    // crash between the two commits: matches landed, sigs did not —
    // the replay rewrites the sig dir and changes no visible match
    val sigDir = new java.io.File(dir, "sig.b1")
    assert(new java.io.File(sigDir, "_SUCCESS").delete())
    assert(s.processBatch(b1, 1))
    assert(s.matches().as[(Long, Long)].collect().toSet == before)
    assert(s.committedBatches == Seq(0L, 1L))
  }

  test("runs as a real foreachBatch sink: cross-batch match lands") {
    val src = Files.createTempDirectory("dstream-src")
    val root = Files.createTempDirectory("dstream-out").toString
    val s = streamIn(root)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").json(src.toString)
    val q = stream.writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("dstream-ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        s.processBatch(df, id); ()
      }.start()
    try {
      Files.writeString(src.resolve("a.json"),
        (0 until 6).map(i =>
          s"""{"doc_id":$i,"text":"${doc(i)}"}""").mkString("\n"))
      q.processAllAvailable()
      Files.writeString(src.resolve("b.json"),
        s"""{"doc_id":500,"text":"${doc(2)}"}""")
      q.processAllAvailable()
    } finally q.stop()
    val m = s.matches().as[(Long, Long)].collect().toSet
    assert(m.contains((500L, 2L)), s"stream missed the redelivery: $m")
    assert(s.committedBatches.size >= 2)
  }

  test("compaction folds the batch tail into a DedupIndex generation") {
    val dir = Files.createTempDirectory("dstream").toString
    val s = streamIn(dir)
    val b0 = (0 until 8).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val b1 = (8 until 16).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    assert(s.processBatch(b0, 0))
    assert(s.processBatch(b1, 1))
    assert(s.compactIndex().isDefined)
    val root = new java.io.File(dir, "compacted").getAbsolutePath
    val resolved = DedupIndex.resolve(root)
    assert(resolved.isDefined)
    // the compacted artifact serves DedupIndex.probe directly: a new
    // doc equal to doc 5 finds its indexed original through the
    // bucket-pruned path
    val sigN = graft.operators.Dedup.minhashSignatures(
      Seq((5000L, doc(5))).toDF("doc_id", "text"), "doc_id", "text", K)
    val hits = DedupIndex.probe(spark, sigN, "doc_id", BANDS, R, root)
      .as[(Long, Long)].collect().toSet
    assert(hits.contains((5000L, 5L)), s"compacted probe missed: $hits")
  }

  test("compaction is load-bearing: folded batch dirs can vacuum and matches still land") {
    val dir = Files.createTempDirectory("dstream").toString
    val s = streamIn(dir)
    val b0 = (0 until 8).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val b1 = (8 until 16).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    assert(s.processBatch(b0, 0))
    assert(s.processBatch(b1, 1))
    assert(s.compactIndex().isDefined)
    s.vacuumFolded()
    // every folded batch dir is gone — the ONLY way batch 2 can match
    // doc 3 is through the compacted generation
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("sig.b")) == 0)
    val b2 = Seq((700L, doc(3)), (701L, doc(12))).toDF("doc_id", "text")
    assert(s.processBatch(b2, 2))
    val m = s.matches().as[(Long, Long)].collect().toSet
    assert(m.contains((700L, 3L)) && m.contains((701L, 12L)),
      s"post-vacuum probe lost folded docs: $m")
  }

  test("re-compaction after vacuum retains previously folded rows") {
    val dir = Files.createTempDirectory("dstream").toString
    val s = streamIn(dir)
    assert(s.processBatch(
      (0 until 8).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"), 0))
    assert(s.compactIndex().isDefined)
    s.vacuumFolded() // batch dirs gone; only generation v1 holds b0
    assert(s.processBatch(
      (8 until 12).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"), 1))
    assert(s.compactIndex().isDefined) // folds generation + tail, NOT tail-only
    s.vacuumFolded()
    // a doc equal to batch-0's doc 2 must still match: a tail-only
    // rewrite would have dropped every batch-0 row from the index
    val b2 = Seq((900L, doc(2))).toDF("doc_id", "text")
    assert(s.processBatch(b2, 2))
    val m = s.matches().as[(Long, Long)].collect().toSet
    assert(m.contains((900L, 2L)),
      s"re-compaction dropped previously folded rows: $m")
  }

  test("tombstones mask the generation AND the uncompacted tail; compaction folds the purge") {
    val dir = Files.createTempDirectory("dstream").toString
    val compacted = s"$dir/compacted"
    val s = streamIn(dir)
    // doc 3 folds into the generation; doc 13 stays in the tail
    s.processBatch((0 until 10).map(i => (i.toLong, doc(i)))
      .toDF("doc_id", "text"), 0)
    s.compactIndex(); s.vacuumFolded()
    s.processBatch((10 until 20).map(i => (i.toLong, doc(i)))
      .toDF("doc_id", "text"), 1)
    DedupIndex.addTombstones(spark,
      Seq(3L, 13L).toDF("doc_id"), "doc_id", compacted)
    // batch 2 redelivers BOTH purged docs: neither may surface — 3
    // through the generation's anti-join, 13 through the tail's
    s.processBatch(Seq((1003L, doc(3)), (1013L, doc(13)))
      .toDF("doc_id", "text"), 2)
    val m = s.matches().as[(Long, Long)].collect().toSet
    assert(!m.exists(p => p._2 == 3L || p._2 == 13L),
      s"purged doc resurfaced through a probe: $m")
    // the next compaction folds tail + purge physically, resets the log
    val gen = s.compactIndex().get
    assert(spark.read.parquet(gen)
      .filter($"index_id" === 3L || $"index_id" === 13L).count() == 0,
      "compaction carried purged rows forward")
    assert(DedupIndex.tombstones(spark, compacted).isEmpty,
      "compaction did not reset the tombstone log")
  }

  test("a banned id re-submitted after purge+compact is gated at ingest, not just masked") {
    val dir = Files.createTempDirectory("dstream").toString
    val compacted = s"$dir/compacted"
    val s = streamIn(dir)
    s.processBatch((0 until 10).map(i => (i.toLong, doc(i)))
      .toDF("doc_id", "text"), 0)
    s.compactIndex(); s.vacuumFolded()
    // purge doc 3 with a BAN; compaction folds the purge and resets
    // the tombstones — the ban must survive that reset
    DedupIndex.addTombstones(spark, Seq(3L).toDF("doc_id"), "doc_id",
      compacted)
    DedupIndex.addBans(spark, Seq(3L).toDF("doc_id"), "doc_id", compacted)
    s.processBatch(Seq((100L, doc(50))).toDF("doc_id", "text"), 1)
    s.compactIndex(); s.vacuumFolded()
    assert(DedupIndex.tombstones(spark, compacted).isEmpty)
    assert(DedupIndex.bans(spark, compacted).nonEmpty,
      "ban did not survive the compaction")
    // the backfill re-submits doc 3 under its ORIGINAL id — post
    // tombstone-reset, only the ban stands between it and the index
    s.processBatch(Seq((3L, doc(3))).toDF("doc_id", "text"), 2)
    // the gate proof: doc 3's signature never landed in the tail
    val tail = spark.read.parquet(
      new java.io.File(dir, "sig.b2").toString)
    assert(tail.filter($"new_id" === 3L).count() == 0,
      "banned id's signature entered the batch tail")
    // a later near-copy finds NOTHING of it
    s.processBatch(Seq((1003L, doc(3))).toDF("doc_id", "text"), 3)
    val m = s.matches().as[(Long, Long)].collect().toSet
    assert(!m.exists(p => p._1 == 3L || p._2 == 3L),
      s"banned doc resurfaced: $m")
  }

  test("replay of a FOLDED batch is absorbed by the compaction ledger") {
    val dir = Files.createTempDirectory("dstream").toString
    val s = streamIn(dir)
    val b0 = (0 until 8).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val b1 = Seq((100L, doc(2)), (101L, doc(2))).toDF("doc_id", "text")
    assert(s.processBatch(b0, 0))
    assert(s.processBatch(b1, 1))
    val before = s.matches().as[(Long, Long)].collect().toSet
    assert(s.compactIndex().isDefined)
    s.vacuumFolded() // sig.b0/sig.b1 gone — only the fold remembers them
    // the streaming runtime redelivers batch 1: without the floor rule
    // the plain sig-dir check would reprocess it against an index that
    // CONTAINS batch 1 — emitting self-pairs like (100,101)/(100,100)
    // the original run never saw
    assert(!s.processBatch(b1, 1), "folded replay was not absorbed")
    assert(s.matches().as[(Long, Long)].collect().toSet == before)
    // and no sig dir was resurrected
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("sig.b")) == 0)
  }
}
