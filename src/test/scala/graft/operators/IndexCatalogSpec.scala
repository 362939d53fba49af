package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fleet inventory: one call over a temp-dir fleet of all eight
  * persisted families, before and after lifecycle transitions — the
  * operational report [[PurgeCascade]] callers read.
  */
class IndexCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16; private val BANDS = 4; private val R = 4
  private val BITS = 8; private val TABLES = 4
  private val M = 4; private val DSUB = 4; private val KS = 8
  private val ITERS = 2
  private val DIM = M * DSUB

  private def doc(i: Int) =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"

  private def vec(seed: Long): Array[Float] =
    Array.tabulate(DIM) { i =>
      (((seed * 31 + i) * 2654435761L) % 1000).toFloat / 1000.0f
    }

  private lazy val docs =
    (0 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
  private lazy val vecs =
    (0 until 40).map(i => (i.toLong, vec(i.toLong)))
      .toDF("vec_id", "embedding")

  test("report inventories all eight families through a purge cascade") {
    val roots = Seq.fill(8)(Files.createTempDirectory("catalog").toString)
    val Seq(dRoot, sRoot, pRoot, fRoot, lRoot, bRoot, cRoot, gRoot) = roots
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
    // the graph family: doc i trades with docs i+1 and i+2 (node ids
    // share the deletion id space, edges symmetric)
    GraphIndex.publish(
      (0 until 40).flatMap { i =>
        Seq((i.toLong, (i + 1).toLong, 1L), ((i + 1).toLong, i.toLong, 1L),
          (i.toLong, (i + 2).toLong, 1L), ((i + 2).toLong, i.toLong, 1L))
      }.toDF("src", "dst", "w"), gRoot)
    val targets = Seq(
      PurgeCascade.dedup(dRoot, "id"),
      PurgeCascade.sim(sRoot, "id"),
      PurgeCascade.pq(pRoot, "id"),
      PurgeCascade.firstSeen(fRoot, "id"),
      PurgeCascade.lex(lRoot, "id"),
      PurgeCascade.bpe(bRoot, docs, "id"),
      PurgeCascade.sketch(cRoot, docs, "id"),
      PurgeCascade.graph(gRoot, "id"))

    val before = IndexCatalog.reportTargets(spark, targets)
    assert(before.map(_.family) ==
      Seq("dedup", "sim", "pq", "firstSeen", "lex", "bpe", "sketch",
        "graph"))
    for (e <- before) {
      assert(e.generation.nonEmpty, s"${e.family}: no committed head")
      assert(e.nGenerations == 1)
      assert(e.nPendingDeltas == 0 && e.nTombstones == 0L)
      assert(e.nRows > 0L, s"${e.family}: head reads as empty")
      assert(e.nBytes > 0L)
    }

    // an uncompacted state: a tagged SimIndex delta + a pending
    // tombstone land in the report as actionable counts
    SimIndex.appendDelta(
      Seq((100L, vec(100L))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", sRoot, tag = "b0")
    SimIndex.addTombstones(spark, Seq(5L).toDF("vec_id"), "vec_id", sRoot)
    val mid = IndexCatalog.inspect(spark, "sim", sRoot)
    assert(mid.nPendingDeltas == 1, s"pending delta not counted: $mid")
    assert(mid.nTombstones == 1L, s"pending tombstone not counted: $mid")

    // the cascade compacts everything WITH the durable ban; vacuum
    // keeps one generation
    PurgeCascade.purge(spark, Seq(5L).toDF("id"), targets,
      vacuum = true, ban = true)
    val after = IndexCatalog.reportTargets(spark, targets)
    for (e <- after) {
      assert(e.nGenerations == 1, s"${e.family}: vacuum left extras")
      assert(e.nPendingDeltas == 0,
        s"${e.family}: deltas survived the compaction")
      assert(e.nTombstones == 0L,
        s"${e.family}: tombstones not reset — compaction failed?")
    }
    // the ban log shows on every id-keyed family's report (bpe and
    // sketch have no id-keyed rows — no-op ban by construction)
    for (e <- after if !Set("bpe", "sketch")(e.family))
      assert(e.nBans == 1L, s"${e.family}: ban not visible: $e")
    // the folded ledger recorded sim's consumed delta tag
    assert(after.find(_.family == "sim").get.nFoldedTags == 1)
    // the sketch purge recorded its deletion fingerprint
    assert(after.find(_.family == "sketch").get.nPurgedTags == 1)
    // purges shrink (or hold) the physical footprint, never grow it
    for ((b, a) <- before.zip(after))
      assert(a.nRows <= b.nRows,
        s"${a.family}: rows grew across a purge (${b.nRows} -> ${a.nRows})")
  }

  test("footer-based nRows matches a full count() — the metadata-scale claim, proven") {
    // a multi-dataset generation (the graph family's out/ + in/
    // twins, both partitioned) and a partitioned single-dataset one
    // (dedup): the footer sum must equal the cluster-job answer it
    // replaced
    val gRoot = Files.createTempDirectory("catalog").toString
    GraphIndex.publish(
      (0 until 30).flatMap(i =>
        Seq((i.toLong, (i + 1).toLong, 1L), ((i + 1).toLong, i.toLong, 2L)))
        .toDF("src", "dst", "w"), gRoot)
    val gGen = GraphIndex.resolve(gRoot).get
    val gFooter = ParquetFooters.rows(new java.io.File(gGen))
    val gCount = spark.read.parquet(s"$gGen/out").count() +
      spark.read.parquet(s"$gGen/in").count()
    assert(gFooter == gCount && gFooter > 0,
      s"graph twins: footer $gFooter != count $gCount")
    val dRoot = Files.createTempDirectory("catalog").toString
    DedupIndex.publish(
      Dedup.minhashSignatures(docs, "doc_id", "text", K),
      "doc_id", BANDS, R, dRoot)
    val dGen = DedupIndex.resolve(dRoot).get
    val dFooter = ParquetFooters.rows(new java.io.File(dGen))
    val dCount = spark.read.parquet(dGen).count()
    assert(dFooter == dCount && dFooter > 0,
      s"dedup: footer $dFooter != count $dCount")
  }
}
