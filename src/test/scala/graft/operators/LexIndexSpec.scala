package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted lexical index: probe parity with a from-scratch
  * publish, term-bucket partition pruning, append-time collection-
  * stats shift, and exact stats recompute at compaction.
  */
class LexIndexSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5

  private def doc(i: Int) =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"

  private lazy val base =
    (0 until 30).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
  private lazy val delta =
    (30 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")

  // every doc shares the 6 head terms; "alpha" + a mid-df term make a
  // two-term query whose ranking exercises tf saturation + dl norm
  private lazy val queries =
    Seq((0L, "alpha"), (0L, "word5"), (1L, "zeta"), (1L, "token7"))
      .toDF("query_id", "term")

  private def probeSet(root: String): Set[(Long, Long, Long, Long, Long)] =
    LexIndex.bm25TopK(spark, queries, "query_id", "term", K, root)
      .select($"query_id", $"index_id", $"n_hit", $"score", $"rnk")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def statsOf(path: String): String =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_stats.json"))

  test("append shifts collection stats; base+delta probe ≡ fresh publish of the union") {
    val root = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base, "doc_id", "text", root)
    val before = probeSet(root)
    LexIndex.appendDelta(delta, "doc_id", "text", root)
    val after = probeSet(root)
    // the delta changed N/Σdl/df, so base-era scores must move
    assert(before.map(t => (t._1, t._2, t._4)) !=
      after.filter(t => t._2 < 30).map(t => (t._1, t._2, t._4)),
      "append left every base score unchanged — stale collection stats")
    // ... and the served ranking must equal a never-appended index
    // over the grown corpus
    val freshRoot = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base.unionByName(delta), "doc_id", "text", freshRoot)
    assert(after == probeSet(freshRoot))
  }

  test("mergeCompact folds deltas, recomputes stats exactly, records _folded.json") {
    val root = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base, "doc_id", "text", root)
    LexIndex.appendDelta(delta, "doc_id", "text", root)
    val served = probeSet(root)
    val compacted = LexIndex.mergeCompact(spark, root)
    assert(LexIndex.deltas(root).isEmpty)
    assert(probeSet(root) == served,
      "compaction changed the served ranking")
    val freshRoot = Files.createTempDirectory("lexidx").toString
    val fresh = LexIndex.publish(base.unionByName(delta), "doc_id",
      "text", freshRoot)
    assert(statsOf(compacted) == statsOf(fresh),
      "compacted stats differ from a fresh publish of the union")
    assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(compacted, "_folded.json")).contains("batch-"),
      "compacted generation did not record the folded delta")
  }

  test("a tagged append absorbs past the one-merge horizon (cumulative ledger)") {
    val root = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base, "doc_id", "text", root)
    LexIndex.appendDelta(delta, "doc_id", "text", root, tag = "b0")
    LexIndex.mergeCompact(spark, root) // consumes b0, records it
    // a second merge cycle (new delta, merge) must not prune b0 from
    // the ledger — BM25 sums df/score, so a late replay re-committing
    // it would double-count every batch doc
    LexIndex.appendDelta(
      Seq((100L, doc(100))).toDF("doc_id", "text"),
      "doc_id", "text", root, tag = "b1")
    LexIndex.mergeCompact(spark, root)
    assert(LexIndex.appended(root, "b0"),
      "second merge pruned b0 from the fold ledger")
    LexIndex.appendDelta(delta, "doc_id", "text", root, tag = "b0")
    assert(LexIndex.deltas(root).isEmpty,
      "tag redelivered past one merge horizon re-committed")
    // scores unchanged modulo the b1 doc's stats shift — compare with
    // a fresh never-redelivered index over the same corpus
    val freshRoot = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base.unionByName(delta)
        .unionByName(Seq((100L, doc(100))).toDF("doc_id", "text")),
      "doc_id", "text", freshRoot)
    assert(probeSet(root) == probeSet(freshRoot),
      "late redelivery double-counted the folded batch")
  }

  test("an append that would cross the 9000·dl·N headroom is rejected at append time") {
    val root = Files.createTempDirectory("lexidx").toString
    val gen = LexIndex.publish(base, "doc_id", "text", root)
    // a genuinely over-bound corpus needs dl·N > 1e15 — doctor the
    // committed sidecar instead (the sidecar IS the stats interface):
    // a base whose recorded max_dl·(N + ΔN) exceeds the bound
    val huge = LexIndex.ContribDlNBound / 35L // over once N reaches 40
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(gen, "_stats.json"),
      s"""{"n_docs":30,"sumdl":${huge * 2},"max_dl":$huge}""")
    val ex = intercept[IllegalArgumentException] {
      LexIndex.appendDelta(delta, "doc_id", "text", root, tag = "over")
    }
    assert(ex.getMessage.contains("headroom"))
    // nothing durable landed: no committed delta dir, tag not appended
    assert(LexIndex.deltas(root).isEmpty,
      "over-bound append left a committed delta")
    assert(!LexIndex.appended(root, "over"))
    // restore a sane sidecar: the same batch then commits
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(gen, "_stats.json"),
      s"""{"n_docs":30,"sumdl":330,"max_dl":11}""")
    LexIndex.appendDelta(delta, "doc_id", "text", root, tag = "over")
    assert(LexIndex.deltas(root).size == 1)
  }

  test("tombstones mask immediately; compaction matches a never-ingested index") {
    val root = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base, "doc_id", "text", root)
    LexIndex.addTombstones(spark, Seq(0L, 7L).toDF("doc_id"), "doc_id", root)
    val masked = probeSet(root)
    assert(!masked.exists(t => t._2 == 0L || t._2 == 7L),
      s"tombstoned docs still ranked: $masked")
    LexIndex.mergeCompact(spark, root)
    val freshRoot = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base.filter(!$"doc_id".isin(0L, 7L)), "doc_id",
      "text", freshRoot)
    assert(probeSet(root) == probeSet(freshRoot),
      "post-purge index differs from a fresh publish of the survivors")
  }

  test("a crash-leftover folded delta neither double-counts nor survives the next merge") {
    val root = Files.createTempDirectory("lexidx").toString
    LexIndex.publish(base, "doc_id", "text", root)
    LexIndex.appendDelta(delta, "doc_id", "text", root, tag = "day1")
    val served = probeSet(root)
    // stash the committed delta dir aside so the crash window can be
    // reconstructed verbatim below (appendDelta itself now ABSORBS a
    // consumed tag — the r13 ledger check — so it can no longer be
    // used to recreate the leftover)
    val deltaDir = new java.io.File(s"$root/deltas/batch-day1")
    val stash = Files.createTempDirectory("lexstash").toFile
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles()).getOrElse(Array.empty)
          .foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
      ()
    }
    copyTree(deltaDir, new java.io.File(stash, "batch-day1"))
    LexIndex.mergeCompact(spark, root)
    // reconstruct the crash window: the merge committed (folded rows
    // live in the new generation, _folded.json names the delta) but
    // the delta dir deletion never ran — restore the dir verbatim
    copyTree(new java.io.File(stash, "batch-day1"), deltaDir)
    assert(LexIndex.deltas(root).size == 1)
    // BM25 sums contributions: if the probe read the leftover delta,
    // every df and score it touches would double
    assert(probeSet(root) == served,
      "probe double-counted a folded-but-undeleted delta")
    // the next merge must treat it as already folded (fold it again
    // and the generation holds its rows twice) and vacuum it
    LexIndex.mergeCompact(spark, root)
    assert(LexIndex.deltas(root).isEmpty)
    assert(probeSet(root) == served,
      "healing merge changed the served ranking")
  }

  test("probe prunes to touched term-bucket partition directories") {
    val root = Files.createTempDirectory("lexidx").toString
    val path = LexIndex.publish(base, "doc_id", "text", root)
    val totalDirs = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("pbucket="))
    assert(totalDirs >= 4, "base too small to demonstrate pruning")
    val one = Seq((0L, "alpha")).toDF("query_id", "term")
    val p = LexIndex.bm25TopKPlan(spark, one, "query_id", "term", K, root)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"probe scan lost its pbucket partition filter:\n${p.take(1500)}")
  }
}
