package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The empty-batch append invariant, fleet-wide: an EMPTY batch —
  * whatever emptied it, a fully-banned gate or an upstream that
  * produced no rows — commits NOTHING to a partitioned append log.
  * The hazard (ADVICE r14, GraphIndex:171): an empty `partitionBy`
  * write leaves a `_SUCCESS`-marked dir with ZERO parquet footers,
  * and every later read of the append log throws on schema
  * inference. r13 closed the fully-banned case (`bn.isDefined &&
  * gated.isEmpty`); r15 widens the guard to ANY empty batch on all
  * five gated paths. GraphIndex is the one exception BY DESIGN: its
  * fold commits a schema-bearing MARKER delta so the tag lands in the
  * fold ledger (weights are sums, so at-least-once callers need the
  * absorb) — covered by GraphIndexSpec; this suite pins the other
  * four plus the probe-after-empty-append survival.
  */
class EmptyBatchAppendSpec extends SparkSpec {
  import spark.implicits._

  private val DIM = 16
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(DIM) { i =>
      val h = (seed * 31 + i) * 2654435761L
      (h % 1000).toFloat / 1000.0f
    }
  private lazy val vecs =
    (0 until 20).map(i => (i.toLong, vec(i.toLong)))
      .toDF("vec_id", "embedding")
  private lazy val emptyVecs = vecs.filter($"vec_id" < 0)

  test("SimIndex: an empty append (no bans involved) commits no delta " +
    "and later probes survive") {
    val root = Files.createTempDirectory("ebsim").toString
    SimIndex.publish(vecs, "vec_id", "embedding", 8, 4, root)
    val before = SimIndex.deltas(root)
    val ret = SimIndex.appendDelta(emptyVecs, "vec_id", "embedding", root)
    assert(ret == VersionedDirs.resolve(root).get)
    assert(SimIndex.deltas(root) == before)
    assert(SimIndex.probeTopK(spark, vecs.limit(2), "vec_id",
      "embedding", 3, root).count() > 0)
  }

  test("PqIndex: an empty append commits no delta and later probes " +
    "survive") {
    val root = Files.createTempDirectory("ebpq").toString
    PqIndex.publish(vecs, "vec_id", "embedding", 4, 4, 8, 2, root)
    val before = PqIndex.deltas(root)
    val ret = PqIndex.appendDelta(emptyVecs, "vec_id", "embedding", root)
    assert(ret == VersionedDirs.resolve(root).get)
    assert(PqIndex.deltas(root) == before)
    assert(PqIndex.probeTopK(spark,
      vecs.filter($"vec_id" >= 18), "vec_id", "embedding", 3,
      root).count() > 0)
  }

  test("LexIndex: an empty append commits no delta, shifts no " +
    "collection stats, and later probes survive") {
    val root = Files.createTempDirectory("eblex").toString
    val docs = (0 until 10)
      .map(i => (i.toLong, s"alpha beta w$i gamma"))
      .toDF("doc_id", "text")
    LexIndex.publish(docs, "doc_id", "text", root)
    val before = LexIndex.deltas(root)
    val ret = LexIndex.appendDelta(
      docs.filter($"doc_id" < 0), "doc_id", "text", root)
    assert(ret == VersionedDirs.resolve(root).get)
    assert(LexIndex.deltas(root) == before)
    val q = Seq((0L, "alpha"), (0L, "beta")).toDF("query_id", "term")
    assert(LexIndex.bm25TopK(spark, q, "query_id", "term", 3, root)
      .count() > 0)
  }

  test("FirstSeenIndex: an empty fold commits no delta and later " +
    "probes survive") {
    val root = Files.createTempDirectory("ebfs").toString
    val base = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "s")
    FirstSeenIndex.publish(base, root)
    val before = FirstSeenIndex.deltas(root)
    val ret = FirstSeenIndex.fold(spark,
      base.filter($"doc_id" < 0), root, tag = "empty-1")
    assert(ret == VersionedDirs.resolve(root).get)
    assert(FirstSeenIndex.deltas(root) == before)
    val got = FirstSeenIndex.probe(spark,
      Seq((9L, "a")).toDF("doc_id", "s"), root)
    assert(got.count() == 1)
  }
}
