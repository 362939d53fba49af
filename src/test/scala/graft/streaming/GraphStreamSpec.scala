package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.GraphIndex

/** The continuous connectivity gate: pre-batch census semantics,
  * at-least-once absorption (census dir + fold tag), and the purge
  * boundary — a redelivered batch after a purge consumed its delta
  * must neither double-count nor resurrect the deleted node.
  */
class GraphStreamSpec extends SparkSpec {
  import spark.implicits._

  private def sym(e: Seq[(Long, Long, Long)]) =
    (e ++ e.map { case (u, v, w) => (v, u, w) }).toDF("src", "dst", "w")

  private def censusOf(gs: GraphStream) =
    gs.results().select("node", "out_deg", "w_total", "batch_id")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("census sees the PRE-batch state; replays absorb; fold lands after") {
    val idxRoot = Files.createTempDirectory("gstr-idx").toString
    val outRoot = Files.createTempDirectory("gstr-out").toString
    GraphIndex.publish(sym(Seq((1L, 2L, 3L))), idxRoot)
    val gs = new GraphStream(spark, idxRoot, outRoot)
    val b0 = sym(Seq((1L, 2L, 4L), (2L, 3L, 1L)))
    assert(gs.processBatch(b0, 0))
    // node 3 is novel (0 pre-batch); 1 and 2 report the BASE state
    assert(censusOf(gs) == Set(
      (1L, 1L, 3L, 0L), (2L, 1L, 3L, 0L), (3L, 0L, 0L, 0L)))
    assert(GraphIndex.folded(idxRoot, "b0"))
    // replay: both halves absorbed, census unchanged, no double fold
    assert(!gs.processBatch(b0, 0))
    assert(censusOf(gs) == Set(
      (1L, 1L, 3L, 0L), (2L, 1L, 3L, 0L), (3L, 0L, 0L, 0L)))
    assert(GraphIndex.deltas(idxRoot).size == 1)
    // batch 1 censuses base ∪ b0 (weights summed, PRE-batch: the
    // 1—3 edge it carries is not yet in the state it sees)
    assert(gs.processBatch(sym(Seq((1L, 3L, 2L))), 1))
    assert(censusOf(gs).contains((1L, 1L, 7L, 1L)),
      "batch-1 census missed the folded b0 sums")
    assert(censusOf(gs).contains((3L, 1L, 1L, 1L)))
  }

  test("a purge between batches: redelivery absorbed, post-purge census is the survivor world") {
    val idxRoot = Files.createTempDirectory("gstr-idx").toString
    val outRoot = Files.createTempDirectory("gstr-out").toString
    GraphIndex.publish(sym(Seq((1L, 2L, 3L), (2L, 3L, 1L))), idxRoot)
    val gs = new GraphStream(spark, idxRoot, outRoot)
    val b0 = sym(Seq((1L, 2L, 4L), (3L, 4L, 2L)))
    gs.processBatch(b0, 0)
    val preCensus = censusOf(gs)
    // GDPR: node 2 leaves; the merge consumes b0's delta
    GraphIndex.addTombstones(spark, Seq(2L).toDF("node"), "node", idxRoot)
    GraphIndex.mergeCompact(spark, idxRoot)
    // the redelivery AFTER the purge: absorbed through _folded.json —
    // a re-commit would both double-count 3—4 and resurrect 1—2
    assert(!gs.processBatch(b0, 0))
    assert(censusOf(gs) == preCensus, "replay rewrote committed history")
    gs.processBatch(sym(Seq((4L, 5L, 1L))), 1)
    val c1 = censusOf(gs).filter(_._4 == 1L)
    // node 4 kept only its b0 edge to 3; node 2's world is gone
    assert(c1 == Set((4L, 1L, 2L, 1L), (5L, 0L, 0L, 1L)))
    val all = GraphIndex.neighbors(spark,
      Seq(1L, 2L, 3L, 4L, 5L).toDF("node"), idxRoot)
      .select($"node", $"nbr", $"w").as[(Long, Long, Long)].collect().toSet
    assert(!all.exists(r => r._1 == 2L || r._2 == 2L),
      "purged node resurrected through the stream")
  }

  test("a fully-banned batch commits its tag: the redelivery absorbs instead of re-running") {
    val idxRoot = Files.createTempDirectory("gstr-idx").toString
    val outRoot = Files.createTempDirectory("gstr-out").toString
    GraphIndex.publish(sym(Seq((1L, 2L, 3L))), idxRoot)
    GraphIndex.addBans(spark, Seq(9L).toDF("node"), "node", idxRoot)
    val gs = new GraphStream(spark, idxRoot, outRoot)
    // every edge of the batch touches the banned node: nothing may
    // ingest, but the batch must still COMMIT (census + marker delta)
    val banned = sym(Seq((9L, 1L, 2L)))
    assert(gs.processBatch(banned, 0), "first delivery should do work")
    assert(GraphIndex.folded(idxRoot, "b0"),
      "fully-gated fold left no tag — the r13 hole: every redelivery " +
        "re-ran the gate and reported work committed")
    assert(!gs.processBatch(banned, 0),
      "redelivery of a fully-banned batch must absorb")
    // and nothing banned serves
    val got = GraphIndex.neighbors(spark,
      Seq(1L, 9L).toDF("node"), idxRoot)
      .select($"node", $"nbr", $"w").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L)), s"banned edge served: $got")
  }
}
