package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted adjacency index: probe parity with a from-scratch
  * build, bucket pruning, non-idempotent fold absorption, two-sided
  * node deletion, and the k-hop traversal.
  */
class GraphIndexSpec extends SparkSpec {
  import spark.implicits._

  // a small undirected graph stored as directed rows both ways:
  // 1—2 (w 3), 1—3 (w 1), 2—3 (w 2), 3—4 (w 5), 5 isolated via 5—6
  private def sym(e: Seq[(Long, Long, Long)]) =
    (e ++ e.map { case (u, v, w) => (v, u, w) }).toDF("src", "dst", "w")
  private lazy val base = sym(Seq(
    (1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 4L, 5L), (5L, 6L, 1L)))
  // the delta re-trades 1—2 (w 4 more) and adds 4—5 (w 2)
  private lazy val delta = sym(Seq((1L, 2L, 4L), (4L, 5L, 2L)))

  private def nbrSet(nodes: Seq[Long], root: String) =
    GraphIndex.neighbors(spark, nodes.toDF("node"), root)
      .select($"node", $"nbr", $"w").as[(Long, Long, Long)].collect().toSet

  test("publish + neighbors serves the summed adjacency") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    assert(nbrSet(Seq(1L, 4L), root) == Set(
      (1L, 2L, 3L), (1L, 3L, 1L), (4L, 3L, 5L)))
  }

  test("neighbors prunes to touched src-bucket directories") {
    val root = Files.createTempDirectory("gidx").toString
    val path = GraphIndex.publish(base, root)
    val totalDirs = new java.io.File(path, "out").listFiles()
      .count(_.getName.startsWith("pbucket="))
    assert(totalDirs >= 2, "base too small to demonstrate pruning")
    val p = GraphIndex.neighborsPlan(spark, Seq(1L).toDF("node"), root)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"neighbors scan lost its pbucket partition filter:\n${p.take(1500)}")
  }

  test("inNeighbors serves the reverse adjacency off the dst-bucketed mirror") {
    val root = Files.createTempDirectory("gidx").toString
    // a DIRECTED world (no symmetrization): 1→2, 3→2, 2→4
    GraphIndex.publish(
      Seq((1L, 2L, 3L), (3L, 2L, 1L), (2L, 4L, 5L)).toDF("src", "dst", "w"),
      root)
    val in = GraphIndex.inNeighbors(spark, Seq(2L, 4L, 9L).toDF("node"), root)
      .select($"node", $"nbr", $"w").as[(Long, Long, Long)].collect().toSet
    assert(in == Set((2L, 1L, 3L), (2L, 3L, 1L), (4L, 2L, 5L)),
      s"reverse probe wrong: $in")
    // fold + tombstone flow through the mirror identically: purge 3,
    // fold a new 5→2 edge — the in-probe of 2 must drop 3 and sum 5
    GraphIndex.fold(spark, Seq((5L, 2L, 2L)).toDF("src", "dst", "w"),
      root, tag = "b0")
    GraphIndex.addTombstones(spark, Seq(3L).toDF("node"), "node", root)
    val in2 = GraphIndex.inNeighbors(spark, Seq(2L).toDF("node"), root)
      .select($"node", $"nbr", $"w").as[(Long, Long, Long)].collect().toSet
    assert(in2 == Set((2L, 1L, 3L), (2L, 5L, 2L)),
      s"mirror probe missed delta or mask: $in2")
    // the mirror survives compaction (mergeCompact re-emits both twins)
    GraphIndex.mergeCompact(spark, root)
    val in3 = GraphIndex.inNeighbors(spark, Seq(2L).toDF("node"), root)
      .select($"node", $"nbr", $"w").as[(Long, Long, Long)].collect().toSet
    assert(in3 == in2, s"compaction broke the mirror: $in3")
  }

  test("inNeighbors prunes to touched dst-bucket directories of the mirror") {
    val root = Files.createTempDirectory("gidx").toString
    val path = GraphIndex.publish(base, root)
    val totalDirs = new java.io.File(path, "in").listFiles()
      .count(_.getName.startsWith("pbucket="))
    assert(totalDirs >= 2, "base too small to demonstrate pruning")
    val p = GraphIndex.inNeighborsPlan(spark, Seq(1L).toDF("node"), root)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"inNeighbors scan lost its pbucket partition filter:\n${p.take(1500)}")
    // that the filter targets the MIRROR (not the out layout) is
    // proven semantically by the parity test above: pruning to
    // pbucket(hash(node)) over the src-bucketed layout would drop the
    // in-edges whose src hashes elsewhere
  }

  test("fold is O(batch); sums are not idempotent, so a redelivered tag is absorbed") {
    val root = Files.createTempDirectory("gidx").toString
    val basePath = GraphIndex.publish(base, root)
    GraphIndex.fold(spark, delta, root, tag = "day2")
    assert(VersionedDirs.versionsOf(root).size == 1,
      "fold rewrote the committed adjacency — the O(index) shape")
    assert(GraphIndex.resolve(root).contains(basePath))
    assert(GraphIndex.folded(root, "day2"))
    // the redelivery: absorbed (a re-commit would double-count 1—2)
    GraphIndex.fold(spark, delta, root, tag = "day2")
    assert(GraphIndex.deltas(root).size == 1)
    // probe ≡ a from-scratch build over base ∪ delta (weights SUM)
    val fresh = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base.unionByName(delta), fresh)
    assert(nbrSet(Seq(1L, 4L, 5L), root) == nbrSet(Seq(1L, 4L, 5L), fresh))
    assert(nbrSet(Seq(1L), root) ==
      Set((1L, 2L, 7L), (1L, 3L, 1L)), "delta weight did not sum")
    // mergeCompact folds physically: same answers, empty log, and the
    // consumed tag stays absorbed through _folded.json
    GraphIndex.mergeCompact(spark, root)
    assert(GraphIndex.deltas(root).isEmpty)
    assert(GraphIndex.folded(root, "day2"))
    GraphIndex.fold(spark, delta, root, tag = "day2")
    assert(GraphIndex.deltas(root).isEmpty,
      "post-merge redelivery re-committed — double-count hazard")
    assert(nbrSet(Seq(1L, 4L, 5L), root) == nbrSet(Seq(1L, 4L, 5L), fresh))
  }

  test("purging a node masks BOTH endpoints immediately and compacts to the never-ingested world") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    GraphIndex.fold(spark, delta, root, tag = "b0")
    // purge node 3: its own rows (src=3) AND the scattered (·,3) rows
    GraphIndex.addTombstones(spark, Seq(3L).toDF("node"), "node", root)
    val expect = Set((1L, 2L, 7L), (2L, 1L, 7L), (4L, 5L, 2L),
      (5L, 4L, 2L), (5L, 6L, 1L), (6L, 5L, 1L))
    assert(nbrSet(1L to 6L, root) == expect,
      "tombstone mask missed an endpoint side")
    GraphIndex.mergeCompact(spark, root)
    // the never-ingested oracle: a fresh build where node 3 never was
    val fresh = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base.unionByName(delta)
      .filter($"src" =!= 3L && $"dst" =!= 3L), fresh)
    assert(nbrSet(1L to 6L, root) == nbrSet(1L to 6L, fresh))
    assert(nbrSet(1L to 6L, root) == expect)
    // the purged node's edges stay gone through a redelivered fold
    GraphIndex.fold(spark, delta, root, tag = "b0")
    assert(nbrSet(1L to 6L, root) == expect,
      "redelivered fold after the purge resurrected edges")
  }

  test("degrees reports 0 for absent or fully-purged nodes") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    GraphIndex.addTombstones(spark, Seq(4L).toDF("node"), "node", root)
    val got = GraphIndex.degrees(spark, Seq(1L, 4L, 99L).toDF("node"), root)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 4L), (4L, 0L, 0L), (99L, 0L, 0L)))
  }

  test("khop assigns BFS distance through the committed artifact") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    GraphIndex.fold(spark, delta, root, tag = "b0")
    // from node 1: {1}@0, {2,3}@1, {4}@2, (5 at 3 — beyond k=2)
    val got = GraphIndex.khop(spark, Seq(1L).toDF("node"), 2, root)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 1L),
      (1L, 4L, 2L)))
    // a masked node is neither visited nor traversed THROUGH
    GraphIndex.addTombstones(spark, Seq(3L).toDF("node"), "node", root)
    val masked = GraphIndex.khop(spark, Seq(1L).toDF("node"), 3, root)
      .as[(Long, Long, Long)].collect().toSet
    assert(masked == Set((1L, 1L, 0L), (1L, 2L, 1L)),
      "khop traversed through a tombstoned node")
  }

  test("reverse khop walks ancestors through the mirror") {
    val root = Files.createTempDirectory("gidx").toString
    // directed chain 1→2→3→4 plus a side feeder 9→3
    GraphIndex.publish(
      Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (9L, 3L, 1L))
        .toDF("src", "dst", "w"), root)
    val up = GraphIndex.khop(spark, Seq(4L).toDF("node"), 2, root,
        out = false)
      .as[(Long, Long, Long)].collect().toSet
    // ancestors of 4 within 2 hops: 3 at 1; 2 and 9 at 2
    assert(up == Set((4L, 4L, 0L), (4L, 3L, 1L), (4L, 2L, 2L),
      (4L, 9L, 2L)), s"reverse reach wrong: $up")
    // forward khop over the same artifact is unchanged
    val down = GraphIndex.khop(spark, Seq(1L).toDF("node"), 2, root)
      .as[(Long, Long, Long)].collect().toSet
    assert(down == Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("bans survive compaction and gate re-ingestion at fold") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    // purge AND ban node 3, compact (tombstones reset; bans must not)
    GraphIndex.addTombstones(spark, Seq(3L).toDF("node"), "node", root)
    GraphIndex.addBans(spark, Seq(3L).toDF("node"), "node", root)
    GraphIndex.mergeCompact(spark, root)
    assert(GraphIndex.tombstones(spark, root).isEmpty, "tombstones kept")
    assert(GraphIndex.bans(spark, root).nonEmpty, "bans reset by compact")
    // a LATER batch re-mentions the banned node: filtered at the gate
    GraphIndex.fold(spark, sym(Seq((3L, 5L, 9L), (1L, 2L, 1L))), root,
      tag = "later")
    val got = nbrSet(1L to 6L, root)
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L),
      s"banned node re-ingested through a later fold: $got")
    assert(got.contains((1L, 2L, 4L)), "innocent edge in the batch lost")
    // and the delta physically lacks the banned rows (gate, not mask)
    val delta = spark.read.parquet(GraphIndex.deltas(root).head + "/out")
      .select($"src", $"dst").as[(Long, Long)].collect().toSet
    assert(delta == Set((1L, 2L), (2L, 1L)),
      s"ban was only masked, not gated at ingestion: $delta")
  }

  test("an entirely-banned fold commits its tag as a marker delta") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    GraphIndex.addBans(spark, Seq(3L).toDF("node"), "node", root)
    // every edge of the batch touches the banned node → nothing may
    // ingest, but the TAG must still commit: an at-least-once caller
    // (GraphStream) tests folded() to absorb redeliveries, and before
    // the marker it re-ran the gate (and re-reported "committed")
    // forever
    GraphIndex.fold(spark, sym(Seq((3L, 5L, 9L))), root, tag = "gone")
    assert(GraphIndex.folded(root, "gone"),
      "fully-gated fold left its tag unrecorded — replays never absorb")
    // the marker is an EMPTY delta: probes read through it and serve
    // exactly the banned-masked base
    val got = nbrSet(1L to 6L, root)
    assert(got.contains((1L, 2L, 3L)), s"marker delta broke probe reads: $got")
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L))
    GraphIndex.mergeCompact(spark, root)
    assert(GraphIndex.folded(root, "gone"),
      "marker tag lost by the merge — post-merge replays double-run")
    assert(GraphIndex.deltas(root).isEmpty)
  }

  test("purgeCompact rewrites only touched buckets; untouched dirs are verbatim copies") {
    val root = Files.createTempDirectory("gidx").toString
    // a chain long enough to populate many src/dst buckets
    val edges = sym((0 until 200).map(i => (i.toLong, (i + 1).toLong, 1L)))
    val oldGen = GraphIndex.publish(edges, root)
    GraphIndex.addTombstones(spark, Seq(7L).toDF("node"), "node", root)
    val newGen = GraphIndex.purgeCompact(spark, root)
    assert(newGen != oldGen)
    assert(GraphIndex.tombstones(spark, root).isEmpty,
      "purgeCompact must reset the tombstone log")
    // parity with the never-ingested world, BOTH probe directions
    val fresh = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(edges.filter($"src" =!= 7L && $"dst" =!= 7L), fresh)
    assert(nbrSet(0L to 20L, root) == nbrSet(0L to 20L, fresh))
    def inSet(r: String) = GraphIndex
      .inNeighbors(spark, (0L to 20L).toDF("node"), r)
      .select($"node", $"nbr", $"w").as[(Long, Long, Long)].collect().toSet
    assert(inSet(root) == inSet(fresh), "the in/ mirror missed the purge")
    // bucket-locality: most bucket dirs must be VERBATIM copies of
    // the old generation (same file names and sizes), and at least
    // one (the purged node's) must differ
    for (layout <- Seq("out", "in")) {
      def listing(gen: String) =
        Option(new java.io.File(gen, layout).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName.startsWith("pbucket="))
          .map { d =>
            d.getName -> Option(d.listFiles()).getOrElse(Array.empty)
              .filter(f => f.isFile && !f.getName.endsWith(".crc"))
              .map(f => (f.getName, f.length())).toSet
          }.toMap
      val before = listing(oldGen); val after = listing(newGen)
      val copied = after.keySet.intersect(before.keySet)
        .count(k => before(k) == after(k))
      val changed = after.keySet.union(before.keySet)
        .count(k => before.get(k) != after.get(k))
      assert(copied > 0,
        s"$layout: no bucket carried verbatim — the rewrite was not " +
          s"bucket-local (copied=$copied changed=$changed)")
      assert(changed > 0 && changed < before.size,
        s"$layout: expected a strict subset of buckets rewritten, " +
          s"got changed=$changed of ${before.size}")
    }
  }

  test("purgeCompact with live deltas falls back to the full merge") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    GraphIndex.fold(spark, delta, root, tag = "b0")
    GraphIndex.addTombstones(spark, Seq(3L).toDF("node"), "node", root)
    GraphIndex.purgeCompact(spark, root)
    assert(GraphIndex.deltas(root).isEmpty, "fallback merge must fold the log")
    val fresh = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base.unionByName(delta)
      .filter($"src" =!= 3L && $"dst" =!= 3L), fresh)
    assert(nbrSet(1L to 6L, root) == nbrSet(1L to 6L, fresh))
  }

  test("PurgeCascade.graph target runs the tombstone→compact→vacuum chain") {
    val root = Files.createTempDirectory("gidx").toString
    GraphIndex.publish(base, root)
    GraphIndex.fold(spark, delta, root, tag = "b0")
    val reports = PurgeCascade.purge(spark, Seq(3L).toDF("node"),
      Seq(PurgeCascade.graph(root)), vacuum = true)
    assert(reports.map(_.family) == Seq("graph"))
    assert(GraphIndex.deltas(root).isEmpty)
    assert(VersionedDirs.versionsOf(root).size == 1, "vacuum kept old gens")
    assert(!nbrSet(1L to 6L, root).exists(r => r._1 == 3L || r._2 == 3L))
    // a cascade RE-RUN with the same ids is a no-op filter, and the
    // same Target value serves both runs (stateless-Target contract)
    val again = PurgeCascade.purge(spark, Seq(3L).toDF("node"),
      Seq(PurgeCascade.graph(root)))
    assert(again.map(_.family) == Seq("graph"))
    assert(!nbrSet(1L to 6L, root).exists(r => r._1 == 3L || r._2 == 3L))
  }
}
