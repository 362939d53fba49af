package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fleet snapshot manifest: one atomic rename pins a
  * (family → committed generation) vector; readers resolving through
  * a pinned snapshot never observe cross-family generation skew and
  * never observe post-snapshot state (the q335 semantics).
  */
class FleetSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val DIM = 16

  private def vec(seed: Long, perturb: Float): Array[Float] =
    Array.tabulate(DIM) { i =>
      val h = (seed * 31 + i) * 2654435761L
      ((h % 1000).toFloat / 1000.0f) + (if (i == 0) perturb else 0.0f)
    }

  // corpus ids start at 0: the PQ codebook seeds are the vectors with
  // id < ks ([[VectorQuantizer.fitPQ]]) — an id-shifted corpus would
  // fit an EMPTY codebook; queries live far above the corpus range
  private lazy val corpus =
    (0 until 40).map(i => (i.toLong, vec(i.toLong, 0.0f)))
      .toDF("vec_id", "embedding")
  private lazy val queries =
    (0 until 5).map(q => (1000L + q, vec(q.toLong, 0.001f)))
      .toDF("vec_id", "embedding")

  private def fleet(): (String, String, String) = {
    val fleetRoot = Files.createTempDirectory("fleet").toString
    val simRoot = new java.io.File(fleetRoot, "sim").getAbsolutePath
    val pqRoot = new java.io.File(fleetRoot, "pq").getAbsolutePath
    SimIndex.publish(corpus, "vec_id", "embedding", 8, 4, simRoot)
    PqIndex.publish(corpus, "vec_id", "embedding", 4, 4, 8, 2, pqRoot)
    (fleetRoot, simRoot, pqRoot)
  }

  test("pin commits a (family -> generation) vector; at() returns it") {
    val (fleetRoot, simRoot, pqRoot) = fleet()
    val n = FleetSnapshot.pin(fleetRoot,
      Map("sim" -> simRoot, "pq" -> pqRoot))
    assert(n == 1L)
    val gens = FleetSnapshot.at(fleetRoot, n)
    assert(gens.keySet == Set("sim", "pq"))
    assert(gens("sim") == VersionedDirs.resolve(simRoot).get)
    assert(gens("pq") == VersionedDirs.resolve(pqRoot).get)
    assert(FleetSnapshot.current(fleetRoot).map(_._1).contains(1L))
  }

  test("skew window: a purge between family commits never reaches a " +
    "snapshot reader — old pin = old world for BOTH families") {
    val (fleetRoot, simRoot, pqRoot) = fleet()
    val m1 = FleetSnapshot.pin(fleetRoot,
      Map("sim" -> simRoot, "pq" -> pqRoot))
    // the skew window: sim has compacted its purge, pq has NOT yet —
    // a latest-generation reader composing both families right now
    // would see a world no single commit produced
    val del = corpus.filter($"vec_id" % 4 === 1).select("vec_id")
    SimIndex.addTombstones(spark, del, "vec_id", simRoot)
    SimIndex.mergeCompact(spark, simRoot)
    val g1 = FleetSnapshot.at(fleetRoot, m1)
    // the snapshot reader resolves BOTH families pre-purge: purged
    // ids still retrievable through the pinned sim generation even
    // though the live root already compacted them away
    val pinnedSim = SimIndex.probeTopKAt(spark, queries,
        "vec_id", "embedding", 5, g1("sim"))
      .select("index_id").as[Long].collect().toSet
    assert(pinnedSim.exists(_ % 4 == 1),
      "pinned read lost purged ids — post-snapshot state leaked in")
    val liveSim = SimIndex.probeTopK(spark, queries,
        "vec_id", "embedding", 5, simRoot)
      .select("index_id").as[Long].collect().toSet
    assert(!liveSim.exists(_ % 4 == 1),
      "live read still serves purged ids — compaction broken")
    // close the window: finish pq's purge, pin m2 — the new snapshot
    // is (post, post)
    PqIndex.addTombstones(spark, del, "vec_id", pqRoot)
    PqIndex.mergeCompact(spark, pqRoot)
    val m2 = FleetSnapshot.pin(fleetRoot,
      Map("sim" -> simRoot, "pq" -> pqRoot))
    val g2 = FleetSnapshot.at(fleetRoot, m2)
    assert(g2("sim") != g1("sim") && g2("pq") != g1("pq"))
    val pinned2 = SimIndex.probeTopKAt(spark, queries,
        "vec_id", "embedding", 5, g2("sim"))
      .select("index_id").as[Long].collect().toSet
    assert(!pinned2.exists(_ % 4 == 1))
  }

  test("adcRescoreAt ranks exactly the candidate pairs, pinned") {
    val (fleetRoot, simRoot, pqRoot) = fleet()
    val m1 = FleetSnapshot.pin(fleetRoot,
      Map("sim" -> simRoot, "pq" -> pqRoot))
    val gens = FleetSnapshot.at(fleetRoot, m1)
    val cand = SimIndex.probeTopKAt(spark, queries,
        "vec_id", "embedding", 4, gens("sim"))
      .select("query_id", "index_id")
    val got = PqIndex.adcRescoreAt(spark, queries, "vec_id", "embedding",
      3, gens("pq"), cand)
    val gotPairs = got.select("query_id", "index_id")
      .as[(Long, Long)].collect().toSet
    val candPairs = cand.as[(Long, Long)].collect().toSet
    assert(gotPairs.nonEmpty)
    assert(gotPairs.subsetOf(candPairs),
      "rescore produced a pair the recall stage never emitted")
    // ranks are contiguous from 1 within each query
    val byQ = got.select("query_id", "rnk").as[(Long, Long)]
      .collect().groupBy(_._1)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq ==
        (1L to rs.length.toLong).toSeq)
    }
  }

  test("IndexCatalog reports the pinned snapshots, one row per " +
    "(snap, family), without a Spark job over the data") {
    val (fleetRoot, simRoot, pqRoot) = fleet()
    FleetSnapshot.pin(fleetRoot, Map("sim" -> simRoot, "pq" -> pqRoot))
    SimIndex.addTombstones(spark,
      corpus.filter($"vec_id" % 4 === 1).select("vec_id"),
      "vec_id", simRoot)
    SimIndex.mergeCompact(spark, simRoot)
    FleetSnapshot.pin(fleetRoot, Map("sim" -> simRoot, "pq" -> pqRoot))
    val rows = IndexCatalog.pinnedSnapshots(spark, fleetRoot)
      .select("snap", "family", "generation")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set(
      (1L, "sim", 1L), (1L, "pq", 1L),
      (2L, "sim", 2L), (2L, "pq", 1L)))
  }

  test("pin refuses a family with no committed generation") {
    val fleetRoot = Files.createTempDirectory("fleet").toString
    val empty = new java.io.File(fleetRoot, "nothing").getAbsolutePath
    intercept[IllegalStateException] {
      FleetSnapshot.pin(fleetRoot, Map("ghost" -> empty))
    }
  }

  test("a taken snapshot slot is never clobbered: pin retries the " +
    "next number and the committed manifest survives byte-for-byte") {
    val (fleetRoot, simRoot, pqRoot) = fleet()
    // simulate the losing side of a cross-process race: the slot the
    // pinner would pick already holds a committed manifest (a plain
    // renameTo would silently REPLACE this file — POSIX rename(2)
    // only fails for non-empty directories)
    val snapDir = new java.io.File(fleetRoot, "_snapshots")
    snapDir.mkdirs()
    val taken = new java.io.File(snapDir, "fleet.m1.json")
    val body = """{"other":"/somewhere/index.v9"}"""
    Files.writeString(taken.toPath, body)
    val n = FleetSnapshot.pin(fleetRoot,
      Map("sim" -> simRoot, "pq" -> pqRoot))
    assert(n == 2L, "pin must advance past the taken slot")
    assert(Files.readString(taken.toPath) == body,
      "pin clobbered a committed manifest — lost-snapshot race")
    assert(FleetSnapshot.at(fleetRoot, 2L).keySet == Set("sim", "pq"))
  }

  test("pin-aware retention: a vacuumed-past pinned generation " +
    "survives while its manifest lives; release() lets it reclaim") {
    val (fleetRoot, simRoot, _) = fleet()
    val m1 = FleetSnapshot.pin(fleetRoot, Map("sim" -> simRoot))
    val g1 = FleetSnapshot.at(fleetRoot, m1)("sim")
    // push the pinned generation below the keep=2 floor: two more
    // publishes (each commit runs retention)
    SimIndex.publish(corpus, "vec_id", "embedding", 8, 4, simRoot)
    SimIndex.publish(corpus, "vec_id", "embedding", 8, 4, simRoot)
    assert(new java.io.File(g1).isDirectory,
      "retention vacuumed a generation a live manifest still pins")
    // the pinned read still serves the old world
    val pinned = SimIndex.probeTopKAt(spark, queries,
        "vec_id", "embedding", 3, g1)
      .select("index_id").as[Long].collect()
    assert(pinned.nonEmpty)
    // expire the pin: delete the manifest, re-run retention
    FleetSnapshot.release(fleetRoot, m1)
    VersionedDirs.retainLatestGenerations(simRoot)
    assert(!new java.io.File(g1).exists(),
      "released pin's generation survived the next vacuum")
    // idempotent release
    FleetSnapshot.release(fleetRoot, m1)
  }

  test("catalog flags a dangling pin (manifest outlived its " +
    "generation) as live=0 and a malformed path as generation -1") {
    val (fleetRoot, simRoot, pqRoot) = fleet()
    val m1 = FleetSnapshot.pin(fleetRoot,
      Map("sim" -> simRoot, "pq" -> pqRoot))
    // hand-break the sim pin: delete the pinned generation out from
    // under the manifest (the pre-pin-aware-retention scenario)
    val g1 = new java.io.File(FleetSnapshot.at(fleetRoot, m1)("sim"))
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    rm(g1)
    // plus one manifest entry whose path breaks the index.vN naming
    Files.writeString(new java.io.File(fleetRoot,
      "_snapshots/fleet.m2.json").toPath,
      """{"weird":"/nonexistent/not-a-generation"}""")
    val rows = IndexCatalog.pinnedSnapshots(spark, fleetRoot)
      .select("snap", "family", "generation", "live")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(rows.contains((1L, "sim", 1L, 0L)), s"sim pin not dangling: $rows")
    assert(rows.exists { case (n, f, _, l) => n == 1L && f == "pq" && l == 1L })
    assert(rows.contains((2L, "weird", -1L, 0L)),
      "malformed entry must report generation -1, not fail the listing")
  }

  test("corpus pin: assertCorpus passes on the pinned world and " +
    "fails with 'corpus moved since pin' after the table changes") {
    val (fleetRoot, simRoot, _) = fleet()
    val tableDir = Files.createTempDirectory("corpus-tbl")
    val part = new java.io.File(tableDir.toFile, "part-0.parquet")
    Files.writeString(part.toPath, "row data v1")
    val m1 = FleetSnapshot.pin(fleetRoot, Map("sim" -> simRoot),
      corpusTables = Map("docs" -> tableDir.toString))
    assert(FleetSnapshot.corpusAt(fleetRoot, m1).keySet == Set("docs"))
    // corpus keys never leak into the family vector
    assert(FleetSnapshot.at(fleetRoot, m1).keySet == Set("sim"))
    FleetSnapshot.assertCorpus(fleetRoot, m1,
      Map("docs" -> tableDir.toString))
    // unpinned tables are ignored
    FleetSnapshot.assertCorpus(fleetRoot, m1,
      Map("other" -> "/nonexistent"))
    // move the corpus: longer content + a bumped mtime
    Files.writeString(part.toPath, "row data v2 — rewritten")
    part.setLastModified(part.lastModified() + 10000)
    val e = intercept[IllegalStateException] {
      FleetSnapshot.assertCorpus(fleetRoot, m1,
        Map("docs" -> tableDir.toString))
    }
    assert(e.getMessage.contains("corpus moved since pin"))
  }
}
