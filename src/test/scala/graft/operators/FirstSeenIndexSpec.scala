package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted first-occurrence map: probe parity with a global
  * first-occurrence recompute, bucket pruning, and the fold
  * maintenance step.
  */
class FirstSeenIndexSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, shingle) rows: docs 1-3 are the base, 10-12 the batch;
  // "b" recurs base→batch, "e" recurs batch→batch, "n" is new
  private lazy val base = Seq(
    (1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "d"))
    .toDF("doc_id", "s")
  private lazy val batch = Seq(
    (10L, "b"), (10L, "e"), (11L, "e"), (11L, "n"), (12L, "a"))
    .toDF("doc_id", "s")

  test("probe annotates batch shingles with the committed first-doc") {
    val root = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base, root)
    val got = FirstSeenIndex.probe(spark, batch, root)
      .select($"doc_id", $"s", $"seen_doc")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set(
      (10L, "b", Some(1L)), (10L, "e", None), (11L, "e", None),
      (11L, "n", None), (12L, "a", Some(1L))))
  }

  test("probe prunes to touched partition directories") {
    val root = Files.createTempDirectory("fsidx").toString
    val path = FirstSeenIndex.publish(base, root)
    val totalDirs = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("pbucket="))
    // a single-shingle probe touches one bucket
    val one = Seq((10L, "b")).toDF("doc_id", "s")
    val p = FirstSeenIndex.probePlan(spark, one, root)
      .queryExecution.executedPlan.toString
    assert(totalDirs >= 2, s"base too small to demonstrate pruning")
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"probe scan lost its pbucket partition filter:\n${p.take(1500)}")
  }

  private def probeSet(probeBatch: org.apache.spark.sql.DataFrame,
                       root: String) =
    FirstSeenIndex.probe(spark, probeBatch, root)
      .select($"doc_id", $"s", $"seen_doc")
      .as[(Long, String, Option[Long])].collect().toSet

  test("fold is O(batch): a tagged delta, base untouched; probe ≡ a from-scratch map") {
    val root = Files.createTempDirectory("fsidx").toString
    val basePath = FirstSeenIndex.publish(base, root)
    FirstSeenIndex.fold(spark, batch, root, tag = "day2")
    // O(batch) proof: the committed base was neither rewritten (still
    // ONE generation) nor its rows touched; the delta holds exactly
    // the batch's own distinct shingles, not the index's
    assert(VersionedDirs.versionsOf(root).size == 1,
      "fold rewrote the committed map — that is the O(index) shape")
    assert(FirstSeenIndex.resolve(root).contains(basePath))
    val deltaRows = spark.read.parquet(FirstSeenIndex.deltas(root).head)
    assert(deltaRows.count() == batch.select("s").distinct().count(),
      "delta is not batch-sized")
    assert(FirstSeenIndex.folded(root, "day2"))
    // a redelivered tagged fold is absorbed, not double-committed
    FirstSeenIndex.fold(spark, batch, root, tag = "day2")
    assert(FirstSeenIndex.deltas(root).size == 1)
    // probe resolves the min-union of base ∪ delta ≡ from-scratch map
    val day3 = Seq((20L, "b"), (20L, "e"), (20L, "n"), (20L, "z"))
      .toDF("doc_id", "s")
    val fresh = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base.unionByName(batch), fresh)
    assert(probeSet(day3, root) == probeSet(day3, fresh),
      "min-union probe diverges from a from-scratch map")
    // mergeCompact folds physically: same answers, empty log
    FirstSeenIndex.mergeCompact(spark, root)
    assert(FirstSeenIndex.deltas(root).isEmpty)
    assert(probeSet(day3, root) == probeSet(day3, fresh),
      "post-compact probe diverges")
  }

  test("a live cross-process fold's staging dir survives a merge; an aged orphan vacuums") {
    val root = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base, root)
    FirstSeenIndex.fold(spark, batch, root)
    val dr = new java.io.File(root, "deltas")
    // a concurrent writer's IN-FLIGHT staging dir (fresh mtime): the
    // merge must not yank it mid-write
    val live = new java.io.File(dr, ".staging-live")
    assert(live.mkdirs())
    // a crashed writer's leftover (mtime past the grace age): vacuumed
    val orphan = new java.io.File(dr, ".staging-orphan")
    assert(orphan.mkdirs())
    assert(orphan.setLastModified(
      System.currentTimeMillis() - VersionedDirs.StagingGraceMs - 60000))
    FirstSeenIndex.mergeCompact(spark, root)
    assert(live.isDirectory, "merge deleted a live writer's staging dir")
    assert(!orphan.exists(), "merge kept an aged staging orphan")
  }

  test("a banned early doc cannot steal first-occurrence back through a backfill fold") {
    val root = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base, root)
    // purge doc 1 with reassignment (doc 12 isn't here; 2/10 take
    // over what they hold), compact, then BAN it
    FirstSeenIndex.addTombstones(spark, Seq(1L).toDF("doc_id"),
      "doc_id", root)
    FirstSeenIndex.mergeCompact(spark, root,
      reassignSrc = Some(base.unionByName(batch)
        .filter($"doc_id" =!= 1L)))
    FirstSeenIndex.addBans(spark, Seq(1L).toDF("doc_id"), "doc_id", root)
    // the backfill re-folds doc 1 (min(1) would beat every reassigned
    // survivor) — the gate must keep it out of the delta
    FirstSeenIndex.fold(spark,
      Seq((1L, "a"), (1L, "b"), (30L, "q")).toDF("doc_id", "s"), root,
      tag = "backfill")
    val day3 = Seq((40L, "a"), (40L, "b"), (40L, "q"))
      .toDF("doc_id", "s")
    val got = FirstSeenIndex.probe(spark, day3, root)
      .select($"s", $"seen_doc")
      .as[(String, Option[Long])].collect().toMap
    assert(!got.values.flatten.exists(_ == 1L),
      s"banned doc re-claimed first occurrence: $got")
    assert(got("q").contains(30L),
      "the gate dropped the banned doc's innocent batch-mate")
  }

  test("purge reassigns first occurrence to the next-earliest surviving holder") {
    val root = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base, root)
    FirstSeenIndex.fold(spark, batch, root)
    // purge doc 1 — it owns "a" (also in surviving doc 12) and "b"
    // (also in surviving docs 2 and 10)
    FirstSeenIndex.addTombstones(spark, Seq(1L).toDF("doc_id"),
      "doc_id", root)
    val day3 = Seq((20L, "a"), (20L, "b"), (20L, "e"), (20L, "z"))
      .toDF("doc_id", "s")
    // BEFORE compaction: purged rows hidden; a delta's later holder
    // takes over where one was recorded ("b" → 10), an unrecorded
    // survivor cannot ("a" → unseen until the repair runs)
    assert(probeSet(day3, root) == Set(
      (20L, "a", Some(12L)), (20L, "b", Some(10L)),
      (20L, "e", Some(10L)), (20L, "z", None)))
    // compact WITH the surviving corpus as repair source: exact
    // never-ingested semantics — "b"'s next-earliest holder is doc 2
    val survivors = base.unionByName(batch).filter($"doc_id" =!= 1L)
    FirstSeenIndex.mergeCompact(spark, root, reassignSrc = Some(survivors))
    FirstSeenIndex.vacuumOld(root)
    val fresh = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(survivors, fresh)
    assert(probeSet(day3, root) == probeSet(day3, fresh),
      "post-purge map diverges from a never-ingested publish")
    assert(FirstSeenIndex.tombstones(spark, root).isEmpty)
    // physically purged: no row anywhere names doc 1
    val v = FirstSeenIndex.resolve(root).get
    assert(spark.read.parquet(v).filter($"first_doc" === 1L).count() == 0)
  }

  test("a tagged fold redelivered AFTER purge + merge is absorbed — no resurrection") {
    // the r11 advice scenario: "min is idempotent, double fold
    // harmless" breaks when a DELETE ran in between — a replayed fold
    // re-committing its delta after mergeCompact reset the tombstones
    // would resurrect purged doc ids into the served map. The
    // _folded.json sidecar is the durable commit record that closes it.
    val root = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base, root)
    FirstSeenIndex.fold(spark, batch, root, tag = "b0")
    // purge doc 10 (it introduced "e"; doc 11 is the surviving holder)
    FirstSeenIndex.addTombstones(spark, Seq(10L).toDF("doc_id"),
      "doc_id", root)
    val survivors = base.unionByName(batch).filter($"doc_id" =!= 10L)
    FirstSeenIndex.mergeCompact(spark, root, reassignSrc = Some(survivors))
    // the delta dir is gone, but the fold is still durably recorded
    assert(FirstSeenIndex.deltas(root).isEmpty)
    assert(FirstSeenIndex.folded(root, "b0"),
      "merge erased the only commit record of the folded batch")
    // at-least-once redelivery of the SAME tagged fold: absorbed
    FirstSeenIndex.fold(spark, batch, root, tag = "b0")
    assert(FirstSeenIndex.deltas(root).isEmpty,
      "redelivered fold re-committed a delta a purge already consumed")
    val day3 = Seq((20L, "e")).toDF("doc_id", "s")
    assert(probeSet(day3, root) == Set((20L, "e", Some(11L))),
      "purged doc resurrected as a first-occurrence holder")
    // the HORIZON half (r13): the ledger is cumulative across
    // generations, so the same tag absorbs even after a SECOND merge
    // deleted every trace of the delta dir — a snapshot-pruned
    // sidecar would drop the name here and let the replay re-commit
    FirstSeenIndex.fold(spark, Seq((30L, "zz")).toDF("doc_id", "s"),
      root, tag = "b1")
    FirstSeenIndex.mergeCompact(spark, root)
    assert(FirstSeenIndex.folded(root, "b0"),
      "second merge pruned b0 from the fold ledger")
    FirstSeenIndex.fold(spark, batch, root, tag = "b0")
    assert(FirstSeenIndex.deltas(root).isEmpty,
      "tag redelivered past one merge horizon re-committed")
    assert(probeSet(day3, root) == Set((20L, "e", Some(11L))),
      "late redelivery resurrected a purged holder")
  }
}
