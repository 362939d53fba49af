package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted banded dedup index: versioned publish, bucket-pruned
  * probe, and exact parity with the in-plan NEW × INDEX band join
  * (q91's oracle-checked form).
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16; private val BANDS = 4; private val R = 4

  private def doc(i: Int) =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"

  private lazy val indexDocs =
    (0 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
  // new batch: one exact redelivery of index doc 5 plus one novel doc
  private lazy val freshDocs = Seq(
    (1000L, doc(5)),
    (1001L, "completely unrelated payload nothing shared at all here"))
    .toDF("doc_id", "text")

  private lazy val sigI =
    Dedup.minhashSignatures(indexDocs, "doc_id", "text", K)
  private lazy val sigN =
    Dedup.minhashSignatures(freshDocs, "doc_id", "text", K)

  test("publish + probe reproduces the in-plan candidate set exactly") {
    val root = Files.createTempDirectory("dedupidx").toString
    DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    val got = DedupIndex.probe(spark, sigN, "doc_id", BANDS, R, root)
      .as[(Long, Long)].collect().toSet
    val want = Dedup.incrementalCandidates(sigN, sigI, "doc_id", BANDS, R)
      .as[(Long, Long)].collect().toSet
    assert(want.contains((1000L, 5L)), "redelivered copy must be a candidate")
    assert(got == want)
  }

  test("probe prunes to touched bucket directories only") {
    val root = Files.createTempDirectory("dedupidx").toString
    val path = DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    val totalDirs = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("bucket="))
    val touched = Dedup.bandRows(sigN, "doc_id", BANDS, R)
      .select(DedupIndex.bucketOf(col("band"), col("band_key")).as("b"))
      .distinct().count()
    // the new batch's footprint must be a strict subset of the index's
    // bucket universe — otherwise this test proves nothing
    assert(touched < totalDirs,
      s"corpus too small to demonstrate pruning: $touched vs $totalDirs")
    // and the probe's scan carries that footprint as a STATIC
    // partition filter — pruning happens at file listing, not post-scan
    val p = DedupIndex.probePlan(spark, sigN, "doc_id", BANDS, R, root)
      .queryExecution.executedPlan.toString
    // the filter must sit INSIDE the scan's PartitionFilters list (an
    // empty list would still print the header — anchor on the content)
    assert("PartitionFilters: \\[[^\\]]*bucket[^\\]]*IN".r.findFirstIn(p).isDefined
        || "PartitionFilters: \\[[^\\]]*bucket[^\\]]*INSET".r.findFirstIn(p).isDefined,
      s"probe scan lost its bucket partition filter:\n${p.take(2000)}")
  }

  test("resolve picks the highest committed version; uncommitted dirs invisible") {
    val root = Files.createTempDirectory("dedupidx").toString
    assert(DedupIndex.resolve(root).isEmpty)
    DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    val v2 = DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    assert(DedupIndex.resolve(root).contains(v2))
    // a crashed re-index: directory exists, no _SUCCESS commit marker
    val orphan = new java.io.File(root, "index.v9")
    assert(orphan.mkdir())
    assert(DedupIndex.resolve(root).contains(v2))
    // retention: publishing twice more vacuums generations beyond two
    DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    val kept = new java.io.File(root).listFiles()
      .filter(_.getName.matches("index\\.v\\d+")).map(_.getName).toSet
    assert(!kept.contains("index.v1") && !kept.contains("index.v2"))
  }

  test("publish renames AROUND an occupied version slot (cross-process race)") {
    val root = Files.createTempDirectory("dedupidx").toString
    DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    // a racing publisher already owns slot v2 (non-empty, so rename
    // onto it must fail and this publisher must take the next slot)
    val occupied = new java.io.File(root, "index.v2")
    assert(occupied.mkdir())
    Files.writeString(occupied.toPath.resolve("part-0.parquet"), "racer")
    val path = DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    assert(path.endsWith("index.v3"), s"landed at $path")
    assert(Files.readString(occupied.toPath.resolve("part-0.parquet")) == "racer",
      "the racer's slot was clobbered")
    // and no staging leftovers survive a successful publish
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.startsWith(".staging-")))
  }

  test("tombstones hide deleted ids at probe time; compaction purges them physically") {
    val root = Files.createTempDirectory("dedupidx").toString
    DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    // probe before any delete: the redelivered copy links to doc 5
    def probeSet() = DedupIndex.probe(spark, sigN, "doc_id", BANDS, R, root)
      .as[(Long, Long)].collect().toSet
    assert(probeSet().contains((1000L, 5L)))
    // delete request for doc 5: hidden IMMEDIATELY (no rewrite yet)
    DedupIndex.addTombstones(spark,
      Seq(5L).toDF("doc_id"), "doc_id", root)
    val afterTomb = probeSet()
    assert(!afterTomb.exists(_._2 == 5L),
      s"tombstoned id still probe-visible: $afterTomb")
    // the index FILE still contains doc 5 (delete path is O(deletes))
    val v1 = DedupIndex.resolve(root).get
    assert(spark.read.parquet(v1).filter($"index_id" === 5L).count() > 0)
    // compaction: physically gone, tombstones reset, probe unchanged
    val v2 = DedupIndex.compact(spark, root)
    assert(spark.read.parquet(v2).filter($"index_id" === 5L).count() == 0)
    assert(DedupIndex.tombstones(spark, root).isEmpty,
      "tombstone set must reset after compaction")
    assert(probeSet() == afterTomb)
    // cumulative deletes: a second request unions with nothing (reset)
    DedupIndex.addTombstones(spark, Seq(7L).toDF("doc_id"), "doc_id", root)
    DedupIndex.addTombstones(spark, Seq(9L).toDF("doc_id"), "doc_id", root)
    val t = DedupIndex.tombstones(spark, root).get
      .as[Long].collect().toSet
    assert(t == Set(7L, 9L), s"cumulative tombstones wrong: $t")
    // hard vacuum after the grace period: only the compacted head stays
    DedupIndex.vacuumOld(root)
    val gens = new java.io.File(root).listFiles()
      .filter(_.getName.matches("index\\.v\\d+")).map(_.getName).toSet
    assert(gens == Set(new java.io.File(v2).getName),
      s"pre-purge generation survived the vacuum: $gens")
  }

  test("a crash orphan above the committed head never displaces the previous generation") {
    val root = Files.createTempDirectory("dedupidx").toString
    val v1 = DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    // crashed re-index lands ABOVE the committed head (no _SUCCESS)
    assert(new java.io.File(root, "index.v5").mkdir())
    val v6 = DedupIndex.publish(sigI, "doc_id", BANDS, R, root)
    assert(v6.endsWith("index.v6"))
    // retention must rank COMMITTED versions: v1 is the previous
    // committed generation and stays; a raw-dir ranking would have
    // kept {v6, orphan v5} and deleted v1 under a pinned reader
    assert(new java.io.File(v1, "_SUCCESS").isFile,
      "previous committed generation was vacuumed by a crash orphan")
    assert(DedupIndex.resolve(root).contains(v6))
  }
}
