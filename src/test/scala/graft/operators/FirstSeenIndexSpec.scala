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
    val p = FirstSeenIndex.probe(spark, one, root)
      .queryExecution.executedPlan.toString
    assert(totalDirs >= 2, s"base too small to demonstrate pruning")
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"probe scan lost its pbucket partition filter:\n${p.take(1500)}")
  }

  test("fold min-unions the batch; result equals a from-scratch publish") {
    val root = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base, root)
    FirstSeenIndex.fold(spark, batch, root)
    val got = spark.read.parquet(FirstSeenIndex.resolve(root).get)
      .select($"s", $"first_doc").as[(String, Long)].collect().toSet
    val fresh = Files.createTempDirectory("fsidx").toString
    FirstSeenIndex.publish(base.unionByName(batch), fresh)
    val want = spark.read.parquet(FirstSeenIndex.resolve(fresh).get)
      .select($"s", $"first_doc").as[(String, Long)].collect().toSet
    assert(got == want, "fold diverges from a from-scratch map")
    // the previous generation survives for pinned readers (keep-two)
    assert(VersionedDirs.versionsOf(root).size == 2)
  }
}
