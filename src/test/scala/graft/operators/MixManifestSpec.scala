package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mix-manifest versioning: thresholds follow q77's rule, application
  * is a pure function of the PINNED manifest (not the current data),
  * and the version protocol matches the other committed artifacts.
  */
class MixManifestSpec extends SparkSpec {
  import spark.implicits._

  // skewed source mix: 60 web, 15 books, 5 code
  private lazy val docs =
    ((0 until 60).map(i => (i.toLong, "web")) ++
     (100 until 115).map(i => (i.toLong, "books")) ++
     (200 until 205).map(i => (i.toLong, "code")))
      .toDF("doc_id", "source")

  test("published thresholds follow the sqrt(n_min/n_s) rule") {
    val root = Files.createTempDirectory("mix").toString
    MixManifest.publish(docs, "doc_id", "source", 1000000L, 80, 90, root)
    val p = MixManifest.load(spark, root)
    val bySrc = p.sources.map(s => s._1 -> ((s._2, s._3))).toMap
    assert(bySrc("code") == ((5L, 1000000L))) // n_min source keeps all
    assert(bySrc("books") ==
      ((15L, math.round(math.sqrt(5.0 / 15.0) * 1000000L))))
    assert(bySrc("web") ==
      ((60L, math.round(math.sqrt(5.0 / 60.0) * 1000000L))))
    assert(p.scale == 1000000L && p.trainLt == 80 && p.valLt == 90)
  }

  test("applying a PINNED manifest ignores later corpus drift") {
    val root = Files.createTempDirectory("mix").toString
    MixManifest.publish(docs, "doc_id", "source", 1000000L, 80, 90, root)
    val v1 = MixManifest.load(spark, root)
    // the corpus grows: web triples, so head-derived thresholds change
    val grown = docs.unionByName(
      (1000 until 1120).map(i => (i.toLong, "web")).toDF("doc_id", "source"))
    MixManifest.publish(grown, "doc_id", "source", 1000000L, 80, 90, root)
    val v2 = MixManifest.load(spark, root)
    assert(v1.sources != v2.sources, "drift must change head thresholds")
    // v1 applied to the ORIGINAL docs reselects identical membership,
    // run after run — the reproducibility contract
    val a = MixManifest.applyMix(docs, v1, "doc_id", "source")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val b = MixManifest.applyMix(docs, v1, "doc_id", "source")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
    // and a source born AFTER the pin is dropped, not silently admitted
    val late = docs.unionByName(Seq((9000L, "forum")).toDF("doc_id", "source"))
    val applied = MixManifest.applyMix(late, v1, "doc_id", "source")
    assert(applied.filter(col("source") === "forum").count() == 0)
  }

  test("versioned publish: resolve skips uncommitted, retention keeps two") {
    val root = Files.createTempDirectory("mix").toString
    assert(MixManifest.resolve(root).isEmpty)
    MixManifest.publish(docs, "doc_id", "source", 1000000L, 80, 90, root,
      provenance = "fp-one")
    assert(MixManifest.load(spark, root).provenance == "fp-one")
    val orphan = new java.io.File(root, "mix.v7")
    assert(orphan.mkdir()) // crashed publish: no _SUCCESS
    assert(MixManifest.resolve(root).exists(_.endsWith("mix.v1")))
    MixManifest.publish(docs, "doc_id", "source", 1000000L, 80, 90, root)
    MixManifest.publish(docs, "doc_id", "source", 1000000L, 80, 90, root)
    val kept = new java.io.File(root).listFiles()
      .filter(_.getName.matches("mix\\.v\\d+")).map(_.getName).toSet
    assert(!kept.contains("mix.v1"), s"retention failed: $kept")
  }
}
