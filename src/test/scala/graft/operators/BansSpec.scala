package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** The shared durable ban log's scale hardening (r14): multi-add
  * dedup-compaction to one file, and the footer-based empty fast
  * path — [[Bans.get]] runs on every fold/append/probe/compact of
  * six families, so its cost profile is a hot-path property, not a
  * detail.
  */
class BansSpec extends SparkSpec {
  import spark.implicits._

  test("multi-add compacts to ONE deduplicated file") {
    val root = Files.createTempDirectory("bans").toString
    Bans.add(spark, Seq(1L, 2L).toDF("id"), "id", root)
    Bans.add(spark, Seq(2L, 3L).toDF("id"), "id", root)
    Bans.add(spark, Seq(3L, 4L).toDF("id"), "id", root)
    val p = VersionedDirs.resolve(
      new java.io.File(root, "bans").getAbsolutePath).get
    val parts = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        !f.getName.endsWith(".crc"))
    assert(parts.length == 1,
      s"ban set split across ${parts.length} files after 3 adds — " +
        "years of GDPR adds would accumulate per-batch small files")
    val got = spark.read.parquet(p)
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L), s"union-dedup broke: $got")
  }

  test("get() answers absent and empty sets from metadata alone") {
    // absent: no ban dir at all
    val fresh = Files.createTempDirectory("bans").toString
    assert(Bans.get(spark, fresh).isEmpty)
    // present and non-empty: served
    Bans.add(spark, Seq(7L).toDF("id"), "id", fresh)
    assert(Bans.get(spark, fresh).map(_.count()) == Some(1L))
    // empty-committed (never happens via add, but the footer check
    // must treat 0 rows as none — the Tombstones reset shape)
    val root2 = Files.createTempDirectory("bans").toString
    VersionedDirs.commit(
      new java.io.File(root2, "bans").getAbsolutePath) { st =>
      spark.range(0).select($"id".as("index_id")).write.parquet(st)
    }
    assert(Bans.get(spark, root2).isEmpty,
      "an empty committed ban set must read as none")
  }
}
