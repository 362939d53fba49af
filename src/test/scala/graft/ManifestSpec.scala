package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Cross-table atomicity via manifest commits — the one semantic the
  * reference documents as a known crash window (`updateUserName`
  * rewrites three files sequentially, buzzdb_lab1.cpp:791-930;
  * SURVEY.md §3.3 scopes it out). `manifestCommits = true` closes it:
  * version directories are invisible until a `_manifest.mN` file
  * (published by one atomic rename) references them, so a cascade is
  * all-or-nothing. These tests construct the crash states directly,
  * the same technique AcidSpec uses for the single-table matrix.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-manifest").toString
    Files.writeString(Paths.get(d, "users.csv"),
      "id,username,location\n1,alice,Austin\n2,bob,Austin\n")
    Files.writeString(Paths.get(d, "posts.csv"),
      "id,content,username,views\n19,Sunset,alice,99\n20,Coffee,bob,10\n")
    Files.writeString(Paths.get(d, "engagements.csv"),
      "id,postId,username,type,comment,timestamp\n" +
        "1,19,alice,like,None,100\n2,20,bob,comment,Nice,200\n")
    d
  }

  private def engine(dir: String) =
    new FlatFileEngine(spark, dir, manifestCommits = true)

  private def namesEverywhere(e: FlatFileEngine): (Set[String], Set[String], Set[String]) = (
    e.users.select("username").as[String].collect().toSet,
    e.posts.select("username").as[String].collect().toSet,
    e.engagements.select("username").as[String].collect().toSet)

  private def manifests(dir: String): Seq[String] =
    new java.io.File(dir).list().toSeq.filter(_.startsWith("_manifest.m")).sorted

  test("cascading rename publishes all three tables in one manifest") {
    val dir = freshDir()
    assert(engine(dir).updateUserName(1, "alicia"))
    // m1 = genesis pin (published before anything was materialized),
    // m2 = the cascade itself
    assert(manifests(dir) == Seq("_manifest.m1", "_manifest.m2"))
    // a FRESH engine (re-reads disk) sees the complete cascade
    val (u, p, g) = namesEverywhere(engine(dir))
    assert(u == Set("alicia", "bob") && p == Set("alicia", "bob")
      && g == Set("alicia", "bob"))
    // the default-mode view of the same directory is identical: the
    // fixture files were vacuumed, the v1 dirs carry _SUCCESS
    val (du, dp, dg) = namesEverywhere(new FlatFileEngine(spark, dir))
    assert(du == Set("alicia", "bob") && dp == Set("alicia", "bob")
      && dg == Set("alicia", "bob"))
  }

  test("crash after materialization, before manifest publish: nothing is visible") {
    val dir = freshDir()
    assert(engine(dir).updateUserName(1, "alicia")) // m1: all three at v1
    // a second cascade crashed after writing users.csv.v2 — COMPLETE,
    // _SUCCESS and all — but before its manifest rename landed
    val orphan = Paths.get(dir, "users.csv.v2")
    Files.createDirectory(orphan)
    Files.writeString(orphan.resolve("part-00000.csv"),
      "id,username,location\n1,zelda,Austin\n2,bob,Austin\n")
    Files.writeString(orphan.resolve("_SUCCESS"), "")
    // readers resolve through the manifest: the half-cascade is
    // invisible even though Spark's own commit marker is present —
    // no mixed state (users renamed, posts not) can ever be observed
    val (u, p, g) = namesEverywhere(engine(dir))
    assert(u == Set("alicia", "bob") && p == Set("alicia", "bob")
      && g == Set("alicia", "bob"))
    assert(engine(dir).snapshotVersions("users") == Seq(1L))
    // the next writer sequences past the orphan and vacuums it
    assert(engine(dir).updateUserName(2, "bobby"))
    assert(!Files.exists(orphan))
    val (u2, _, _) = namesEverywhere(engine(dir))
    assert(u2 == Set("alicia", "bobby"))
  }

  test("abandoned manifest tmp file is ignored and cleaned up") {
    val dir = freshDir()
    assert(engine(dir).updateUserName(1, "alicia"))
    // writer crashed inside the manifest WRITE (before the rename):
    // only a tmp file exists, which readers never look at
    Files.writeString(Paths.get(dir, "_manifest.tmp9"),
      "engagements,9\nposts,9\nusers,9")
    val (u, _, _) = namesEverywhere(engine(dir))
    assert(u == Set("alicia", "bob"))
    assert(engine(dir).updateUserName(2, "bobby"))
    assert(!Files.exists(Paths.get(dir, "_manifest.tmp9")))
  }

  test("previous manifest and its table versions retained one generation") {
    val dir = freshDir()
    assert(engine(dir).updateUserName(1, "alicia")) // m1 genesis, m2 → v1×3
    assert(engine(dir).updateUserName(1, "ada"))    // m3 → v2×3
    assert(manifests(dir) == Seq("_manifest.m2", "_manifest.m3"))
    // a lazy reader that resolved m2 still has every v1 dir intact
    val e = engine(dir)
    assert(e.snapshotVersions("users") == Seq(1L, 2L))
    assert(e.tableAt("users", 1L).filter(col("id") === 1)
      .select("username").as[String].head() == "alicia")
    // one more commit slides the horizon: m2 and the v1 dirs go
    assert(engine(dir).updateUserName(1, "grace"))
    assert(manifests(dir) == Seq("_manifest.m3", "_manifest.m4"))
    assert(engine(dir).snapshotVersions("users") == Seq(2L, 3L))
  }

  test("single-table writes also publish through the manifest, pinning the rest") {
    val dir = freshDir()
    val e = engine(dir)
    assert(e.updatePostViews(19, +1))
    // m1 = genesis (all tables pinned at the fixture), m2 = the write;
    // every manifest maps the COMPLETE table set
    assert(manifests(dir) == Seq("_manifest.m1", "_manifest.m2"))
    assert(Files.readString(Paths.get(dir, "_manifest.m2"))
      .linesIterator.size == 3)
    assert(e.posts.filter(col("id") === 19)
      .select("views").as[Int].head() == 100)
    assert(e.users.count() == 2)
    assert(e.updateUserName(1, "alicia")) // m3 updates all three together
    assert(Files.readString(Paths.get(dir, "_manifest.m3"))
      .linesIterator.size == 3)
    assert(e.posts.filter(col("id") === 19)
      .select("views").as[Int].head() == 100) // carried forward
  }

  test("reader racing manifest cascades always sees a consistent rename") {
    val dir = freshDir()
    val e = engine(dir)
    @volatile var writerDone = false
    @volatile var writerErr: Option[Throwable] = None
    val names = Vector("alice", "ann", "amy", "ada", "ava")
    val writer = new Thread(() =>
      try names.tail.foreach(n => assert(e.updateUserName(1, n)))
      catch { case t: Throwable => writerErr = Some(t) }
      finally { writerDone = true })
    writer.setDaemon(true)
    writer.start()
    var reads = 0
    while (!writerDone) {
      // snapshot() resolves all tables through ONE manifest read:
      // user-1's name in users and in engagements must come from the
      // SAME cascade, however many commits land while we scan
      val r = engine(dir).snapshot()
      val u = r.users.filter(col("id") === 1)
        .select("username").as[String].head()
      val g = r.engagements.filter(col("id") === 1)
        .select("username").as[String].head()
      assert(u == g, s"torn cascade after $reads reads: users=$u eng=$g")
      assert(names.contains(u))
      reads += 1
    }
    writer.join()
    assert(writerErr.isEmpty, s"writer failed: $writerErr")
    assert(reads > 0)
    val (u, p, g) = namesEverywhere(engine(dir))
    assert(u == Set("ava", "bob") && g.contains("ava") && p.contains("ava"))
  }
}
