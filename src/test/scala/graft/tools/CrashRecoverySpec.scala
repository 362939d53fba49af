package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{FlatFileEngine, SparkSpec}

/** PROCESS-level durability: a real writer JVM SIGKILLed while
  * committing — the reference's fork()+kill scenario
  * (buzzdb_lab1.cpp:1604-1648), which AcidSpec's constructed crash
  * states approximate but don't reproduce. The writer subprocess
  * commits view updates in a loop; the parent kills it -9 after a few
  * commits, at whatever point in the materialize→publish→vacuum cycle
  * it happens to be, then asserts the recovery matrix: a complete,
  * uncorrupted table at some committed prefix of the updates, and a
  * next writer that carries on and clears any orphan.
  */
class CrashRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-crash").toString
    Files.writeString(Paths.get(d, "users.csv"),
      "id,username,location\n1,alice,Austin\n2,bob,Austin\n")
    Files.writeString(Paths.get(d, "posts.csv"),
      "id,content,username,views\n19,Sunset,alice,99\n20,Coffee,bob,10\n")
    Files.writeString(Paths.get(d, "engagements.csv"),
      "id,postId,username,type,comment,timestamp\n" +
        "1,19,bob,like,None,100\n2,19,alice,comment,Nice,200\n")
    d
  }

  /** Launch CrashWriter in a fresh JVM, SIGKILL it after `minCommits`
    * committed writes, return how many commits the parent observed
    * (shared harness: [[KillHarness]]).
    */
  private def runAndKill(dir: String, mode: String,
                         minCommits: Int): Int =
    KillHarness.runAndKill(Seq(dir, mode), minCommits)

  test("SIGKILLed writer JVM leaves a committed prefix; next writer recovers") {
    val dir = freshDir()
    // pace the kill off the writer's own commit log: let a few commits
    // land, then SIGKILL wherever the next cycle happens to be —
    // including mid-materialization
    val commits = runAndKill(dir, "views", minCommits = 3)
    assert(commits >= 3, s"writer made only $commits commits before timeout")

    // recovery matrix, from a FRESH engine in this JVM:
    val engine = new FlatFileEngine(spark, dir)
    val rows = engine.posts.select("id", "views")
      .as[(Int, Int)].collect().toMap
    // complete table — both rows parse, nothing torn
    assert(rows.keySet == Set(19, 20), s"torn table after kill: $rows")
    // views is 99 + (some committed prefix of the updates): the killed
    // in-flight commit either landed fully or not at all
    assert(rows(19) >= 99 + 3, s"committed updates lost: ${rows(19)}")
    assert(rows(20) == 10)
    // the next writer proceeds and the table stays consistent
    assert(engine.updatePostViews(19, 1))
    val after = new FlatFileEngine(spark, dir).posts
      .filter(col("id") === 19).select("views").as[Int].head()
    assert(after == rows(19) + 1)
    // nothing uncommitted survives the next commit cycle except at
    // most the one in-flight orphan the kill interrupted — and after
    // ANOTHER commit, no orphan older than the retention window exists
    assert(engine.updatePostViews(19, 1))
    val leftovers = new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("posts.csv.v"))
      .filterNot(f => Files.exists(f.toPath.resolve("_SUCCESS")))
      .filterNot(f => f.getName.contains(".d")) // delta namespace
    assert(leftovers.isEmpty,
      s"uncommitted orphans survived vacuum: ${leftovers.map(_.getName)}")
  }

  test("SIGKILLed manifest cascade is all-or-nothing across every table") {
    val dir = freshDir()
    val commits = runAndKill(dir, "cascade", minCommits = 2)
    assert(commits >= 2, s"writer made only $commits cascades before timeout")

    // recovery: whatever instant the kill hit — mid-materialization of
    // any of the three tables, mid-manifest-write, mid-vacuum — a
    // fresh reader sees ONE cascade's state everywhere, never a mix
    def consistentName(): String = {
      val v = new FlatFileEngine(spark, dir, manifestCommits = true)
        .snapshot()
      val u = v.users.filter(col("id") === 1)
        .select("username").as[String].head()
      val p = v.posts.filter(col("id") === 19)
        .select("username").as[String].head()
      val g = v.engagements.filter(col("id") === 2)
        .select("username").as[String].head()
      assert(u == p && p == g,
        s"torn cascade after SIGKILL: users=$u posts=$p engagements=$g")
      u
    }
    val recovered = consistentName()
    // the surviving name is a committed cascade (or the fixture state)
    assert(recovered == "alice" || recovered.startsWith("name"))
    // at least the commits the parent SAW must have survived: the
    // recovered cascade index is >= observed commits - 1 (0-based)
    if (recovered.startsWith("name"))
      assert(recovered.drop(4).toInt >= commits - 1,
        s"committed cascade lost: recovered=$recovered commits=$commits")

    // the next writer proceeds; the half-materialized leftovers from
    // the killed cascade are sequenced past and vacuumed
    val engine = new FlatFileEngine(spark, dir, manifestCommits = true)
    assert(engine.updateUserName(1, "final"))
    assert(consistentName() == "final")
    assert(engine.updateUserName(1, "final2"))
    assert(consistentName() == "final2")
  }
}
