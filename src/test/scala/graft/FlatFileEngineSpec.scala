package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** End-to-end engine facade tests over reference-style CSV fixtures
  * (FIXTURES.md §1), mirroring the reference's own scenario tests
  * (buzzdb_lab1.cpp:1072-1717): load semantics incl. malformed-row
  * drops and RI filtering (tests 1/12/13), ordered comments with ties
  * (test 3), location counts (test 4), cascading rename (test 5),
  * clamp + missing-id updates (tests 6/8).
  */
class FlatFileEngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-flatfile").toString
    Files.writeString(Paths.get(d, "users.csv"),
      """id,username,location
        |1, knorman ,New York
        |2,wchaney,Austin
        |3,richardbishop,Austin
        |notanint,badrow,Nowhere
        |
        |4,solo,Remote
        |5,blankloc,
        |""".stripMargin)
    Files.writeString(Paths.get(d, "posts.csv"),
      """id,content,username,views
        |19,Check out this sunset,knorman,95
        |20,Coffee time,wchaney,10
        |21,Ghost post,nosuchuser,50
        |22,Bad views,knorman,notanint
        |""".stripMargin)
    Files.writeString(Paths.get(d, "engagements.csv"),
      """id,postId,username,type,comment,timestamp
        |1,19,wchaney,comment,Howdy!,100
        |2,19,knorman,like,None,101
        |3,19,wchaney,comment,Again,102
        |4,19,wchaney,comment,Again,103
        |5,999,knorman,comment,dangling post,104
        |6,20,nosuchuser,like,None,105
        |7,20,knorman,comment,Nice,106
        |""".stripMargin)
    d
  }

  private lazy val engine = new FlatFileEngine(spark, dir)

  test("load drops malformed rows and trims cells (ref tests 1/13)") {
    val u = engine.users.collect()
    assert(u.length == 5)                       // badrow + blank line dropped
    assert(u.map(_.getString(1)).contains("knorman"))  // trimmed
    // an empty STRING cell is kept as "" (reference split_csv keeps
    // empty tokens; only int-parse failure or wrong arity drops rows)
    assert(u.find(_.getInt(0) == 5).map(_.getString(2)).contains(""))
  }

  test("load applies RI filters (ref tests 1/12)") {
    val p = engine.posts.select("id").as[Int].collect().toSet
    assert(p == Set(19, 20))                    // 21: bad FK, 22: bad int
    val e = engine.engagements.select("id").as[Int].collect().toSet
    assert(e == Set(1, 2, 3, 4, 7))             // 5: dangling post, 6: bad user
  }

  test("getAllUserComments: ordered with ties, by username via id (ref test 3)") {
    val rows = engine.getAllUserComments(2)
      .as[(Int, String)].collect().toSeq
    assert(rows == Seq((19, "Again"), (19, "Again"), (19, "Howdy!")))
    assert(engine.getAllUserComments(777).isEmpty)   // invalid id ⇒ empty
  }

  test("getAllEngagementsByLocation counts by type (ref test 4)") {
    val (likes, comments) = engine.getAllEngagementsByLocation("Austin")
      .as[(Long, Long)].head()
    assert((likes, comments) == ((0L, 3L)))
    val zero = engine.getAllEngagementsByLocation("Atlantis")
      .as[(Long, Long)].head()
    assert(zero == ((0L, 0L)))                  // invalid location ⇒ (0,0)
  }

  test("updatePostViews: clamp at zero, persists, missing id false (ref 6/8)") {
    assert(!engine.updatePostViews(777, 5))
    assert(engine.updatePostViews(20, -999))    // 10 - 999 clamps to 0
    val views = engine.posts.filter(col("id") === 20)
      .select("views").as[Int].head()
    assert(views == 0)
    assert(engine.updatePostViews(20, 7))
    assert(engine.posts.filter(col("id") === 20)
      .select("views").as[Int].head() == 7)
  }

  test("addEngagementRecords appends valid rows, drops FK violations (ref 12)") {
    val fresh = Seq(
      (100, 19, "solo", "like", "None", 200),
      (101, 999, "solo", "like", "None", 201),      // bad post
      (102, 19, "nobody", "comment", "hi", 202))    // bad user
      .toDF("id", "postId", "username", "type", "comment", "timestamp")
    engine.addEngagementRecords(fresh)
    val ids = engine.engagements.filter(col("id") >= 100)
      .select("id").as[Int].collect().toSet
    assert(ids == Set(100))
  }

  test("updateUserName cascades through all tables, persists (ref test 5)") {
    assert(!engine.updateUserName(777, "x"))
    assert(engine.updateUserName(1, "knorman2"))
    assert(engine.users.filter(col("id") === 1)
      .select("username").as[String].head() == "knorman2")
    assert(engine.posts.filter(col("username") === "knorman").isEmpty)
    assert(engine.engagements.filter(col("username") === "knorman").isEmpty)
    // per-user counts preserved through the rename (ref :1376-1396);
    // post 22 was dropped at load (malformed views), leaving one
    assert(engine.posts.filter(col("username") === "knorman2").count() == 1)
    // engagement 7 (knorman on post 20) survived as knorman2
    assert(engine.engagements.filter(col("username") === "knorman2")
      .select("id").as[Int].collect().toSet == Set(2, 7))
  }

  test("no dangling engagements after RI-filtered load (ref test 12)") {
    // raw file still contains the dangling row; the load filters it
    assert(engine.danglingEngagements.select("id").as[Int]
      .collect().toSet == Set(5))
    assert(engine.engagements.join(
      engine.posts.select(col("id").as("postId")), Seq("postId"), "left_anti")
      .isEmpty)
  }
}
