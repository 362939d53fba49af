package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit tests for the reference-surface semantics (SURVEY.md §2) on
  * tiny in-memory frames: FK drop on load/append, clamp-at-zero
  * update, cascading rename, anti-join sweep — the properties the
  * reference's own tests 3/5/8/12 assert (buzzdb_lab1.cpp:1212-1675).
  */
class SocialOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val users =
    Seq((1, "knorman", "NY"), (2, "wchaney", "TX"))
      .toDF("id", "username", "location")
  private lazy val posts =
    Seq((19, "sunset", 1, 95), (20, "ghost", 99, 5))
      .toDF("id", "content", "uid", "views")
  private lazy val engagements =
    Seq((1, 19, 2, "comment", "Howdy!"), (2, 19, 1, "like", "None"),
        (3, 42, 1, "comment", "dangling post"))
      .toDF("id", "postId", "uid", "type", "comment")

  test("riFilter drops child rows with missing parents (load semantics)") {
    val kept = SocialOps.riFilter(posts, "uid", users, "id")
    assert(kept.select("id").as[Int].collect().toSet == Set(19))
  }

  test("dangling finds RI violations (check_no_dangling_post_ids)") {
    val bad = SocialOps.dangling(engagements, "postId",
      posts.select(col("id")), "id")
    assert(bad.select("id").as[Int].collect().toSet == Set(3))
  }

  test("updateClamped applies delta with clamp at zero") {
    val out = SocialOps.updateClamped(
      posts, col("id") === 20, "views", lit(-100d))
      .select("id", "views").as[(Int, Double)].collect().toMap
    assert(out(20) == 0d)   // 5 - 100 clamps to 0
    assert(out(19) == 95d)  // untouched
  }

  test("updateClamped never goes below zero but applies positive deltas") {
    val out = SocialOps.updateClamped(
      posts, lit(true), "views", lit(10d))
      .select("id", "views").as[(Int, Double)].collect().toMap
    assert(out(19) == 105d && out(20) == 15d)
  }

  test("validatedAppend silently drops FK-violating fresh rows") {
    val fresh = Seq((10, 19, 1, "like", "ok"), (11, 999, 1, "like", "bad post"),
                    (12, 19, 777, "like", "bad user"))
      .toDF("id", "postId", "uid", "type", "comment")
    val appended = SocialOps.validatedAppend(
      engagements, fresh,
      Seq((posts, "id", "postId"), (users, "id", "uid")))
    assert(appended.filter(col("id") >= 10).select("id").as[Int]
      .collect().toSet == Set(10))
    assert(appended.count() == engagements.count() + 1)
  }

  test("renamed cascades through a referencing join") {
    val renamedUsers = SocialOps.renamed(users, "id", "username",
      lit(1), "newname")
    val joined = posts.join(renamedUsers,
      posts("uid") === renamedUsers("id")).select("username")
    assert(joined.as[String].collect().toSet == Set("newname"))
    assert(renamedUsers.filter(col("id") === 2)
      .select("username").as[String].head() == "wchaney")
  }

  test("userActivity: missing user yields empty result (ref test 3)") {
    val out = SocialOps.userActivity(
      engagements, users, col("id") === 777, lit("comment"),
      "uid", "id", "type", Seq("postId", "comment"), Seq("postId", "comment"))
    assert(out.isEmpty)
  }

  test("activityByCohort counts by type within cohort only") {
    val row = SocialOps.activityByCohort(
      engagements, users, col("location") === "NY",
      "uid", "id", "type",
      Seq("like" -> "n_like", "comment" -> "n_comment"))
      .as[(Long, Long)].head()
    // user 1 (NY) has one like and one dangling comment
    assert(row == ((1L, 1L)))
  }
}
