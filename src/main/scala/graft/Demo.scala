package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Usage example / smoke driver for the [[FlatFileEngine]] facade:
  * builds a reference-style CSV fixture in a temp dir, then runs the
  * reference's whole API surface against it — load, ordered comments,
  * location counts, clamped view update, FK-validated append,
  * cascading rename — printing each result.
  *
  * Run: `sbt "runMain graft.Demo"`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft-demo").toString
    Files.writeString(Paths.get(dir, "users.csv"),
      "id,username,location\n1,knorman,New York\n2,wchaney,Austin\n")
    Files.writeString(Paths.get(dir, "posts.csv"),
      "id,content,username,views\n19,Sunset,knorman,95\n20,Coffee,wchaney,10\n")
    Files.writeString(Paths.get(dir, "engagements.csv"),
      "id,postId,username,type,comment,timestamp\n" +
        "1,19,wchaney,comment,Howdy!,100\n2,19,knorman,like,None,101\n")

    val engine = new FlatFileEngine(spark, dir)
    println(s"users=${engine.users.count()} posts=${engine.posts.count()} " +
      s"engagements=${engine.engagements.count()}")
    println("comments of user 2:")
    engine.getAllUserComments(2).show(false)
    println("engagements by Austin:")
    engine.getAllEngagementsByLocation("Austin").show(false)
    println(s"updatePostViews(20, -999) -> ${engine.updatePostViews(20, -999)}")
    println("post 20 after clamp:")
    engine.posts.filter($"id" === 20).show(false)
    engine.addEngagementRecords(Seq((3, 20, "knorman", "like", "None", 102),
      (4, 999, "knorman", "like", "None", 103))
      .toDF("id", "postId", "username", "type", "comment", "timestamp"))
    println(s"after FK-validated append: ${engine.engagements.count()} engagements (bad-FK row dropped)")
    println(s"updateUserName(1, fred) -> ${engine.updateUserName(1, "fred")}")
    engine.engagements.orderBy("id").show(false)
    spark.stop()
  }
}
