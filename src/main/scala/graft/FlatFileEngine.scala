package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.SocialOps
import graft.sources.CsvIngest

/** The reference engine's complete user-facing API
  * (`FlatFile`, buzzdb_lab1.cpp:86-968) as a Spark-native facade over
  * a directory of headered CSV tables. A user of the reference can
  * switch: every public method there has its analog here, with the
  * same semantics — RI-filtered loads, ordered comment retrieval,
  * cohort like/comment counts, clamp-at-zero view updates,
  * FK-validated appends, cascading renames.
  *
  * Storage model: each table is a directory of headered CSV parts
  * (`dir/users.csv/part-*`), the distributed form of the reference's
  * single files. Durability keeps the reference's tmp-file + atomic
  * rename protocol (buzzdb_lab1.cpp:1032-1059) — writers materialize
  * a complete new table directory and swap it in with a filesystem
  * rename, so readers never observe a torn table; Spark's commit
  * protocol makes the *directory* internally consistent and the
  * rename makes the swap atomic. Concurrency needs no locks: a
  * loaded DataFrame is an immutable snapshot (the reference's
  * parse-then-swap under scoped_lock, :308-315, is free here).
  */
class FlatFileEngine(spark: SparkSession, dir: String) {

  import FlatFileEngine._

  private def path(table: String) = s"$dir/$table.csv"

  // ------------------------------------------------------------------ loads

  /** `loadFlatFile` (buzzdb_lab1.cpp:126-316): typed, trimmed,
    * malformed-row-dropping reads plus the dual semi-join RI filter.
    * Parallelism note: the reference's `loadMultipleFlatFilesInParallel`
    * exists only to read 3 files on 3 threads; Spark scans are
    * split-parallel natively, so the serial/parallel distinction
    * dissolves (SURVEY.md §2.1 S2).
    */
  def users: DataFrame =
    CsvIngest.readFlatFile(spark, path("users"), userSchema)

  def posts: DataFrame = {
    val p = CsvIngest.readFlatFile(spark, path("posts"), postSchema)
    SocialOps.riFilter(p, "username", users, "username")
  }

  def engagements: DataFrame = {
    val e = CsvIngest.readFlatFile(spark, path("engagements"), engagementSchema)
    val byPost = SocialOps.riFilter(e, "postId", posts.select(col("id")), "id")
    SocialOps.riFilter(byPost, "username", users, "username")
  }

  // ----------------------------------------------------------------- reads

  /** `getAllUserComments` (buzzdb_lab1.cpp:682-716): (postId, comment)
    * for one user, ordered by (postId, comment) — ties included,
    * matching the reference's lexicographic tie-break.
    */
  def getAllUserComments(userId: Int): DataFrame =
    SocialOps.userActivity(
      engagements, users, col("id") === userId, lit("comment"),
      "username", "username", "type",
      Seq("postId", "comment"), Seq("postId", "comment"))

  /** `getAllEngagementsByLocation` (buzzdb_lab1.cpp:729-763): one-row
    * (likes, comments) count pair for a location's users.
    */
  def getAllEngagementsByLocation(location: String): DataFrame =
    SocialOps.activityByCohort(
      engagements, users, col("location") === location,
      "username", "username", "type",
      Seq("like" -> "likes", "comment" -> "comments"))

  /** RI sweep (`check_no_dangling_post_ids`, buzzdb_lab1.cpp:1063-1070). */
  def danglingEngagements: DataFrame =
    SocialOps.dangling(
      CsvIngest.readFlatFile(spark, path("engagements"), engagementSchema),
      "postId", posts.select(col("id")), "id")

  // ---------------------------------------------------------------- writes

  /** `updatePostViews` (buzzdb_lab1.cpp:603-631): clamp-at-zero delta
    * on one post, persisted via write-new + atomic swap. Returns false
    * (no write) when the id is absent, like the reference.
    */
  def updatePostViews(postId: Int, delta: Int): Boolean = {
    val current = CsvIngest.readFlatFile(spark, path("posts"), postSchema)
    if (current.filter(col("id") === postId).isEmpty) false
    else {
      val updated = current.withColumn("views",
        when(col("id") === postId,
          greatest(lit(0), col("views") + delta)).otherwise(col("views")))
      swapIn(updated, "posts")
      true
    }
  }

  /** `addEngagementRecord` batch form (buzzdb_lab1.cpp:639-673):
    * FK-validate fresh rows (silently dropping violations, as the
    * reference does) and append — appends add new part files, no
    * rewrite of existing data.
    */
  def addEngagementRecords(fresh: DataFrame): Unit = {
    // appends add part files to a table *directory*; a fixture that
    // starts as a single CSV file is converted on first append
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(path("engagements"))
    if (fs.exists(live) && fs.getFileStatus(live).isFile)
      swapIn(CsvIngest.readFlatFile(spark, path("engagements"), engagementSchema),
        "engagements")
    val valid = SocialOps.riFilter(
      SocialOps.riFilter(fresh, "postId", posts.select(col("id")), "id"),
      "username", users, "username")
    // semi-joins move the key column first; restore schema order so
    // every part file in the table directory has the same header
    valid.select(engagementSchema.fields.map(f => col(f.name)).toSeq: _*)
      .write.mode(SaveMode.Append)
      .option("header", true).csv(path("engagements"))
  }

  /** `updateUserName` (buzzdb_lab1.cpp:775-963): cascading rename
    * across all three tables. Per-table swaps are atomic; cross-table
    * atomicity is out of scope exactly as in the reference (a crash
    * between file rewrites leaves the same inconsistency window,
    * SURVEY.md §3.3). Returns false if the id is absent, true (no-op)
    * if the name is unchanged.
    */
  def updateUserName(userId: Int, newName: String): Boolean = {
    val u = CsvIngest.readFlatFile(spark, path("users"), userSchema)
    val row = u.filter(col("id") === userId).select("username").collect()
    if (row.isEmpty) return false
    val oldName = row.head.getString(0)
    if (oldName == newName) return true

    val renameCol = (c: String) =>
      when(col(c) === oldName, lit(newName)).otherwise(col(c)).as(c)
    swapIn(u.withColumn("username",
      when(col("id") === userId, lit(newName)).otherwise(col("username"))),
      "users")
    val p = CsvIngest.readFlatFile(spark, path("posts"), postSchema)
    swapIn(p.select(col("id"), col("content"), renameCol("username"),
      col("views")), "posts")
    val e = CsvIngest.readFlatFile(spark, path("engagements"), engagementSchema)
    swapIn(e.select(col("id"), col("postId"), renameCol("username"),
      col("type"), col("comment"), col("timestamp")), "engagements")
    true
  }

  /** Write-new-then-swap: materialize the full new table next to the
    * old one, then rename over it — the reference's `*.tmp` + `rename`
    * durability protocol (buzzdb_lab1.cpp:1032-1059) lifted to
    * directories. Readers race-free: they see the old or the new
    * directory, never a mix.
    */
  private def swapIn(updated: DataFrame, table: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(path(table))
    val tmp = new Path(path(table) + ".tmp")
    updated.write.mode(SaveMode.Overwrite).option("header", true)
      .csv(tmp.toString)
    fs.delete(live, true)
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"atomic swap failed for $table")
  }
}

object FlatFileEngine {
  /** The reference's three fixed schemas (buzzdb_lab1.cpp:39-83). */
  val userSchema: StructType = StructType(Seq(
    StructField("id", IntegerType), StructField("username", StringType),
    StructField("location", StringType)))
  val postSchema: StructType = StructType(Seq(
    StructField("id", IntegerType), StructField("content", StringType),
    StructField("username", StringType), StructField("views", IntegerType)))
  val engagementSchema: StructType = StructType(Seq(
    StructField("id", IntegerType), StructField("postId", IntegerType),
    StructField("username", StringType), StructField("type", StringType),
    StructField("comment", StringType), StructField("timestamp", IntegerType)))
}
