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
  * Storage model: each table is a *versioned* directory of headered
  * CSV parts (`dir/posts.csv.v3/part-*`) — the multi-snapshot form of
  * the reference's tmp-file + rename protocol
  * (buzzdb_lab1.cpp:1032-1059). A writer never touches the live
  * snapshot: it materializes the complete next version and Spark's
  * commit protocol publishes it by writing `_SUCCESS` last; readers
  * resolve the highest version carrying that marker. The previous
  * version is retained through the next commit (then vacuumed), so a
  * lazily-executing reader keeps a complete, immutable snapshot under
  * its feet while a swap happens — snapshot isolation without a
  * single rename race, the property the reference buys with its
  * scoped_lock parse-then-swap (:308-315). A writer killed
  * mid-materialization leaves an uncommitted orphan that readers
  * ignore and the next writer vacuums. Writers within one engine
  * instance are serialized by a lock (the reference's mutexes,
  * buzzdb_lab1.cpp:96-97); writers in separate processes are
  * uncoordinated, the same scope as the reference's process-local
  * mutexes. A plain `posts.csv` fixture (file or dir) is read as the
  * pre-version-0 snapshot, so reference-style fixtures work unchanged.
  *
  * **Point-write modes.** The reference rewrites the whole table per
  * point update (buzzdb_lab1.cpp:1032-1059) and the default mode is
  * faithful to that. With `changelogWrites = true`, `updatePostViews`
  * instead APPENDS a one-row delta snapshot (`posts.csv.v3.d1`, same
  * `_SUCCESS` commit discipline as full versions) and reads resolve
  * base ∪ deltas through [[graft.operators.Merge.latestWins]] —
  * merge-on-read, write cost independent of table size. Every
  * `compactAfter` committed deltas the writer folds the merged state
  * into the next full version (compaction), whose commit vacuums the
  * superseded generation and its deltas one generation later — the
  * snapshot-plus-changelog layout every production table format
  * (Delta/Hudi/Iceberg) converges on, built from the same two
  * primitives this engine already owns (versioned `_SUCCESS` publish
  * + latest-wins merge). Visible semantics are IDENTICAL in both
  * modes: per-update clamp-at-zero (each delta stores the resolved
  * row image, never a raw increment — summing increments would clamp
  * only once at read time), false-on-missing, snapshot isolation,
  * crash recovery (an uncommitted delta orphan is invisible and gets
  * superseded) — AcidSpec asserts the matrix in both modes.
  */
class FlatFileEngine(spark: SparkSession, dir: String,
                     changelogWrites: Boolean = false,
                     compactAfter: Int = 4) {

  import FlatFileEngine._

  private def path(table: String) = s"$dir/$table.csv"

  /** Serializes writers within this engine instance — the analog of
    * the reference's per-table mutexes (buzzdb_lab1.cpp:96-97).
    */
  private val writeLock = new Object

  private def fs =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version number, path) of every `<table>.csv.vN` directory. */
  private def listVersions(table: String): Seq[(Long, Path)] = {
    val base = new Path(dir)
    val prefix = s"$table.csv.v"
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith(prefix) && name.drop(prefix.length).forall(_.isDigit)
          && name.length > prefix.length)
        Some((name.drop(prefix.length).toLong, st.getPath))
      else None
    }
  }

  /** A version is visible once Spark's commit protocol has written its
    * `_SUCCESS` marker (the job-level commit, written last).
    */
  private def committed(p: Path): Boolean = fs.exists(new Path(p, "_SUCCESS"))

  /** Read-side snapshot resolution: the highest committed version,
    * falling back to the bare fixture path. Never mutates the
    * filesystem, so racing readers are safe by construction.
    */
  private def tablePath(table: String): String =
    listVersions(table).filter(v => committed(v._2))
      .sortBy(-_._1).headOption
      .map(_._2.toString).getOrElse(path(table))

  // ------------------------------------------------------- changelog deltas

  /** (seq, path) of every delta dir riding on the CURRENT base
    * snapshot: `<base>.dM` (e.g. `posts.csv.v3.d1`). The version
    * lister's all-digits check keeps delta names out of the version
    * namespace and vice versa.
    */
  private def listDeltas(table: String): Seq[(Long, Path)] = {
    val prefix = s"${new Path(tablePath(table)).getName}.d"
    val root = new Path(dir)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith(prefix) && name.length > prefix.length &&
          name.drop(prefix.length).forall(_.isDigit))
        Some((name.drop(prefix.length).toLong, st.getPath))
      else None
    }
  }

  /** Merge-on-read resolution: the base snapshot with every COMMITTED
    * delta applied, the highest-sequence row image per id winning
    * ([[graft.operators.Merge.latestWins]] — one key shuffle, no
    * join). With no deltas this is exactly the plain snapshot read;
    * an uncommitted delta (crashed writer) is invisible, the same
    * `_SUCCESS` rule as full versions.
    */
  private def currentTable(table: String): DataFrame = {
    val base = CsvIngest.readFlatFile(spark, tablePath(table), schemaOf(table))
    val deltas = listDeltas(table).filter(d => committed(d._2)).sortBy(_._1)
    if (deltas.isEmpty) base
    else {
      val all = deltas.foldLeft(base.withColumn("_seq", lit(0L))) {
        case (acc, (m, p)) =>
          acc.unionByName(
            CsvIngest.readFlatFile(spark, p.toString, schemaOf(table))
              .withColumn("_seq", lit(m)))
      }
      graft.operators.Merge.latestWins(all, Seq("id"), Seq("_seq"))
        .drop("_seq")
    }
  }

  // ------------------------------------------------------------------ loads

  /** `loadFlatFile` (buzzdb_lab1.cpp:126-316): typed, trimmed,
    * malformed-row-dropping reads plus the dual semi-join RI filter.
    * Parallelism note: the reference's `loadMultipleFlatFilesInParallel`
    * exists only to read 3 files on 3 threads; Spark scans are
    * split-parallel natively, so the serial/parallel distinction
    * dissolves (SURVEY.md §2.1 S2).
    */
  def users: DataFrame = currentTable("users")

  def posts: DataFrame =
    SocialOps.riFilter(currentTable("posts"), "username", users, "username")

  def engagements: DataFrame = {
    val e = currentTable("engagements")
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
    SocialOps.dangling(currentTable("engagements"),
      "postId", posts.select(col("id")), "id")

  // ----------------------------------------------------------- time travel

  /** Committed snapshot versions of a table, ascending. Depth is
    * bounded by the vacuum horizon: the current generation plus the
    * one it replaced (see [[swapIn]]) — the single-table form of a
    * table format's retention window.
    */
  def snapshotVersions(table: String): Seq[Long] =
    listVersions(table).filter(v => committed(v._2)).map(_._1).sorted

  /** Time-travel read of one committed snapshot version (raw rows —
    * RI filtering is a load-time semantic of the *current* tables, not
    * of a historical snapshot).
    */
  def tableAt(table: String, version: Long): DataFrame = {
    require(snapshotVersions(table).contains(version),
      s"$table has no committed version $version " +
        s"(retained: ${snapshotVersions(table).mkString(", ")})")
    CsvIngest.readFlatFile(spark, path(table) + ".v" + version, schemaOf(table))
  }

  private def schemaOf(table: String): StructType = table match {
    case "users"       => userSchema
    case "posts"       => postSchema
    case "engagements" => engagementSchema
    case other => throw new IllegalArgumentException(s"unknown table $other")
  }

  // ---------------------------------------------------------------- writes

  /** `updatePostViews` (buzzdb_lab1.cpp:603-631): clamp-at-zero delta
    * on one post. Returns false (no write) when the id is absent,
    * like the reference. Rewrite mode persists via write-new + atomic
    * swap (faithful to the reference's O(table) rewrite,
    * buzzdb_lab1.cpp:1032-1059); changelog mode appends a one-row
    * RESOLVED row image as a committed delta — write cost independent
    * of table size — and compacts every `compactAfter` deltas. Both
    * modes read through the merge-on-read view, so they compose
    * freely on one table.
    */
  def updatePostViews(postId: Int, delta: Int): Boolean =
    writeLock.synchronized {
      val current = currentTable("posts")
      val hit = current.filter(col("id") === postId).collect()
      if (hit.isEmpty) false
      else if (!changelogWrites) {
        val updated = current.withColumn("views",
          when(col("id") === postId,
            greatest(lit(0), col("views") + delta)).otherwise(col("views")))
        swapIn(updated, "posts")
        true
      } else {
        // the delta stores the resolved, per-update-clamped row image
        // (NOT a raw increment: summing increments would clamp once at
        // read time — "views 2, -10, +3" must end at 3, not 0)
        val r = hit.head
        val one = spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(
            r.getAs[Int]("id"), r.getAs[String]("content"),
            r.getAs[String]("username"),
            math.max(0, r.getAs[Int]("views") + delta))),
          postSchema)
        // next sequence past EVERY delta dir, committed or orphaned —
        // never overwrite a dir a concurrent/killed writer may own
        val m = listDeltas("posts").map(_._1).maxOption.getOrElse(0L) + 1L
        val target = new Path(dir,
          s"${new Path(tablePath("posts")).getName}.d$m")
        one.coalesce(1).write.mode(SaveMode.Overwrite)
          .option("header", true).csv(target.toString)
        if (listDeltas("posts").count(d => committed(d._2)) >= compactAfter)
          swapIn(currentTable("posts"), "posts")
        true
      }
    }

  /** `addEngagementRecord` batch form (buzzdb_lab1.cpp:639-673):
    * FK-validate fresh rows (silently dropping violations, as the
    * reference does) and append — appends add new part files, no
    * rewrite of existing data.
    */
  def addEngagementRecords(fresh: DataFrame): Unit = writeLock.synchronized {
    // appends add part files to the current snapshot *directory*
    // (per-file commit is atomic, and Spark readers ignore the
    // in-flight `_temporary` dir); a fixture that starts as a single
    // CSV file is first converted to a version directory
    val cur = new Path(tablePath("engagements"))
    if (fs.exists(cur) && fs.getFileStatus(cur).isFile)
      swapIn(CsvIngest.readFlatFile(spark, cur.toString, engagementSchema),
        "engagements")
    val valid = SocialOps.riFilter(
      SocialOps.riFilter(fresh, "postId", posts.select(col("id")), "id"),
      "username", users, "username")
    // semi-joins move the key column first; restore schema order so
    // every part file in the table directory has the same header
    valid.select(engagementSchema.fields.map(f => col(f.name)).toSeq: _*)
      .write.mode(SaveMode.Append)
      .option("header", true).csv(tablePath("engagements"))
  }

  /** `updateUserName` (buzzdb_lab1.cpp:775-963): cascading rename
    * across all three tables. Per-table swaps are atomic; cross-table
    * atomicity is out of scope exactly as in the reference (a crash
    * between file rewrites leaves the same inconsistency window,
    * SURVEY.md §3.3). Returns false if the id is absent, true (no-op)
    * if the name is unchanged.
    */
  def updateUserName(userId: Int, newName: String): Boolean =
    writeLock.synchronized {
    val u = currentTable("users")
    val row = u.filter(col("id") === userId).select("username").collect()
    if (row.isEmpty) return false
    val oldName = row.head.getString(0)
    if (oldName == newName) return true

    val renameCol = (c: String) =>
      when(col(c) === oldName, lit(newName)).otherwise(col(c)).as(c)
    swapIn(u.withColumn("username",
      when(col("id") === userId, lit(newName)).otherwise(col("username"))),
      "users")
    val p = currentTable("posts")
    swapIn(p.select(col("id"), col("content"), renameCol("username"),
      col("views")), "posts")
    val e = currentTable("engagements")
    swapIn(e.select(col("id"), col("postId"), renameCol("username"),
      col("type"), col("comment"), col("timestamp")), "engagements")
    true
    }

  /** Commit a new table snapshot: materialize the complete next
    * version directory (Spark's commit protocol writes `_SUCCESS`
    * last — that marker IS the publish), then vacuum everything except
    * the new version and the one it replaced. Retaining one
    * generation lets a reader that resolved the previous snapshot
    * finish its (lazy) scan while this commit lands; a reader older
    * than one full commit must re-resolve — the documented vacuum
    * horizon. Crash at any point leaves either the old snapshot
    * current (uncommitted orphan ignored by readers, vacuumed by the
    * next writer) or the new one fully committed — there is no
    * in-between state, because nothing that readers resolve is ever
    * renamed or deleted inside the commit.
    */
  private def swapIn(updated: DataFrame, table: String): Unit = {
    val versions = listVersions(table)
    val cur = new Path(tablePath(table)).getName
    val next = new Path(
      path(table) + ".v" + (versions.map(_._1).maxOption.getOrElse(0L) + 1L))
    updated.write.mode(SaveMode.Overwrite).option("header", true)
      .csv(next.toString)
    // compare by directory NAME: listed paths are scheme-qualified
    // (file:/...), constructed ones are bare — string-equality on full
    // paths would vacuum the snapshot we mean to keep
    val keep = Set(next.getName, cur)
    versions.foreach { case (_, v) =>
      if (!keep.contains(v.getName)) fs.delete(v, true)
    }
    // deltas ride their base snapshot's retention: a reader that
    // resolved (cur, cur's deltas) keeps both until the NEXT commit,
    // exactly like the base itself; deltas of vacuumed generations go
    // with them. The just-committed `next` starts delta-free.
    val root = new Path(dir)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      val di = name.lastIndexOf(".d")
      if (name.startsWith(s"$table.csv") && di > 0 &&
          name.length > di + 2 && name.drop(di + 2).forall(_.isDigit) &&
          !keep.contains(name.take(di)))
        fs.delete(st.getPath, true)
    }
    val legacy = new Path(path(table))
    if (!keep.contains(legacy.getName) && fs.exists(legacy))
      fs.delete(legacy, true)
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
