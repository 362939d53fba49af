package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference engine's query/write surface re-expressed as generic,
  * composable DataFrame transformations.
  *
  * Reference: `buzzdb_lab1.cpp` (see /root/repo/SURVEY.md §2). Each op
  * here is the Spark-native form of one of the reference's hard-coded
  * methods; the hand-rolled hash-set semi-joins, point lookups, and
  * whole-file rewrites become Catalyst `leftsemi`/`leftanti` joins,
  * pushed-down key predicates, and batch column rewrites. All ops are
  * lazy DataFrame-in/DataFrame-out — no driver-side collection — so
  * they distribute unchanged on a real cluster.
  */
object SocialOps {

  /** Referential-integrity load filter (buzzdb_lab1.cpp:207-306): keep
    * only child rows whose FK value exists in the parent's key column.
    * The reference builds an `unordered_set` of parent keys and probes
    * per row; Spark's `leftsemi` join is the same hash build/probe,
    * chosen per-side by Catalyst (broadcast when the parent fits,
    * shuffled-hash/sort-merge otherwise) — which is exactly what makes
    * it survive a 100 TB parent where an in-memory set cannot.
    */
  def riFilter(child: DataFrame, childKey: String,
               parent: DataFrame, parentKey: String): DataFrame =
    child.join(
      parent.select(col(parentKey).as(childKey)),
      Seq(childKey), "leftsemi")

  /** RI violation sweep (`check_no_dangling_post_ids`,
    * buzzdb_lab1.cpp:1063-1070): child rows whose FK has no parent —
    * the anti-join dual of [[riFilter]].
    */
  def dangling(child: DataFrame, childKey: String,
               parent: DataFrame, parentKey: String): DataFrame =
    child.join(
      parent.select(col(parentKey).as(childKey)),
      Seq(childKey), "leftanti")

  /** `getAllUserComments` (buzzdb_lab1.cpp:682-716): point-lookup a
    * user, scan that user's engagements of one type, project, total
    * order. The single-key filter is pushed into the parquet scan
    * (partition/row-group pruning at scale); the 1-row user side is
    * broadcast by Catalyst.
    */
  def userActivity(engagements: DataFrame, users: DataFrame,
                   userKey: Column, activityType: Column,
                   joinKeyEng: String, joinKeyUser: String,
                   typeCol: String,
                   projection: Seq[String], order: Seq[String]): DataFrame =
    engagements
      .join(users.filter(userKey).select(col(joinKeyUser).as(joinKeyEng)),
        Seq(joinKeyEng))
      .filter(col(typeCol) === activityType)
      .select(projection.map(col): _*)
      .orderBy(order.map(col): _*)

  /** `getAllEngagementsByLocation` (buzzdb_lab1.cpp:729-763): semi-join
    * engagements against the users in one location, then a single-pass
    * conditional aggregate (the reference's `likes++ / comments++`
    * branch becomes `count_if`, which Catalyst executes with map-side
    * partial aggregation — one shuffle of pre-aggregated rows).
    */
  def activityByCohort(engagements: DataFrame, users: DataFrame,
                       cohort: Column,
                       joinKeyEng: String, joinKeyUser: String,
                       typeCol: String, types: Seq[(String, String)]): DataFrame = {
    val filtered = riFilter(
      engagements, joinKeyEng, users.filter(cohort), joinKeyUser)
    val aggs = types.map { case (t, alias) =>
      count_if(col(typeCol) === t).as(alias)
    }
    filtered.agg(aggs.head, aggs.tail: _*)
  }

  /** `updatePostViews` batch form (buzzdb_lab1.cpp:603-631): apply a
    * delta to a numeric column with the reference's clamp-at-zero
    * semantic (`new_views = max(0, views + delta)`,
    * buzzdb_lab1.cpp:619-622), for every row matching `cond`. The
    * reference rewrites the whole CSV per single-row update (O(table)
    * per write); this is the same rewrite amortized over a whole batch
    * of updates in one pass — the design `BASELINE.json:7` mandates.
    */
  def updateClamped(df: DataFrame, cond: Column,
                    valueCol: String, delta: Column): DataFrame =
    df.withColumn(valueCol,
      when(cond, greatest(lit(0d), col(valueCol) + delta))
        .otherwise(col(valueCol)))

  /** `addEngagementRecord` batch form (buzzdb_lab1.cpp:639-673):
    * FK-validate a batch of new child rows against each (parentDf,
    * parentKey, childKey) constraint — silently dropping violations,
    * as the reference does — then append to the existing table.
    */
  def validatedAppend(existing: DataFrame, fresh: DataFrame,
                      fks: Seq[(DataFrame, String, String)]): DataFrame = {
    val valid = fks.foldLeft(fresh) { case (df, (parent, pKey, cKey)) =>
      riFilter(df, cKey, parent, pKey)
    }
    existing.unionByName(valid)
  }

  /** `updateUserName` cascade (buzzdb_lab1.cpp:775-963): rename an
    * entity and propagate the new name to every referencing table.
    * The reference streams three whole-file rewrites under a global
    * lock; here each table is one `when(...)` column rewrite, and the
    * denormalized name is recovered via join — immutable snapshots
    * replace the lock.
    */
  def renamed(users: DataFrame, idCol: String, nameCol: String,
              targetId: Column, newName: String): DataFrame =
    users.withColumn(nameCol,
      when(col(idCol) === targetId, lit(newName)).otherwise(col(nameCol)))
}
