package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.operators.SocialOps

/** The reference engine's full query/write surface (SURVEY.md §2),
  * re-expressed over the driver testdata with the role mapping of
  * FIXTURES.md §3 (users→customer, posts→orders, engagements→events).
  * Every query ends in a total order (with tie-breakers) so its output
  * hash-matches the DuckDB oracle.
  */
object ReferenceQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables(s, d, n)

  /** S1+J4+P1+P2+O1 — `getAllUserComments` analog
    * (buzzdb_lab1.cpp:682-716): one user's events of one type,
    * projected and totally ordered. The single-key predicate reaches
    * the parquet scan; the 1-row user side is broadcast.
    */
  val userComments: Q = Q(
    (s, d) => SocialOps.userActivity(
      t(s, d, "events"), t(s, d, "customer"),
      col("c_custkey") === 7, lit("click"),
      "user_id", "c_custkey", "event_type",
      Seq("event_id", "props"), Seq("event_id", "props")),
    """SELECT e.event_id, e.props FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |WHERE c.c_custkey = 7 AND e.event_type = 'click'
      |ORDER BY e.event_id, e.props""".stripMargin)

  /** J5+A1 — `getAllEngagementsByLocation` analog
    * (buzzdb_lab1.cpp:729-763): semi-join events to a user cohort,
    * conditional dual count in one pass (map-side partial agg).
    */
  val cohortCounts: Q = Q(
    (s, d) => SocialOps.activityByCohort(
      t(s, d, "events"), t(s, d, "customer"),
      col("c_mktsegment") === "BUILDING",
      "user_id", "c_custkey", "event_type",
      Seq("purchase" -> "n_purchase", "click" -> "n_click")),
    """SELECT CAST(count_if(e.event_type = 'purchase') AS BIGINT) AS n_purchase,
      |       CAST(count_if(e.event_type = 'click') AS BIGINT) AS n_click
      |FROM events e
      |WHERE e.user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin)

  /** J6 — RI sweep (`check_no_dangling_post_ids`,
    * buzzdb_lab1.cpp:1063-1070) as anti-join counts over two FK edges.
    */
  val riSweep: Q = Q(
    (s, d) => {
      val e = SocialOps.dangling(
        t(s, d, "events"), "user_id", t(s, d, "customer"), "c_custkey")
        .agg(count("*").as("n_dangling_events"))
      val l = SocialOps.dangling(
        t(s, d, "lineitem"), "l_orderkey", t(s, d, "orders"), "o_orderkey")
        .agg(count("*").as("n_dangling_lineitems"))
      e.crossJoin(l)
    },
    """SELECT
      |  (SELECT count(*) FROM events e
      |     WHERE e.user_id NOT IN (SELECT c_custkey FROM customer))::BIGINT AS n_dangling_events,
      |  (SELECT count(*) FROM lineitem l
      |     WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders))::BIGINT AS n_dangling_lineitems""".stripMargin)

  /** S1+J2+J3 — the load pipeline's double semi-join RI filter
    * (buzzdb_lab1.cpp:207-306) at scale: child table filtered by two
    * parents, then grouped cardinalities (the loader's per-table
    * counts).
    */
  val loadRiGroups: Q = Q(
    (s, d) => {
      val li = SocialOps.riFilter(
        SocialOps.riFilter(
          t(s, d, "lineitem"), "l_orderkey", t(s, d, "orders"), "o_orderkey"),
        "l_partkey", t(s, d, "part"), "p_partkey")
      li.groupBy("l_returnflag").agg(count("*").as("n"))
        .orderBy("l_returnflag")
    },
    """SELECT l_returnflag, count(*)::BIGINT AS n FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders)
      |  AND l_partkey IN (SELECT p_partkey FROM part)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

  /** A2+A4 — distinct-count assertions (buzzdb_lab1.cpp:1099-1114):
    * exact `countDistinct` (at 100 TB the engine exposes
    * `approx_count_distinct`, see AnalyticsQueries.approxDistinct).
    */
  val distinctCounts: Q = Q(
    (s, d) => t(s, d, "orders").agg(
      countDistinct("o_custkey").as("n_authors"),
      count("*").as("n_orders")),
    """SELECT count(DISTINCT o_custkey)::BIGINT AS n_authors,
      |       count(*)::BIGINT AS n_orders FROM orders""".stripMargin)

  /** A3 — group-by count (buzzdb_lab1.cpp:1239-1244): engagements per
    * user.
    */
  val groupCounts: Q = Q(
    (s, d) => t(s, d, "events").groupBy("user_id")
      .agg(count("*").as("n_events")).orderBy("user_id"),
    """SELECT user_id, count(*)::BIGINT AS n_events FROM events
      |GROUP BY user_id ORDER BY user_id""".stripMargin)

  /** J1 — PK point lookup (buzzdb_lab1.cpp:612-617): single-key
    * predicate pushed to the scan (partition pruning at scale).
    */
  val pointLookup: Q = Q(
    (s, d) => t(s, d, "orders").filter(col("o_orderkey") === 19)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey"),
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey = 19 ORDER BY o_orderkey""".stripMargin)

  /** W1 — `updatePostViews` batch form with the reference's
    * clamp-at-zero semantic (buzzdb_lab1.cpp:619-622).
    */
  val updateClamp: Q = Q(
    (s, d) => SocialOps.updateClamped(
      t(s, d, "orders"), col("o_orderstatus") === "F",
      "o_totalprice", lit(-150000d))
      .select("o_orderkey", "o_totalprice").orderBy("o_orderkey"),
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'F'
      |       THEN greatest(0, o_totalprice + -150000)
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  /** W2 — `addEngagementRecord` batch form (buzzdb_lab1.cpp:639-673):
    * FK-validate a derived batch of new rows (every third key escapes
    * the parent domain and must be silently dropped), append, count.
    */
  val validatedAppend: Q = Q(
    (s, d) => {
      val ev = t(s, d, "events").select("event_id", "user_id", "event_type")
      val fresh = ev.select(
        (col("event_id") + lit(10000000L)).as("event_id"),
        (col("user_id") * 3).as("user_id"),
        col("event_type"))
      SocialOps.validatedAppend(ev, fresh,
        Seq((t(s, d, "customer"), "c_custkey", "user_id")))
        .groupBy("event_type").agg(count("*").as("n"))
        .orderBy("event_type")
    },
    """WITH fresh AS (
      |  SELECT event_id + 10000000 AS event_id, user_id * 3 AS user_id, event_type
      |  FROM events),
      |valid AS (
      |  SELECT * FROM fresh WHERE user_id IN (SELECT c_custkey FROM customer)),
      |appended AS (
      |  SELECT event_type FROM events UNION ALL SELECT event_type FROM valid)
      |SELECT event_type, count(*)::BIGINT AS n FROM appended
      |GROUP BY event_type ORDER BY event_type""".stripMargin)

  /** W3 — `updateUserName` cascade (buzzdb_lab1.cpp:775-963): rename
    * one user; the denormalized name every order displays reflects the
    * rename after the cascade join.
    */
  val cascadingRename: Q = Q(
    (s, d) => {
      val users = SocialOps.renamed(
        t(s, d, "customer"), "c_custkey", "c_name", lit(7), "renamed_user_7")
      t(s, d, "orders")
        .join(users, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name").orderBy("o_orderkey")
    },
    """SELECT o_orderkey,
      |  CASE WHEN c_custkey = 7 THEN 'renamed_user_7' ELSE c_name END AS c_name
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin)

  /** U1 — `set_intersection` RI verification (buzzdb_lab1.cpp:1129-1138):
    * users ∩ authors.
    */
  val intersectKeys: Q = Q(
    (s, d) => t(s, d, "customer").select(col("c_custkey").as("custkey"))
      .intersect(t(s, d, "orders").select(col("o_custkey").as("custkey")))
      .orderBy("custkey"),
    """SELECT c_custkey AS custkey FROM customer
      |INTERSECT
      |SELECT o_custkey FROM orders
      |ORDER BY custkey""".stripMargin)

  /** Anti-join as a user-facing operator: users with no authored
    * orders (the `except` dual of [[intersectKeys]]).
    */
  val inactiveUsers: Q = Q(
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey"),
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin)

  /** O1 + LIMIT — top-k by measure with tie-break (Spark plans
    * TakeOrderedAndProject — no global sort materialized).
    */
  val topK: Q = Q(
    (s, d) => t(s, d, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10).select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey")),
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)

  /** Window extension (SURVEY.md §2.5 — absent in the reference): top-3
    * orders per user by ranking window.
    */
  val windowRank: Q = Q(
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) sub
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)

  val all: Map[String, Q] = Map(
    "q01_user_comments"    -> userComments,
    "q02_cohort_counts"    -> cohortCounts,
    "q03_ri_sweep"         -> riSweep,
    "q04_load_ri_groups"   -> loadRiGroups,
    "q05_distinct_counts"  -> distinctCounts,
    "q06_group_counts"     -> groupCounts,
    "q07_point_lookup"     -> pointLookup,
    "q08_update_clamp"     -> updateClamp,
    "q09_validated_append" -> validatedAppend,
    "q10_cascading_rename" -> cascadingRename,
    "q11_intersect_keys"   -> intersectKeys,
    "q12_inactive_users"   -> inactiveUsers,
    "q13_topk"             -> topK,
    "q14_window_rank"      -> windowRank)
}
