package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Breadth-first hop levels from a source node — the traversal member
  * of the graph family ([[PageRank]] ranks, [[ConnectedComponents]]
  * partitions, [[Triangles]] counts; this one answers "how far").
  *
  * Scale shape: per hop, ONE key-equi join of the edge list against
  * the current frontier plus one anti-join against the visited set —
  * both partitioned by node id, no global state, no driver-side
  * frontier. The edge list is repartitioned on src once and persisted;
  * every round reuses that exchange. Each round's new level is
  * localCheckpoint-ed (eagerly) so the lineage stays O(1) deep instead
  * of O(hops), the same discipline as the other iterative operators.
  * Early exit when a frontier empties: the emptiness probe rides the
  * checkpoint's materialization, not an extra scan.
  *
  * Frontier-size monotonicity is NOT assumed: dense graphs saturate in
  * 2–3 hops, chains run the full budget — both are fine because each
  * round's work is |frontier ⨝ edges|, never |V|².
  */
object Bfs {

  /** (node, hop) for every node reachable from `source` in ≤ maxHops
    * hops; hop = shortest-path length (BFS invariant: a node joins the
    * visited set the first round it is seen, and never again).
    */
  def levels(edges: DataFrame, src: String, dst: String, source: Long,
             maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val e = edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .repartition(col("src"))
      .persist()
    var visited = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("hop"))
      .localCheckpoint(eager = true)
    var frontier = visited.select("node")
    var h = 1L
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val next = e
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "leftanti")
        .withColumn("hop", lit(h))
        .localCheckpoint(eager = true)
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.unionByName(next)
        frontier = next.select("node")
      }
      h += 1
    }
    e.unpersist()
    visited
  }
}
