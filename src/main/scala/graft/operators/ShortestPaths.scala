package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded Bellman-Ford single-source shortest paths — the weighted
  * complement of [[Bfs]]: hop count answers "how far", this answers
  * "how cheap", and a cheap 2-hop route must beat an expensive direct
  * edge (asserted in ShortestPathsSpec).
  *
  * Scale shape: each relaxation round is ONE key-equi join (tentative
  * distances against the src-partitioned edge list) plus ONE
  * min-aggregate — both partitioned by node id, map-side combinable,
  * no driver state. The edge list pays its exchange once; each round's
  * distance table is localCheckpoint-ed so lineage stays O(1) deep.
  * Integer weights keep every tentative distance bit-deterministic at
  * any parallelism (min of longs has no accumulation order).
  *
  * Rounds are a BUDGET, not a convergence guess: after H rounds the
  * table holds the exact cheapest cost among paths of ≤ H edges — a
  * well-defined answer on any graph (negative-cycle-proof, since
  * weights here are required positive) and the form a 1000-executor
  * run can afford to pin ahead of time.
  */
object ShortestPaths {

  /** (node, dist): cheapest total weight over paths of at most
    * `rounds` edges from `source`; unreachable-within-budget nodes are
    * absent. Weights must be positive (checked per-row at plan time
    * via a filter that drops non-positive edges defensively).
    */
  def distances(edges: DataFrame, src: String, dst: String, weight: String,
                source: Long, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val spark = edges.sparkSession
    val e = edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"),
        col(weight).cast("long").as("w"))
      .filter(col("w") > 0)
      .repartition(col("src"))
      .persist()
    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = true)
    var h = 0
    while (h < rounds) {
      val relaxed = e
        .join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(eager = true)
      h += 1
    }
    e.unpersist()
    dist
  }
}
