package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer arithmetic — the graph
  * companion to [[ConnectedComponents]]: influence/centrality over an
  * entity graph (link graphs for crawl prioritization, author graphs
  * for source weighting in a training-data pipeline).
  *
  * Determinism stance: rank mass is an integer number of units
  * (SCALE = 10¹²), every division is integer `div`, and all operands
  * are non-negative — so Spark's truncate-toward-zero `div` and
  * DuckDB's floor `//` agree on every intermediate, and the result is
  * bit-identical on any engine at any parallelism. (Float PageRank
  * would converge to the same ORDER but never hash-match across
  * engines.) With damping d = 85/100:
  *
  *   r₀(v)    = SCALE div N
  *   share(u) = r(u) div outdeg(u)
  *   r'(v)    = (15·(SCALE div N)) div 100
  *              + (85·Σ_{u→v} share(u)) div 100
  *
  * Scale shape per iteration: one join of the rank table against the
  * edge list keyed on src, one groupBy dst — both shuffles keyed on
  * node id, nothing driver-side, no O(N²). N reaches the plan as a
  * broadcast 1-row aggregate (not a collected scalar), so the whole
  * computation stays one declarative plan. Truncation loses ≤ 1 unit
  * per division (≤ outdeg·10⁻¹² relative), irrelevant for ranking.
  *
  * Dangling nodes (outdeg 0): with `redistributeDangling` their rank
  * mass is shared equally across all nodes each round — the standard
  * sink-redistribution fix, as one more broadcast 1-row aggregate
  * (Σ rank over outdeg-less nodes), each node receiving
  * `dangling div N` extra inflow before damping. Off by default: the
  * default recurrence stays bit-identical for densified graphs (q70's
  * oracle replays it), where the dangling sum is zero anyway and the
  * extra aggregate would be pure cost.
  */
object PageRank {

  val SCALE = 1000000000000L // 1e12 rank units

  /** `iters` damped rounds over `(src, dst)` edges (dedup'd here);
    * returns (node, rank) for every node appearing as src or dst.
    */
  def ranks(edges: DataFrame, src: String, dst: String,
            iters: Int, redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"at least one iteration, got $iters")
    // one scan feeds edges/nodes/outdeg in every iteration — persist,
    // callers clear via spark.catalog.clearCache() (Verify/Bench do)
    // distinct shuffles on (src, dst); the extra repartition pins the
    // CACHED edge list on hash(src) so every round's share-join reuses
    // the partitioning instead of re-exchanging the (corpus-sized)
    // edge side per iteration — one edge shuffle total, not one per
    // round, which is the dominant cost at real graph sizes
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst")).distinct()
      .repartition(col("src")).persist()
    // nodes/outdeg feed every round — persist so each is one shuffle
    // total, not one per round (callers clear via catalog.clearCache)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    var r = nodes.crossJoin(broadcast(nn))
      .select(col("node"), expr(s"$SCALE div n_nodes").as("r"))
    for (_ <- 1 to iters) {
      val shares = r.join(outdeg, col("node") === col("src"))
        .select(col("src"), expr("r div outdeg").as("share"))
      val inflow = e.join(shares, Seq("src"))
        .groupBy("dst").agg(sum("share").as("inflow"))
      // sink redistribution: the rank mass sitting on outdeg-0 nodes,
      // as a broadcast 1-row aggregate (same discipline as n_nodes —
      // never a collected scalar), split evenly into every node's
      // pre-damping inflow
      val base = if (!redistributeDangling) nodes.crossJoin(broadcast(nn))
        else {
          val dangling = r.join(outdeg, col("node") === col("src"), "left_anti")
            .agg(coalesce(sum("r"), lit(0L)).as("dangling"))
          nodes.crossJoin(broadcast(nn)).crossJoin(broadcast(dangling))
        }
      val inflowExpr =
        if (redistributeDangling) "coalesce(inflow, 0L) + dangling div n_nodes"
        else "coalesce(inflow, 0L)"
      r = base
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"), expr(
          s"(15 * ($SCALE div n_nodes)) div 100" +
            s" + (85 * ($inflowExpr)) div 100").as("r"))
        // checkpoint each round's (tiny, node-sized) rank table: the
        // executed plan stays O(1) in iteration count instead of
        // replanning/re-shuffling the whole prefix — same practice as
        // ConnectedComponents' rounds and VectorQuantizer's fit
        .localCheckpoint()
    }
    r
  }

  /** Personalized PageRank: the teleport mass returns to ONE source
    * node instead of spreading uniformly, so ranks measure proximity
    * TO the source (the recommendation / similar-entities form of
    * PageRank). Same integer recurrence, partitioning discipline and
    * per-round checkpointing as [[ranks]]; r₀ concentrates all mass
    * at the source. Deterministic: exact integer arithmetic
    * throughout, identical at any executor count.
    */
  def personalizedRanks(edges: DataFrame, src: String, dst: String,
                        iters: Int, source: Long): DataFrame = {
    require(iters >= 1, s"at least one iteration, got $iters")
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst")).distinct()
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val teleport = 15L * SCALE / 100 // exact integer constant
    var r = nodes.select(col("node"),
      when(col("node") === source, lit(SCALE)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val shares = r.join(outdeg, col("node") === col("src"))
        .select(col("src"), expr("r div outdeg").as("share"))
      val inflow = e.join(shares, Seq("src"))
        .groupBy("dst").agg(sum("share").as("inflow"))
      r = nodes
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          (when(col("node") === source, lit(teleport)).otherwise(lit(0L)) +
            expr("(85 * coalesce(inflow, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    r
  }
}
