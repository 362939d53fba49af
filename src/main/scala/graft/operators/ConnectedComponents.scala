package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step that turns pairwise near-dup evidence ([[Dedup.jaccardPairs]],
  * [[Dedup.lshCandidates]], [[Similarity]] cosine pairs) into
  * dedup groups: every document in a component is a (transitive)
  * near-duplicate of the others, and the survivor is the component's
  * minimum id.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — each
  * round is two groupBy-shuffles over the edge list, and the edge set
  * contracts toward one star per component in O(log n) rounds. That
  * is the property that matters at 10⁹ nodes: no step ever
  * materializes a neighborhood larger than the data it contracts
  * (unlike naive transitive closure), no driver-side graph state, and
  * the per-round `localCheckpoint` keeps the plan from growing with
  * the iteration count. The reference's analog is the RI sweep's
  * fixpoint over referencing tables (buzzdb_lab1.cpp:1063-1070) —
  * iterate a set-shrinking rule until stable — scaled to graphs.
  */
object ConnectedComponents {

  /** One large-star round: every node u connects its strictly-larger
    * neighbors to the minimum of its closed neighborhood Γ⁺(u).
    * Keeps (v, m) with v > m, so edges always point downward.
    */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: orient every edge high→low, then every
    * node connects all its (smaller) neighbors — and itself — to the
    * smallest of them.
    */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val dir = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val grouped = dir.groupBy("u").agg(min(col("v")).as("m"))
    val reattach = dir.join(grouped, "u")
      .select(col("v").as("u"), col("m").as("v"))
    val self = grouped.select(col("u"), col("m").as("v"))
    reattach.union(self)
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Component assignment for every node that appears in `edges`:
    * returns (node, component) where component is the minimum node id
    * reachable. Nodes with no edges simply don't appear — union the
    * vertex universe with `component = node` afterwards if singleton
    * rows are wanted (see [[graft.queries.PipelineQueries]] q46).
    *
    * Convergence: the star rounds strictly contract the partial order
    * until every edge points directly at its component root; stability
    * is detected by comparing an order-independent checksum of the
    * edge set across rounds (one tiny aggregate per round — not a
    * full self-join diff). `maxRounds` bounds the loop defensively at
    * 64 (the paper's bound is O(log n) alternating rounds — 64 covers
    * any node-id universe a 64-bit key can address); hitting the bound
    * without a checksum fixpoint throws rather than silently returning
    * a still-contracting edge set as if it were the assignment.
    */
  def assign(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    var e = edges.select(col("u"), col("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var prev = (-1L, -1L)
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint()
      // order-independent fingerprint of the (distinct) edge set:
      // (count, xor of row hashes) — xor can't overflow under ANSI
      // arithmetic and duplicate rows can't cancel (the set is distinct)
      val row = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      val checksum = (row.getLong(0), row.getLong(1))
      stable = checksum == prev
      prev = checksum
      round += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds")
    // post-convergence the edge set IS the assignment — one (node,
    // root) edge per non-root node — plus each root assigned to itself
    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")).distinct())
  }

  /** Incremental component maintenance: fold a DELTA edge batch into
    * an existing assignment at CONTRACTED-graph cost instead of
    * re-clustering the world — the daily shape once near-dup
    * clusters/entity groups live as a persisted artifact and new
    * evidence arrives in batches. Each delta edge's endpoints map
    * through the existing assignment to their component roots (an
    * unseen node is its own root); edges whose endpoints land in the
    * SAME root are already absorbed and drop out, and the survivors
    * form the CONTRACTED graph — one node per existing component
    * touched, sized by the delta's merge activity, never by the
    * corpus. [[assign]] on that contracted graph yields the merge
    * map, and one final join relabels exactly the absorbed
    * components. Labels stay canonical (component = min reachable
    * node id): the merged label is the min over merged roots, and
    * min-of-mins is the global min.
    *
    * Returns (node, component) for every node in `baseAssign` or
    * `deltaEdges`.
    */
  def incremental(baseAssign: DataFrame, deltaEdges: DataFrame,
                  maxRounds: Int = 64): DataFrame = {
    // base feeds the two delta-endpoint lookups AND the final
    // relabel; callers pass a (possibly persisted/artifact-read)
    // frame — persist here so the lookups share one materialization
    val base = baseAssign.select(col("node"), col("component")).persist()
    val d = deltaEdges.select(col("u"), col("v"))
      .filter(col("u") =!= col("v")).distinct()
    val mapped = d
      .join(base.select(col("node").as("u"), col("component").as("cu")),
        Seq("u"), "left")
      .join(base.select(col("node").as("v"), col("component").as("cv")),
        Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("u"),
        coalesce(col("cv"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val newNodes = d.select(col("u").as("node"))
      .union(d.select(col("v").as("node")))
      .distinct()
      .join(base, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    val universe = base.unionByName(newNodes)
    if (mapped.isEmpty) return universe
    val mergeMap = assign(mapped, maxRounds)
      .select(col("node").as("component"), col("component").as("merged"))
    universe
      .join(mergeMap, Seq("component"), "left")
      .select(col("node"),
        coalesce(col("merged"), col("component")).as("component"))
  }
}
