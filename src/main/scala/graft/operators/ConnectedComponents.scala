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
}
