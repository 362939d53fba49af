package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling: repeatedly delete every node of degree
  * < k (and its edges), so the survivors are nodes with ≥ k
  * neighbors INSIDE the surviving set — the standard cohesion
  * primitive (Seidman 1983) and the degeneracy workhorse graph
  * libraries build on.
  *
  * Like the bounded Bellman-Ford (q154), rounds are a pinned BUDGET,
  * not a convergence guess: the result after H rounds is a
  * well-defined superset of the true k-core, equal to it as soon as
  * one round removes nothing (detected and early-exited, so a
  * converged run never pays unused rounds). Each round is one
  * degree aggregate (map-side combinable) plus two left-semi joins
  * against the ≤ |V|-row keep set — never a pairwise shape — and
  * lineage is cut per round with `localCheckpoint`, the same
  * discipline as PageRank/LPA/BFS. The edge frame shrinks
  * monotonically, so later rounds cost less, not more.
  *
  * `edges` must already contain both directions of every undirected
  * edge (the caller symmetrizes, as with [[Bfs]]/[[LabelPropagation]]);
  * degree is then the plain src-group count. Returns (node, deg):
  * every surviving node with its residual in-core degree.
  */
object KCore {

  def residual(edges: DataFrame, src: String, dst: String, k: Int,
               rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .localCheckpoint(eager = true)
    var n = e.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      val next = e.join(keep, Seq("src"), "leftsemi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "leftsemi")
        .localCheckpoint(eager = true)
      val n2 = next.count()
      // no edge lost ⇒ no node lost ⇒ every later round is a no-op
      stable = n2 == n
      e = next
      n = n2
      r += 1
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
