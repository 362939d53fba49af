package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Count-min sketch — the mergeable frequency sketch (Cormode &
  * Muthukrishnan '05): d hash rows × w cells of counters; an item
  * increments one cell per row, and its estimate is the MIN over its
  * d cells. Estimates never undercount, and overcount by ≤ ε·N
  * (ε = e/w) with probability 1 − δ (δ = e^−d) — the standard tool
  * for heavy-hitter / hot-key detection over a stream or corpus too
  * large to count exactly (the detection side of the [[Salting]]
  * mitigation: find the keys that need salting without a full
  * groupBy over the key domain).
  *
  * Scale shape: the BUILD is one groupBy over (row, cell) — map-side
  * partial counts into a table of at most d·w rows, bounded and tiny
  * regardless of corpus size, so the aggregate's reduce state is
  * O(d·w) per executor. Sketches MERGE by summing cells (same
  * groupBy), which is what makes per-partition / per-day partials
  * composable — asserted in CountMinSpec. Estimates broadcast the
  * finished sketch and probe it with the same hash family.
  *
  * Determinism: the hash family is [[Hashing.seeded]]'s affine
  * universal family over one md5 — (A(r)·h32(x) + B(r)) mod P mod w,
  * exact in int64 (A < 2²⁰ keeps A·h32 + B < 2⁵³) — so every cell,
  * and therefore every estimate, is bit-identical on both engines and
  * at any parallelism.
  */
object CountMin {

  /** The first `depth` members of the affine hash family as a LITERAL
    * array of (r, a, b) structs — exploding it is a pure map-side
    * projection (d rows per item, no join of any kind), which both
    * keeps the build plan join-free and makes the same code legal
    * under Structured Streaming (see [[graft.streaming.EventStream
    * .hotKeySketch]]). Shared with the oracle via [[paramsSqlValues]].
    */
  def paramsArray(depth: Int): Column =
    array((0 until depth).map(r => struct(
      lit(r).as("r"), lit(Hashing.mult(r)).as("a"),
      lit(Hashing.add(r)).as("b"))): _*)

  /** DuckDB VALUES list of [[params]], one definition for both engines. */
  def paramsSqlValues(depth: Int): String =
    (0 until depth).map(r => s"(${r}, ${Hashing.mult(r)}, ${Hashing.add(r)})")
      .mkString(", ")

  /** Cell index of `term` in row (a, b): the seeded 32-bit hash mod w. */
  def cellOf(term: Column, a: Column, b: Column, width: Int): Column =
    ((Hashing.h32(term) * a + b) % Hashing.P) % width

  def cellOfSql(term: String, a: String, b: String, width: Int): String =
    s"(((${Hashing.h32Sql(term)}) * $a + $b) % ${Hashing.P}) % $width"

  /** Build the sketch over one string column: (r, cell, cnt), at most
    * depth·width rows. Items are weighted 1 each (a weight column
    * would drop into the same aggregate). Join-free: the param family
    * explodes as a literal.
    */
  def build(items: DataFrame, term: String, depth: Int, width: Int): DataFrame =
    items.select(col(term), explode(paramsArray(depth)).as("p"))
      .groupBy(col("p.r").as("r"),
        cellOf(col(term), col("p.a"), col("p.b"), width).as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `queries`' terms against a finished sketch:
    * min over the term's d cells; a never-incremented cell reads 0
    * (left join), so absent terms estimate 0.
    */
  def estimate(sketch: DataFrame, queries: DataFrame, term: String,
               depth: Int, width: Int): DataFrame =
    queries.select(col(term), explode(paramsArray(depth)).as("p"))
      .select(col(term), col("p.r").as("r"),
        cellOf(col(term), col("p.a"), col("p.b"), width).as("cell"))
      .join(broadcast(sketch), Seq("r", "cell"), "left")
      .groupBy(col(term))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
