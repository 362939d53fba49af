package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of two
  * dimension columns so that range-partitioning on ONE derived key
  * gives locality in BOTH dimensions — the layout trick behind
  * Delta/Iceberg `ZORDER BY` and the reason a 100 TB table can skip
  * almost every file for a 2-D predicate.
  *
  * Why it matters at scale: min/max file statistics prune on the sort
  * key only. Sorting by (a, b) prunes a-predicates but leaves every
  * file's b-range spanning the whole domain; sorting by morton(a, b)
  * bounds EVERY file's extent in BOTH dimensions (a file covering
  * 1/k of the curve covers ~1/√k of each side), so a rectangle
  * predicate intersects O(perimeter) files instead of O(all of them).
  * ZOrderSpec quantifies exactly this against the linear layout.
  *
  * The key is built from plain shift/and/or built-ins — fully
  * codegen'd, no UDF — and is a pure function of the two values, so
  * the same arithmetic runs in DuckDB for the oracle.
  */
object ZOrder {

  /** Morton key of two non-negative ints using their low `bits` bits
    * each (callers bucket/clamp the raw domain first; bits ≤ 31).
    * Inputs are widened to long BEFORE shifting: int shift masks the
    * amount mod 32 and wraps at bit 31, so interleave positions ≥ 32
    * (any bits ≥ 16) would silently alias in int arithmetic. On long
    * the top term lands at bit 2·bits−1 ≤ 61 — no sign-bit contact
    * anywhere in [1,31].
    */
  def mortonKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The identical arithmetic as DuckDB SQL, for oracles: emits
    * `((a >> i) & 1) << 2i | ...` over the given column expressions.
    */
  def mortonSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"(((($a)::BIGINT >> $i) & 1) << ${2 * i})",
        s"(((($b)::BIGINT >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")::BIGINT")

  /** Rewrite `df` into `numFiles` range-partitions of the morton
    * curve, each internally sorted — the write-side layout pass. One
    * range exchange (sampled boundaries), no other shuffle; at 100 TB
    * this runs once per table/partition rewrite, and every subsequent
    * 2-D predicate pays only the pruned scan.
    */
  def cluster(df: DataFrame, a: String, b: String, bits: Int,
              numFiles: Int): DataFrame = {
    val keyed = df.withColumn("_z", mortonKey(col(a), col(b), bits))
    keyed.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z").drop("_z")
  }
}
