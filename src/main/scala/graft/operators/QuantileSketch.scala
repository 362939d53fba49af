package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable approximate-quantile sketch over positive integer
  * measures: a significant-digit histogram (the decimal cousin of
  * HdrHistogram's binary bucketing; same guarantee family as
  * Greenwald–Khanna / KLL but with deterministic, data-independent
  * buckets, which is what makes it ORDER-FREE mergeable — partial
  * per-bucket counts from any number of executors/days/shards sum
  * into the same sketch with zero rank error introduced by merging).
  *
  * Bucket rule: truncate each value to its top `sig` decimal digits —
  * `bucket_low = v - v mod 10^(digits(v) - sig)` — computed with
  * integer/string ops only (the power of ten is built by string
  * repeat, never float `pow`), so Spark and DuckDB produce
  * bit-identical buckets and the oracle hash-matches.
  *
  * Guarantees, for values spanning D decades:
  *  - bucket count ≤ 9·10^(sig-1) per decade · D — a few thousand
  *    rows regardless of input cardinality (the "sketch" property:
  *    state is O(1) in N, so a 100 TB scan reduces to KBs of partial
  *    aggregates, map-side combined);
  *  - quantile estimates carry relative error < 10^(1-sig) (the
  *    answer is a true bucket lower bound ≤ the true quantile value,
  *    within one bucket width of it): sig = 3 → < 1%.
  */
object QuantileSketch {

  /** Lower bound of `v`'s significant-digit bucket (`v` must be a
    * non-negative integer column).
    */
  def bucketLow(v: Column, sig: Int = 3): Column = {
    val pow10 = concat(lit("1"),
      call_function("repeat", lit("0"),
        greatest(length(v.cast("string")) - sig, lit(0)))).cast("long")
    v - (v % pow10)
  }

  /** The DuckDB twin of [[bucketLow]] over column expression `c` —
    * kept beside the Spark form so the two engines' bucket rule can
    * only change together (the [[graft.operators.HyperLogLog
    * .rhoCaseSql]] discipline; q80/q141/q163 all consume this).
    */
  def bucketLowSql(c: String, sig: Int = 3): String =
    s"$c - ($c % (('1' || repeat('0', " +
      s"greatest(length($c::VARCHAR) - $sig, 0)))::BIGINT))"

  /** The sketch itself: per-group per-bucket counts. This is the
    * mergeable/persistable form — union sketches from different
    * shards and re-`groupBy.sum` to merge.
    */
  def sketch(df: DataFrame, value: Column, groupCols: Seq[String],
             sig: Int = 3): DataFrame =
    df.groupBy((groupCols.map(col) :+
        bucketLow(value, sig).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Recover quantile estimates (in percent) from a sketch: for each
    * group and each q, the smallest bucket whose cumulative count
    * reaches ceil(q·N/100) — integer comparison `cum·100 ≥ q·N`, no
    * floats anywhere.
    */
  def quantiles(sk: DataFrame, groupCols: Seq[String],
                qPcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
    val cum = sk.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt"))
        .over(Window.partitionBy(groupCols.map(col): _*)))
    val session = sk.sparkSession
    import session.implicits._
    val qs = qPcts.toDF("q_pct")
    cum.join(broadcast(qs), col("cum") * 100 >= col("q_pct") * col("n"))
      .groupBy((groupCols.map(col) :+ col("q_pct")): _*)
      .agg(min(col("bucket")).as("est"))
  }
}
