package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation primitives for hot keys. AQE's skew-join handling
  * (enabled in every session here) splits oversized partitions at
  * runtime, but two shapes still need plan-level salting at 100 TB:
  * a single hot GROUP in an aggregation — one reducer owns the key no
  * matter how AQE splits scan partitions — and a skewed join key
  * against a side too big to broadcast.
  *
  * The salt is `spark_partition_id() mod salts`: deterministic within
  * an execution, free to compute, and it spreads a hot key exactly as
  * widely as its rows are spread over input partitions. Final results
  * never depend on salt values (they are merged away), so the
  * operators are drop-in equivalents of their unsalted forms — the
  * spec asserts that equivalence.
  */
object Salting {

  private def salt(n: Int) = pmod(spark_partition_id(), lit(n)).as("_salt")

  /** Two-phase count: groupBy (key, salt) partials — a hot key spreads
    * over up to `salts` reducers — then merge per key.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int): DataFrame =
    df.withColumn("_salt", salt(salts))
      .groupBy(keys.map(col) :+ col("_salt"): _*)
      .agg(count("*").as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("n"))

  /** Two-phase sum over `valueCol`, same shape as [[saltedCount]]. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int): DataFrame =
    df.withColumn("_salt", salt(salts))
      .groupBy(keys.map(col) :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as(s"sum_$valueCol"))

  /** Salted equi-join: the (big, skewed) left side gets a salt, the
    * right side is replicated once per salt value, and the join key
    * becomes (key, salt) — a hot left key's rows land on up to
    * `salts` reducers instead of one. Right-side cost: `salts`×
    * replication, so use it when the right side is too big to
    * broadcast but far smaller than the left.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val l = left.withColumn("_salt", salt(salts))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
