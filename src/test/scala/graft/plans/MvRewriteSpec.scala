package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.MaterializedView

/** The MV rewrite must (a) fire on exactly the supported aggregate
  * shapes, (b) preserve results bit-for-bit, and (c) refuse anything
  * its grain cannot answer.
  */
class MvRewriteSpec extends SparkSpec {

  private lazy val mvRoot = MaterializedView.install(spark, sf0001)

  test("supported aggregate is redirected to the MV and is exact") {
    mvRoot // force install BEFORE the plan below is optimized
    val q = Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty_d"), count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_d").cast("long").as("sum_qty"), col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
    val opt = q.queryExecution.optimizedPlan
    assert(MvRewrite.scansPath(opt, mvRoot),
      s"rewrite did not fire; optimized plan:\n$opt")

    // ground truth from the base table with the rule disabled
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    val base =
      try Tables(spark, sf0001, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").cast("long").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
        .collect().toSeq
      finally spark.experimental.extraOptimizations = saved
    assert(q.collect().toSeq == base)
  }

  test("global (no grouping) aggregate also rewrites") {
    val q = Tables(spark, sf0001, "lineitem")
      .agg(count(lit(1)).as("n_rows"))
    assert(MvRewrite.scansPath(q.queryExecution.optimizedPlan, mvRoot))
    assert(q.head().getLong(0) ==
      Tables(spark, sf0001, "lineitem").count())
  }

  test("unsupported shapes stay on the base scan") {
    val lineitemPath = s"$sf0001/lineitem.parquet"
    // aggregate the MV cannot answer (sum of a non-MV measure)
    val m1 = Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_discount").as("x"))
    assert(!MvRewrite.scansPath(m1.queryExecution.optimizedPlan, mvRoot))
    assert(MvRewrite.scansPath(m1.queryExecution.optimizedPlan, lineitemPath))
    // grouping key outside the MV dimension set
    val m2 = Tables(spark, sf0001, "lineitem")
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    assert(!MvRewrite.scansPath(m2.queryExecution.optimizedPlan, mvRoot))
    // a row-level filter blocks the match (grain cannot answer it)
    val m3 = Tables(spark, sf0001, "lineitem")
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!MvRewrite.scansPath(m3.queryExecution.optimizedPlan, mvRoot))
    // distinct aggregates are not answerable from partial sums
    val m4 = Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
    assert(!MvRewrite.scansPath(m4.queryExecution.optimizedPlan, mvRoot))
  }
}
