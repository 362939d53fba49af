package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print a query's FINAL (AQE-resolved) physical
  * plan at an arbitrary scale factor — the bench-time twin of
  * PlanAuditSpec's sf0.001 `plan()` helper, for chasing plan flips
  * that only materialize at larger inputs (join-strategy boundaries,
  * AQE coalesce decisions). Usage:
  * `graft.PlanDump <sfDir> <queryName>`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    // mirror graft.Bench's session so the dumped plan is the plan the
    // bench actually ran (AQE + skew-join change join strategies)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    // executedPlan AFTER execution = the AQE-final plan
    // scalastyle:off println
    println(df.queryExecution.executedPlan.toString)
    // scalastyle:on println
    spark.stop()
  }
}
