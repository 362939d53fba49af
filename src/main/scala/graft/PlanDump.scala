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
    require(args.length >= 2,
      "usage: graft.PlanDump <sfDir> <queryName> — set SPARK_GRAFT_CPUS " +
        "to match the bench run being diagnosed (Bench's own default: 4)")
    val Array(sfDir, name) = args.take(2)
    // mirror graft.Bench's session EXACTLY — AQE coalesce/skew/broadcast
    // decisions depend on partition counts and sizes, so a dump at a
    // different parallelism can show a different join strategy than
    // the bench ran (the r11 q148 lesson: the '3x regression' was a
    // 4-cpu run compared against the driver's 32-cpu numbers)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // catalog DDL must never touch the working dir (Bench's rule)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-plandump").toString)
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
