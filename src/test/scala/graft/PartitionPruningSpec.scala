package graft

import org.apache.spark.sql.functions._

/** Partition-layout pruning: the other half of the 100 TB storage
  * story next to BucketingSpec. A date-partitioned table read with a
  * date predicate must resolve the predicate against the directory
  * layout (PartitionFilters) and never list, open, or count the
  * non-matching partitions in the scan.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write is pruned by a partition predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pruning").toString
    val events = Tables(spark, sf0001, "events")
      .withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").mode("overwrite").parquet(dir)
    val nDays = events.select("day").distinct().count()
    assert(nDays > 1, "fixture must span multiple days")

    val pruned = spark.read.parquet(dir)
      .filter(col("day") === lit("2024-01-05").cast("date"))

    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*2024-01-05[^\\]]*\\].*"),
      s"partition predicate not applied to layout:\n$scan")

    // the scan must OPEN only the matching partition's files — the
    // actual I/O claim. (`inputFiles` reports the base relation before
    // pruning, so the probe is the executed scan's numFiles metric.)
    val qe = pruned.queryExecution
    qe.executedPlan.execute().count() // run this exact plan
    val scanExec = qe.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val filesRead = scanExec.metrics("numFiles").value
    val allFiles = spark.read.parquet(dir).inputFiles.length
    assert(filesRead < allFiles, s"nothing pruned: read $filesRead of $allFiles")
    assert(filesRead == pruned.inputFiles.count(_.contains("day=2024-01-05")),
      s"read $filesRead files, expected only day=2024-01-05's")

    // and the values agree with a predicate over the unpartitioned table
    val expected = events.filter(col("day") === lit("2024-01-05").cast("date")).count()
    assert(pruned.count() == expected)
  }
}
