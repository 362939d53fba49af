package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic main (optimization rounds): run selected queries under
  * the bench's exact session and report, per query, wall seconds plus
  * the JOB / STAGE / TASK counts a timed window spends — the number
  * that separates a job-count-bound query (many tiny actions: beam
  * rounds, probe collects, localCheckpoints) from a compute-bound one.
  * Guide §1: decide whether time goes to scheduling or work before
  * touching either. Usage: `graft.Profile <sfDir> [q1,q2,...]`
  * (prefix match, default all). Prints one line per query:
  * `name  sec=...  warm_sec=...  jobs=N stages=N tasks=N`
  * (counts from the warm run — the bench's min-of-3 is warm).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.lift(1).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    })
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith)) }
    selected.foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"$name  ERROR ${e.getClass.getSimpleName}: " +
            e.getMessage.take(120)) }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // settle the listener queue so the warm window's counts are its own
      Thread.sleep(100)
      val (j0, s0, t0c) = (jobs.get, stages.get, tasks.get)
      val warm = once()
      Thread.sleep(100)
      println(f"$name%-34s sec=$cold%7.2f warm=$warm%7.2f " +
        s"jobs=${jobs.get - j0} stages=${stages.get - s0} " +
        s"tasks=${tasks.get - t0c}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(50)
    }
    spark.stop()
  }
}
