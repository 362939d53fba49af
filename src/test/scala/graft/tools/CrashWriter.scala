package graft.tools

import org.apache.spark.sql.SparkSession

import graft.FlatFileEngine

/** Subprocess body for the process-level crash test
  * (CrashRecoverySpec): hammer single-row view updates through the
  * versioned-snapshot commit protocol until the parent SIGKILLs this
  * JVM at an arbitrary point — possibly mid-materialization, the
  * window the reference's fork()+kill test exercises
  * (buzzdb_lab1.cpp:1604-1648). Prints one line per committed update
  * so the parent can pace the kill.
  */
object CrashWriter {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[2]").appName("graft-crash-writer")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    val engine = new FlatFileEngine(spark, dir)
    var i = 0
    while (true) {
      engine.updatePostViews(19, 1)
      i += 1
      // stdout line per commit — the parent counts these
      println(s"committed $i")
      Console.out.flush()
    }
  }
}
