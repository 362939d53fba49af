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
    val mode = if (args.length > 1) args(1) else "views"
    val spark = SparkSession.builder()
      .master("local[2]").appName("graft-crash-writer")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    var i = 0
    mode match {
      case "views" =>
        val engine = new FlatFileEngine(spark, dir)
        while (true) {
          engine.updatePostViews(19, 1)
          i += 1
          // stdout line per commit — the parent counts these
          println(s"committed $i")
          Console.out.flush()
        }
      case "cascade" =>
        // manifest-mode cascading renames: the kill can land anywhere
        // in materialize×3 → manifest rename → vacuum — the window
        // whose all-or-nothing behavior ManifestSpec asserts with
        // constructed states and this test with a real dead JVM
        val engine = new FlatFileEngine(spark, dir, manifestCommits = true)
        while (true) {
          engine.updateUserName(1, s"name$i")
          i += 1
          println(s"committed $i")
          Console.out.flush()
        }
    }
  }
}
