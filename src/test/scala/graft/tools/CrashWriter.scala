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
      case "lexindex" =>
        // persisted-index lifecycle under the same real-kill regime:
        // tagged delta appends with a merge-compaction every third
        // append — the kill can land mid-append (staging dir),
        // mid-merge (staged generation), or between a merge's commit
        // and its delta deletion (the crash-leftover folded path).
        // One `committed` line per completed APPEND; batch i = the
        // deterministic docs [20+5i, 25+5i) (LexIndexCrashSpec
        // reconstructs the expected corpus from the count).
        import spark.implicits._
        import graft.operators.LexIndex
        val root = new java.io.File(dir, "lexroot").getAbsolutePath
        val base = (0 until 20)
          .map(j => (j.toLong, CrashWriter.doc(j))).toDF("doc_id", "text")
        if (LexIndex.resolve(root).isEmpty)
          LexIndex.publish(base, "doc_id", "text", root)
        while (true) {
          val batch = (20 + 5 * i until 25 + 5 * i)
            .map(j => (j.toLong, CrashWriter.doc(j)))
            .toDF("doc_id", "text")
          LexIndex.appendDelta(batch, "doc_id", "text", root, tag = s"t$i")
          if (i % 3 == 2) LexIndex.mergeCompact(spark, root)
          i += 1
          println(s"committed $i")
          Console.out.flush()
        }
    }
  }

  /** The shared deterministic corpus of the lexindex crash mode —
    * ONE definition for writer and asserting parent.
    */
  def doc(i: Int): String =
    s"alpha beta gamma delta epsilon zeta token$i filler${i * 7} " +
      s"word${i % 13} tail${i * 31} end$i"
}
