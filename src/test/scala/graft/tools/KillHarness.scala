package graft.tools

import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

/** Shared subprocess-SIGKILL harness of the process-level crash
  * suites ([[CrashRecoverySpec]], [[LexIndexCrashSpec]]): launch a
  * [[CrashWriter]] mode in a fresh JVM, count its `committed N`
  * stdout lines, SIGKILL it after `minCommits` — at whatever point in
  * its commit cycle the kill happens to land — and return the count.
  */
object KillHarness {

  def runAndKill(writerArgs: Seq[String], minCommits: Int): Int = {
    // inherit this JVM's classpath — portable across Spark install
    // locations and build layouts, unlike hardcoded paths
    val cp = System.getProperty("java.class.path")
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").toSeq
    val cmd = (Seq(s"${System.getProperty("java.home")}/bin/java") ++
      moduleOpts ++ Seq("-Xmx1g", "-cp", cp,
        "graft.tools.CrashWriter") ++ writerArgs).asJava
    val proc = new ProcessBuilder(cmd)
      .redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var commits = 0
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(180)
    var line = null: String
    while (commits < minCommits && System.nanoTime() < deadline &&
        { line = reader.readLine(); line != null }) {
      if (line.startsWith("committed ")) commits += 1
    }
    proc.destroyForcibly() // SIGKILL, no shutdown hooks, no cleanup
    assert(proc.waitFor(30, TimeUnit.SECONDS), "kill did not land")
    commits
  }
}
