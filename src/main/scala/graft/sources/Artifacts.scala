package graft.sources

import java.io.File

/** Fingerprint-keyed publish-once for derived artifacts under
  * `java.io.tmpdir` (the q164/q165 roundtrip copies; the same
  * discipline [[graft.operators.DedupIndex]] applies to its versioned
  * index): the root name embeds the source table's
  * [[TableStats.fingerprint]], so a rerun against unchanged data finds
  * the committed root and reads, while any data change mints a fresh
  * key and re-publishes.
  *
  * Publication is atomic the same way the engine's own table commits
  * are: the writer materializes into a writer-private staging dir
  * (Spark's own `_SUCCESS` lands inside it) and then RENAMES the
  * stage to the final root — a reader can observe only nothing or a
  * complete artifact, never a half-written mix, and when two JVMs
  * race the first rename wins while the loser discards its stage and
  * reads the winner's root. After a successful publish, roots of the
  * same prefix under superseded fingerprints are pruned (the q91
  * retention rule — without it every data refresh would leak a full
  * copy into tmp; in-flight `.stage-` dirs of other writers are left
  * alone).
  */
object Artifacts {

  /** Returns the committed root path, publishing it first if absent.
    * `write` receives the staging path and must produce a Spark-style
    * directory (with `_SUCCESS`) there. `tables` lists every source
    * table the artifact derives from — the root key changes when ANY
    * of them does.
    */
  def publishOnce(prefix: String, sfDir: String, tables: Seq[String])
                 (write: String => Unit): String = {
    require(tables.nonEmpty, "an artifact must derive from some table")
    val base = new File(sys.props("java.io.tmpdir"))
    val fp = tables
      .map(t => TableStats.fingerprint(s"$sfDir/$t").take(8)).mkString
    val keyPrefix = prefix + "-" + new File(sfDir).getName + "-"
    val name = keyPrefix + fp
    val root = new File(base, name)
    if (!new File(root, "_SUCCESS").exists()) {
      val stage = new File(base, name + ".stage-" +
        java.util.UUID.randomUUID().toString.take(8))
      write(stage.getAbsolutePath)
      if (!stage.renameTo(root)) deleteRec(stage) // lost the race: reader wins
      Option(base.listFiles()).getOrElse(Array.empty[File]).foreach { f =>
        if (f.getName.startsWith(keyPrefix) && f.getName != name &&
            !f.getName.contains(".stage-"))
          deleteRec(f)
      }
    }
    root.getAbsolutePath
  }

  private def deleteRec(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRec)
    f.delete()
    ()
  }
}
