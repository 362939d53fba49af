package graft.sources

import java.io.File

/** Fingerprint-keyed publish-once for derived artifacts (the q164/q165
  * roundtrip copies, the q70/q79 graph pair tables; the same
  * discipline [[graft.operators.DedupIndex]] applies to its versioned
  * index): the root name embeds the source table's
  * [[TableStats.fingerprint]] plus the derivation's logic version, so
  * a rerun against unchanged data finds the committed root and reads,
  * while any data change OR derivation change mints a fresh key and
  * re-publishes.
  *
  * Publication is atomic the same way the engine's own table commits
  * are: the writer materializes into a writer-private staging dir
  * (Spark's own `_SUCCESS` lands inside it) and then RENAMES the
  * stage to the final root — a reader can observe only nothing or a
  * complete artifact, never a half-written mix, and when two JVMs
  * race the first rename wins while the loser discards its stage and
  * reads the winner's root. A rename that fails for any OTHER reason
  * (cross-device tmp, permissions) is surfaced as an error instead of
  * being mistaken for a lost race.
  *
  * Retention mirrors [[graft.operators.DedupIndex]]'s floor: the
  * current root plus the NEWEST other committed generation survive
  * (so a cross-JVM reader that resolved just before a re-publish is
  * never yanked); everything older — superseded fingerprints, stale
  * logic versions, and abandoned `.stage-` dirs past the orphan age —
  * is vacuumed.
  *
  * Where artifacts live is one engine config: the
  * `graft.artifacts.root` system property when set; else a
  * PRE-EXISTING writable `_derived` sibling of the data dir (the
  * co-located layout a production deployment provisions next to its
  * tables — never created implicitly, since the data dir's parent may
  * be read-only or not ours to write); else `java.io.tmpdir`.
  */
object Artifacts {

  /** Age after which an orphaned `.stage-` dir (a crashed writer's
    * leftover) is vacuumed by the next successful publish.
    */
  private val StageOrphanMs = 60L * 60 * 1000

  /** Count of ACTUAL artifact publishes in this JVM (key-hit reads
    * don't count) — every publish path ([[publishOnce]],
    * [[graft.operators.DedupIndex.publish]],
    * [[graft.operators.MixManifest.publish]]) notifies it, and
    * [[graft.Bench]] samples it around each timed execution so a
    * cold-box first run that paid an artifact build is MARKED in the
    * bench output instead of masquerading as probe cost.
    */
  val publishes = new java.util.concurrent.atomic.AtomicLong(0)

  def notePublish(): Unit = { publishes.incrementAndGet(); () }

  /** Count of KEY-HIT artifact resolves in this JVM — a committed
    * root found and read without publishing. The complement of
    * [[publishes]]: together they let [[graft.Bench]] stamp every
    * artifact-consuming query `cold` (published during the timed run)
    * or `warm` (probed an existing generation), so a regression in
    * probe cost can never hide behind publish ambiguity again (the
    * r8 q91 diagnosis gap).
    */
  val resolveHits = new java.util.concurrent.atomic.AtomicLong(0)

  def noteResolveHit(): Unit = { resolveHits.incrementAndGet(); () }

  /** The base directory artifacts for `sfDir`'s tables publish under.
    * Resolution order: `graft.artifacts.root` system property →
    * existing writable `_derived` sibling of the data dir → tmpdir.
    */
  def baseDir(sfDir: String): File =
    sys.props.get("graft.artifacts.root").map { p =>
      val f = new File(p); f.mkdirs(); f
    }.orElse {
      Option(new File(sfDir).getAbsoluteFile.getParentFile)
        .map(new File(_, "_derived"))
        .filter(d => d.isDirectory && d.canWrite)
    }.getOrElse(new File(sys.props("java.io.tmpdir")))

  /** The versioned root path for a derivation WITHOUT publishing —
    * the shared key scheme [[graft.operators.DedupIndex]] /
    * [[graft.operators.MixManifest]] callers use for their own
    * version-dir protocols. `logicVersion` is the bump-on-change
    * constant: editing the derivation must bump it so the stale
    * artifact under the old key is abandoned (and later vacuumed by
    * any publishOnce retention pass on the same prefix+sfDir).
    */
  def versionedRoot(prefix: String, sfDir: String, tables: Seq[String],
                    logicVersion: Int = 1): String = {
    require(tables.nonEmpty, "an artifact must derive from some table")
    val fp = tables
      .map(t => TableStats.fingerprint(s"$sfDir/$t").take(8)).mkString
    val name =
      s"$prefix-${new File(sfDir).getName}-v$logicVersion-$fp"
    new File(baseDir(sfDir), name).getAbsolutePath
  }

  /** Returns the committed root path, publishing it first if absent.
    * `write` receives the staging path and must produce a Spark-style
    * directory (with `_SUCCESS`) there. `tables` lists every source
    * table the artifact derives from — the root key changes when ANY
    * of them does; `logicVersion` when the derivation itself does.
    */
  def publishOnce(prefix: String, sfDir: String, tables: Seq[String],
                  logicVersion: Int = 1)
                 (write: String => Unit): String = {
    val base = baseDir(sfDir)
    val root =
      new File(versionedRoot(prefix, sfDir, tables, logicVersion))
    val name = root.getName
    // retention matches every generation of this derivation for this
    // sf dir — any fingerprint, any logic version
    val matchPrefix = s"$prefix-${new File(sfDir).getName}-"
    if (new File(root, "_SUCCESS").exists()) noteResolveHit()
    else {
      val stage = new File(base, name + ".stage-" +
        java.util.UUID.randomUUID().toString.take(8))
      notePublish()
      write(stage.getAbsolutePath)
      if (!stage.renameTo(root)) {
        // only a lost publish race leaves a committed root to fall
        // back to; anything else (cross-device tmp, permissions) must
        // surface, not send the caller to a path that doesn't exist
        deleteRec(stage)
        if (!new File(root, "_SUCCESS").exists())
          throw new IllegalStateException(
            s"artifact publish failed: rename of staging dir into " +
              s"$root failed and no committed root exists (base=" +
              s"$base — cross-device or permission problem?)")
      }
      val now = System.currentTimeMillis()
      val committed = (f: File) => new File(f, "_SUCCESS").exists()
      val siblings = Option(base.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.getName.startsWith(matchPrefix) && f.getName != name)
      // retention floor: the newest OTHER committed generation stays
      // for readers that resolved before this publish
      val keep = siblings
        .filter(f => !f.getName.contains(".stage-") && committed(f))
        .sortBy(-_.lastModified()).headOption.map(_.getName).toSet
      siblings.foreach { f =>
        if (f.getName.contains(".stage-")) {
          if (now - f.lastModified() > StageOrphanMs) deleteRec(f)
        } else if (!keep(f.getName)) deleteRec(f)
      }
    }
    root.getAbsolutePath
  }

  /** The ops view of the derived-state subsystem: one row per
    * artifact root under [[baseDir]] — prefix dirs published by
    * [[publishOnce]] plus versioned index roots ([[graft.operators
    * .DedupIndex]] / [[graft.operators.SimIndex]] / mix manifests),
    * with generation counts, the committed head, byte/file totals,
    * and any uncommitted residue (crash orphans, in-flight stages).
    * This is the cross-prefix vacuum audit: residue with an old
    * mtime is a crashed writer awaiting the next publish's retention
    * pass; many generations under one root means retention isn't
    * running. Driver-side listing of a BOUNDED namespace (artifact
    * roots, not data), so it stays cheap at any corpus size.
    */
  def inventory(sfDir: String): Seq[ArtifactInfo] = {
    val base = baseDir(sfDir)
    def sizeOf(f: File): (Long, Long) = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[File])
      kids.foldLeft(if (f.isFile) (f.length(), 1L) else (0L, 0L)) {
        case ((b, n), k) => val (kb, kn) = sizeOf(k); (b + kb, n + kn)
      }
    }
    val committed = (f: File) => new File(f, "_SUCCESS").exists()
    val all = Option(base.listFiles()).getOrElse(Array.empty[File])
      .filter(_.isDirectory).toSeq
      .filter(f => f.getName.startsWith("graft-"))
    // publishOnce stages as SIBLINGS (`<root>.stage-<uuid>`) of the
    // final root — fold them into their stem's residue count rather
    // than listing half-written stages as artifacts of their own
    val (stages, roots) = all.partition(_.getName.contains(".stage-"))
    val stageCount = stages
      .groupBy(f => f.getName.take(f.getName.indexOf(".stage-")))
      .map { case (k, v) => (k, v.size) }
    roots.sortBy(_.getName).map { root =>
      val kids = Option(root.listFiles()).getOrElse(Array.empty[File])
      val versions = kids
        .filter(f => f.isDirectory && f.getName.startsWith("index.v") &&
          f.getName.drop(7).forall(_.isDigit))
      val (bytes, files) = sizeOf(root)
      val orphanStages = stageCount.getOrElse(root.getName, 0)
      if (versions.nonEmpty) {
        // a versioned index root: generations are index.vN children,
        // in-flight stages are `.staging-` children
        val head = versions.filter(committed)
          .map(_.getName.drop(7).toLong).sorted.lastOption
        ArtifactInfo(root.getName, "versioned",
          versions.count(committed), head, bytes, files,
          nResidue = versions.count(!committed(_)) +
            kids.count(_.getName.startsWith(".staging-")))
      } else {
        // a publish-once root: the dir IS the single generation,
        // committed iff _SUCCESS landed before the rename
        ArtifactInfo(root.getName, "publish-once",
          if (committed(root)) 1 else 0,
          if (committed(root)) Some(1L) else None, bytes, files,
          nResidue = orphanStages)
      }
    }
  }

  final case class ArtifactInfo(name: String, kind: String,
                                nCommitted: Int, headVersion: Option[Long],
                                bytes: Long, nFiles: Long, nResidue: Int)

  private def deleteRec(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRec)
    f.delete()
    ()
  }
}
