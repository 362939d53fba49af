package graft.operators

import org.apache.spark.sql.SparkSession

/** The operational face of the persisted-index fleet: ONE call that
  * inventories every family root's committed state — the report a
  * compliance officer (or an on-call engineer) asks for before and
  * after a [[PurgeCascade]] run. All eight families share the same
  * on-disk conventions ([[VersionedDirs]] versioned generations,
  * `deltas/batch-*` append logs, `_folded.json`/`_purged.json`
  * ledgers, [[Tombstones]] logs), so the inspection is one generic
  * walk per root:
  *
  *   - `generation` / `nGenerations` — the serving head and how many
  *     committed versions still exist (1 after a vacuum; >1 means
  *     prior generations are still pinned-readable);
  *   - `nPendingDeltas` — LIVE (unconsumed) append-log dirs: work the
  *     next mergeCompact will fold;
  *   - `nFoldedTags` / `nPurgedTags` — the absorption ledgers: how
  *     many batch tags redeliveries will absorb, and (sketch) how
  *     many purge fingerprints a re-run will absorb;
  *   - `nTombstones` — committed deletes not yet compacted away: a
  *     non-zero count after a purge cascade means a compaction failed
  *     partway and must be re-run;
  *   - `nBans` — the durable re-ingestion ban set (never resets;
  *     after a `purge(ban = true)` cascade this equals the cumulative
  *     deletion-request ids the family will refuse forever);
  *   - `nRows` / `nBytes` — the head generation's physical footprint
  *     (every parquet dataset under it, layout-agnostic: memo+merges,
  *     cells, postings, band keys alike).
  *
  * Cost: filesystem listings plus one count per head-generation
  * dataset — metadata-scale, safe to run at audit cadence. Reports
  * are point-in-time snapshots (no locks taken): a root mid-commit
  * shows its last committed state, the same read-isolation every
  * probe has.
  */
object IndexCatalog {

  /** One family root's committed state. */
  final case class Entry(
      family: String,
      root: String,
      generation: Option[String],
      nGenerations: Int,
      nPendingDeltas: Int,
      nFoldedTags: Int,
      nPurgedTags: Int,
      nTombstones: Long,
      nBans: Long,
      nRows: Long,
      nBytes: Long)

  private def ledger(genPath: String, name: String): Set[String] = {
    val f = new java.io.File(genPath, name)
    if (!f.isFile) Set.empty
    else """"([^"]+)"""".r.findAllMatchIn(
      java.nio.file.Files.readString(f.toPath)).map(_.group(1)).toSet
  }

  private def deltaDirs(root: String): Seq[java.io.File] =
    Option(new java.io.File(root, "deltas").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch-") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .toSeq

  /** Every parquet DATASET directory under `dir`: the distinct parent
    * dirs of its part files (a generation may hold several datasets —
    * memo/ + merges/, or partition subdirs of one dataset, whose
    * common parent is the dataset).
    */
  private def datasetDirs(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(dir)
      .filter(f => f.getName.endsWith(".parquet") ||
        (f.getName.startsWith("part-") && !f.getName.endsWith(".crc")))
      .map { f =>
        // partition dirs (k=v) roll up to the dataset root so one
        // partitioned dataset reads as ONE frame
        var p = f.getParentFile
        while (p.getName.contains("=")) p = p.getParentFile
        p
      }
      .distinct
  }

  private def bytesUnder(dir: java.io.File): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else f.length()
    walk(dir)
  }

  /** Inspect one family root (see class doc for the fields). */
  def inspect(spark: SparkSession, family: String, root: String): Entry = {
    val gen = VersionedDirs.resolve(root)
    val folded = gen.map(ledger(_, "_folded.json")).getOrElse(Set.empty)
    val purged = gen.map(ledger(_, "_purged.json")).getOrElse(Set.empty)
    val pending = deltaDirs(root).filterNot(d => folded(d.getName))
    val nTomb = Tombstones.get(spark, root).map(_.count()).getOrElse(0L)
    val nBans = Bans.get(spark, root).map(_.count()).getOrElse(0L)
    val (rows, bytes) = gen.fold((0L, 0L)) { g =>
      val dir = new java.io.File(g)
      val n = datasetDirs(dir)
        .map(d => spark.read.parquet(d.getAbsolutePath).count()).sum
      (n, bytesUnder(dir))
    }
    Entry(family, root, gen,
      nGenerations = VersionedDirs.versionsOf(root).size,
      nPendingDeltas = pending.size,
      nFoldedTags = folded.size,
      nPurgedTags = purged.size,
      nTombstones = nTomb,
      nBans = nBans,
      nRows = rows, nBytes = bytes)
  }

  /** The fleet report: one [[Entry]] per (family, root), in input
    * order — pairs naturally with the Seq of [[PurgeCascade.Target]]s
    * a cascade ran over.
    */
  def report(spark: SparkSession,
             roots: Seq[(String, String)]): Seq[Entry] =
    roots.map { case (family, root) => inspect(spark, family, root) }

  /** [[report]] over a cascade's own targets. */
  def reportTargets(spark: SparkSession,
                    targets: Seq[PurgeCascade.Target]): Seq[Entry] =
    report(spark, targets.map(t => (t.family, t.root)))
}
