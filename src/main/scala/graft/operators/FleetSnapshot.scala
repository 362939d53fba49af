package graft.operators

import java.io.File

/** Atomic cross-family snapshot of the persisted-index fleet — the
  * manifest commit of [[graft.FlatFileEngine]] generalized from its
  * three CSV tables to the index families. Each family already
  * commits its own generations atomically ([[VersionedDirs]]), but a
  * reader COMPOSING two artifacts (the q282 hybrid retrieval, q275
  * hard negatives) could observe generation skew: family A at its
  * post-purge generation, family B still pre-purge — a world no
  * single commit ever produced. A fleet snapshot closes that seam:
  * ONE `fleet.mN.json` rename pins a (family → committed generation)
  * vector, and a reader that resolves every family through the same
  * manifest sees one consistent world, no matter which commits land
  * while it reads.
  *
  * Commit protocol: write the vector to a staging file, atomic-rename
  * to `<fleetRoot>/_snapshots/fleet.mN.json` (rename(2) onto an
  * existing name fails, so two racing pinners cannot interleave —
  * the loser retries the next slot, the [[VersionedDirs.commit]]
  * discipline). [[pin]] resolves each family's CURRENT committed
  * generation; a crash mid-`pin` leaves an orphaned staging file and
  * no manifest — readers keep the previous snapshot.
  *
  * Scope: the snapshot pins committed GENERATIONS exactly — no delta
  * log, no tombstone or ban mask (those are post-snapshot state by
  * definition; the pinned-read paths are
  * [[SimIndex.probeTopKAt]] / [[PqIndex.probeTopKAt]]). Pins are
  * valid within each family's retention window ([[VersionedDirs]]
  * keeps the newest two committed generations): a deployment wanting
  * longer-lived snapshots raises retention — the manifest records
  * paths, it does not itself prevent vacuuming, exactly like a Hive
  * metastore pointer over object-store data.
  *
  * Scale: `pin` is a per-family directory listing plus one rename —
  * metadata cost, no Spark job, no data movement; a 100 TB fleet
  * pins in milliseconds.
  */
object FleetSnapshot {

  private def snapDir(fleetRoot: String): File =
    new File(fleetRoot, "_snapshots")

  private val Name = """fleet\.m(\d+)\.json""".r

  /** Committed snapshot numbers under `fleetRoot`, ascending. */
  def list(fleetRoot: String): Seq[Long] =
    Option(snapDir(fleetRoot).listFiles())
      .getOrElse(Array.empty[File]).toSeq
      .flatMap(f => f.getName match {
        case Name(n) if f.isFile => Some(n.toLong)
        case _ => None
      }).sorted

  /** Pin every family's CURRENT committed generation into the next
    * snapshot. `families` maps family name → family root (the dir
    * whose `index.vN` generations [[VersionedDirs]] manages).
    * Returns the committed snapshot number.
    */
  def pin(fleetRoot: String, families: Map[String, String]): Long =
    synchronized {
      val gens = families.toSeq.sortBy(_._1).map { case (f, r) =>
        f -> VersionedDirs.resolve(r).getOrElse(throw
          new IllegalStateException(
            s"family '$f' has no committed generation under $r"))
      }
      val dir = snapDir(fleetRoot); dir.mkdirs()
      val body = gens.map { case (f, g) =>
        s""""${f}":"${g.replace("\\", "\\\\").replace("\"", "\\\"")}""""
      }.mkString("{", ",", "}")
      val staging = new File(dir, s".staging-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.writeString(staging.toPath, body)
      var n = list(fleetRoot).maxOption.getOrElse(0L) + 1
      var target = new File(dir, s"fleet.m$n.json")
      var attempts = 0
      while (!staging.renameTo(target)) {
        attempts += 1
        require(attempts < 1000,
          s"snapshot rename failed repeatedly into $dir (not a slot race)")
        n += 1
        target = new File(dir, s"fleet.m$n.json")
      }
      n
    }

  /** The (family → pinned generation path) vector of snapshot `n`. */
  def at(fleetRoot: String, n: Long): Map[String, String] = {
    val f = new File(snapDir(fleetRoot), s"fleet.m$n.json")
    require(f.isFile, s"no committed snapshot m$n under $fleetRoot")
    parse(java.nio.file.Files.readString(f.toPath))
  }

  /** The newest committed snapshot, if any. */
  def current(fleetRoot: String): Option[(Long, Map[String, String])] =
    list(fleetRoot).lastOption.map(n => (n, at(fleetRoot, n)))

  private def parse(body: String): Map[String, String] =
    """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(body)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2)))
      .toMap

  // single pass: sequential replaces would turn the escaped form of
  // `\"` (backslash then quote: \\\") into `"` instead of `\"`
  private def unescape(s: String): String =
    """\\(.)""".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
}
