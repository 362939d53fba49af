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
  * Commit protocol: write the vector to a staging file, then
  * create-exclusive move to `<fleetRoot>/_snapshots/fleet.mN.json`.
  * NOTE the manifest target is a FILE, and POSIX rename(2) silently
  * REPLACES an existing file (the [[VersionedDirs.commit]] rename
  * discipline only holds for non-empty DIRECTORIES) — so the commit
  * uses `Files.move` WITHOUT `REPLACE_EXISTING`, which throws
  * `FileAlreadyExistsException` on a taken slot; the loser retries
  * the next slot with its staging file intact. [[pin]] resolves each
  * family's CURRENT committed generation; a crash mid-`pin` leaves
  * an orphaned staging file and no manifest — readers keep the
  * previous snapshot.
  *
  * Scope: the snapshot pins committed GENERATIONS exactly — no delta
  * log, no tombstone or ban mask (those are post-snapshot state by
  * definition; the pinned-read paths are
  * [[SimIndex.probeTopKAt]] / [[PqIndex.probeTopKAt]]). Retention is
  * PIN-AWARE: [[VersionedDirs.retainLatestGenerations]] skips any
  * generation a live `fleet.mN.json` under the family root's parent
  * still references ([[pinnedGenerations]]), so a pinned read can
  * never dangle while its manifest lives; [[release]] deletes the
  * manifest and the next vacuum reclaims. Manifests hand-pointed at
  * OTHER directory trees (a fleet root that is not the family
  * root's parent) are metastore-style pointers only — the
  * [[IndexCatalog.pinnedSnapshots]] listing flags entries whose
  * pinned path no longer exists.
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

  /** Reserved manifest-key prefix for pinned corpus fingerprints —
    * filtered out of [[at]]'s family vector, surfaced by
    * [[corpusAt]].
    */
  private val CorpusKey = "_corpus:"

  /** Pin every family's CURRENT committed generation into the next
    * snapshot. `families` maps family name → family root (the dir
    * whose `index.vN` generations [[VersionedDirs]] manages).
    * `corpusTables` optionally names the source-table paths the
    * families were built from; their CURRENT content fingerprints
    * ([[graft.sources.TableStats.fingerprint]]) are recorded in the
    * manifest, so a pinned read that rescores against the raw corpus
    * can assert the table has not moved since the pin
    * ([[assertCorpus]]) — the corpus/index half of the skew the
    * family vector closes. Returns the committed snapshot number.
    */
  def pin(fleetRoot: String, families: Map[String, String],
          corpusTables: Map[String, String] = Map.empty): Long =
    synchronized {
      val gens = families.toSeq.sortBy(_._1).map { case (f, r) =>
        require(!f.startsWith(CorpusKey),
          s"family name '$f' collides with the reserved corpus prefix")
        f -> VersionedDirs.resolve(r).getOrElse(throw
          new IllegalStateException(
            s"family '$f' has no committed generation under $r"))
      }
      val corpus = corpusTables.toSeq.sortBy(_._1).map { case (t, p) =>
        s"$CorpusKey$t" -> graft.sources.TableStats.fingerprint(p)
      }
      val dir = snapDir(fleetRoot); dir.mkdirs()
      val body = (gens ++ corpus).map { case (f, g) =>
        s""""${f}":"${g.replace("\\", "\\\\").replace("\"", "\\\"")}""""
      }.mkString("{", ",", "}")
      val staging = new File(dir, s".staging-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.writeString(staging.toPath, body)
      var n = list(fleetRoot).maxOption.getOrElse(0L) + 1
      var attempts = 0
      var committed = -1L
      while (committed < 0) {
        attempts += 1
        require(attempts < 1000,
          s"snapshot commit failed repeatedly into $dir (not a slot race)")
        // create-exclusive: rename(2) REPLACES an existing file, so a
        // plain renameTo would let a cross-process race clobber a
        // committed manifest; move without REPLACE_EXISTING throws on
        // a taken slot and the loser advances to the next number
        try {
          java.nio.file.Files.move(staging.toPath,
            new File(dir, s"fleet.m$n.json").toPath)
          committed = n
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => n += 1
        }
      }
      committed
    }

  /** The (family → pinned generation path) vector of snapshot `n`. */
  def at(fleetRoot: String, n: Long): Map[String, String] =
    read(fleetRoot, n).filterNot(_._1.startsWith(CorpusKey))

  /** The (table → pinned corpus fingerprint) vector recorded by
    * snapshot `n` — empty for manifests pinned without corpus tables.
    */
  def corpusAt(fleetRoot: String, n: Long): Map[String, String] =
    read(fleetRoot, n).collect {
      case (k, v) if k.startsWith(CorpusKey) =>
        k.stripPrefix(CorpusKey) -> v
    }

  /** Assert that each table pinned by snapshot `n` still has the
    * fingerprint it had at pin time. `tables` maps table name → its
    * CURRENT path; tables the manifest did not pin are ignored.
    * Throws with "corpus moved since pin" on any mismatch — the
    * guard a pinned read that touches the RAW corpus (exact-vector
    * rerank, scoring joins) runs before pairing a pinned index with
    * the live table.
    */
  def assertCorpus(fleetRoot: String, n: Long,
                   tables: Map[String, String]): Unit = {
    val pinned = corpusAt(fleetRoot, n)
    tables.foreach { case (t, p) =>
      pinned.get(t).foreach { want =>
        val got = graft.sources.TableStats.fingerprint(p)
        if (got != want) throw new IllegalStateException(
          s"corpus moved since pin: table '$t' fingerprint $got != " +
            s"pinned $want (snapshot m$n under $fleetRoot)")
      }
    }
  }

  /** Release snapshot `n`: delete its manifest, so the next vacuum
    * ([[VersionedDirs.retainLatestGenerations]]) may reclaim
    * generations only this pin was keeping alive. Idempotent.
    */
  def release(fleetRoot: String, n: Long): Unit = {
    java.nio.file.Files.deleteIfExists(
      new File(snapDir(fleetRoot), s"fleet.m$n.json").toPath)
    ()
  }

  /** Generation paths pinned by any LIVE manifest under
    * `<parent-of-familyRoot>/_snapshots` — the set a pin-aware
    * vacuum ([[VersionedDirs.retainLatestGenerations]]) must not
    * reclaim. Fleet layouts place family roots directly under the
    * fleet root (`<fleetRoot>/<family>/index.vN`), so the family
    * root's parent IS the fleet root; standalone roots (no parent
    * `_snapshots` dir) return empty and retention proceeds
    * unchanged. A malformed manifest contributes nothing rather than
    * failing the vacuum (report-what-is-there doctrine).
    */
  def pinnedGenerations(familyRoot: String): Set[String] = {
    val parent = Option(new File(familyRoot).getAbsoluteFile.getParentFile)
    parent.toSeq.flatMap { p =>
      val root = p.getAbsolutePath
      list(root).flatMap { n =>
        try at(root, n).values
        catch { case _: Exception => Nil }
      }
    }.map(new File(_).getAbsolutePath).toSet
  }

  private def read(fleetRoot: String, n: Long): Map[String, String] = {
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
