package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** The PERSISTED half of incremental similarity search — the ANN twin
  * of [[DedupIndex]]: the historical corpus's multi-table
  * hyperplane-LSH key set ([[graft.plans.MultiTableBuckets]], q74's
  * at-scale family) materialized as a parquet table partitioned by a
  * hash bucket of (tbl, bucket), so a daily query batch probes ONLY
  * the partition directories its keys touch — publish the index once
  * per re-index (amortized), probe per batch at batch cost. The
  * in-plan [[Similarity.multiTableTopK]] stays as the
  * oracle-checkable form; this is the production artifact.
  *
  * Each key row CARRIES ITS VECTOR (index_id, tbl, bucket, ivec): the
  * write-once-read-many trade every ANN index makes (FAISS stores
  * codes in its inverted lists for the same reason) — T copies of
  * each vector on disk buy a probe that is ONE pruned join with
  * scoring inline, instead of keys-join + a second corpus-wide join
  * to fetch vectors by id (which re-touches the full corpus per
  * batch, forfeiting the batch-cost property). T is the recall
  * budget's table count ([[graft.functions.VectorFunctions.mtTables]],
  * single digits for corpus-derived r), so the amplification is
  * bounded and chosen, not accidental.
  *
  * The (r, T) the index was built with are FROZEN into the artifact
  * (a probe must key its queries with the index's own parameters, not
  * parameters re-derived from a grown corpus): publish writes them as
  * an `_params.json` sidecar (underscore-prefixed so file readers
  * skip it) next to `_SUCCESS`, and [[probeTopK]]
  * reads them back — the caller never re-derives.
  *
  * Layout/commit/retention are [[VersionedDirs]]' versioned-dir
  * protocol, identical to [[DedupIndex]].
  */
object SimIndex {

  /** Partition-dir count — a layout constant (64 for test-visible
    * pruning; thousands at 100 TB), the same bounded-by-design class
    * as [[DedupIndex.NumBuckets]].
    */
  val NumBuckets = 64

  /** Stable partition bucket of a key row. */
  def pbucketOf(tbl: Column, bucket: Column): Column =
    pmod(xxhash64(tbl, bucket), lit(NumBuckets.toLong)).cast("int")

  /** Highest committed index version under `root`, if any. */
  def resolve(root: String): Option[String] = VersionedDirs.resolve(root)

  /** Publish `corpus`'s multi-table LSH key set (with vectors
    * attached) as the next committed version under `root`: one row
    * per (id, tbl) keyed by the packed r-bit hyperplane bucket,
    * hash-partitioned into [[NumBuckets]] directories and sorted by
    * (tbl, bucket) within each file. Returns the committed path.
    */
  def publish(corpus: DataFrame, id: String, vec: String,
              bits: Int, tables: Int, root: String): String = synchronized {
    VersionedDirs.commit(root) { staging =>
      keyRows(corpus, id, vec, bits, tables)
        .repartition(col("pbucket"))
        .sortWithinPartitions("tbl", "bucket")
        .write.partitionBy("pbucket").mode("overwrite")
        .parquet(staging)
      val params = new java.io.File(staging, "_params.json")
      java.nio.file.Files.writeString(params.toPath,
        s"""{"bits":$bits,"tables":$tables}""")
      ()
    }
  }

  /** The frozen (bits, tables) of the newest committed index. */
  def params(root: String): (Int, Int) =
    paramsAt(resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root")))

  /** The frozen params of ONE resolved generation — internal reads
    * pin the path so a probe never keys with a racing re-publish's
    * (r, T) against this generation's buckets.
    */
  private def paramsAt(genPath: String): (Int, Int) = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(genPath, "_params.json"))
    def field(k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(
          s"malformed _params.json in $genPath: $txt"))
        .group(1).toInt
    (field("bits"), field("tables"))
  }

  // ------------------------------------------------------ deletes
  //
  // Identical semantics to [[DedupIndex]]'s delete support (shared
  // [[Tombstones]] log): deletes commit in O(deletes), probes
  // anti-join the committed set immediately, [[mergeCompact]] drops
  // the rows physically and resets the log, and [[vacuumOld]] is the
  // post-grace compliance step.

  /** Record `ids` as deleted — hidden from every probe immediately,
    * removed physically at the next [[mergeCompact]].
    */
  def addTombstones(spark: SparkSession, ids: DataFrame, idCol: String,
                    root: String): String = synchronized {
    Tombstones.add(spark, ids, idCol, root)
  }

  /** The committed tombstone set, if any. */
  def tombstones(spark: SparkSession, root: String): Option[DataFrame] =
    Tombstones.get(spark, root)

  /** Durably ban vector `ids` — the re-ingestion closure ([[Bans]]):
    * tombstones reset at [[mergeCompact]], so a deleted user's
    * embedding re-uploaded by a backfill would re-enter the LSH
    * tables; banned ids are gated at [[appendDelta]] (their key rows
    * never commit), masked at [[probeTopK]], scrubbed at
    * [[mergeCompact]].
    */
  def addBans(spark: SparkSession, ids: DataFrame, idCol: String,
              root: String): String = synchronized {
    Bans.add(spark, ids, idCol, root)
  }

  /** The committed ban set, if any. */
  def bans(spark: SparkSession, root: String): Option[DataFrame] =
    Bans.get(spark, root)

  /** Drop every index generation but the newest committed one — the
    * post-grace step of a compliance purge.
    */
  def vacuumOld(root: String): Unit = synchronized {
    VersionedDirs.retainLatestGenerations(root, keep = 1)
  }

  // ------------------------------------------------------ delta appends
  //
  // Daily growth without daily re-index: a new batch lands as an
  // append-log delta (one `batch-*` dir per append — the LSM L0
  // shape), keyed with the BASE index's frozen (r, T) so base and
  // delta keys stay joinable. Probes read base ∪ deltas with the
  // same bucket pruning applied to each; a periodic merge-compaction
  // folds every delta into the next base generation and clears the
  // log. Appends are batch-cost, probes pay one extra root per
  // unmerged delta — the knob is the compaction cadence.

  private def deltaDir(root: String): java.io.File =
    new java.io.File(root, "deltas")

  /** The committed delta roots (append order is irrelevant — deltas
    * are disjoint key sets by construction of the caller's batches).
    */
  def deltas(root: String): Seq[String] =
    Option(deltaDir(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch-") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getAbsolutePath).sorted.toSeq

  /** Delta roots NOT yet consumed by the generation at `genPath` —
    * the read set every consumer must use: a delta named in
    * `_folded.json` is already in the generation's rows, and worse,
    * it may PREDATE a purge the generation applied — reading the
    * leftover dir in the crash window between a merge's commit and
    * its delta cleanup would resurface purged vectors through every
    * probe.
    */
  private def liveDeltas(root: String, genPath: String): Seq[String] = {
    val folded = foldedOf(genPath)
    deltas(root).filterNot(p => folded(new java.io.File(p).getName))
  }

  /** Delta dir NAMES already folded into the generation at `genPath`
    * — the durable fold record ([[FirstSeenIndex]]'s closure, carried
    * forward CUMULATIVELY across generations). "Max-aggregated scores
    * are idempotent, a double-read is harmless" only holds while no
    * DELETE happened in between: an at-least-once redelivery of a
    * tagged append arriving after a purge + [[mergeCompact]]
    * (tombstones reset) would re-commit the delta and resurrect the
    * purged vec_ids' band rows through every probe. The sidecar is
    * what lets [[folded]] answer "already in the generation" after
    * the delta dir itself is gone.
    */
  private def foldedOf(genPath: String): Set[String] = {
    val f = new java.io.File(genPath, "_folded.json")
    if (!f.isFile) Set.empty
    else """"([^"]+)"""".r.findAllMatchIn(
      java.nio.file.Files.readString(f.toPath)).map(_.group(1)).toSet
  }

  /** True when an append tagged `tag` has already committed — live in
    * the delta log, or folded into the resolved generation (its name
    * in `_folded.json`). The folded half is the purge-race closure:
    * see [[foldedOf]].
    */
  def folded(root: String, tag: String): Boolean = {
    val live = new java.io.File(
      new java.io.File(deltaDir(root), s"batch-$tag"), "_SUCCESS").isFile
    live || resolve(root).exists(p => foldedOf(p)(s"batch-$tag"))
  }

  /** Append `corpus` as a new delta batch, keyed with the base
    * index's frozen (r, T). Commit is the same stage-then-rename
    * protocol; a crashed append leaves an uncommitted `.staging-`
    * dir that probes skip and the next merge vacuums. `tag` names the
    * batch (an at-least-once producer supplies its batch identity):
    * a redelivered tag is ABSORBED — returned without writing —
    * whether the delta is still live or was already folded into a
    * committed generation, so a replay arriving after a
    * purge + [[mergeCompact]] cannot resurrect purged vectors.
    */
  def appendDelta(corpus: DataFrame, id: String, vec: String,
                  root: String,
                  tag: String = java.util.UUID.randomUUID().toString)
      : String = synchronized {
    val genPath = resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root"))
    val (bits, tables) = paramsAt(genPath)
    val dr = deltaDir(root); dr.mkdirs()
    val target = new java.io.File(dr, s"batch-$tag")
    if (new java.io.File(target, "_SUCCESS").isFile)
      return target.getAbsolutePath // tagged append already committed
    // already folded into a committed generation and its dir deleted:
    // ABSORB — re-committing would resurrect purged vec_ids when a
    // purge ran between the append and this redelivery (see foldedOf)
    if (foldedOf(genPath)(s"batch-$tag")) return genPath
    graft.sources.Artifacts.notePublish()
    val staging = new java.io.File(dr,
      s".staging-${java.util.UUID.randomUUID()}")
    // the ingestion gate of the ban closure: a banned vector's key
    // rows never enter the delta (see [[addBans]]); an ENTIRELY
    // banned batch commits nothing at all — an empty partitioned
    // delta dir would have no parquet footers and break every later
    // read of the append log
    val bn = Bans.get(corpus.sparkSession, root)
    // batch-scoped cache: the emptiness check and the write below are
    // two actions over the same anti-joined frame — persist so the
    // broadcast gate's batch scan runs once, not twice
    val gated = bn
      .map(b => corpus.join(
        b.select(col("index_id").cast("long").as(id)), Seq(id),
        "left_anti").persist())
      .getOrElse(corpus)
    try {
      // EMPTY commits nothing, whatever emptied it — fully banned OR
      // empty at the source: an empty partitionBy write leaves no
      // parquet footers and would break every later append-log read
      // (the GraphIndex:171 hazard class, closed fleet-wide in r15)
      if (gated.isEmpty) return genPath
      keyRows(gated, id, vec, bits, tables)
        .repartition(col("pbucket"))
        .sortWithinPartitions("tbl", "bucket")
        .write.partitionBy("pbucket").mode("overwrite")
        .parquet(staging.getAbsolutePath)
    } finally if (bn.isDefined) { gated.unpersist(); () }
    require(staging.renameTo(target),
      s"delta append rename failed into $dr")
    target.getAbsolutePath
  }

  /** Fold every committed delta into the next base generation and
    * clear the append log. Pure row union over existing artifacts —
    * no re-hashing; params carry over unchanged.
    */
  def mergeCompact(spark: SparkSession, root: String): String = synchronized {
    val deltaSnap = deltas(root)
    val basePath = resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root"))
    val (bits, tables) = paramsAt(basePath)
    // a crash leftover a predecessor folded but never deleted must
    // not re-enter: its rows are in the base AND it may predate a
    // purge (see [[foldedOf]])
    val folded0 = foldedOf(basePath)
    val liveSnap = deltaSnap
      .filterNot(p => folded0(new java.io.File(p).getName))
    val all0 = (basePath +: liveSnap)
      .map(p => spark.read.parquet(p))
      .reduce(_.unionByName(_))
    // fold pending deletes into the rewrite (pure row filter, no
    // re-hashing), then reset the log
    val all1 = tombstones(spark, root)
      .map(t => all0.join(t, Seq("index_id"), "left_anti"))
      .getOrElse(all0)
    // banned rows that slipped in pre-ban scrub physically here
    val all = bans(spark, root)
      .map(b => all1.join(b, Seq("index_id"), "left_anti"))
      .getOrElse(all1)
    // cumulative fold record: prior generations' names carry forward
    // so a tag redelivered ANY number of merges later still absorbs
    // (names are ~bytes per batch — the ledger grows with batch
    // count, never with data)
    val foldedNames = (folded0 ++
      liveSnap.map(p => new java.io.File(p).getName)).toSeq.sorted
    val path = VersionedDirs.commit(root) { st =>
      all.repartition(col("pbucket"))
        .sortWithinPartitions("tbl", "bucket")
        .write.partitionBy("pbucket").mode("overwrite").parquet(st)
      java.nio.file.Files.writeString(
        new java.io.File(st, "_params.json").toPath,
        s"""{"bits":$bits,"tables":$tables}""")
      // record the fold BEFORE deleting the dirs — the durable commit
      // record a redelivered tagged append checks via [[folded]]
      java.nio.file.Files.writeString(
        new java.io.File(st, "_folded.json").toPath,
        foldedNames.map(n => s""""$n"""").mkString("[", ",", "]"))
      ()
    }
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    // delete exactly the dirs THIS merge folded plus already-folded
    // crash leftovers — an append another process committed after the
    // snapshot was not folded and must survive (a blanket deltaDir rm
    // would silently lose its vectors); crashed-append staging
    // leftovers vacuum alongside.
    deltaSnap.foreach(p => rm(new java.io.File(p)))
    Option(deltaDir(root).listFiles()).getOrElse(Array.empty)
      .filter(VersionedDirs.stagingOrphan).foreach(rm)
    Tombstones.reset(spark, root)
    path
  }

  /** The shared key layout of [[publish]] and [[appendDelta]]. */
  private def keyRows(corpus: DataFrame, id: String, vec: String,
                      bits: Int, tables: Int): DataFrame =
    corpus.select(col(id).as("index_id"), col(vec).as("ivec"),
        posexplode(multiTableBuckets(col(vec), bits, tables))
          .as(Seq("tbl", "bucket")))
      .withColumn("pbucket", pbucketOf(col("tbl"), col("bucket")))

  /** Approximate top-k of each query vector against the committed
    * index: key the batch with the index's FROZEN (r, T), collect its
    * touched partition buckets (≤ [[NumBuckets]] ints — a constant,
    * never data-sized), read ONLY those directories, and score inline
    * on the (pbucket, tbl, bucket) equi-join — a pair colliding in
    * several tables is scored per collision but COUNTED once
    * (max-aggregated on the identical rounded score), exactly
    * [[Similarity.multiTableTopK]]'s rule. Self-matches (same id on
    * both sides) are excluded. Untouched index partitions never leave
    * the filesystem.
    */
  def probeTopK(spark: SparkSession, queries: DataFrame, id: String,
                vec: String, k: Int, root: String): DataFrame =
    probeCore(spark, queries, id, vec, k, root, materialize = true)

  /** [[probeTopK]] against a PINNED committed generation — the
    * fleet-snapshot read path ([[FleetSnapshot]]): serves `genPath`
    * EXACTLY as committed — no delta log, no tombstone or ban mask
    * (all post-snapshot state by definition: the reader asked for
    * the world the manifest pinned, and masking it with later logs
    * would re-open the generation-skew seam the snapshot closes).
    */
  def probeTopKAt(spark: SparkSession, queries: DataFrame, id: String,
                  vec: String, k: Int, genPath: String): DataFrame =
    probeCore(spark, queries, id, vec, k, genPath, materialize = true,
      pinned = true)

  /** The LAZY plan behind [[probeTopK]] — exposed for plan audits
    * (pruning specs assert the static PartitionFilters on this form;
    * [[probeTopK]]'s returned frame is an already-materialized RDD
    * scan per the [[ProbeCache]] contract). Evaluates the batch
    * keying twice if `queries` is not cached.
    */
  private[graft] def probeTopKPlan(spark: SparkSession, queries: DataFrame,
                                   id: String, vec: String, k: Int,
                                   root: String): DataFrame =
    probeCore(spark, queries, id, vec, k, root, materialize = false)

  private def probeCore(spark: SparkSession, queries: DataFrame,
                        id: String, vec: String, k: Int, root: String,
                        materialize: Boolean,
                        pinned: Boolean = false): DataFrame = {
    // read-order discipline (see DedupIndex.probeBanded): tombstones,
    // then the DELTA LISTING, then resolve. Tombstones-first keeps a
    // racing compact's log reset from resurfacing purged vectors;
    // deltas-before-resolve keeps a probe that resolves the OLD
    // generation from seeing the append log after a racing merge
    // deleted it (old-gen-minus-deltas was never a committed state).
    // Resolving the NEW generation with the stale delta listing is
    // harmless here: the probe max-aggregates an idempotent score, so
    // double-read key rows can't change any ranking — EXCEPT a
    // leftover dir the generation already folded, which may predate a
    // purge the generation applied; those are filtered against the
    // resolved generation's `_folded.json` below.
    // pinned = fleet-snapshot read: `root` IS the generation path and
    // every later log (deltas, tombstones, bans) is out of scope
    val ts = if (pinned) None else tombstones(spark, root)
    val deltaSnap0 = if (pinned) Nil else deltas(root)
    val idxPath =
      if (pinned) { graft.sources.Artifacts.noteResolveHit(); root }
      else resolve(root).getOrElse(
        throw new IllegalStateException(s"no committed index under $root"))
    val folded0 = foldedOf(idxPath)
    val deltaSnap = deltaSnap0
      .filterNot(p => folded0(new java.io.File(p).getName))
    // params pinned to the resolved generation (re-resolving could
    // land on a racing re-publish's (r, T))
    val (bits, tables) = paramsAt(idxPath)
    // one banding pass for BOTH the touched-bucket collect and the
    // probe join (the q91 lesson, baked in): persist backs both, and
    // the cache is held until the RESULT is materialized below (the
    // [[ProbeCache]] contract) so the returned frame never re-derives
    // this batch-sized keying
    val qk0 = queries.select(col(id).as("query_id"), col(vec).as("qv"),
        posexplode(multiTableBuckets(col(vec), bits, tables))
          .as(Seq("tbl", "bucket")))
      .withColumn("pbucket", pbucketOf(col("tbl"), col("bucket")))
    val qk = if (materialize) qk0.persist() else qk0
    val touched = qk.select("pbucket").distinct()
      .collect().map(_.getInt(0)).sorted
    // base ∪ committed deltas, each with the same static partition
    // filter — pruning applies per root, so an unmerged delta costs
    // its touched buckets only
    val idx0 = (idxPath +: deltaSnap)
      .map(p => spark.read.parquet(p)
        .filter(col("pbucket").isin(touched.toIndexedSeq.map(Int.box): _*)))
      .reduce(_.unionByName(_))
    // uncompacted deletes are honored at probe time; strategy left to
    // AQE (a mass purge can be arbitrarily large — no broadcast hint)
    val idx1 = ts
      .map(t => idx0.join(t, Seq("index_id"), "left_anti"))
      .getOrElse(idx0)
    // bans mask like tombstones but never reset (the re-ingestion
    // closure — see [[addBans]]); out of scope for a pinned read
    val idx = (if (pinned) None else bans(spark, root))
      .map(b => idx1.join(b, Seq("index_id"), "left_anti"))
      .getOrElse(idx1)
    val scored = qk.join(idx, Seq("pbucket", "tbl", "bucket"))
      .filter(col("index_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("index_id"))
      .agg(max(round(cosineNative(col("qv"), col("ivec")), 6)).as("cos_sim"))
    val result = Similarity.topK(scored, "index_id", k)
    // materialize the (≤ k per query) result BEFORE releasing the
    // batch cache — see [[ProbeCache]]
    if (materialize) try ProbeCache.materialize(result) finally qk.unpersist()
    else result
  }
}
