package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED half of incremental near-dedup: the historical
  * corpus's banded MinHash index materialized as a parquet table
  * partitioned by a hash bucket of (band, band_key), so a daily-ingest
  * probe scans ONLY the bucket directories its batch touches — the
  * property that lets a 100 TB index absorb a batch at batch cost.
  * [[Dedup.incrementalCandidates]] keeps both sides in-plan (the
  * oracle-checkable form); this is the production artifact the q91
  * docstring promises.
  *
  * Layout mirrors [[graft.FlatFileEngine]]'s versioned-dir commit
  * protocol: each publish writes a fresh `index.vN` directory (Spark's
  * own `_SUCCESS` marker is the commit record — a crashed writer
  * leaves an unreferenced dir that readers skip), and [[resolve]]
  * returns the highest committed version, so re-indexing never
  * disturbs a concurrent reader of the previous generation.
  *
  * Scale notes: the bucket count is a layout constant (64 here for
  * test-visible pruning; thousands at 100 TB — one directory per
  * bucket, each holding one sorted file per writer partition). The
  * probe's touched-bucket set is collected to the driver to become a
  * STATIC partition filter — bounded by the bucket-count constant, the
  * same bounded-by-design class as the HLL register map, never by
  * data volume.
  */
object DedupIndex {

  val NumBuckets = 64

  /** Stable bucket of a band row — the partition key of the index. */
  def bucketOf(band: Column, bandKey: Column): Column =
    pmod(xxhash64(band, bandKey), lit(NumBuckets.toLong)).cast("int")

  private def versionsOf(root: String): Seq[(Long, java.io.File)] = {
    val d = new java.io.File(root)
    val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
    kids.filter(f => f.isDirectory && f.getName.startsWith("index.v") &&
        f.getName.drop(7).forall(_.isDigit))
      .map(f => (f.getName.drop(7).toLong, f))
  }

  /** Highest committed (`_SUCCESS`-marked) index version under `root`,
    * or None before the first publish.
    */
  def resolve(root: String): Option[String] =
    versionsOf(root).filter { case (_, f) =>
      new java.io.File(f, "_SUCCESS").isFile }
      .sortBy(-_._1).headOption.map(_._2.getAbsolutePath)

  /** Publish the banded index of `indexSig` (a MinHash signature
    * frame) as the next version under `root`: one row per (id, band,
    * band_key), hash-partitioned into [[NumBuckets]] directories and
    * sorted by (band, band_key) within each file. Returns the
    * committed path.
    */
  def publish(indexSig: DataFrame, id: String, bands: Int,
              rowsPerBand: Int, root: String): String = synchronized {
    // stage under a writer-private name, then atomic-rename into the
    // version slot — the engine's commit protocol. rename(2) onto an
    // existing non-empty dir fails, so two cross-process publishers
    // racing the same number cannot interleave files: the loser's
    // rename fails and it retries the next slot with its staging dir
    // intact. (The `synchronized` covers same-JVM races; the rename
    // covers everything else.)
    graft.sources.Artifacts.notePublish()
    val staging = new java.io.File(root,
      s".staging-${java.util.UUID.randomUUID()}")
    Dedup.bandRows(indexSig, id, bands, rowsPerBand)
      .withColumnRenamed(id, "index_id")
      .withColumn("bucket", bucketOf(col("band"), col("band_key")))
      .repartition(col("bucket"))
      .sortWithinPartitions("band", "band_key")
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(staging.getAbsolutePath)
    var next = versionsOf(root).map(_._1).maxOption.getOrElse(0L) + 1
    var target = new java.io.File(root, s"index.v$next")
    var attempts = 0
    while (!staging.renameTo(target)) {
      attempts += 1
      require(attempts < 1000,
        s"publish rename failed repeatedly into $root (not a version race)")
      next += 1
      target = new java.io.File(root, s"index.v$next")
    }
    val path = target.getAbsolutePath
    // engine-style retention: the floor is the SECOND-newest COMMITTED
    // version — everything below it (older generations, crashed-writer
    // leftovers) vacuums; everything at/above survives, so the
    // previous committed generation stays for readers that resolved
    // before this publish and a possibly in-flight higher-numbered
    // writer is never yanked. Ranking raw dirs instead would let a
    // crash orphan displace the previous committed generation.
    retainLatestGenerations(root)
    path
  }

  /** Shared retention for an index root (also used by the streaming
    * compactor): keep the newest two COMMITTED generations, vacuum
    * older ones plus abandoned staging dirs. See [[publish]] for why
    * the floor ranks committed versions, not raw dirs.
    */
  private[graft] def retainLatestGenerations(root: String): Unit = {
    val committedVs = versionsOf(root).filter { case (_, f) =>
      new java.io.File(f, "_SUCCESS").isFile }.map(_._1)
    val keepFloor = committedVs.sorted.takeRight(2).headOption.getOrElse(0L)
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    versionsOf(root).filter(_._1 < keepFloor).foreach(v => rm(v._2))
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".staging-"))
      .foreach(rm)
  }

  /** NEW × persisted-INDEX candidate pairs with bucket pruning: band
    * the new batch, collect its touched buckets (≤ [[NumBuckets]]
    * ints — a constant, not data-sized), and read ONLY those
    * partition directories of the committed index. The equi-join then
    * runs on (bucket, band, band_key); untouched buckets never leave
    * the filesystem. Result schema matches
    * [[Dedup.incrementalCandidates]]: distinct (new_id, index_id).
    */
  def probe(spark: SparkSession, newSig: DataFrame, id: String,
            bands: Int, rowsPerBand: Int, root: String): DataFrame =
    probeBanded(spark,
      Dedup.bandRows(newSig, id, bands, rowsPerBand)
        .withColumnRenamed(id, "new_id")
        .withColumn("bucket", bucketOf(col("band"), col("band_key"))),
      root)

  /** [[probe]] with an already-banded new side — (new_id, band,
    * band_key, bucket) rows. The streaming path shares one banding of
    * its batch across this probe and its tail join.
    */
  def probeBanded(spark: SparkSession, newBands: DataFrame,
                  root: String): DataFrame = {
    val idxPath = resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root"))
    val touched = newBands.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val idx = spark.read.parquet(idxPath)
      .filter(col("bucket").isin(touched.toIndexedSeq.map(Int.box): _*))
    newBands.join(idx, Seq("bucket", "band", "band_key"))
      .select(col("new_id"), col("index_id")).distinct()
  }
}
