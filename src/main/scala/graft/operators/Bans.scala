package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared durable ban log of the persisted-index family — the
  * "forgotten must STAY forgotten" companion to [[Tombstones]]:
  * tombstones mask what was already ingested and RESET at
  * compaction, so nothing stops a LATER batch from re-mentioning a
  * deleted identity (at-least-once upstreams and backfills do
  * exactly that). A ban commits the id to `<indexRoot>/bans` —
  * union-append like the tombstone log, but NEVER reset — and the
  * family's ingestion paths filter arriving rows against it (the
  * gate), with read paths masking besides (defense in depth).
  * O(bans) broadcast per batch — GDPR request-sized, never
  * data-sized. Rides [[VersionedDirs]]' commit protocol.
  */
private[graft] object Bans {

  private def root(indexRoot: String): String =
    new java.io.File(indexRoot, "bans").getAbsolutePath

  /** Commit `ids` (as column `index_id`) unioned with the previous
    * committed ban set.
    */
  def add(spark: SparkSession, ids: DataFrame, idCol: String,
          indexRoot: String): String = {
    val tr = root(indexRoot)
    val cur = ids.select(col(idCol).cast("long").as("index_id")).distinct()
    val all = VersionedDirs.resolve(tr)
      .map(p => spark.read.parquet(p).unionByName(cur).distinct())
      .getOrElse(cur)
    VersionedDirs.commit(tr) { st => all.write.parquet(st) }
  }

  /** The committed ban set, if any. */
  def get(spark: SparkSession, indexRoot: String): Option[DataFrame] =
    VersionedDirs.resolve(root(indexRoot)).map(spark.read.parquet(_))
      .filter(!_.isEmpty)
}
