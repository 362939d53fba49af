package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Artifacts

/** Persisted bucketed layout — the shuffle-elimination strategy for
  * repeated big-big joins at 100 TB: write each side once, hashed into
  * `n` buckets on its join key (Spark's bucket id is
  * `pmod(murmur3(key), n)` — the same function `repartition(n, key)`
  * uses, so pre-partitioning by the key gives exactly one file per
  * bucket and lets the `SORTED BY` clause eliminate the merge-join
  * sort too), then register the layout in the session catalog; every
  * subsequent join between co-bucketed tables reads bucket i of each
  * side into the same task — zero Exchange, zero Sort, forever.
  * On a cluster this is the difference between re-shuffling the fact
  * table on every join and never shuffling it again.
  *
  * The data files are a fingerprint-keyed [[Artifacts.publishOnce]]
  * artifact (bucketing pays its one shuffle at publish time, amortized
  * across every consumer and every session); the catalog entry is
  * per-session DDL over that committed location — `CREATE TABLE …
  * CLUSTERED BY … LOCATION`, idempotent via IF NOT EXISTS. The staging
  * write goes through a throwaway EXTERNAL table name because
  * `bucketBy` can only write through `saveAsTable`; dropping it keeps
  * the files (external semantics) for the rename into the committed
  * root.
  */
object Bucketing {

  /** Publish `df` bucketed+sorted on `key` into `n` buckets as a
    * fingerprint-keyed artifact, register it as catalog table
    * `tableName` (schema `schemaDdl` must list `df`'s columns in
    * order), and return the catalog table. `tables` are the source
    * parquet files the derivation fingerprints.
    */
  def table(s: SparkSession, prefix: String, sfDir: String,
            tables: Seq[String], df: => DataFrame, key: String, n: Int,
            tableName: String, schemaDdl: String): DataFrame = {
    val root = Artifacts.publishOnce(prefix, sfDir, tables) { stage =>
      val tmp = "graft_stage_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(12)
      df.repartition(n, col(key))
        .write.bucketBy(n, key).sortBy(key)
        .option("path", stage).format("parquet").saveAsTable(tmp)
      s.sql(s"DROP TABLE `$tmp`")
      ()
    }
    if (!s.catalog.tableExists(tableName)) {
      s.sql(
        s"""CREATE TABLE IF NOT EXISTS `$tableName` ($schemaDdl)
           |USING PARQUET
           |CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $n BUCKETS
           |LOCATION '$root'""".stripMargin)
    }
    s.table(tableName)
  }
}
