package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access for the driver-generated parquet testdata
  * (`/root/repo/TESTDATA.md`). One parquet file per table; reads are
  * partition-parallel and benefit from Catalyst column pruning /
  * predicate pushdown automatically — the scan only materializes the
  * columns and row groups the query needs, which is what keeps this
  * layout viable at 100 TB (columnar + min/max pruned).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") readEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a session temp view, exposing the full
    * Spark SQL surface over the same data (the reference has no SQL
    * layer at all — SURVEY.md §3; here parser/analyzer/optimizer come
    * with the platform). Queries built via `spark.sql` after this are
    * planned by the exact same Catalyst pipeline as the DataFrame
    * ones — q45 exercises the path end-to-end against its oracle.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** `events.ts` normalization — the generated data has shipped two
    * physical types across driver rounds, so the read adapts to the
    * schema actually on disk rather than assuming one:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it unless
    *    the session sets `spark.sql.legacy.parquet.nanosAsLong=true`
    *    (Verify/Bench/SparkSpec all do, at construction — no per-read
    *    conf mutation, which would racily flip reader behavior
    *    session-wide). The long nanos are converted to a microsecond
    *    TimestampType with integral division — `ts div 1000`, not
    *    `/1000.0`, because epoch-nanos (~1.7e18) exceed double's
    *    53-bit integer range and a float path would corrupt low-order
    *    digits. Truncation to µs matches how the DuckDB oracle's
    *    nanosecond timestamps collapse when compared.
    *  - TIMESTAMP(MICROS) without UTC adjustment: Spark infers
    *    TIMESTAMP_NTZ; cast to the session TimestampType — a
    *    wall-clock identity under the UTC session timezone every
    *    entrypoint pins — so every downstream consumer (windows,
    *    unix_timestamp, range joins) sees one type either way.
    */
  private def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
