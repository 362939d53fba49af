package graft.operators

import java.io.File

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Exact row counts from parquet FOOTERS — the metadata-scale answer
  * to "how many rows does this artifact hold". Every parquet file
  * already records its row-group counts in the footer; summing them
  * is a driver-side metadata read (one small seek per part file),
  * where `spark.read.parquet(...).count()` is a cluster job that
  * scans data. At 100 TB the difference is a listing vs a pass — the
  * r13 verdict's [[IndexCatalog]] nit, and the same trick lets the
  * [[Tombstones]]/[[Bans]] empty-set fast path skip its per-call
  * `isEmpty` Spark job.
  */
private[graft] object ParquetFooters {

  private val conf = new Configuration()

  private def isPart(f: File): Boolean =
    f.isFile && !f.getName.endsWith(".crc") &&
      (f.getName.endsWith(".parquet") || f.getName.startsWith("part-"))

  /** Every parquet part file under `dir` (recursive). */
  private def parts(dir: File): Seq[File] =
    if (dir.isFile) { if (isPart(dir)) Seq(dir) else Nil }
    else Option(dir.listFiles()).getOrElse(Array.empty[File])
      .toSeq.flatMap(parts)

  /** Exact row count of one parquet file, from its footer. */
  def rowsOf(f: File): Long = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
    try r.getRecordCount finally r.close()
  }

  /** Exact total row count of every parquet part file under `dir` —
    * footer metadata only, no Spark job. Works across partitioned
    * layouts, multi-dataset generations (postings + stats sidecars,
    * out/ + in/ twins), and plain single-dataset dirs alike.
    */
  def rows(dir: File): Long = parts(dir).map(rowsOf).sum
}
