package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class TableStatsSpec extends SparkSpec {

  private def writeEmb(path: String, n: Int, dim: Int): Unit =
    spark.range(n).selectExpr("id AS vec_id",
      s"transform(sequence(1, $dim), x -> cast(x AS float)) AS embedding")
      .write.mode("overwrite").parquet(path)

  test("stats come from one aggregate pass, then the sidecar") {
    val p = Files.createTempDirectory("stats").toString + "/emb.parquet"
    writeEmb(p, 10, 3)
    TableStats.clearMemo()
    assert(TableStats.embeddingStats(spark, p) == ((10L, 3)))
    // prove subsequent reads are sidecar-served, not recomputed: poison
    // the sidecar, drop the in-memory memo, and watch the poisoned
    // value surface
    val sidecar = TableStats.sidecarFor(p)
    assert(sidecar.isFile)
    Files.writeString(sidecar.toPath, """{"n":99,"dim":7}""")
    TableStats.clearMemo()
    assert(TableStats.embeddingStats(spark, p) == ((99L, 7)))
  }

  test("a rewritten table invalidates the sidecar (fingerprint change)") {
    val p = Files.createTempDirectory("stats").toString + "/emb.parquet"
    writeEmb(p, 10, 3)
    TableStats.clearMemo()
    assert(TableStats.embeddingStats(spark, p) == ((10L, 3)))
    writeEmb(p, 5, 4) // new files, new sizes/mtimes -> new fingerprint
    TableStats.clearMemo()
    assert(TableStats.embeddingStats(spark, p) == ((5L, 4)))
  }

  test("ragged embedding dimensions are rejected, not padded") {
    val p = Files.createTempDirectory("stats").toString + "/emb.parquet"
    spark.range(6).selectExpr("id AS vec_id",
      "transform(sequence(1, cast(2 + id % 2 AS int)), x -> cast(x AS float)) AS embedding")
      .write.mode("overwrite").parquet(p)
    TableStats.clearMemo()
    intercept[IllegalArgumentException] {
      TableStats.embeddingStats(spark, p)
    }
  }
}
