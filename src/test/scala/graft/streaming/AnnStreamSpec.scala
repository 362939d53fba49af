package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{SimIndex, Similarity}

/** [[AnnStream]]: continuous top-k probing of a published SimIndex
  * generation with exactly-once batch commits and replay absorption.
  */
class AnnStreamSpec extends SparkSpec {
  import spark.implicits._

  private val BITS = 8; private val TABLES = 4; private val K = 2
  private val DIM = 16

  private def vec(seed: Long, perturb: Float): Array[Float] =
    Array.tabulate(DIM) { i =>
      val h = (seed * 31 + i) * 2654435761L
      ((h % 1000).toFloat / 1000.0f) + (if (i == 0) perturb else 0.0f)
    }

  private lazy val index =
    (0 until 40).map(i => (100L + i, vec(i.toLong, 0.0f)))
      .toDF("vec_id", "embedding")

  private def publishIndex(): String = {
    val root = Files.createTempDirectory("annstream-idx").toString
    SimIndex.publish(index, "vec_id", "embedding", BITS, TABLES, root)
    root
  }

  test("per-batch top-k equals the direct probe; replays absorbed") {
    val idxRoot = publishIndex()
    val outRoot = Files.createTempDirectory("annstream-out").toString
    val s = new AnnStream(spark, idxRoot, outRoot, "vec_id", "embedding", K)
    val b0 = (0 until 3).map(q => (q.toLong, vec(q.toLong, 0.001f)))
      .toDF("vec_id", "embedding")
    val b1 = (3 until 5).map(q => (q.toLong, vec(q.toLong, 0.001f)))
      .toDF("vec_id", "embedding")
    assert(s.processBatch(b0, 0))
    assert(s.processBatch(b1, 1))
    assert(s.committedBatches == Seq(0L, 1L))
    val got = s.results()
      .as[(Long, Long, Double, Long)].collect().toSet
    val want = SimIndex.probeTopK(spark,
        b0.unionByName(b1), "vec_id", "embedding", K, idxRoot)
      .select("query_id", "index_id", "cos_sim", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == want, s"stream/batch divergence:\n$got\n$want")
    // every near-copy query found its original as top-1
    val top1 = got.filter(_._4 == 1L).map(t => (t._1, t._2)).toMap
    for (q <- 0L until 5L) assert(top1.get(q).contains(100L + q))
    // at-least-once replay: absorbed, results unchanged
    assert(!s.processBatch(b1, 1))
    assert(s.results().count() == got.size)
  }

  test("the probe seam serves the PQ index too: stream ≡ direct ADC probe") {
    val M = 4; val DSUB = 4; val KS = 8; val ITERS = 2
    // PQ fit seeds from the first KS ids — index ids must start at 0
    val pqIndex = (0 until 40).map(i => (i.toLong, vec(i.toLong, 0.0f)))
      .toDF("vec_id", "embedding")
    val idxRoot = Files.createTempDirectory("annstream-pqidx").toString
    graft.operators.PqIndex.publish(pqIndex, "vec_id", "embedding",
      M, DSUB, KS, ITERS, idxRoot)
    val outRoot = Files.createTempDirectory("annstream-out").toString
    val s = new AnnStream(spark, idxRoot, outRoot, "vec_id", "embedding",
      K, probeFn = graft.operators.PqIndex.probeTopK)
    val b0 = (0 until 3).map(q => (1000L + q, vec(q.toLong, 0.001f)))
      .toDF("vec_id", "embedding")
    val b1 = (3 until 5).map(q => (1000L + q, vec(q.toLong, 0.001f)))
      .toDF("vec_id", "embedding")
    assert(s.processBatch(b0, 0))
    assert(s.processBatch(b1, 1))
    val got = s.results()
      .select("query_id", "index_id", "adc_d2", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.operators.PqIndex.probeTopK(spark,
        b0.unionByName(b1), "vec_id", "embedding", K, idxRoot)
      .select("query_id", "index_id", "adc_d2", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want, s"PQ stream/batch divergence:\n$got\n$want")
    // replay absorbed on this probe too
    assert(!s.processBatch(b1, 1))
    assert(s.results().count() == got.size)
  }

  test("a partially-applied nprobe IVFPQ probe works on the seam: stream ≡ direct pruned probe") {
    val M = 4; val DSUB = 4; val KS = 8; val ITERS = 2; val NP = 2
    val pqIndex = (0 until 40).map(i => (i.toLong, vec(i.toLong, 0.0f)))
      .toDF("vec_id", "embedding")
    val idxRoot = Files.createTempDirectory("annstream-ivfpqidx").toString
    graft.operators.PqIndex.publish(pqIndex, "vec_id", "embedding",
      M, DSUB, KS, ITERS, idxRoot, coarseC = 4, coarseIters = 2)
    val outRoot = Files.createTempDirectory("annstream-out").toString
    // the q273 shape: a LAMBDA on the seam (the r11 empty-schema fix
    // made non-default probes first-class — results() derives its
    // empty shape by planning the probe, not reference identity)
    val s = new AnnStream(spark, idxRoot, outRoot, "vec_id", "embedding",
      K, probeFn = (sp, b, id, v, k, root) =>
        graft.operators.PqIndex.probeTopK(sp, b, id, v, k, root, NP))
    // before any batch commits, the empty frame carries the probe's
    // own schema — no guard failure for a custom probe
    assert(s.results().columns.toSeq ==
      Seq("query_id", "index_id", "adc_d2", "rnk"))
    assert(s.results().count() == 0)
    val b0 = (0 until 3).map(q => (1000L + q, vec(q.toLong, 0.001f)))
      .toDF("vec_id", "embedding")
    val b1 = (3 until 5).map(q => (1000L + q, vec(q.toLong, 0.001f)))
      .toDF("vec_id", "embedding")
    assert(s.processBatch(b0, 0))
    assert(s.processBatch(b1, 1))
    val got = s.results()
      .select("query_id", "index_id", "adc_d2", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.operators.PqIndex.probeTopK(spark,
        b0.unionByName(b1), "vec_id", "embedding", K, idxRoot, NP)
      .select("query_id", "index_id", "adc_d2", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want, s"IVFPQ stream/batch divergence:\n$got\n$want")
  }

  test("runs under a real foreachBatch micro-batch query (file source)") {
    val idxRoot = publishIndex()
    val outRoot = Files.createTempDirectory("annstream-out").toString
    val inDir = Files.createTempDirectory("annstream-in")
    val s = new AnnStream(spark, idxRoot, outRoot, "vec_id", "embedding", K)
    def jsonOf(q: Long): String =
      s"""{"vec_id":$q,"embedding":[${vec(q, 0.001f).mkString(",")}]}"""
    Files.writeString(inDir.resolve("f0.json"),
      (0L until 2L).map(jsonOf).mkString("\n"))
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .json(inDir.toString)
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        s.processBatch(b, id); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("annstream-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(inDir.resolve("f1.json"), jsonOf(2L))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.results().select("query_id", "index_id", "rnk")
      .as[(Long, Long, Long)].collect().toSet
    for (qid <- 0L until 3L)
      assert(got.contains((qid, 100L + qid, 1L)),
        s"query $qid missing its original: $got")
  }
}
