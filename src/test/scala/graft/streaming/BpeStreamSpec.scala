package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BpeIndex

/** The streaming × tokenizer cell: census-before-fold ordering,
  * replay absorption, the memo-hit boundary shift, and the
  * purge-resurrection closure (`_folded.json`).
  */
class BpeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val R = 4

  private lazy val train = Seq(
    (1L, "abab abc abc abab cab"),
    (2L, "abc abab bc bc cab"),
    (3L, "abab abc dd dd dd")).toDF("doc_id", "text")

  private def fixture(): (BpeStream, String, String) = {
    val idxRoot = Files.createTempDirectory("bpes-idx").toString
    val outRoot = Files.createTempDirectory("bpes-out").toString
    BpeIndex.publish(train, "doc_id", "text", R, idxRoot)
    (new BpeStream(spark, idxRoot, outRoot, "doc_id", "text"),
      idxRoot, outRoot)
  }

  test("memo hits shift at exactly the batch boundary; redelivery absorbed") {
    val (bs, idxRoot, _) = fixture()
    // zz is novel in batch 0; batch 1 reuses it — a hit only from b1 on
    val b0 = Seq((10L, "abc zz zz")).toDF("doc_id", "text")
    val b1 = Seq((11L, "zz cab qq")).toDF("doc_id", "text")
    assert(bs.processBatch(b0, 0))
    assert(!bs.processBatch(b0, 0), "redelivered batch not absorbed")
    assert(BpeIndex.deltas(idxRoot).size == 1)
    assert(bs.processBatch(b1, 1))
    val got = bs.results()
      .select("doc_id", "n_words", "n_memo_hits")
      .as[(Long, Long, Long)].collect()
      .map { case (d, w, h) => d -> ((w, h)) }.toMap
    // b0: abc hit, zz×2 miss (novel); b1: zz + cab hit (zz via b0's
    // delta — the boundary), qq miss
    assert(got(10L) == ((3L, 1L)), s"batch-0 hits wrong: $got")
    assert(got(11L) == ((3L, 2L)), s"boundary shift missing: $got")
  }

  test("census commits before the fold: a batch never hits its own words") {
    val (bs, _, _) = fixture()
    val b0 = Seq((10L, "zz zz zz")).toDF("doc_id", "text")
    bs.processBatch(b0, 0)
    val hits = bs.results().select("n_memo_hits").as[Long].head()
    assert(hits == 0L, "batch counted its own fold as memo hits")
  }

  test("census-committed/fold-lost crash sliver replays fold-only") {
    val (bs, idxRoot, outRoot) = fixture()
    val b0 = Seq((10L, "abc zz")).toDF("doc_id", "text")
    bs.processBatch(b0, 0)
    val censusFile = new java.io.File(outRoot, "census.b0")
    val before = spark.read.parquet(censusFile.toString)
      .as[(Long, Long, Long, Long)].collect().toSet
    // simulate the crash: delta lost, census kept
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    rm(new java.io.File(idxRoot, "deltas"))
    assert(BpeIndex.deltas(idxRoot).isEmpty)
    assert(bs.processBatch(b0, 0), "replay must re-commit the lost fold")
    assert(BpeIndex.deltas(idxRoot).size == 1, "fold not replayed")
    assert(spark.read.parquet(censusFile.toString)
      .as[(Long, Long, Long, Long)].collect().toSet == before,
      "committed census was rewritten on replay")
  }

  test("runs under a real foreachBatch micro-batch query (file source)") {
    val (bs, _, _) = fixture()
    val inDir = Files.createTempDirectory("bpes-in")
    def jsonOf(rows: Seq[(Long, String)]): String =
      rows.map { case (d, t) => s"""{"doc_id":$d,"text":"$t"}""" }
        .mkString("\n")
    Files.writeString(inDir.resolve("f0.json"),
      jsonOf(Seq((10L, "abc zz zz"))))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(inDir.toString)
    val q = stream.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => bs.processBatch(b.toDF(), id); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("bpes-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(inDir.resolve("f1.json"),
        jsonOf(Seq((11L, "zz cab qq"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = bs.results()
      .select("doc_id", "n_words", "n_memo_hits")
      .as[(Long, Long, Long)].collect()
      .map { case (d, w, h) => d -> ((w, h)) }.toMap
    // doc 11's zz must be a memo hit through batch 0's fold
    assert(got(10L) == ((3L, 1L)) && got(11L) == ((3L, 2L)),
      s"fold boundary lost under the real stream: $got")
  }

  test("a fold redelivered after purgeWords consumed it cannot resurrect the purged word") {
    val (bs, idxRoot, _) = fixture()
    val b0 = Seq((10L, "abc zz")).toDF("doc_id", "text")
    bs.processBatch(b0, 0)
    assert(BpeIndex.deltas(idxRoot).size == 1)
    // the deletion request names the delta-held word; purge consumes
    // the delta log and records its name in _folded.json
    BpeIndex.purgeWords(spark, Seq("zz").toDF("word"), idxRoot)
    assert(BpeIndex.deltas(idxRoot).isEmpty)
    assert(BpeIndex.folded(idxRoot, "b0"),
      "purge lost the consumed delta's durable record")
    // checkpoint-lagged redelivery: both halves read as committed
    assert(!bs.processBatch(b0, 0), "redelivery after purge not absorbed")
    assert(BpeIndex.deltas(idxRoot).isEmpty,
      "redelivered fold re-committed a purge-consumed delta")
    assert(BpeIndex.memoAll(spark, idxRoot)
      .filter($"word" === "zz").isEmpty,
      "purged word string resurrected into the memo")
  }
}
