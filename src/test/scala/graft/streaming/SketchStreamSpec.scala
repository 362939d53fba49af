package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SketchIndex

/** The streaming × sketch cell: estimate-before-fold ordering, the
  * monotone boundary, replay absorption (doubly load-bearing here —
  * cell sums are not idempotent), and a real micro-batch run.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4; private val W = 64

  private def terms(xs: (String, Int)*) =
    xs.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("term")

  private def fixture(): (SketchStream, String, String) = {
    val idxRoot = Files.createTempDirectory("cmss-idx").toString
    val outRoot = Files.createTempDirectory("cmss-out").toString
    SketchIndex.publish(terms("a" -> 5, "b" -> 2), "term", D, W, idxRoot)
    (new SketchStream(spark, idxRoot, outRoot, "term"), idxRoot, outRoot)
  }

  private def got(ss: SketchStream) = ss.results()
    .select("batch_id", "term", "cms_est")
    .as[(Long, String, Long)].collect().toSet

  test("estimates grow at exactly the batch boundary; redelivery absorbed") {
    val (ss, idxRoot, _) = fixture()
    val b0 = terms("a" -> 3, "c" -> 7)
    assert(ss.processBatch(b0, 0))
    assert(!ss.processBatch(b0, 0), "redelivered batch not absorbed")
    assert(SketchIndex.deltas(idxRoot).size == 1,
      "redelivery double-committed the fold (sums are not idempotent)")
    assert(ss.processBatch(terms("a" -> 1, "c" -> 1), 1))
    val g = got(ss)
    // batch 0 estimates the PRE-batch state: a=5, c unseen
    assert(g.contains((0L, "a", 5L)) && g.contains((0L, "c", 0L)),
      s"batch 0 saw its own fold: $g")
    // batch 1 sees base ∪ batch 0: a=8, c=7
    assert(g.contains((1L, "a", 8L)) && g.contains((1L, "c", 7L)),
      s"boundary growth missing: $g")
  }

  test("estimate-committed/fold-lost crash sliver replays fold-only") {
    val (ss, idxRoot, outRoot) = fixture()
    ss.processBatch(terms("a" -> 3), 0)
    val estFile = new java.io.File(outRoot, "est.b0")
    val before = spark.read.parquet(estFile.toString)
      .select("term", "cms_est").as[(String, Long)].collect().toSet
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    rm(new java.io.File(idxRoot, "deltas"))
    assert(ss.processBatch(terms("a" -> 3), 0),
      "replay must re-commit the lost fold")
    assert(SketchIndex.deltas(idxRoot).size == 1)
    assert(spark.read.parquet(estFile.toString)
      .select("term", "cms_est").as[(String, Long)].collect().toSet
      == before, "committed estimates rewritten on replay")
  }

  test("a fold redelivered after a merge consumed it cannot double-count") {
    val (ss, idxRoot, _) = fixture()
    val b0 = terms("a" -> 3)
    ss.processBatch(b0, 0)
    SketchIndex.mergeCompact(spark, idxRoot)
    assert(SketchIndex.deltas(idxRoot).isEmpty)
    // checkpoint-lagged redelivery: absorbed through _folded.json
    assert(!ss.processBatch(b0, 0), "post-merge redelivery not absorbed")
    assert(SketchIndex.deltas(idxRoot).isEmpty,
      "redelivered fold re-committed after the merge — double count")
    val est = SketchIndex.estimate(spark, Seq("a").toDF("term"),
        "term", idxRoot)
      .select("cms_est").as[Long].head()
    assert(est == 8L, s"double-counted: a = $est, want 8")
  }

  test("runs under a real foreachBatch micro-batch query (file source)") {
    val (ss, _, _) = fixture()
    val inDir = Files.createTempDirectory("cmss-in")
    def jsonOf(rows: Seq[String]): String =
      rows.map(t => s"""{"term":"$t"}""").mkString("\n")
    Files.writeString(inDir.resolve("f0.json"),
      jsonOf(Seq("a", "a", "c")))
    val stream = spark.readStream.schema("term STRING").json(inDir.toString)
    val q = stream.writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => ss.processBatch(b.toDF(), id); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("cmss-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(inDir.resolve("f1.json"), jsonOf(Seq("a")))
      q.processAllAvailable()
    } finally q.stop()
    val g = got(ss)
    assert(g.contains((0L, "a", 5L)) && g.contains((1L, "a", 7L)),
      s"boundary growth lost under the real stream: $g")
  }
}
