package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** [[VersionedSink]]: exactly-once visible state from at-least-once
  * `foreachBatch` delivery — replay idempotence (direct and across
  * compaction), crash-leftover invisibility, and the compaction
  * floor rule that makes the compact publish order loss- and
  * duplicate-free.
  */
class VersionedSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("event_type", StringType)))

  private def sinkIn(dir: Path) =
    new VersionedSink(spark, dir.toString, "events", schema)

  private def rows(s: VersionedSink): Set[(Long, String)] =
    s.read().as[(Long, String)].collect().toSet

  test("replayed batch id is absorbed; rows appear exactly once") {
    val dir = Files.createTempDirectory("graft-sink")
    val s = sinkIn(dir)
    val b0 = Seq((1L, "click"), (2L, "view")).toDF("event_id", "event_type")
    assert(s.commitBatch(b0, 0))
    assert(!s.commitBatch(b0, 0)) // restart replays batch 0 → no-op
    assert(rows(s) == Set((1L, "click"), (2L, "view")))
    assert(s.committedBatches == Seq(0L))
  }

  test("half-written crash leftover is invisible and overwritten by the replay") {
    val dir = Files.createTempDirectory("graft-sink")
    val s = sinkIn(dir)
    // crashed writer: data but no _SUCCESS
    val leftover = dir.resolve("events.csv.b3")
    Files.createDirectory(leftover)
    Files.writeString(leftover.resolve("part-00000.csv"),
      "event_id,event_type\n999,garbage\n")
    assert(rows(s).isEmpty)
    assert(s.commitBatch(
      Seq((7L, "click")).toDF("event_id", "event_type"), 3))
    assert(rows(s) == Set((7L, "click"))) // replay won; garbage gone
  }

  test("foreachBatch stream lands each micro-batch as one committed dir") {
    val src = Files.createTempDirectory("graft-sink-src")
    val out = Files.createTempDirectory("graft-sink-out")
    val s = sinkIn(out)
    val stream = spark.readStream
      .schema("event_id LONG, event_type STRING").json(src.toString)
    val q = stream.writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        s.commitBatch(df, id); ()
      }.start()
    try {
      Files.writeString(src.resolve("a.json"),
        """{"event_id":1,"event_type":"click"}
          |{"event_id":2,"event_type":"view"}""".stripMargin)
      q.processAllAvailable()
      Files.writeString(src.resolve("b.json"),
        """{"event_id":3,"event_type":"click"}""")
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(s) == Set((1L, "click"), (2L, "view"), (3L, "click")))
    assert(s.committedBatches.nonEmpty)
  }

  test("compaction preserves visible rows; folded ids stay absorbed") {
    val dir = Files.createTempDirectory("graft-sink")
    val s = sinkIn(dir)
    (0 to 2).foreach(i => assert(s.commitBatch(
      Seq((i.toLong, s"t$i")).toDF("event_id", "event_type"), i)))
    val before = rows(s)
    s.compact()
    assert(rows(s) == before)
    assert(new java.io.File(dir.toString).list()
      .count(_.matches("events\\.csv\\.b\\d+")) == 0) // inputs folded
    // replay of a folded id must STILL be a no-op — the compaction
    // ledger absorbs it even though its b-dir is gone
    assert(!s.commitBatch(
      Seq((99L, "dup")).toDF("event_id", "event_type"), 1))
    assert(rows(s) == before)
    // the stream continues past the compaction high-water mark
    assert(s.commitBatch(
      Seq((3L, "t3")).toDF("event_id", "event_type"), 3))
    assert(rows(s) == before + ((3L, "t3")))
    assert(s.committedBatches == Seq(0L, 1L, 2L, 3L))
  }

  test("crash between compaction publish and cleanup double-counts nothing") {
    val dir = Files.createTempDirectory("graft-sink")
    val s = sinkIn(dir)
    (0 to 1).foreach(i => assert(s.commitBatch(
      Seq((i.toLong, s"t$i")).toDF("event_id", "event_type"), i)))
    val before = rows(s)
    s.compact()
    // resurrect a folded input exactly as a crash-before-cleanup
    // would leave it: committed b1 alongside the committed c1
    val back = dir.resolve("events.csv.b1")
    Files.createDirectory(back)
    Files.writeString(back.resolve("part-00000.csv"),
      "event_id,event_type\n1,t1\n")
    Files.writeString(back.resolve("_SUCCESS"), "")
    // the floor rule: b-dirs at or below the compaction id contribute
    // nothing, so the leftover cannot double-count
    assert(rows(s) == before)
    // and the next compact cleans it up
    assert(s.commitBatch(
      Seq((2L, "t2")).toDF("event_id", "event_type"), 2))
    s.compact()
    assert(!Files.exists(back))
    assert(rows(s) == before + ((2L, "t2")))
  }
}
