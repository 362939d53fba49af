package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** The reference's append-only log, streamed (SURVEY.md §2.8): events
  * arrive as files in a directory (the stream form of `ios::app` on
  * the engagement CSV), FK violations are dropped per micro-batch,
  * and the windowed counts after all micro-batches equal the one-shot
  * batch aggregation over the same rows — the batch/stream parity
  * that makes the streaming path trustworthy.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = "user_id LONG, ts TIMESTAMP, event_type STRING"

  private def writeJson(dir: Path, name: String,
                        rows: Seq[(Long, String, String)]): Unit =
    Files.writeString(dir.resolve(name), rows.map { case (u, ts, t) =>
      s"""{"user_id":$u,"ts":"$ts","event_type":"$t"}"""
    }.mkString("\n"))

  test("streaming dedup drops redelivered event ids across micro-batches") {
    val schema = "event_id LONG, ts TIMESTAMP, event_type STRING"
    def write(dir: Path, name: String, rows: Seq[(Long, String, String)]): Unit =
      Files.writeString(dir.resolve(name), rows.map { case (id, ts, t) =>
        s"""{"event_id":$id,"ts":"$ts","event_type":"$t"}"""
      }.mkString("\n"))

    val dir = Files.createTempDirectory("graft-dedup-stream")
    val stream = spark.readStream.schema(schema).json(dir.toString)
    val deduped = EventStream.dedupedWithinWatermark(stream, "ts", "event_id", "30 minutes")
    val q = deduped.writeStream.format("memory").queryName("ev_dedup")
      .outputMode("append").start()
    try {
      // id 1 delivered twice in one batch, id 2 redelivered in the
      // next micro-batch (same event time): both must surface once
      write(dir, "b1.json", Seq(
        (1L, "2026-01-01T10:00:00", "click"),
        (1L, "2026-01-01T10:00:00", "click"),
        (2L, "2026-01-01T10:01:00", "view")))
      q.processAllAvailable()
      write(dir, "b2.json", Seq(
        (2L, "2026-01-01T10:01:00", "view"),
        (3L, "2026-01-01T10:02:00", "click")))
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("ev_dedup").select("event_id")
      .as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("stateful sessionize closes sessions on gap break and on idle timeout") {
    val schema = "user_id LONG, ts TIMESTAMP, event_type STRING"
    val dir = Files.createTempDirectory("graft-session-stream")
    val stream = spark.readStream.schema(schema).json(dir.toString)
      .as[SessionEvent]
    val sessions = EventStream.sessionize(
      stream, gapMs = 30 * 60 * 1000L, lateness = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("ev_sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session); user 7: one event
      writeJson(dir, "b1.json", Seq(
        (1L, "2026-01-01T10:00:00", "click"),
        (1L, "2026-01-01T10:05:00", "view"),
        (7L, "2026-01-01T10:00:00", "click")))
      q.processAllAvailable()
      // user 1 returns 2h later: breaks the gap (data path closes the
      // first session); the watermark advance (12:00 - 10min) passes
      // user 7's timeout (10:00 + 30min) -> idle path closes it
      writeJson(dir, "b2.json", Seq(
        (1L, "2026-01-01T12:00:00", "click")))
      q.processAllAvailable()
    } finally q.stop()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val got = spark.table("ev_sessions")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    assert(got == Set(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:05:00"), 2L),
      (7L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:00:00"), 1L)))
    // user 1's 12:00 session is still open -> not emitted
  }

  test("sessionize extends the open session backward for in-gap late events") {
    val schema = "user_id LONG, ts TIMESTAMP, event_type STRING"
    val dir = Files.createTempDirectory("graft-session-ooo")
    val stream = spark.readStream.schema(schema).json(dir.toString)
      .as[SessionEvent]
    val sessions = EventStream.sessionize(
      stream, gapMs = 30 * 60 * 1000L, lateness = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("ev_sessions_ooo")
      .outputMode("append").start()
    try {
      writeJson(dir, "b1.json", Seq((1L, "2026-01-01T10:10:00", "click")))
      q.processAllAvailable()
      // out of order but within watermark AND within gap of the open
      // session: must extend session_start backward, not merge-forward
      writeJson(dir, "b2.json", Seq((1L, "2026-01-01T10:05:00", "view")))
      q.processAllAvailable()
      writeJson(dir, "b3.json", Seq((1L, "2026-01-01T12:00:00", "click")))
      q.processAllAvailable()
    } finally q.stop()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val got = spark.table("ev_sessions_ooo")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    assert(got == Set(
      (1L, ts("2026-01-01 10:05:00"), ts("2026-01-01 10:10:00"), 2L)))
  }

  test("stream-stream interval join attributes views to clicks; equals batch") {
    val clickSchema = "click_user LONG, click_ts TIMESTAMP"
    val viewSchema = "view_user LONG, view_ts TIMESTAMP"
    def writeRows(dir: Path, name: String, colU: String, colT: String,
                  rows: Seq[(Long, String)]): Unit =
      Files.writeString(dir.resolve(name), rows.map { case (u, ts) =>
        s"""{"$colU":$u,"$colT":"$ts"}"""
      }.mkString("\n"))

    // u1: view 10:00 within 10min of click 10:05 (pair); view 09:40 too
    // old (no pair). u2: view 10:25 arrives a batch AFTER click 10:30
    // but still joins — the buffered-state case.
    val clicks1 = Seq((1L, "2026-01-01T10:05:00"), (2L, "2026-01-01T10:30:00"))
    val views1 = Seq((1L, "2026-01-01T10:00:00"), (1L, "2026-01-01T09:40:00"))
    val views2 = Seq((2L, "2026-01-01T10:25:00"))

    val cDir = Files.createTempDirectory("graft-clicks")
    val vDir = Files.createTempDirectory("graft-views")
    val joined = EventStream.intervalJoin(
      spark.readStream.schema(clickSchema).json(cDir.toString),
      "click_user", "click_ts",
      spark.readStream.schema(viewSchema).json(vDir.toString),
      "view_user", "view_ts",
      lateness = "30 minutes", lower = "10 minutes", upper = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("ev_attrib")
      .outputMode("append").start()
    try {
      writeRows(cDir, "c1.json", "click_user", "click_ts", clicks1)
      writeRows(vDir, "v1.json", "view_user", "view_ts", views1)
      q.processAllAvailable()
      writeRows(vDir, "v2.json", "view_user", "view_ts", views2)
      q.processAllAvailable()
    } finally q.stop()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val streamed = spark.table("ev_attrib")
      .select("click_user", "click_ts", "view_ts")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(streamed == Set(
      (1L, ts("2026-01-01 10:05:00"), ts("2026-01-01 10:00:00")),
      (2L, ts("2026-01-01 10:30:00"), ts("2026-01-01 10:25:00"))))

    // identical call in batch mode must agree
    val batch = EventStream.intervalJoin(
      spark.read.schema(clickSchema).json(
        clicks1.map { case (u, t) => s"""{"click_user":$u,"click_ts":"$t"}""" }.toDS()),
      "click_user", "click_ts",
      spark.read.schema(viewSchema).json(
        (views1 ++ views2).map { case (u, t) => s"""{"view_user":$u,"view_ts":"$t"}""" }.toDS()),
      "view_user", "view_ts",
      lateness = "30 minutes", lower = "10 minutes", upper = "0 seconds")
      .select("click_user", "click_ts", "view_ts")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(batch == streamed)
  }

  test("streaming hot-key sketch cells equal per-window batch CountMin builds") {
    val file1 = Seq(
      (1L, "2026-01-01T10:00:00", "k_hot"),
      (2L, "2026-01-01T10:01:00", "k_hot"),
      (3L, "2026-01-01T10:02:00", "k_cold"))
    val file2 = Seq(
      (4L, "2026-01-01T10:16:00", "k_hot"),
      (5L, "2026-01-01T10:05:00", "k_hot")) // late, inside watermark

    val dir = Files.createTempDirectory("graft-cms-stream")
    val stream = spark.readStream.schema(schema).json(dir.toString)
    val sketch = EventStream.hotKeySketch(
      stream, "ts", "event_type", "15 minutes", "30 minutes",
      depth = 3, width = 16)
    val q = sketch.writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      writeJson(dir, "batch1.json", file1)
      q.processAllAvailable()
      writeJson(dir, "batch2.json", file2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cms_cells")
      .orderBy("win_start", "r", "cell")
      .as[(java.sql.Timestamp, Int, Long, Long)].collect().toSeq

    // batch parity: per window, cells equal CountMin.build on the slice
    import org.apache.spark.sql.functions.{col, window}
    val all = (file1 ++ file2).map { case (u, ts, t) =>
      s"""{"user_id":$u,"ts":"$ts","event_type":"$t"}"""
    }
    val expected = spark.read.schema(schema).json(all.toDS())
      .select(window(col("ts"), "15 minutes").getField("start").as("win_start"),
        col("event_type"))
    val perWindow = expected.select("win_start").distinct()
      .as[java.sql.Timestamp].collect().sortBy(_.getTime).toSeq
      .flatMap { w =>
        graft.operators.CountMin.build(
            expected.filter(col("win_start") === w), "event_type", 3, 16)
          .as[(Int, Long, Long)].collect().toSeq.sorted
          .map { case (r, c, n) => (w, r, c, n) }
      }
    assert(streamed == perWindow)
    // the sketch state is cells, not keys: never more than d*w rows/window
    assert(streamed.groupBy(_._1).forall(_._2.size <= 3 * 16))
  }

  test("streamed FK-validated windowed counts equal the batch aggregation") {
    val users = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
    // two 15-minute windows; user 99 violates the FK; the 10:05 view
    // in the second file arrives late but inside the 30-min watermark
    val file1 = Seq(
      (1L, "2026-01-01T10:00:00", "click"),
      (2L, "2026-01-01T10:01:00", "view"),
      (99L, "2026-01-01T10:02:00", "click"))
    val file2 = Seq(
      (1L, "2026-01-01T10:16:00", "click"),
      (2L, "2026-01-01T10:05:00", "view"))

    val dir = Files.createTempDirectory("graft-stream")
    val stream = spark.readStream.schema(schema)
      .json(dir.toString)
    val counts = EventStream.windowedCounts(
      EventStream.fkValidated(stream, users, "user_id"),
      "ts", "event_type", "15 minutes", "30 minutes")
    val q = counts.writeStream.format("memory").queryName("ev_counts")
      .outputMode("complete").start()
    try {
      writeJson(dir, "batch1.json", file1)
      q.processAllAvailable()
      writeJson(dir, "batch2.json", file2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ev_counts")
      .orderBy("win_start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq

    val batch = EventStream.windowedCounts(
      EventStream.fkValidated(
        spark.read.schema(schema).json(
          (file1 ++ file2).map { case (u, ts, t) =>
            s"""{"user_id":$u,"ts":"$ts","event_type":"$t"}"""
          }.toDS()),
        users, "user_id"),
      "ts", "event_type", "15 minutes", "30 minutes")
      .orderBy("win_start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq

    assert(streamed == batch)
    // FK violation (user 99) dropped: first window has exactly 1 click
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    assert(streamed == Seq(
      (ts("2026-01-01 10:00:00"), "click", 1L),
      (ts("2026-01-01 10:00:00"), "view", 2L),
      (ts("2026-01-01 10:15:00"), "click", 1L)))
  }
}
