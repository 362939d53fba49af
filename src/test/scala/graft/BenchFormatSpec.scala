package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's stdout contract: one machine-parseable JSON line that
  * FITS the driver's bounded tail capture. r5/r6 shipped a ~3.3 kB
  * full-name line whose front fell outside the window (parsed:null);
  * this pins the budget against query-count growth. No SparkSession
  * needed — the formatter is pure.
  */
class BenchFormatSpec extends AnyFunSuite {

  private def results(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_some_long_query_name_$i", i * 0.123))

  test("compact line for every registered query stays inside the capture window") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst case includes every artifact-publishing query marked
    val pubs = Seq("q70_pagerank", "q79_triangles", "q91_incremental_dedup",
      "q95_mix_manifest", "q164_jsonl_source", "q165_orc_source",
      "q168_avro_source").map(n => (n, 19.9))
    // worst case also carries a warm/cold marker for every
    // artifact-consuming query family
    val arts = (pubs.map(_._1) ++ Seq("q170_stream_dedup_batch",
      "q197_dpp_peak_day", "q200_item_cf", "q202_hits", "q206_stationary",
      "q243_sim_index")).map(n => (n, "warm"))
    val line = Bench.compactLine(
      names.map(n => (n, 9.999)), Nil, "/root/testdata/sf0.1", pubs, arts)
    assert(line.length < 2000,
      s"compact bench line grew to ${line.length} bytes — the driver's " +
        "tail capture will clip it (the r5/r6 parsed:null regression)")
    // qNN keys must stay unique after prefix-shortening, or timings
    // silently overwrite each other in the JSON object
    val keys = names.map(_.takeWhile(_ != '_'))
    assert(keys.distinct.size == keys.size,
      s"duplicate qNN prefixes: ${keys.diff(keys.distinct).distinct}")
  }

  test("fully cold box: a pub entry per artifact family still fits the capture") {
    // the r16 baseline run: 89 publishes + a warm/cold marker for every
    // artifact query blew the line to 2338 bytes and the capture assert
    // killed the bench AFTER all queries had executed — pub/art must be
    // byte-bounded exactly like the query map
    val names = SparkEntry.queries.keys.toSeq.sorted
    val pubs = names.filter(_.hashCode % 2 == 0).map(n => (n, 19.9))
    val arts = names.map(n => (n, if (n.hashCode % 3 == 0) "cold" else "warm"))
    val line = Bench.compactLine(
      names.map(n => (n, 9.999)), Nil, "/root/testdata/sf0.1", pubs, arts)
    assert(line.length < 2000,
      s"cold-box compact line is ${line.length} bytes — exceeds capture")
    assert(line.contains(""""pub":{""") && line.contains(""""art":{"""))
  }

  test("overflowing line folds the fast tail into more/more_sec, keeping the slowest") {
    val many = (1 to 400).map(i => (f"q$i%03d_name", if (i <= 10) 50.0 else 0.1))
    val line = Bench.compactLine(many, Nil, "/tmp/sf")
    assert(line.length < 2000, s"budgeted line still ${line.length} bytes")
    assert(line.contains("\"more\":"), line.take(200))
    assert(line.contains("\"more_sec\":"), line.take(200))
    // every slow query keeps its own entry; only fast ones fold
    for (i <- 1 to 10) assert(line.contains(f""""q$i%03d":50"""), f"q$i%03d missing")
    // the folded remainder keeps the total exact
    assert(line.contains("\"value\":539.000"), line.take(60))
  }

  test("line is valid JSON shape with escaped error strings") {
    val line = Bench.compactLine(results(3),
      Seq(("q01_x", "boom \"quoted\"\npath\\x")), "/tmp/sf")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains("\\\"quoted\\\"") && line.contains("\\n"))
    assert(!line.contains("\n"))
    // 0.123+0.246+0.369 = 0.738
    assert(line.contains(""""value":0.738"""))
  }

  test("detail line keeps full query names") {
    val line = Bench.detailLine(results(2), Nil, "/tmp/sf")
    assert(line.contains("q01_some_long_query_name_1"))
  }

  test("artifact warm/cold markers land under art (qNN keys, single letter)") {
    val line = Bench.compactLine(results(2), Nil, "/tmp/sf", Nil,
      Seq(("q91_incremental_dedup", "warm"), ("q243_sim_index", "cold")))
    assert(line.contains(""""art":{"q91":"w","q243":"c"}"""), line)
    val detail = Bench.detailLine(results(2), Nil, "/tmp/sf", Nil,
      Seq(("q91_incremental_dedup", "warm")))
    assert(detail.contains(""""art":{"q91_incremental_dedup":"warm"}"""),
      detail)
  }

  test("detail line carries every iteration time under iters (DETAIL only)") {
    val detail = Bench.detailLine(results(2), Nil, "/tmp/sf", Nil, Nil,
      Seq(("q01_some_long_query_name_1", Seq(6.613, 3.862, 3.382))))
    assert(detail.contains(
      """"iters":{"q01_some_long_query_name_1":[6.613,3.862,3.382]}"""),
      detail)
    // the byte-budgeted compact stdout line must NOT grow an iters map
    val compact = Bench.compactLine(results(2), Nil, "/tmp/sf")
    assert(!compact.contains("iters"), compact)
  }

  test("publish-inclusive first runs are marked under pub with qNN keys") {
    val line = Bench.compactLine(results(2), Nil, "/tmp/sf",
      Seq(("q91_incremental_dedup", 5.73)))
    assert(line.contains(""""pub":{"q91":5.7}"""))
    val detail = Bench.detailLine(results(2), Nil, "/tmp/sf",
      Seq(("q91_incremental_dedup", 5.73)))
    assert(detail.contains(""""pub":{"q91_incremental_dedup":5.730}"""))
  }
}
