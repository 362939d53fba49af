package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  // (key, version, seq, value) changelog with out-of-order arrivals
  private lazy val changes = Seq(
    (1L, 0L, 0L, "base-1"),
    (1L, 50L, 7L, "mid-1"),
    (1L, 90L, 2L, "last-1"),
    (2L, 0L, 0L, "base-2"),
    (3L, 10L, 1L, "only-update-3"),
    (4L, 30L, 1L, "tie-lo-4"),
    (4L, 30L, 2L, "tie-hi-4"))
    .toDF("k", "ver", "seq", "v").repartition(5)

  test("latestWins keeps exactly the newest version per key") {
    val got = Merge.latestWins(changes, Seq("k"), Seq("ver", "seq"))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "last-1",      // newest ver wins over higher seq at older ver
      2L -> "base-2",      // no updates -> base survives
      3L -> "only-update-3",
      4L -> "tie-hi-4"))   // same ver -> seq breaks the tie
  }

  test("latestWins emits one row per key and preserves the payload schema") {
    val out = Merge.latestWins(changes, Seq("k"), Seq("ver", "seq"))
    assert(out.columns.toSeq == Seq("k", "ver", "seq", "v"))
    assert(out.groupBy("k").count().filter(col("count") > 1).isEmpty)
    assert(out.count() == 4)
  }

  test("result is invariant to input partitioning and row order") {
    val a = Merge.latestWins(changes.repartition(1), Seq("k"), Seq("ver", "seq"))
      .orderBy("k").collect().toSeq
    val b = Merge.latestWins(
        changes.orderBy(desc("seq")).repartition(7), Seq("k"), Seq("ver", "seq"))
      .orderBy("k").collect().toSeq
    assert(a == b)
  }
}
