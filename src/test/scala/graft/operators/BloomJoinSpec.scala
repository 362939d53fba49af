package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  // spark.range, not a local Seq: ConvertToLocalRelation would fold a
  // LocalRelation filter at plan time and hide the codegen'd shape
  private lazy val probe = spark.range(1L, 1001L).toDF("id")
  private lazy val build = Seq(3L, 77L, 500L, 999L).toDF("key")

  test("bloom-pruned semi join equals the exact semi join, even undersized") {
    // m=64, k=2: heavy false-positive rate — result must still be exact
    val pruned = BloomJoin.semiJoin(probe, build, "id", "key",
        mBits = 64, k = 2)
      .as[Long].collect().sorted.toSeq
    assert(pruned == Seq(3L, 77L, 500L, 999L))
  }

  test("no false negatives: every build key passes the probe predicate") {
    val bm = BloomJoin.buildBitmap(build, "key", mBits = 128, k = 3)
    val pass = build.filter(BloomJoin.mightContain(col("key"), bm, 128, 3))
    assert(pass.count() == build.count())
  }

  test("a sized bloom prunes most non-matching probe rows before the join") {
    val bm = BloomJoin.buildBitmap(build, "key", mBits = 4096, k = 3)
    val survivors = probe
      .filter(BloomJoin.mightContain(col("id"), bm, 4096, 3)).count()
    // 4 true keys; FP rate at m/n=1024, k=3 is well under 1%
    assert(survivors >= 4 && survivors < 50, s"survivors=$survivors")
  }

  test("probe predicate stays codegen (no UDF in the filter)") {
    val bm = BloomJoin.buildBitmap(build, "key", mBits = 128, k = 3)
    val plan = probe.filter(BloomJoin.mightContain(col("id"), bm, 128, 3))
      .queryExecution.executedPlan.toString
    // "*(1) Filter" is the whole-stage-codegen marker in plan strings
    assert(plan.contains("*(1) Filter"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
