package graft

import org.apache.spark.sql.functions._

import graft.operators.HyperLogLog

/** [[HyperLogLog]]: rho extraction, duplicate-insensitivity,
  * partitioning independence, lossless register merge, and the
  * estimate accuracy the register table exists to provide.
  */
class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  private def regs(values: Seq[String], parts: Int = 4): Map[Long, Int] =
    HyperLogLog.registers(
        values.toDF("v").repartition(parts), col("v"))
      .as[(Long, Int)].collect().toMap

  test("rho is the 1-based lowest set bit; all-zero payload saturates") {
    val got = Seq(1L, 2L, 12L, 0L, 1L << 23).toDF("p")
      .select(HyperLogLog.rho(col("p")).as("r")).as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3, HyperLogLog.PAYLOAD_BITS + 1, 24))
  }

  test("registers ignore duplicates and input partitioning") {
    val vs = (1 to 1000).map(i => s"user-${i % 200}")
    assert(regs(vs) == regs(vs.distinct, parts = 1))
  }

  test("max-merge of shard registers equals the whole-corpus registers") {
    val a = (1 to 3000).map(i => s"u$i")
    val b = (2000 to 5000).map(i => s"u$i") // overlapping shard
    val whole = regs(a ++ b)
    val merged = HyperLogLog.merge(
        HyperLogLog.registers(a.toDF("v"), col("v")),
        HyperLogLog.registers(b.toDF("v"), col("v")))
      .as[(Long, Int)].collect().toMap
    assert(merged == whole)
  }

  test("estimate lands within 3 standard errors of the truth") {
    for (n <- Seq(500, 5000, 50000)) {
      val est = HyperLogLog.estimate(
        HyperLogLog.registers((1 to n).map(i => s"item-$i").toDF("v"),
          col("v")))
      val se = 1.04 / math.sqrt(HyperLogLog.M) // ≈ 6.5%
      assert(math.abs(est - n) <= 3 * se * n,
        s"n=$n est=$est out of ±${3 * se * 100}%")
    }
  }
}
