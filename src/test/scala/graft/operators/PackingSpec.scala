package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long, Long)], budget: Long) =
    Packing.nextFitPack(
        rows.toDF("stratum", "doc_id", "n_tok"),
        "stratum", "doc_id", "n_tok", budget)
      .select("stratum", "doc_id", "bin")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("next-fit opens a new bin exactly at the budget boundary") {
    // budget 10: 6+4 fills bin 0 exactly; 1 must open bin 1
    val b = pack(Seq((0L, 1L, 6L), (0L, 2L, 4L), (0L, 3L, 1L)), budget = 10L)
    assert(b((0L, 1L)) == 0L && b((0L, 2L)) == 0L && b((0L, 3L)) == 1L)
  }

  test("an oversized document occupies a bin alone") {
    val b = pack(Seq((0L, 1L, 3L), (0L, 2L, 99L), (0L, 3L, 3L)), budget = 10L)
    assert(b((0L, 1L)) == 0L)
    assert(b((0L, 2L)) == 1L) // 3+99 > 10 -> new bin, alone
    assert(b((0L, 3L)) == 2L) // 99+3 > 10 -> next bin
  }

  test("strata pack independently and bins restart at 0") {
    val b = pack(Seq((0L, 1L, 8L), (0L, 2L, 8L), (1L, 3L, 8L), (1L, 4L, 8L)),
      budget = 10L)
    assert(b((0L, 1L)) == 0L && b((0L, 2L)) == 1L)
    assert(b((1L, 3L)) == 0L && b((1L, 4L)) == 1L)
  }

  test("assignment is invariant to input partitioning and row order") {
    val rows = (1L to 200L).map(i => (i % 4, i, 1L + i % 13))
    val a = pack(rows, budget = 20L)
    val shuffled = Packing.nextFitPack(
        spark.createDataset(scala.util.Random.shuffle(rows))
          .toDF("stratum", "doc_id", "n_tok").repartition(17),
        "stratum", "doc_id", "n_tok", 20L)
      .select("stratum", "doc_id", "bin")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(a == shuffled)
  }

  test("next-fit guarantee: consecutive bins always overflow the budget") {
    // bin i+1 only opens because load(i) + its first item > budget,
    // so load(i) + load(i+1) > budget for every consecutive pair
    val rows = (1L to 300L).map(i => (i % 8, i, 1L + i % 29))
    val budget = 40L
    val packed = Packing.nextFitPack(
        rows.toDF("stratum", "doc_id", "n_tok"),
        "stratum", "doc_id", "n_tok", budget)
      .groupBy("stratum", "bin").agg(sum("n_tok").as("load"))
      .as[(Long, Long, Long)].collect().toSeq
    for (Seq((s1, b1, l1), (s2, b2, l2)) <-
           packed.sortBy(p => (p._1, p._2)).sliding(2).toSeq if s1 == s2) {
      assert(l1 + l2 > budget,
        s"bins $b1,$b2 of stratum $s1 both underfull ($l1,$l2)")
    }
  }
}
