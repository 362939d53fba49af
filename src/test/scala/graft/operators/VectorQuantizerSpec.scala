package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 2-D clusters; seeds (ids 0, 1) land one per
  // cluster, so 2 Lloyd rounds must recover the exact means
  private lazy val emb = Seq(
    (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)),
    (2L, Array(0.2f, 0.0f)), (3L, Array(10.2f, 10.0f)),
    (4L, Array(0.4f, 0.0f)), (5L, Array(10.4f, 10.0f)))
    .toDF("vec_id", "embedding")

  test("fit recovers the exact integer-scaled cluster means") {
    val fitted = VectorQuantizer.fit(emb, "vec_id", "embedding", c = 2, iters = 2)
      .select("cell", "dim", "cs", "n")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byCell = fitted.groupBy(_._1)
    assert(byCell(0L).map(r => r._2 -> r._3).toMap ==
      Map(1L -> 200000L, 2L -> 0L))           // mean(0, 0.2, 0.4) = 0.2
    assert(byCell(1L).map(r => r._2 -> r._3).toMap ==
      Map(1L -> 10200000L, 2L -> 10000000L))  // mean(10, 10.2, 10.4), mean(10)
    assert(fitted.map(r => r._1 -> r._4).toMap == Map(0L -> 3L, 1L -> 3L))
  }

  test("assignCells is an exact argmin with ties to the lowest cell") {
    val corpus = VectorQuantizer.scaled(emb, "vec_id", "embedding")
    // two identical centroids: every vector must pick cell 0
    val cent = VectorQuantizer.scaled(
      Seq((0L, Array(5.0f, 5.0f)), (1L, Array(5.0f, 5.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select(col("vec_id").as("cell"), col("xs").as("cs"))
    val cells = VectorQuantizer.assignCells(corpus, cent, "vec_id")
      .select("cell").as[Long].collect().toSet
    assert(cells == Set(0L))
  }

  test("scaled guards the exact-arithmetic domain instead of wrapping") {
    // |x| = 23 is inside the guarded domain; 23.5 must raise rather
    // than risk a silent long overflow in the distance sums
    // consume xs (a bare count() would prune the guarded column away)
    val ok = Seq((0L, Array(23.0f, -23.0f))).toDF("vec_id", "embedding")
    assert(VectorQuantizer.scaled(ok, "vec_id", "embedding")
      .select(explode(col("xs")).as("x")).agg(sum("x")).as[Long].head() == 0L)
    val bad = Seq((0L, Array(23.5f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      VectorQuantizer.scaled(bad, "vec_id", "embedding")
        .select(explode(col("xs")).as("x")).agg(sum("x")).as[Long].head()
    }
    assert(e.getMessage.contains("pre-normalize"))
  }

  test("fit plans no cartesian product") {
    val p = VectorQuantizer.fit(emb, "vec_id", "embedding", 2, 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
  }
}
