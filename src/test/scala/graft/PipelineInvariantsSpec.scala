package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Self-validating invariants of q113–q116 — the properties their
  * docstrings promise, checked at sf0.001. The oracle gate checks
  * value-level parity with DuckDB; these check the CLAIMS (injected
  * duplicates collapse, thresholds rank correctly, budget math is the
  * ceil-div it says it is).
  */
class PipelineInvariantsSpec extends SparkSpec {

  test("q113: every quantized-code group is exactly original + perturbed copy") {
    val g = PipelineQueries.quantizedDedup.fn(spark, sf0001).cache()
    try {
      assert(g.filter(col("n_copies") =!= 2L).count() == 0,
        "a +1-micro-unit perturbation failed to collapse (or codes collided)")
      // the survivor is always the original, never the injected copy
      assert(g.filter(col("keep_id") >= 1000000L).count() == 0)
    } finally g.unpersist()
  }

  test("q114: exactly TOPK sources blocked, and they have the worst fail rates") {
    val rows = PipelineQueries.sourceBlocklist.fn(spark, sf0001).collect()
    val blocked = rows.filter(_.getAs[Long]("blocked") == 1L)
    assert(blocked.length == math.min(3, rows.length))
    if (blocked.length < rows.length) {
      val bestBlocked = blocked.map(_.getAs[Long]("fail_milli")).min
      val worstUnblocked = rows.filter(_.getAs[Long]("blocked") == 0L)
        .map(_.getAs[Long]("fail_milli")).max
      assert(bestBlocked >= worstUnblocked,
        s"blocked floor $bestBlocked < unblocked ceiling $worstUnblocked")
    }
  }

  test("q115: budget uniform across sources, epochs = ceil(budget/tokens)") {
    val rows = PipelineQueries.tokenBudget.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("budget")).distinct.length == 1)
    rows.foreach { r =>
      val toks = r.getAs[Long]("toks")
      val b = r.getAs[Long]("budget")
      assert(r.getAs[Long]("epochs") == (b + toks - 1) / math.max(toks, 1L))
    }
  }

  test("q116: every injected benchmark copy surfaces at distance zero") {
    val injected = PipelineQueries.embedDecontaminate.fn(spark, sf0001)
      .filter(col("vec_id") >= 1000000L).collect()
    assert(injected.nonEmpty, "no injected copies flagged")
    injected.foreach { r =>
      assert(r.getAs[Long]("min_d2") == 0L,
        s"injected ${r.getAs[Long]("vec_id")} at d2 ${r.getAs[Long]("min_d2")}")
    }
  }
}
