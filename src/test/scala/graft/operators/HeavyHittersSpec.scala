package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Misra-Gries contract: candidates are partition-order-dependent,
  * but (a) every global heavy hitter survives in the candidate union
  * (the pigeonhole superset guarantee), and (b) the recount-filtered
  * final answer is therefore exact and partitioning-invariant.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: item i appears ~ N/i times, plus a long unique tail.
  private def corpus: Seq[String] = {
    val head = (1 to 20).flatMap(i => Seq.fill(600 / i)(s"hot$i"))
    val tail = (1 to 3000).map(i => s"rare$i")
    head ++ tail
  }

  private def exactHeavy(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      .filter { case (_, c) => c * k > n }
  }

  test("candidate union is a superset of the exact heavy hitters, " +
    "under adversarial partitionings") {
    val k = 25
    val heavy = exactHeavy(corpus, k).keySet
    assert(heavy.nonEmpty, "test needs at least one heavy hitter")
    // three adversarial layouts: sorted (each hot item clustered in one
    // partition), round-robin interleaved, and reverse-sorted
    val layouts = Seq(corpus.sorted, corpus.reverse,
      corpus.zipWithIndex.sortBy(_._2 % 7).map(_._1))
    layouts.zipWithIndex.foreach { case (data, li) =>
      val df = spark.sparkContext.parallelize(data, 8).toDF("w")
      val cand = HeavyHitters.mgCandidates(df, "w", k)
        .as[String].collect().toSet
      assert(heavy.subsetOf(cand),
        s"layout $li lost heavy hitters: ${heavy -- cand}")
      // and the sketch did its job: far fewer candidates than vocab
      assert(cand.size <= 8 * k, s"layout $li kept ${cand.size} candidates")
    }
  }

  test("recount-filtered answer is exact and partitioning-invariant") {
    val k = 25
    val expected = exactHeavy(corpus, k)
    Seq(corpus, corpus.sorted, corpus.reverse).zipWithIndex.foreach {
      case (data, li) =>
        val tok = spark.sparkContext.parallelize(data, 8).toDF("w").persist()
        val cand = HeavyHitters.mgCandidates(tok, "w", k)
        val n = tok.agg(count(lit(1)).as("n"))
        val got = tok.join(cand, Seq("w"), "leftsemi")
          .groupBy("w").agg(count(lit(1)).as("n_w"))
          .crossJoin(n)
          .filter(col("n_w") * k > col("n"))
          .select("w", "n_w").as[(String, Long)].collect().toMap
        tok.unpersist()
        assert(got == expected, s"layout $li mismatch")
    }
  }

  test("k=1 degenerates safely (no majority item -> empty answer)") {
    val df = Seq("a", "b", "a", "b").toDF("w")
    val cand = HeavyHitters.mgCandidates(df, "w", 1)
    // MG with one counter may keep an arbitrary candidate, but the
    // recount filter (> n/1) can never pass without a true majority
    assert(cand.count() <= df.rdd.getNumPartitions)
  }
}
