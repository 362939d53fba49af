package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom per-key top-k operator: value-equal to the window form,
  * planned sort-free as Partial → Exchange → Final with the partial
  * side capping shuffle input at k rows per (key, partition).
  */
class PerKeyTopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 1000).map { i =>
    (i % 13L, (i * 2654435761L) % 997, i.toLong)
  }.toDF("key", "score", "id")

  test("matches the window row_number form exactly (incl. ties)") {
    val got = PerKeyTopK(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 5)
      .select("key", "score", "id")
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("key").orderBy(desc("score"), asc("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("key", "score", "id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.size == 13 * 5)
  }

  test("k larger than the group emits the whole group, ranked") {
    val tiny = Seq((1L, 30L, 1L), (1L, 10L, 2L), (2L, 20L, 3L))
      .toDF("key", "score", "id")
    val got = PerKeyTopK(tiny, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 5)
      .select("key", "score", "id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.toSet == Set((1L, 30L, 1L), (1L, 10L, 2L), (2L, 20L, 3L)))
    // within a key, rows come out in ranking order
    assert(got.filter(_._1 == 1L).map(_._2) == Seq(30L, 10L))
  }

  test("empty input yields empty output") {
    val empty = df.filter(col("key") < 0)
    assert(PerKeyTopK(empty, Seq(col("key")),
      Seq(col("score").desc), 3).count() == 0)
  }

  test("plans Partial -> Exchange -> Final with NO sort anywhere") {
    val p = PerKeyTopK(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 5)
      .queryExecution.executedPlan.toString
    assert("PerKeyTopK \\[".r.findAllIn(p).size == 2,
      s"expected partial+final operator pair:\n$p")
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Sort "),
      s"the whole point is no sort; window form would plan one:\n$p")
  }

  test("partial side caps shuffle rows at k per (key, partition)") {
    // 1000 rows, 13 keys, k=5, input coalesced to 4 partitions: the
    // exchange moves at most 13*5*4 rows instead of 1000
    val coalesced = df.coalesce(4)
    val q = PerKeyTopK(coalesced, Seq(col("key")),
      Seq(col("score").desc, col("id").asc), 5)
    q.collect()
    val executed = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // query stages are traversal leaves — recurse into their plans
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val into = p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(qs.plan)
        case _ => Nil
      }
      (p +: p.children.flatMap(nodes)) ++ into
    }
    val shuffles = nodes(executed).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.nonEmpty, executed.toString)
    val written = shuffles.head.metrics("shuffleRecordsWritten").value
    assert(written > 0 && written <= 13L * 5 * 4,
      s"partial cap failed: $written rows shuffled (input was 1000)")
  }
}
