package graft

import graft.operators.LabelPropagation

/** [[LabelPropagation]]: synchronous-update semantics, the
  * deterministic tie-break, community structure a reachability pass
  * cannot see, and partitioning independence.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int,
                  parts: Int = 4): Map[Long, Long] =
    LabelPropagation.labels(
      edges.toDF("u", "v").repartition(parts), "u", "v", rounds)
      .as[(Long, Long)].collect().toMap

  test("one synchronous round on a path: ties break to the min label") {
    // 1–2–3: node 2 sees {1, 3} (tie → 1); nodes 1 and 3 see {2}
    assert(run(Seq((1L, 2L), (2L, 3L)), 1) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("a clique converges to one label") {
    val nodes = (1L to 5L)
    val clique = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    val m = run(clique, 3)
    assert(m.values.toSet.size == 1)
  }

  test("two cliques over one bridge keep separate communities (CC would merge)") {
    val c1 = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val c2 = for { a <- 11L to 15L; b <- 11L to 15L if a < b } yield (a, b)
    val m = run(c1 ++ c2 :+ ((5L, 11L)), 4)
    val left = (1L to 5L).map(m)
    val right = (11L to 15L).map(m)
    assert(left.toSet.size == 1 && right.toSet.size == 1)
    assert(left.head != right.head,
      "dense communities must not merge across a single bridge")
  }

  test("labels are independent of input partitioning") {
    val edges = (for { a <- 1L to 8L; b <- 1L to 8L if a < b && (a + b) % 3 != 0 }
      yield (a, b)) ++ Seq((8L, 20L), (20L, 21L), (21L, 8L))
    assert(run(edges, 3, parts = 1) == run(edges, 3, parts = 16))
  }
}
