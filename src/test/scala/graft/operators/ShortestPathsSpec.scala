package graft.operators

import graft.SparkSpec

/** Bellman-Ford semantics: cheap multi-hop beats expensive direct,
  * the round budget bounds path length, non-positive edges dropped.
  */
class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  // 1 -> 3 direct costs 10; 1 -> 2 -> 3 costs 2 + 3 = 5;
  // 3 -> 4 costs 1; island 9 -> 10
  private def edges = Seq(
    (1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 1L), (9L, 10L, 4L))
    .toDF("u", "v", "w")

  test("a cheap 2-hop route beats the expensive direct edge") {
    val got = ShortestPaths.distances(edges, "u", "v", "w", 1L, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L))
  }

  test("the round budget bounds path length (1 round = direct edges only)") {
    val got = ShortestPaths.distances(edges, "u", "v", "w", 1L, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 10L),
      "one round must see the direct 1->3 edge at cost 10, not the 2-hop 5")
  }

  test("non-positive edges are dropped, not traversed") {
    val poisoned = edges.union(Seq((1L, 4L, 0L), (1L, 4L, -5L)).toDF("u", "v", "w"))
    val got = ShortestPaths.distances(poisoned, "u", "v", "w", 1L, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got(4L) == 6L)
  }

  test("unreachable nodes are absent") {
    val got = ShortestPaths.distances(edges, "u", "v", "w", 1L, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(!got.contains(9L) && !got.contains(10L))
  }
}
