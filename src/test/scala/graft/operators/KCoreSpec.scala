package graft.operators

import graft.SparkSpec

/** KCore semantics: cycles survive 2-core, pendant chains cascade one
  * node per round, the round budget clips mid-cascade, and a too-high
  * k empties the graph.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    pairs.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("u", "v")

  // triangle 1-2-3 with a pendant chain 3-4-5-6
  private def lollipop = sym(Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))

  test("2-core keeps the triangle, cascades the whole chain off") {
    val got = KCore.residual(lollipop, "u", "v", k = 2, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("the round budget clips mid-cascade (superset of the true core)") {
    // round 1 peels 6, round 2 peels 5; 4 still has degree 1 edge to 3
    val got = KCore.residual(lollipop, "u", "v", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(3L) == 3L && got(4L) == 1L)
  }

  test("a cycle is stable under 2-core on round one (early exit)") {
    val cycle = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    val got = KCore.residual(cycle, "u", "v", k = 2, rounds = 50)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("k above the max degree empties the graph") {
    val got = KCore.residual(lollipop, "u", "v", k = 4, rounds = 8)
    assert(got.isEmpty)
  }
}
