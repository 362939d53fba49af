package graft.operators

import graft.SparkSpec

/** BFS semantics: shortest hop counts, budget clipping, early exit on
  * an exhausted frontier, unreachable nodes absent.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  // chain 1-2-3-4-5 plus a shortcut 1-4 and an island 9-10
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (9L, 10L))
    .flatMap { case (u, v) => Seq((u, v), (v, u)) }
    .toDF("u", "v")

  test("hops are shortest-path lengths (shortcut wins over the chain)") {
    val got = Bfs.levels(edges, "u", "v", source = 1L, maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("maxHops clips the traversal") {
    val got = Bfs.levels(edges, "u", "v", source = 1L, maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("the island is never reached; exhausted frontier exits early") {
    val got = Bfs.levels(edges, "u", "v", source = 9L, maxHops = 50)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(9L -> 0L, 10L -> 1L))
  }

  test("maxHops = 0 returns just the source") {
    val got = Bfs.levels(edges, "u", "v", source = 3L, maxHops = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 0L))
  }
}
