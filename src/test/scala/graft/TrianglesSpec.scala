package graft

import graft.operators.Triangles

/** [[Triangles.perNode]] against hand-countable graphs, including the
  * input forms the canonicalization must absorb (mixed direction,
  * duplicates, self-loops) and the skew case the degree ordering
  * exists for.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap

  test("two triangles sharing a vertex, pendant edge excluded") {
    // {1,2,3} and {3,4,5} share node 3; (5,6) closes nothing
    val m = count(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L), (5L, 6L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("K4: every vertex in C(3,2)=3 triangles") {
    val nodes = Seq(7L, 8L, 9L, 10L)
    val edges = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    assert(count(edges) == nodes.map(_ -> 3L).toMap)
  }

  test("mixed direction, duplicates and self-loops are canonicalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 3L), (1L, 3L), (2L, 2L))
    assert(count(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle-free star produces no rows (hub wedge explosion avoided by design)") {
    // star K1,20: raw wedge count from the hub would be C(20,2); the
    // degree orientation points every edge INTO the hub, so zero
    // wedges are enumerated at the hub — the celebrity-node bound
    val star = (2L to 21L).map(leaf => (1L, leaf))
    assert(count(star).isEmpty)
  }

  test("broadcast-intersection and shuffle-wedge paths agree exactly") {
    // a mixed graph with shared-vertex triangles, a K4 and noise
    val nodes = Seq(7L, 8L, 9L, 10L)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L)) ++
      (for { a <- nodes; b <- nodes if a < b } yield (a, b)) ++
      Seq((6L, 7L), (2L, 9L))
    val small = Triangles.perNode(edges.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap
    val large = Triangles.perNode(edges.toDF("u", "v"), "u", "v",
        broadcastLimit = 0L) // force the shuffle wedge join
      .as[(Long, Long)].collect().toMap
    assert(small == large)
    assert(small.nonEmpty)
  }

  test("triangle count is independent of partitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (3L, 5L))
    val one = Triangles.perNode(
      edges.toDF("u", "v").repartition(1), "u", "v")
      .as[(Long, Long)].collect().toMap
    val many = Triangles.perNode(
      edges.toDF("u", "v").repartition(16), "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(one == many)
  }
}
