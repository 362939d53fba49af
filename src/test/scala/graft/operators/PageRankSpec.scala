package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("symmetric pair splits rank mass equally") {
    // 1 <-> 2: perfect symmetry, every iteration keeps r(1) == r(2)
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)), iters = 3)
    assert(r(1L) == r(2L))
    // total mass stays within integer-truncation loss of SCALE
    assert(math.abs(r.values.sum - PageRank.SCALE) < 1000000L)
  }

  test("a hub out-ranks leaves on a star graph") {
    // undirected star: hub 0 against leaves 1..4
    val spokes = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val r = ranksOf(spokes, iters = 3)
    assert((1L to 4L).forall(l => r(0L) > r(l)))
    // leaves are symmetric -> identical ranks
    assert((1L to 4L).map(r).distinct.size == 1)
  }

  test("exact integer recurrence on a 2-node asymmetric graph") {
    // 1 -> 2 plus self-loop on 1 (so node 1 keeps outflow): hand-check
    // one damped round. N=2, r0 = SCALE/2; outdeg(1)=2, outdeg(2)=0
    // is avoided by 2 -> 1 back edge.
    val r1 = ranksOf(Seq((1L, 2L), (1L, 1L), (2L, 1L)), iters = 1)
    val S = PageRank.SCALE
    val r0 = S / 2
    val base = 15 * (S / 2) / 100
    // node 1 inflow: own self-loop share r0/2 + node 2's full r0
    assert(r1(1L) == base + 85 * (r0 / 2 + r0) / 100)
    // node 2 inflow: node 1's share r0/2
    assert(r1(2L) == base + 85 * (r0 / 2) / 100)
  }

  test("duplicate edges collapse; result invariant to partitioning") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L))
    val a = ranksOf(e, iters = 2)
    val b = PageRank.ranks(
        e.toDF("src", "dst").repartition(7).orderBy(desc("dst")),
        "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("dangling node: redistribution conserves mass, default leaks it") {
    // 1 -> 2, 2 -> 3, 3 dangling: without redistribution node 3's rank
    // drains out of the system every round
    val e = Seq((1L, 2L), (2L, 3L))
    val leaky = ranksOf(e, iters = 3)
    val S = PageRank.SCALE
    assert(leaky.values.sum < S - S / 10, "dangling mass should leak by default")
    val r = PageRank.ranks(e.toDF("src", "dst"), "src", "dst",
        iters = 3, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    // total mass within integer-truncation loss of SCALE (each of the
    // 3 rounds loses < a few units per node to the div truncations)
    assert(math.abs(r.values.sum - S) < 1000L * r.size * 3)
    // the chain still orders 3 (two hops of inflow) above 1 (teleport
    // + redistribution only)
    assert(r(3L) > r(2L) && r(2L) > r(1L))
    spark.catalog.clearCache()
  }

  test("redistribution on a dangling-free graph matches the default") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val a = ranksOf(e, iters = 2)
    val b = PageRank.ranks(e.toDF("src", "dst"), "src", "dst",
        iters = 2, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("plan is join/agg shaped — no cartesian product on the edge side") {
    val df = PageRank.ranks(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst", 2)
    val physical = df.queryExecution.executedPlan.toString
    // the only cartesian-ish node allowed is the broadcast 1-row count
    assert(!physical.contains("CartesianProduct"))
    spark.catalog.clearCache()
  }

  test("personalized ranks: teleport pins the source, reach bounds the mass") {
    // triangle {1,2,3} (odd cycle — mixes, no bipartite oscillation)
    // with 4 hung symmetrically off 2 AND 3; disconnected pair (8,9)
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val edges = tri ++ Seq((8L, 9L), (9L, 8L))
    val r = PageRank.personalizedRanks(
      edges.toDF("src", "dst"), "src", "dst", iters = 3, source = 1L)
      .as[(Long, Long)].collect().toMap
    // the source keeps its teleport mass every round
    assert(r(1L) >= 15L * PageRank.SCALE / 100)
    // 2 and 3 are symmetric w.r.t. the source -> identical ranks
    assert(r(2L) == r(3L), s"symmetry broken: $r")
    // the source out-ranks the far node, which still gets SOME mass
    assert(r(1L) > r(4L) && r(4L) > 0L, s"proximity violated: $r")
    // nothing leaks to nodes unreachable from the source
    assert(r(8L) == 0L && r(9L) == 0L)
    // identical at any partitioning
    val r16 = PageRank.personalizedRanks(
      edges.toDF("src", "dst").repartition(16), "src", "dst", 3, 1L)
      .as[(Long, Long)].collect().toMap
    assert(r == r16)
  }
}
