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
}
