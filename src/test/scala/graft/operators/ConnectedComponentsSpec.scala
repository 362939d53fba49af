package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def assignMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.assign(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  /** Brute-force union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to its minimum") {
    val m = assignMap(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components stay separate; self-loops and dups are ignored") {
    val m = assignMap(Seq((10L, 20L), (20L, 10L), (5L, 5L), (30L, 40L), (40L, 50L)))
    assert(m == Map(10L -> 10L, 20L -> 10L, 30L -> 30L, 40L -> 30L, 50L -> 30L))
  }

  test("empty edge set yields empty assignment") {
    assert(assignMap(Seq.empty) == Map.empty)
  }

  test("assignment matches union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges
    // a handful of sampled graphs, each one Spark run (a run per
    // ScalaCheck case would take minutes)
    (1 to 6).foreach { i =>
      val edges = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      assert(assignMap(edges) == unionFind(edges.filter(e => e._1 != e._2)),
        s"graph seed $i: $edges")
    }
  }

  test("incremental delta fold equals a full recompute (merges, new nodes, absorbed edges)") {
    // base: {1,2,3} and {10,11}; delta merges the two components
    // (3-10), adds a brand-new component {20,21}, attaches a new
    // node to an old component (11-12), and includes an
    // already-absorbed edge (1-3)
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val delta = Seq((3L, 10L), (20L, 21L), (11L, 12L), (1L, 3L))
      .toDF("u", "v")
    val baseComp = ConnectedComponents.assign(base)
    val got = ConnectedComponents.incremental(baseComp, delta)
      .as[(Long, Long)].collect().toMap
    val want = ConnectedComponents.assign(base.unionByName(delta))
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"incremental=$got full=$want")
    assert(got(10L) == 1L && got(12L) == 1L, s"merge lost min label: $got")
    assert(got(21L) == 20L)
  }

  test("incremental with a no-merge delta is the identity") {
    val base = Seq((1L, 2L)).toDF("u", "v")
    val baseComp = ConnectedComponents.assign(base)
    // delta edge entirely inside the existing component
    val got = ConnectedComponents.incremental(baseComp,
        Seq((2L, 1L)).toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("incremental equals full recompute on sampled random graphs and splits") {
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { trial =>
      val n = 14
      val edges = (1 to 20).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val (base, delta) = edges.partition(_ => rnd.nextBoolean())
      if (base.nonEmpty && delta.nonEmpty) {
        val baseDf = base.toDF("u", "v")
        val deltaDf = delta.toDF("u", "v")
        val got = ConnectedComponents
          .incremental(ConnectedComponents.assign(baseDf), deltaDf)
          .as[(Long, Long)].collect().toMap
        val want = ConnectedComponents
          .assign(baseDf.unionByName(deltaDf))
          .as[(Long, Long)].collect().toMap
        assert(got == want,
          s"trial $trial: base=$base delta=$delta\ngot=$got\nwant=$want")
      }
      spark.catalog.clearCache()
    }
  }

  test("star rounds are join/groupBy shaped — no cartesian product") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val plan = ConnectedComponents
      .smallStar(ConnectedComponents.largeStar(e))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
