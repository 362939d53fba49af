package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Hashing
import graft.multimodal.Multimodal
import graft.operators.Dedup

/** ScalaCheck-generated property tests, batch-evaluated: each property
  * generates a few hundred cases with a fixed seed and evaluates them
  * in ONE DataFrame job (a Spark job per ScalaCheck case would take
  * minutes). Replaces the reference's randomized self-oracle pattern
  * (buzzdb_lab1.cpp:1227-1270) with seeded generators.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("hash family ranges: h32 in [0, 2^32), seeded in [0, P), all seeds") {
    val strs = sample(Gen.asciiPrintableStr, 300).toDF("s")
    val cols = col("s") +: (Hashing.h32(col("s")).as("h") +:
      (0 until 16).map(i => Hashing.seeded(i, col("s")).as(s"s$i")))
    val rows = strs.select(cols: _*).collect()
    rows.foreach { r =>
      val h = r.getLong(1)
      assert(h >= 0L && h < (1L << 32), s"h32 out of range: $h")
      (0 until 16).foreach { i =>
        val v = r.getLong(i + 2)
        assert(v >= 0L && v < Hashing.P, s"seeded($i) out of range: $v")
      }
    }
    // the affine family must not be degenerate: multipliers distinct
    assert((0 until 16).map(Hashing.mult).distinct.size == 16)
  }

  test("winnowing guarantee: docs sharing a >= k+w-1 run share a fingerprint") {
    // random distinct word-soup docs, each pair given a shared marker
    // run longer than the winnowing guarantee threshold (k=8, w=4)
    val wordG = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val docG = Gen.listOfN(12, wordG).map(_.mkString(" "))
    val docs = sample(docG, 40)
    val marker = "shared marker run long enough to survive"
    val d = docs.zipWithIndex.map { case (t, i) =>
      // even ids carry the marker mid-text, odd ids don't
      (i.toLong, if (i % 2 == 0) s"$t $marker $t" else t)
    }.toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(d, "doc_id", "text", k = 8, w = 4)
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val withMarker = (0 until 40 by 2).map(_.toLong)
    // every marker-carrying pair shares at least one fingerprint
    val sharedAll = withMarker.map(fp(_)).reduce(_ & _)
    assert(sharedAll.nonEmpty,
      "marker docs share no fingerprint despite a 40-char shared run")
  }

  test("kmeans centroids are the exact integer means of the final assignment") {
    import graft.operators.VectorQuantizer
    val vecG = Gen.listOfN(4, Gen.chooseNum(-1.0f, 1.0f)).map(_.toArray)
    val vecs = sample(vecG, 60).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val emb = vecs.toDF("vec_id", "embedding")
    val e = VectorQuantizer.scaled(emb, "vec_id", "embedding").persist()
    val fitted = VectorQuantizer.fitCentroids(e, "vec_id", c = 4, iters = 2)
    // recompute: assignment against the PENULTIMATE centroids produced
    // the final ones; assert via one more exact recomputation in Spark
    def update(assign: org.apache.spark.sql.DataFrame) =
      e.join(assign, Seq("vec_id"))
        .select(col("cell"), posexplode(col("xs")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(round(sum(col("x")) / count(lit(1))).cast("long").as("cs"))
    val cent1 = {
      val c = e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("cell"), col("xs").as("cs"))
      update(VectorQuantizer.assignCells(e, c, "vec_id"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cs")))),
          s => s.getField("cs")).as("cs"))
    }
    val a2 = VectorQuantizer.assignCells(e, cent1, "vec_id")
    val expect = update(a2)
      .select(col("cell"), (col("pos") + 1).cast("long").as("dim"), col("cs"))
      .as[(Long, Long, Long)].collect().toSet
    val got = fitted
      .select(col("cell"), col("n"), posexplode(col("cs")).as(Seq("pos", "csv")))
      .select(col("cell"), (col("pos") + 1).cast("long").as("dim"), col("csv"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
    e.unpersist()
  }

  test("count-min never undercounts on random weighted corpora") {
    import graft.operators.CountMin
    // random multiset: 200 draws over a 30-term alphabet
    val terms = sample(Gen.choose(0, 29), 200).map(i => s"w$i")
    val items = terms.toDF("term")
    val (dd, ww) = (3, 8) // deliberately tight width: collisions certain
    val sketch = CountMin.build(items, "term", dd, ww)
    val exact = items.groupBy("term").agg(count(lit(1)).as("n"))
    val bad = exact.join(
        CountMin.estimate(sketch, exact.select("term"), "term", dd, ww),
        Seq("term"))
      .filter(col("cms_est") < col("n"))
    assert(bad.isEmpty, s"undercount: ${bad.collect().mkString(",")}")
  }

  test("shingle count: n words yield exactly max(n-2, 0) shingles when all distinct") {
    val wordCounts = sample(Gen.choose(0, 40), 120)
    val docs = wordCounts.zipWithIndex.map { case (n, i) =>
      // globally unique words: every shingle distinct by construction
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val counts = Dedup.shingleSet(docs, "doc_id", "text", 3)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    wordCounts.zipWithIndex.foreach { case (n, i) =>
      val expected = math.max(n - 2, 0)
      // split(" ") on "" yields one empty token, still below n=3
      assert(counts.getOrElse(i.toLong, 0L) == expected,
        s"doc $i with $n words: ${counts.getOrElse(i.toLong, 0L)} != $expected")
    }
  }

  test("fitWithin: always inside the box, never upscaled, floors at 1, ratio kept") {
    val dims = sample(Gen.zip(Gen.choose(1, 4000), Gen.choose(1, 4000)), 300)
    val (fw, fh) = Multimodal.fitWithin(col("w"), col("h"), 320, 240)
    val rows = dims.toDF("w", "h")
      .select(col("w"), col("h"), fw.as("fw"), fh.as("fh"))
      .as[(Int, Int, Int, Int)].collect()
    rows.foreach { case (w, h, w2, h2) =>
      assert(w2 >= 1 && h2 >= 1 && w2 <= 320 && h2 <= 240, s"($w,$h)->($w2,$h2)")
      assert(w2 <= w && h2 <= h, s"upscaled ($w,$h)->($w2,$h2)")
      if (w <= 320 && h <= 240) assert((w2, h2) == ((w, h)), "no-op case resized")
    }
  }

  test("persisted-index probe ≡ in-plan band join on random corpora") {
    import graft.operators.DedupIndex
    // three random corpora with planted redeliveries: the persisted
    // bucket-pruned probe must reproduce the in-plan candidate set
    // EXACTLY — any drift would silently change q91's dedup decisions
    val word = Gen.choose(1, 60).map(i => s"w$i")
    val docGen = Gen.choose(8, 20).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    for (seed <- Seq(1L, 2L, 3L)) {
      val texts = Gen.listOfN(30, docGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
      val idx = texts.take(20).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val fresh = (texts.drop(20).zipWithIndex
        .map { case (t, i) => (100L + i, t) } :+ ((500L, texts.head)))
        .toDF("doc_id", "text")
      val sigI = Dedup.minhashSignatures(idx, "doc_id", "text", 16)
      val sigN = Dedup.minhashSignatures(fresh, "doc_id", "text", 16)
      val root = java.nio.file.Files
        .createTempDirectory(s"prop-idx-$seed").toString
      DedupIndex.publish(sigI, "doc_id", 4, 4, root)
      val persisted = DedupIndex.probe(spark, sigN, "doc_id", 4, 4, root)
        .as[(Long, Long)].collect().toSet
      val inPlan = Dedup.incrementalCandidates(sigN, sigI, "doc_id", 4, 4)
        .as[(Long, Long)].collect().toSet
      assert(persisted == inPlan, s"seed $seed drifted")
      assert(inPlan.contains((500L, 0L)), s"seed $seed lost the redelivery")
    }
  }

  test("pinned mix manifest reselects identical membership across reloads") {
    import graft.operators.MixManifest
    val src = Gen.oneOf("web", "books", "code", "forum")
    val docs = sample(src, 400).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val root = java.nio.file.Files.createTempDirectory("prop-mix").toString
    MixManifest.publish(docs, "doc_id", "source", 1000000L, 80, 90, root)
    def membership(): Set[(Long, String)] = MixManifest
      .applyMix(docs, MixManifest.load(spark, root), "doc_id", "source")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val a = membership()
    assert(a == membership() && a.nonEmpty)
    // split shares follow the pinned 80/10/10 bounds on kept docs
    val bySplit = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("val", 0))
  }

  test("clamp-at-zero update semantics (ref buzzdb_lab1.cpp:619-622)") {
    val cases = sample(Gen.zip(Gen.choose(0, 1000), Gen.choose(-2000, 2000)), 300)
    val rows = cases.toDF("views", "delta")
      .select(col("views"), col("delta"),
        greatest(lit(0), col("views") + col("delta")).as("updated"))
      .as[(Int, Int, Int)].collect()
    rows.foreach { case (v, d, u) =>
      assert(u == math.max(0, v + d), s"clamp($v, $d) = $u")
    }
  }
}
