package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-means vector quantization (Lloyd's algorithm) over an
  * embedding column — the trained upgrade of [[Similarity.ivfTopK]]'s
  * deterministic pivot quantizer: run `fit`, feed the centroids to the
  * IVF cell-assignment seam, and the inverted file clusters around
  * actual data density instead of arbitrary pivots.
  *
  * Everything is exact integer arithmetic so the result is
  * bit-identical on any engine, any partitioning, any executor count:
  * components are scaled to micro-units (`round(x·10⁶)` longs) with a
  * GUARDED domain of |x| ≤ 23 — the bound under which a long sum of
  * squared deltas cannot wrap at any d ≤ 4096 (d·(2·23·10⁶)² < 2⁶³;
  * Spark's non-ANSI sum(long) wraps silently while DuckDB promotes to
  * HUGEINT, so an unguarded overflow would break cross-engine
  * bit-identity, not just precision — [[scaled]] raises instead).
  * Any normalized embedding family sits far inside the bound;
  * pre-scale wider domains down. Centroid updates re-quantize to the
  * same scaled domain, and argmin ties break on the lowest cell id.
  * Floating-point k-means would converge equally well but no two runs
  * — let alone two engines — would agree bit-for-bit on the result;
  * this is the same determinism stance as the integer-cents monetary
  * sums (SCALE.md).
  *
  * Scale shape per iteration: scoring is one fused
  * [[graft.plans.L2DistSq]] loop per (vector, cell) pair against the
  * broadcast centroid table — the corpus stays in ARRAY form, so the
  * distance stage materializes n·c scored rows, not the n·c·d
  * long-form join rows of the per-dimension formulation it replaced
  * (measured 64× fewer rows at d = 64; q71's 12.9 s → see BENCH).
  * The centroid update explodes only the n assigned vectors (n·d
  * rows, independent of c), one groupBy (cell, dim), and folds back
  * to arrays. All shuffles are keyed on corpus-sized keys, nothing
  * driver-side, no O(N²) anywhere. Seeding is the first `c` vectors
  * by id (deterministic; k-means|| would drop into the same seam).
  */
object VectorQuantizer {

  private val SCALE = graft.functions.VectorFunctions.MICRO

  /** Largest |component| for which long squared-delta sums are exact
    * at any d ≤ 4096 (see object doc); enforced per element by the
    * shared guarded scaling ([[graft.functions.VectorFunctions
    * .scaledMicro]]).
    */
  val MAX_ABS: Double = graft.functions.VectorFunctions.MAX_ABS

  /** Scaled corpus in array form: (id, xs: array<long>) with
    * xs[i] = round(x[i]·10⁶). Components outside ±[[MAX_ABS]] raise
    * (assert_true) rather than risk a silent long overflow downstream
    * — one codegen'd compare per element, no extra pass.
    */
  def scaled(emb: DataFrame, id: String, vec: String): DataFrame =
    emb.select(col(id),
      graft.functions.VectorFunctions.scaledMicro(col(vec)).as("xs"))

  /** Native fused integer squared-L2 ([[graft.plans.L2DistSq]]) — the
    * scoring hot path of [[assignCells]], exposed for callers that
    * score against a codebook directly.
    */
  def l2DistSq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.L2DistSq(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** `iters` Lloyd rounds from first-`c`-vectors seeds; returns the
    * long-form codebook (cell, dim, cs, n) — scaled centroid
    * components (dim 1-based) plus the cell's final assignment count.
    */
  def fit(emb: DataFrame, id: String, vec: String,
          c: Int, iters: Int): DataFrame = {
    val e = scaled(emb, id, vec).persist()
    // checkpoint the (tiny) result so the corpus cache can be released
    // before returning — fit() owns e, so it must not leak it
    val out = fitCentroids(e, id, c, iters)
      .select(col("cell"), col("n"), posexplode(col("cs")).as(Seq("pos", "csv")))
      .select(col("cell"), (col("pos") + 1).cast("long").as("dim"),
        col("csv").as("cs"), col("n"))
      .localCheckpoint()
    e.unpersist()
    out
  }

  /** [[fit]] over an already-[[scaled]] (persisted) corpus — the
    * entry point when the caller also needs the scaled frame for cell
    * assignment afterwards (q54's trained IVF search). Returns the
    * array-form codebook (cell, cs: array<long>, n). The caller owns
    * the corpus cache.
    */
  def fitCentroids(e: DataFrame, id: String, c: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"at least one Lloyd round required, got $iters")
    var cent = e.filter(col(id) < c)
      .select(col(id).as("cell"), col("xs").as("cs"))
    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      assign = assignCells(e, cent, id)
      // per-dim means need the long form, but only over the n assigned
      // vectors (n·d rows — independent of the cell count, unlike the
      // distance stage this update used to share a shape with); fold
      // back to arrays ordered by dim, and checkpoint each round's
      // (c-row — tiny) codebook: the plan stays O(1) in iteration
      // count, and downstream consumers that broadcast it (assignment,
      // probing) read materialized rows instead of replaying the whole
      // fit per broadcast — the same practice as ConnectedComponents'
      // rounds
      cent = e.join(assign, Seq(id))
        .select(col("cell"), posexplode(col("xs")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(round(sum(col("x")) / count(lit(1))).cast("long").as("cs"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cs")))),
          s => s.getField("cs")).as("cs"))
        .localCheckpoint()
    }
    val n = assign.groupBy("cell").agg(count(lit(1)).as("n"))
    cent.join(n, Seq("cell"))
  }

  /** Nearest-centroid assignment: exact integer squared-L2 argmin,
    * ties to the lowest cell id. `cent` is the array-form codebook
    * (cell, cs). Returns one (id, cell) row per id for `top = 1`
    * (cluster assignment) or the `top` nearest cells per id (IVF
    * probing).
    */
  def assignCells(scaledCorpus: DataFrame, cent: DataFrame,
                  id: String, top: Int = 1): DataFrame = {
    // long arithmetic is exact here BY CONSTRUCTION: [[scaled]] guards
    // |x| ≤ MAX_ABS, so Σdelta² ≤ d·(2·MAX_ABS·SCALE)² < 2⁶³ for any
    // d ≤ 4096 — no silent wrap, and integer addition is order-free,
    // so the fused-loop sum is bit-identical to the oracle's per-dim
    // SUM. One scored row per (vector, cell): the broadcast
    // nested-loop join against the c-row codebook is the intended
    // plan — c is bounded (√n at the largest, see Similarity.cellsFor)
    // while the corpus side streams through codegen untouched.
    val d2 = scaledCorpus
      .crossJoin(broadcast(cent.select(col("cell"), col("cs"))))
      .select(col(id), col("cell"), l2DistSq(col("xs"), col("cs")).as("d2"))
    d2.withColumn("rnk",
        row_number().over(Window.partitionBy(col(id)).orderBy(col("d2"), col("cell"))))
      .filter(col("rnk") <= top)
      .select(col(id), col("cell"))
  }

  /** Scaled centroid component back to a double in vector units. */
  def unscale(cs: Column): Column = cs / lit(SCALE.toDouble)

  // ------------------------------------------------------ product quantization
  //
  // PQ (Jégou/Douze/Schmid, "Product Quantization for Nearest
  // Neighbor Search", TPAMI 2011): split each vector into `m`
  // subspaces of `dsub` dims, k-means each subspace independently
  // (ks centroids), and store each vector as m small codes — 64
  // floats become 8 code bytes, the compression that lets a
  // billion-vector index live in memory. Queries never decompress:
  // an ADC (asymmetric distance computation) table of the query's
  // exact distance to every subspace centroid (m·ks entries) turns
  // scoring into m table lookups + a sum per candidate. Everything
  // stays in the exact integer domain of [[scaled]], so codes,
  // tables and ADC sums are bit-identical on any engine.

  /** Per-subspace sub-vector rows: (id, sub, xs[dsub]) — requires
    * len(xs) == m·dsub. One explode per vector, no joins.
    */
  def subVectors(e: DataFrame, id: String, m: Int, dsub: Int): DataFrame =
    e.select(col(id), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub"),
          slice(col("xs"), j * dsub + 1, dsub).as("xs"))): _*)).as("t"))
      .select(col(id), col("t.sub").as("sub"), col("t.xs").as("xs"))

  /** Nearest sub-centroid per (vector, subspace): exact integer
    * squared-L2 argmin, ties to the lowest cell — [[assignCells]]
    * with the subspace as an extra key. `cent` is (sub, cell, cs);
    * the broadcast is m·ks rows, a layout constant.
    */
  def assignSubCells(epq: DataFrame, cent: DataFrame, id: String,
                     top: Int = 1): DataFrame = {
    val d2 = epq.join(broadcast(cent), Seq("sub"))
      .select(col(id), col("sub"), col("cell"),
        l2DistSq(col("xs"), col("cs")).as("d2"))
    d2.withColumn("rnk",
        row_number().over(Window.partitionBy(col(id), col("sub"))
          .orderBy(col("d2"), col("cell"))))
      .filter(col("rnk") <= top)
      .select(col(id), col("sub"), col("cell"))
  }

  /** `iters` Lloyd rounds per subspace over an already-[[scaled]]
    * corpus: seeds are the first `ks` vectors' sub-vectors (cell id =
    * seed vector id — deterministic, oracle-replayable), updates are
    * truncated-integer per-dim means exactly like [[fitCentroids]],
    * each round's (m·ks)-row codebook checkpointed. Returns
    * (sub, cell, cs).
    */
  def fitPQ(e: DataFrame, id: String, m: Int, dsub: Int, ks: Int,
            iters: Int): DataFrame = {
    require(iters >= 1, s"at least one Lloyd round required, got $iters")
    val epq = subVectors(e, id, m, dsub)
    var cent = epq.filter(col(id) < ks)
      .select(col("sub"), col(id).as("cell"), col("xs").as("cs"))
    for (_ <- 1 to iters) {
      val assign = assignSubCells(epq, cent, id)
      cent = epq.join(assign, Seq(id, "sub"))
        .select(col("sub"), col("cell"), posexplode(col("xs")).as(Seq("pos", "x")))
        .groupBy("sub", "cell", "pos")
        .agg(round(sum(col("x")) / count(lit(1))).cast("long").as("cs"))
        .groupBy("sub", "cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cs")))),
          s => s.getField("cs")).as("cs"))
        .localCheckpoint()
    }
    cent
  }
}
