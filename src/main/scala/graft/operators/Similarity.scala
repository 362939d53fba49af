package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, mirroring how ANN is actually deployed:
  *  - [[bruteForceTopK]] — exact cosine top-k via a query⨯corpus join.
  *    The query side is small and broadcast, so the corpus is scanned
  *    once with no shuffle of the big side; exact, and the baseline
  *    the approximate tier is measured against.
  *  - [[bucketedTopK]] — sign-bit LSH bucketing: corpus and queries
  *    are keyed by [[signBucket]], the join shuffles on the bucket key
  *    only, and scoring happens within buckets. Sub-linear probe cost
  *    at the price of recall — the 100 TB path.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (excluding self).
    * Scoring uses the native fused-loop expression
    * ([[graft.plans.CosineSimilarity]]) — the hot path of every tier.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv")))
    val scored = corpus.select(col(id), col(vec))
      .join(q, col(id) =!= col("query_id"))
      .select(col("query_id"), col(id),
        round(cosineNative(col("qv"), col(vec)), 6).as("cos_sim"))
    topK(scored, id, k)
  }

  /** Approximate top-k: score only within the query's probed buckets.
    * With `multiProbe` (default) each query probes its own bucket plus
    * the Hamming-1 shell ([[probeBuckets]]) — the recall/cost knob;
    * `multiProbe = false` is the single-bucket minimum-cost probe.
    * A candidate's single bucket matches at most one probe key, so no
    * pair is ever scored twice.
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame,
                   id: String, vec: String, k: Int, bits: Int = 8,
                   multiProbe: Boolean = true): DataFrame = {
    val bucketed = corpus.select(col(id), col(vec),
      signBucket(col(vec), bits).as("bucket"))
    val probe =
      if (multiProbe) explode(probeBuckets(col("qv"), bits))
      else signBucket(col("qv"), bits)
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .withColumn("bucket", probe))
    val scored = bucketed.join(q,
        bucketed("bucket") === q("bucket") && col(id) =!= col("query_id"))
      .select(col("query_id"), col(id),
        round(cosineNative(col("qv"), col(vec)), 6).as("cos_sim"))
    topK(scored, id, k)
  }

  /** All-pairs near-dup sweep: every vector's top-k within its
    * multi-probe bucket neighborhood. Unlike routing the sweep through
    * [[bruteForceTopK]] (which would broadcast the whole corpus and
    * score O(N²) pairs — a driver OOM *and* a compute dead end at
    * scale), the join here is keyed on the bucket only and nothing is
    * *forced* to broadcast: the optimizer may still broadcast the
    * probe side while its stats say it fits, and at corpus scale both
    * sides degrade gracefully to a bucket-keyed shuffle, so the work
    * is Σ_buckets |bucket| × probes-landing ≈ N²·(bits+1)/2^bits
    * spread evenly across executors. Genuine near-copies collide in a probed bucket w.h.p.
    * (see [[probeBuckets]]); a vector with no probed-neighborhood
    * companion yields no row — the correct "nothing near" answer.
    */
  def bucketedSweep(corpus: DataFrame, id: String, vec: String, k: Int,
                    bits: Int = 8): DataFrame = {
    val c = corpus.select(col(id), col(vec),
      signBucket(col(vec), bits).as("bucket"))
    val q = corpus.select(col(id).as("query_id"), col(vec).as("qv"),
      explode(probeBuckets(col(vec), bits)).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col(id) =!= col("query_id"))
      .select(col("query_id"), col(id),
        round(cosineNative(col("qv"), col(vec)), 6).as("cos_sim"))
    topK(scored, id, k)
  }

  /** Embedding-cosine near-duplicate pairs: every (a, b) with
    * cos(a, b) ≥ `minCos` whose sign buckets are within Hamming
    * distance 1 — the dedup-framed counterpart of [[bucketedSweep]]
    * (pairs above a threshold instead of top-k per vector). The probe
    * side explodes into the Hamming-1 shell and the join shuffles on
    * the bucket key only, so the shape is the same sub-quadratic one.
    * No `distinct` is needed: a pair's buckets are at one fixed
    * Hamming distance, the probe keys of a vector are pairwise
    * distinct, and the `id_a < id_b` guard keeps a single orientation
    * — each qualifying pair is emitted exactly once.
    */
  def nearDupPairs(corpus: DataFrame, id: String, vec: String,
                   minCos: Double, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(id).as("id_b"), col(vec).as("vb"),
      signBucket(col(vec), bits).as("bucket"))
    val q = corpus.select(col(id).as("id_a"), col(vec).as("va"),
      explode(probeBuckets(col(vec), bits)).as("bucket"))
    q.join(c, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineNative(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  // ------------------------------------------------------ multi-table LSH
  //
  // The at-scale ANN/near-dup family: T independent SimHash tables of
  // r hyperplane bits ([[VectorFunctions.mtBits]]/[[VectorFunctions
  // .mtTables]] — see the recall-budget table there). The single-table
  // Hamming-1 family above stays as the bounded-n demonstration
  // (its recall decays as bits grow; ADVICE r5).

  /** (id, tbl, bucket) keys of every vector: one row per table, keyed
    * by the packed r-bit hyperplane bucket. The probe set of a vector
    * is exactly its own T keys — multi-table replaces neighborhood
    * probing with independent tables.
    */
  private def mtKeys(df: DataFrame, id: String, vec: String,
                     outId: String, outVec: String,
                     bits: Int, tables: Int): DataFrame =
    df.select(col(id).as(outId), col(vec).as(outVec),
      posexplode(multiTableBuckets(col(vec), bits, tables))
        .as(Seq("tbl", "bucket")))

  /** Multi-table approximate top-k: queries and corpus are keyed per
    * table, the join shuffles on (tbl, bucket) only, and a candidate
    * pair colliding in several tables is scored once per collision but
    * COUNTED once (max-aggregated on the identical score before
    * ranking). Recall ≥ 95% for cos ≥ 0.95 neighbors at every corpus
    * size ≤ the table cap — the property the Hamming-1 single-table
    * family loses as bits grow.
    */
  def multiTableTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int,
                     bits: Int, tables: Int): DataFrame = {
    val c = mtKeys(corpus, id, vec, id, vec, bits, tables)
    val q = broadcast(mtKeys(queries, id, vec, "query_id", "qv", bits, tables))
    val scored = c.join(q, Seq("tbl", "bucket"))
      .filter(col(id) =!= col("query_id"))
      .groupBy(col("query_id"), col(id))
      .agg(max(round(cosineNative(col("qv"), col(vec)), 6)).as("cos_sim"))
    topK(scored, id, k)
  }

  /** Bare (id, tbl, bucket) key rows — the SELF-JOIN form of the key
    * table: ~24 bytes per row through the (tbl, bucket) exchange,
    * where joining with the embeddings attached would shuffle the
    * d-float vector T times per corpus row (at n = 10⁹, T = 64,
    * d = 64 that is ~16 KB/vector of shuffle — the difference between
    * a viable sweep and a dead one). Scoring re-joins vectors by id
    * AFTER candidate dedup: two corpus-keyed joins, each touching the
    * vector once. The table is persisted — both self-join sides and
    * the hashing pass execute once (callers clear via
    * `catalog.clearCache`, as with [[semanticKeep]]).
    */
  private def mtBareKeys(corpus: DataFrame, id: String, vec: String,
                         bits: Int, tables: Int): DataFrame =
    corpus.select(col(id),
      posexplode(multiTableBuckets(col(vec), bits, tables))
        .as(Seq("tbl", "bucket"))).persist()

  /** Multi-table all-pairs sweep: every vector's top-k across its T
    * bucket collisions — the at-scale form of [[bucketedSweep]].
    * Candidate-pair shape: keys self-join light, pairs dedup'd
    * (`distinct` — a pair colliding in several tables is a single
    * candidate), vectors re-joined by id for one scoring pass.
    */
  def multiTableSweep(corpus: DataFrame, id: String, vec: String, k: Int,
                      bits: Int, tables: Int): DataFrame = {
    val v = corpus.select(col(id), col(vec))
    val keys = mtBareKeys(corpus, id, vec, bits, tables)
    val cand = keys.select(col(id).as("query_id"), col("tbl"), col("bucket"))
      .join(keys, Seq("tbl", "bucket"))
      .filter(col(id) =!= col("query_id"))
      .select(col("query_id"), col(id)).distinct()
    val scored = cand
      .join(v.select(col(id).as("query_id"), col(vec).as("qv")), Seq("query_id"))
      .join(v, Seq(id))
      .select(col("query_id"), col(id),
        round(cosineNative(col("qv"), col(vec)), 6).as("cos_sim"))
    topK(scored, id, k)
  }

  /** Multi-table near-duplicate pairs: every (a, b), a < b, colliding
    * in at least one table with rounded cosine ≥ `minCos` — the
    * at-scale form of [[nearDupPairs]]. Same candidate-pair shape as
    * [[multiTableSweep]].
    */
  def multiTableNearDupPairs(corpus: DataFrame, id: String, vec: String,
                             minCos: Double, bits: Int, tables: Int): DataFrame = {
    val v = corpus.select(col(id), col(vec))
    val keys = mtBareKeys(corpus, id, vec, bits, tables)
    val cand = keys.select(col(id).as("id_a"), col("tbl"), col("bucket"))
      .join(keys.select(col(id).as("id_b"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(v.select(col(id).as("id_a"), col(vec).as("va")), Seq("id_a"))
      .join(v.select(col(id).as("id_b"), col(vec).as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineNative(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Scale-derived cluster count for [[semanticKeep]]: ⌈2·√n⌉ with a
    * floor of 8. With c ∝ √n cells the expected in-cell pair work is
    * Σ(n/c)²·c = n²/c = n^1.5/2 — sub-quadratic and shrinking as a
    * fraction of n² as the corpus grows, where a FIXED cell count is
    * O(n²/const) at any real corpus (the r4 `weak` finding; web-scale
    * SemDeDup runs ~10⁵ clusters for the same reason). Both engines
    * compute ⌈2·√n⌉ from a correctly-rounded IEEE sqrt (sqrt IS
    * exactly rounded, unlike log), so the derived count is
    * engine-exact; [[cellsForSql]] is the DuckDB twin. Callers obtain
    * n from `corpus.count()` — parquet-footer metadata, cheap at any
    * scale. The count is CLAMPED to the fit-corpus size (seeds are
    * the first `fitN` vectors by id — asking for more would silently
    * seed fewer cells than requested; ADVICE r5): pass `fitN`
    * whenever the scored corpus outgrows the fit corpus (q71 fits on
    * the originals but scores the dup-injected union).
    */
  def cellsFor(n: Long, fitN: Long): Int =
    math.min(fitN,
      math.max(8L, math.ceil(2.0 * math.sqrt(n.toDouble)).toLong)).toInt

  def cellsFor(n: Long): Int = cellsFor(n, n)

  def cellsForSql(nExpr: String, fitNExpr: String): String =
    s"least($fitNExpr, greatest(8, CAST(ceil(2 * sqrt($nExpr)) AS BIGINT)))"

  def cellsForSql(nExpr: String): String = cellsForSql(nExpr, nExpr)

  /** SemDeDup-style semantic deduplication: pairwise cosine bounded
    * by a cluster assignment. `cells` is the (id, cell) map from a
    * trained quantizer ([[VectorQuantizer.assignCells]]); within each
    * cell every pair is scored and a vector with a LOWER-id neighbour
    * at rounded cosine ≥ `tau` is dropped — lowest id survives each
    * semantic-duplicate set, matching the deterministic-survivor rule
    * of every dedup stage here. Returns the survivors as (id, cell).
    *
    * Scale shape: the self-join shuffles on the CELL key only, so
    * pairwise work is O(Σ cellᵢ²) and cross-cell pairs never
    * materialize — the cluster count is the knob, and [[cellsFor]] is
    * how it must grow with the corpus (c ∝ √n keeps the pair work at
    * n^1.5; web-scale SemDeDup runs ~10⁵ clusters for the same
    * reason; a hot cell is AQE-splittable because scoring is
    * per-pair). The threshold
    * compares the 6-decimal ROUNDED cosine so both engines make the
    * same keep/drop call on boundary pairs.
    */
  def semanticKeep(emb: DataFrame, id: String, vec: String,
                   cells: DataFrame, tau: Double): DataFrame = {
    // v feeds three plan branches (both pair sides + the survivor
    // anti-join); persisting makes the embed+assign subtree execute
    // once instead of 3× (callers clear via catalog.clearCache)
    val v = emb.select(col(id), col(vec)).join(cells, Seq(id)).persist()
    val a = v.select(col("cell"), col(id).as("id_a"), col(vec).as("va"))
    val b = v.select(col("cell"), col(id).as("id_b"), col(vec).as("vb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosineNative(col("va"), col("vb")), 6) >= tau)
      .select(col("id_b").as(id)).distinct()
    v.join(dropped, Seq(id), "left_anti").select(col(id), col("cell"))
  }

  /** IVF-style approximate top-k: a coarse quantizer partitions the
    * corpus into `nCells` cells (each vector assigned to its nearest
    * pivot), and a query scores only the vectors in its `nProbe`
    * nearest cells — the inverted-file ANN layout, the other standard
    * scale path next to LSH. Pivots here are the `nCells` lowest-id
    * corpus vectors, which keeps the quantizer deterministic and
    * oracle-reproducible; a production deployment would drop k-means
    * centroids into the same seam (only `pivots` changes). Cost
    * shape: assignment is one broadcast-pivot pass over the corpus
    * (O(N·C), embarrassingly parallel), and probing shuffles on the
    * cell key only — no corpus broadcast, no O(N²).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val pivots = broadcast(corpus.filter(col(id) < nCells)
      .select(col(id).as("cell"), col(vec).as("pv")))
    def assign(df: DataFrame, outId: String, outVec: String, top: Int) = {
      val w = Window.partitionBy(outId).orderBy(desc("pcos"), asc("cell"))
      df.crossJoin(pivots)
        .select(col(outId), col(outVec), col("cell"),
          cosineNative(col(outVec), col("pv")).as("pcos"))
        .withColumn("prnk", row_number().over(w))
        .filter(col("prnk") <= top)
        .select(col(outId), col(outVec), col("cell"))
    }
    val cells = assign(
      corpus.select(col(id), col(vec)), id, vec, top = 1)
    val probes = assign(
      queries.select(col(id).as("query_id"), col(vec).as("qv")),
      "query_id", "qv", top = nProbe)
    val scored = cells.join(probes, Seq("cell"))
      .filter(col(id) =!= col("query_id"))
      .select(col("query_id"), col(id),
        round(cosineNative(col("qv"), col(vec)), 6).as("cos_sim"))
    topK(scored, id, k)
  }

  private[graft] def topK(scored: DataFrame, id: String, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos_sim"), asc(id))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }
}
