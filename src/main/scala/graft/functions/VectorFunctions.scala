package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built on
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, no driver-side math.
  *
  * All arithmetic is promoted to double and summed left-to-right,
  * which is exactly what DuckDB's `list_dot_product` over `DOUBLE[]`
  * does — that sequential-sum parity is what lets cosine scores
  * hash-match the oracle. (At 100 TB one would trade this for SIMD
  * float kernels; the sequential-double contract is the portable
  * correctness spec the fast path must reproduce.)
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (exact widening). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array embeddings. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** The hot-path cosine: the native codegen'd
    * [[graft.plans.CosineSimilarity]] expression — one fused loop
    * over both arrays inside whole-stage codegen, dimension-agnostic.
    * The HOF composition above is the no-custom-code reference
    * semantics; this is the production form ([[cosine]] and this must
    * agree exactly — asserted by ExpressionSpec).
    */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.CosineSimilarity(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** DuckDB twin of [[cosine]] over list expressions. */
  def cosineSql(a: String, b: String): String =
    s"list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
      s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[])))"

  /** Scale-derived bucket-bit count for the sign-bucket LSH family:
    * ceil(log₂(n/2)) with a floor of 8 and a ceiling of the embedding
    * dimension — i.e. 2^bits ≈ n/2 buckets, expected ~2 vectors per
    * bucket, so in-bucket scoring stays O(n·probes) as the corpus
    * grows instead of O(n²/2^const) (a FIXED bits is quadratic at any
    * real corpus — the r4 `weak` finding). The log is computed as the
    * binary-string length of (n/2 − 1), never through floating-point
    * log (log(x)/log(2) can land an ulp past an integer and flip the
    * ceil on exactly the power-of-two corpus sizes where it matters);
    * [[bitsForSql]] is the DuckDB twin with identical integer
    * semantics. Callers obtain n from `corpus.count()` — on parquet a
    * footer-statistics read, metadata-cheap at any scale.
    */
  def bitsFor(n: Long, dim: Int): Int = {
    val m = math.max(1L, n / 2)
    math.min(dim, math.max(8, java.lang.Long.toBinaryString(m - 1).length))
  }

  /** DuckDB twin of [[bitsFor]]: `length(bin(m-1))` is the same
    * integer ceil-log₂. `nExpr` is a COUNT expression (BIGINT).
    */
  def bitsForSql(nExpr: String, dim: Int): String =
    s"least($dim, greatest(8, length(bin(greatest(1, ($nExpr) // 2) - 1))))"

  /** Sign-bit bucket over the first `bits` dimensions — the cheapest
    * LSH family for cosine space (random-hyperplane LSH with axis
    * hyperplanes). Buckets co-locate similar vectors so ANN probes
    * touch one bucket instead of the full table: the scale path where
    * brute force stops being an option. Pass [[bitsFor]] of the
    * corpus size as `bits` unless pinning a configuration.
    */
  def signBucket(v: Column, bits: Int = 8): Column =
    concat((1 to bits).map(i =>
      when(element_at(v, i) > 0f, lit("1")).otherwise(lit("0"))): _*)

  def signBucketSql(v: String, bits: Int = 8): String =
    (1 to bits).map(i =>
      s"(CASE WHEN $v[$i] > 0 THEN '1' ELSE '0' END)").mkString(" || ")

  /** Multi-probe key set: the vector's own sign bucket plus every
    * bucket at Hamming distance 1 (each single-bit flip) — `bits + 1`
    * distinct keys. A near-duplicate (cos ≥ 0.95) flips any given sign
    * bit with probability ≈ arccos(cos)/π ≤ 0.1, so probing the
    * Hamming-1 shell recovers most of the recall single-probe loses at
    * bucket boundaries, at (bits+1)/2^bits of the corpus per query
    * instead of all of it. (For uniformly random vectors no sub-linear
    * probe set can track the true NN — recall there is bounded by the
    * fraction probed; the family is built for the near-dup regime.)
    */
  def probeBuckets(v: Column, bits: Int = 8): Column =
    array((0 to bits).map { f =>
      concat((1 to bits).map { i =>
        val hi = if (i == f) "0" else "1" // flip bit f; f=0 flips none
        val lo = if (i == f) "1" else "0"
        when(element_at(v, i) > 0f, lit(hi)).otherwise(lit(lo))
      }: _*)
    }: _*)

  /** DuckDB twins of [[probeBuckets]] — one bucket expression per
    * probe, kept adjacent so the probe sets can only change together.
    */
  def probeBucketsSql(v: String, bits: Int = 8): Seq[String] =
    (0 to bits).map { f =>
      (1 to bits).map { i =>
        val (hi, lo) = if (i == f) ("0", "1") else ("1", "0")
        s"(CASE WHEN $v[$i] > 0 THEN '$hi' ELSE '$lo' END)"
      }.mkString(" || ")
    }

  // ------------------------------------------------------ multi-table LSH
  //
  // The single-table family above keeps recall only while probing
  // (Hamming-1) tracks the bit count; with corpus-derived bits the
  // probability a cos ≥ 0.95 near-dup stays within one bit flip is
  // ≈ (1−p)^b·(1+bp/(1−p)) with p ≈ 0.1 — ~80% at b = 8 but ~20% at
  // b = 29 (n = 10⁹): recall decays unboundedly (ADVICE r5). The
  // at-scale family is therefore MULTI-TABLE: T independent SimHash
  // tables of r hyperplane bits each. A near-dup pair collides in one
  // table with probability p_match^r (p_match = 1−θ/π ≥ 0.9 at
  // cos ≥ 0.95), so T = ⌈3·(10/9)^r⌉ tables hold
  // recall = 1−(1−0.9^r)^T ≥ 1−e⁻³ ≈ 95% at every corpus size while
  // r = ceil-log₂(n/2) keeps expected bucket size ~2 — total candidate
  // work O(n·T) = O(n^1.152), genuinely sub-quadratic. Recall budget
  // as a function of corpus size (the documented contract):
  //
  //   n         r   T     recall (cos ≥ 0.95)
  //   ≤ 512     8   7     ≥ 95%
  //   10⁶      19   23    ≥ 95%
  //   10⁹      29   64    ≥ 95%
  //   1.4·10¹¹ 37   128 (cap) ≈ 93%
  //   10¹³     42   128 (cap) ≈ 75%  — past the cap, recall decays;
  //                                    the IVF path (q54) is the
  //                                    complementary regime there
  //
  // Hyperplane bits (σ-mixed projections, [[graft.plans
  // .MultiTableBuckets]]) rather than coordinate sampling because a
  // dim-d corpus has only d physical sign bits: sampled tables would
  // share bits and fail correlated, breaking the recall formula.

  /** Guarded micro-unit scaling: array<float> → array<long> with
    * xs[i] = round(x[i]·10⁶), raising (assert_true) outside |x| ≤
    * [[MAX_ABS]] — the shared exact-integer domain of the quantizer
    * distances (Σδ² < 2⁶³ at d ≤ 4096) and the hyperplane projections
    * (|Σ±xs| < 2⁴⁷). One codegen'd compare per element.
    */
  def scaledMicro(v: Column): Column =
    transform(v, x =>
      when(assert_true(abs(x.cast("double")) <= MAX_ABS,
          lit(s"VectorFunctions: |component| > $MAX_ABS breaks exact " +
            "integer arithmetic; pre-normalize the embedding"))
          .isNotNull, lit(0L))
        .otherwise(round(x.cast("double") * MICRO).cast("long")))

  val MICRO: Long = 1000000L
  val MAX_ABS: Double = 23.0

  /** DuckDB twin of [[scaledMicro]] (no guard — the oracle replays
    * already-validated data).
    */
  def scaledMicroSql(v: String): String =
    s"list_transform($v, x -> round(x::DOUBLE * $MICRO)::BIGINT)"

  /** Per-table bit count of the multi-table family: ceil-log₂(n/2)
    * with floor 8 and ceiling 62 (bits pack into one long; 2⁶² buckets
    * is past any physical corpus). Unlike [[bitsFor]] there is no
    * dimension ceiling — hyperplane bits are not limited by the
    * embedding dimension. Same integer-exact log discipline.
    */
  def mtBits(n: Long): Int = {
    val m = math.max(1L, n / 2)
    math.min(62, math.max(8, java.lang.Long.toBinaryString(m - 1).length))
  }

  def mtBitsSql(nExpr: String): String =
    s"least(62, greatest(8, length(bin(greatest(1, ($nExpr) // 2) - 1))))"

  /** Table count holding recall ≥ 1−e⁻³ ≈ 95% for cos ≥ 0.95 pairs at
    * `r` bits per table: ⌈3·(10/9)^r⌉ (per-bit match probability 9/10),
    * computed in exact rational arithmetic (⌈3·10^r/9^r⌉ via BigInt —
    * float pow could land an ulp off an integer and flip the ceil),
    * capped at 128 tables (see the recall-budget table above).
    */
  def mtTables(r: Int): Int = {
    require(r >= 1 && r <= 62, s"r must be in [1, 62], got $r")
    val num = BigInt(3) * BigInt(10).pow(r) + BigInt(9).pow(r) - 1
    (num / BigInt(9).pow(r)).toInt.min(128)
  }

  /** DuckDB twin of [[mtTables]]: the function has 55 possible inputs
    * (r ∈ [8, 62]), so the twin is the exact value table inlined as a
    * CASE — pure family constants, no data dependence, and the two
    * engines can only disagree if this generator and [[mtTables]]
    * disagree with themselves.
    */
  def mtTablesSql(rExpr: String): String =
    (8 to 62).map(r => s"WHEN $r THEN ${mtTables(r)}")
      .mkString(s"CASE ($rExpr) ", " ", " END")

  /** All T bucket keys of a vector — [[graft.plans.MultiTableBuckets]]
    * over the guarded micro-unit scaling; element t is table t's
    * r-bit key packed into a long.
    */
  def multiTableBuckets(v: Column, bits: Int, tables: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.MultiTableBuckets(
        org.apache.spark.sql.graft.ColumnBridge.expression(scaledMicro(v)),
        bits, tables))

  /** Dynamic DuckDB twin of one table's bucket key: `xs` a scaled
    * BIGINT list column ([[scaledMicroSql]]), `t` the table id column,
    * `r` the per-table bit column. Replays [[graft.plans
    * .MultiTableBuckets]]'s σ-mix bit-for-bit (constants shared from
    * its companion object).
    */
  def mtBucketSqlDyn(xs: String, t: String, r: String): String = {
    import graft.plans.MultiTableBuckets.{MIX_ADD, MIX_MOD, MIX_MUL}
    s"""list_sum(list_transform(range(0, $r), i ->
       |  CASE WHEN list_sum(list_transform(range(1, len($xs) + 1), j ->
       |      (1 - 2 * (((((($t) * 4096 + i) * 4096 + (j - 1)) * $MIX_MUL + $MIX_ADD)
       |        % $MIX_MOD) % 2)) * ($xs)[j]))
       |    > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END))""".stripMargin
  }

  /** Dynamic-bits DuckDB twin of [[signBucket]]: `bitsCol` is a plain
    * column (cross-join a 1-row params CTE computing [[bitsForSql]] —
    * DuckDB rejects subqueries inside lambdas). Semantics are
    * identical to the static form: bit i is '1' iff v[i] > 0.
    */
  def signBucketSqlDyn(v: String, bitsCol: String): String =
    s"list_aggr(list_transform(range(1, $bitsCol + 1), " +
      s"i -> CASE WHEN $v[i] > 0 THEN '1' ELSE '0' END), 'string_agg', '')"

  /** Dynamic-bits DuckDB twin of [[probeBuckets]]: a LIST of the
    * bits+1 probe keys (own bucket at f = 0, then each single-bit
    * flip) — the caller unnests it. Bit character = sign XOR flip,
    * the same truth table as the static hi/lo form.
    */
  def probeBucketsSqlDyn(v: String, bitsCol: String): String =
    s"list_transform(range(0, $bitsCol + 1), f -> " +
      s"list_aggr(list_transform(range(1, $bitsCol + 1), " +
      s"i -> CASE WHEN ($v[i] > 0) != (i = f) THEN '1' ELSE '0' END), " +
      "'string_agg', ''))"
}
