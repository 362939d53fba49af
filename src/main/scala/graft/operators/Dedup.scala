package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFunctions}

/** Document deduplication for training-data pipelines: exact
  * (content-hash groupBy), n-gram Jaccard verification, MinHash+LSH
  * candidate generation, and SimHash fingerprints.
  *
  * Scale posture: every path is groupBy/join-shaped (shuffle on
  * content hash, shingle, or band key — never a cross join), so the
  * same plans run on 10^9 documents; the all-pairs work only ever
  * happens *within* an LSH band bucket or shared-shingle group. The
  * hash family is md5-derived ([[Hashing.h32]]) so the DuckDB oracle
  * can recompute every value exactly.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id as the
    * canonical row. `groupBy` not `dropDuplicates` so the survivor is
    * deterministic (dropDuplicates keeps an arbitrary row — useless
    * for an oracle and for reproducible pipelines).
    */
  def exactGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("content_hash"))
      .agg(min(col(id)).as("keep_id"), count("*").as("n_copies"))

  /** (id, shingle) pairs — distinct word n-gram shingles per doc.
    *
    * Shape matters here: building the shingle *array* with
    * `transform(sequence(...), ...)` would put a higher-order function
    * (CodegenFallback — interpreted per element) in the hottest path
    * of the whole dedup family. Instead the start positions are
    * exploded first and each shingle is a flat codegen'd `concat_ws`
    * over three `element_at`s — the entire scan→explode→project stage
    * stays inside whole-stage codegen (measured ~3× on the shingle
    * stage). `sequence(1, m)` with m < 1 would generate a DESCENDING
    * range, so short docs are guarded to an empty array (the reference
    * below-n semantics, mirrored by [[TextFunctions.shinglesSql]]).
    */
  def shingleSet(docs: DataFrame, id: String, text: String, n: Int = 3): DataFrame = {
    val w = TextFunctions.words(col(text))
    docs.select(col(id), w.as("w"))
      .select(col(id), col("w"),
        explode(when(size(col("w")) >= n, sequence(lit(1), size(col("w")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col(id), concat_ws(" ",
        (0 until n).map(j => element_at(col("w"), col("i") + lit(j))): _*).as("s"))
      .distinct()
  }

  /** (id, shingle-key) pairs like [[shingleSet]], but the key is the
    * 64-bit `xxhash64` of the n words instead of their concatenated
    * text. Joining/shuffling near-dup candidates never needs the
    * shingle's characters — only its identity — and an 8-byte key
    * shuffles and sorts for a fraction of a ~25-byte string (and skips
    * the concat allocation entirely). Collisions merge two shingles
    * corpus-wide: P ≈ d²/2⁶⁵ for d distinct shingles, ~10⁻⁹ even at
    * 10⁸ shingles, and a merge only perturbs Jaccard by one shingle.
    */
  def shingleKeys(docs: DataFrame, id: String, text: String, n: Int = 3): DataFrame =
    shingleKeysRaw(docs, id, text, n).distinct()

  /** [[shingleKeys]] before per-doc dedup — one row per shingle
    * *occurrence*. Callers that are about to shuffle by `s` anyway
    * (see [[jaccardPairs]]) dedup after that shuffle instead of paying
    * a separate (id, s)-keyed exchange first.
    */
  private def shingleKeysRaw(docs: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val w = TextFunctions.words(col(text))
    docs.select(col(id), w.as("w"))
      .select(col(id), col("w"),
        explode(when(size(col("w")) >= n, sequence(lit(1), size(col("w")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col(id), xxhash64(
        (0 until n).map(j => element_at(col("w"), col("i") + lit(j))): _*).as("s"))
  }

  /** N-gram Jaccard similarity for every pair of docs sharing at
    * least one *informative* shingle. The shingle-key join means cost
    * is sum-over-shingles(docs²-within-shingle) — bounded by content
    * overlap, not |docs|² — but one ubiquitous shingle still creates a
    * quadratic group, so shingles whose document frequency exceeds
    * `maxDf` are dropped first (the standard df-cap from the dedup
    * literature: a shingle in >maxDf docs carries no near-dup signal).
    * Set sizes are computed over the SAME capped universe, so the
    * score stays a true Jaccard of the reduced sets.
    *
    * Plan shape: the df-cap is a windowed count over the shingle key —
    * ONE shuffle that both computes every shingle's document frequency
    * and leaves the frame hash-partitioned by `s`, so the self-join
    * below consumes the persisted frame with NO further exchange on
    * either side (vs. the groupBy→broadcast→anti-join alternative:
    * two extra stages and a broadcast barrier on the hot set). The
    * capped frame is persisted: it feeds the size aggregate plus both
    * sides of the self-join, and recomputing the explode+distinct
    * subtree 3× is the difference between one scan and three at 10⁹
    * docs.
    */
  def jaccardPairs(docs: DataFrame, id: String, text: String,
                   n: Int = 3, minJaccard: Double = 0.5,
                   maxDf: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // One exchange for the whole build: hash-partition by shingle key,
    // after which the (id, s) dedup (partitioning on s satisfies the
    // subset clustering requirement), the windowed df count, AND both
    // sides of the self-join all consume that same partitioning with
    // no further exchange.
    val sh = shingleKeysRaw(docs, id, text, n)
      .repartition(col("s"))
      .distinct()
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("df") <= maxDf)
      .drop("df")
      .persist()
    val sizes = sh.groupBy(col(id)).agg(count("*").as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"), Seq("s"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .agg(count("*").as("n_inter"))
    scorePairs(inter, sizes, id, minJaccard)
  }

  /** Shared scoring tail of [[jaccardPairs]] and [[jaccardFor]]: join
    * set sizes, compute Jaccard, threshold. The score is emitted as
    * the RAW double of the integer division — both engines perform
    * the identical IEEE division on identical integers, so the value
    * is bit-exact without rounding; a round-to-6 would *introduce*
    * divergence on exact-half fractions (Spark rounds the shortest
    * decimal string HALF_UP, DuckDB rounds the binary value — e.g.
    * 323/640 disagrees in the 6th decimal between the two).
    */
  private def scorePairs(inter: DataFrame, sizes: DataFrame, id: String,
                         minJaccard: Double): DataFrame =
    inter
      .join(sizes.select(col(id).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(id).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Exact Jaccard for an explicit candidate-pair list — the
    * verification stage as it runs at corpus scale: [[jaccardPairs]]
    * meets pairs through shared shingles (bounded-quadratic within a
    * shingle even under the df-cap), whereas here the work is
    * Σ_pairs |shingles(a)| — LINEAR in the candidate count, which LSH
    * keeps sub-quadratic. No df-cap needed or applied: scores are
    * true Jaccard over the full shingle sets. Pairs sharing no
    * shingle never produce a row (their Jaccard is 0 — below any
    * useful threshold).
    */
  def jaccardFor(cands: DataFrame, docs: DataFrame, id: String,
                 text: String, n: Int = 3,
                 minJaccard: Double = 0.5): DataFrame = {
    // only documents that appear in a candidate pair contribute to the
    // output — shingle (and cache) just that subset, keeping the whole
    // stage linear in candidates, not in the corpus
    val candIds = cands.select(col("id_a").as(id))
      .union(cands.select(col("id_b").as(id))).distinct()
    val sh = shingleKeys(docs.join(candIds, Seq(id), "leftsemi"),
      id, text, n).persist()
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val shA = sh.toDF("id_a", "s")
    val shB = sh.toDF("id_b", "s")
    val inter = cands.join(shA, Seq("id_a"))
      .join(shB, Seq("id_b", "s"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    scorePairs(inter, sizes, id, minJaccard)
  }

  /** MinHash signatures: one row per doc with `k` minimum seeded
    * hashes over its shingle set. One explode + one groupBy — a
    * single shuffle keyed by doc id regardless of k.
    */
  def minhashSignatures(docs: DataFrame, id: String, text: String,
                        k: Int, n: Int = 3): DataFrame =
    minhashSignaturesOfSets(shingleSet(docs, id, text, n), id, "s", k)

  /** [[minhashSignatures]] over an ALREADY-BUILT element set (id, s)
    * — the modality-free form: text shingles, media frame
    * fingerprints, any string set. One seeded-hash projection + one
    * id-keyed min-agg shuffle regardless of k.
    */
  def minhashSignaturesOfSets(sets: DataFrame, id: String, s: String,
                              k: Int): DataFrame = {
    val hashed = sets.select(col(id) +:
      (0 until k).map(i => Hashing.seeded(i, col(s)).as(s"h$i")): _*)
    hashed.groupBy(col(id))
      .agg(min(col("h0")).as("h0"),
        (1 until k).map(i => min(col(s"h$i")).as(s"h$i")): _*)
  }

  /** LSH banding over a MinHash signature frame: emit (id, band,
    * band_key) rows; docs colliding in any band are candidate pairs.
    * Stacked via posexplode so it stays one narrow frame (no k-way
    * union), then the candidate join shuffles on (band, key) — the
    * classic sub-quadratic near-dup path.
    */
  def lshCandidates(sig: DataFrame, id: String,
                    bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = bandRows(sig, id, bands, rowsPerBand)
    banded.as("a").join(banded.as("b"), Seq("band", "band_key"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()
  }

  /** (id, band, band_key) rows of a signature frame — the shared
    * banding of [[lshCandidates]] and [[incrementalCandidates]].
    */
  private[graft] def bandRows(sig: DataFrame, id: String,
                              bands: Int, rowsPerBand: Int): DataFrame = {
    val bandKeys: Column = array((0 until bands).map { b =>
      concat_ws(",",
        (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
    }: _*)
    sig.select(col(id), posexplode(bandKeys).as(Seq("band", "band_key")))
  }

  /** Incremental near-dedup candidates: a NEW batch against an
    * already-indexed corpus — the daily-ingest shape. The band join
    * runs NEW × INDEX only: the index is never re-paired with itself
    * and never re-shingled, so per-ingest work is O(batch bands +
    * touched index buckets), not O(corpus²) or even O(corpus) — the
    * property that lets a 100 TB historical index absorb a daily
    * batch at batch cost. (In production the banded index is the
    * PERSISTED artifact — bucketed/sorted by (band, band_key) so the
    * join prunes to touched buckets; here both sides band from their
    * signature frames.)
    */
  def incrementalCandidates(newSig: DataFrame, indexSig: DataFrame,
                            id: String, bands: Int,
                            rowsPerBand: Int): DataFrame =
    bandRows(newSig, id, bands, rowsPerBand)
      .withColumnRenamed(id, "new_id")
      .join(bandRows(indexSig, id, bands, rowsPerBand)
        .withColumnRenamed(id, "index_id"), Seq("band", "band_key"))
      .select(col("new_id"), col("index_id")).distinct()

  /** MinHash similarity estimate (matching-minhash fraction) for
    * candidate pairs, joined back against the signature frame.
    */
  def minhashEstimate(cands: DataFrame, sig: DataFrame, id: String,
                      k: Int): DataFrame = {
    val sa = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == id) "id_a" else s"a_$c"): _*)
    val sb = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == id) "id_b" else s"b_$c"): _*)
    val matches = (0 until k).map(i =>
      when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (matches / lit(k.toDouble)).as("est_sim"))
  }

  /** 32-bit SimHash fingerprint per doc over whitespace tokens (with
    * multiplicity): bit j of the fingerprint is the sign of
    * sum(±1 over tokens, + if bit j of h32(token) set). One explode +
    * one groupBy with 32 conditional sums — single shuffle.
    */
  def simhash(docs: DataFrame, id: String, text: String): DataFrame = {
    val tok = docs.select(col(id),
      explode(TextFunctions.words(col(text))).as("w"))
      .withColumn("h", Hashing.h32(col("w")))
    val bitSums = tok.groupBy(col(id)).agg(
      bitSum(0).as("s0"), (1 until 32).map(j => bitSum(j).as(s"s$j")): _*)
    val fp = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col(id), fp.as("simhash"))
  }

  private def bitSum(j: Int): Column =
    sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1))

  /** (id, pos, h) rows — the polynomial [[Hashing.charHash]] of every
    * `k`-char gram of every document, hashed in O(len) per document:
    * characters are exploded ONCE, each decoded to its code point a
    * single time, and the k-term Horner fold reads the following k−1
    * code points via `lead` over the (id, pos) sort — the same
    * rolling-hash-equivalent shape [[winnowFingerprints]] uses (and
    * the same reason: per-gram `substr` re-scans the string from the
    * start, O(len²) per doc). The position survives into the output —
    * this is the building block of exact-substring span detection
    * (q245), where WHERE a gram matched matters, not just that it did.
    */
  def gramHashes(docs: DataFrame, id: String, text: String,
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chars = docs
      .select(col(id), graft.functions.Hashing.asciiGuard(col(text)).as(text))
      .repartition(col(id))
      .select(col(id), (length(col(text)) - (k - 1)).as("n_pos"),
        posexplode(split(col(text), "")).as(Seq("pos0", "ch")))
      .select(col(id), col("n_pos"), (col("pos0") + 1).as("pos"),
        ascii(col("ch")).cast("long").as("c"))
    val byPos = Window.partitionBy(col(id)).orderBy(col("pos"))
    val h = (1 until k).foldLeft(col("c")) { (acc, j) =>
      (acc * lit(Hashing.GB) + lead(col("c"), j).over(byPos)) % lit(Hashing.PG)
    }
    chars.withColumn("h", h)
      .filter(col("pos") <= col("n_pos"))
      .select(col(id), col("pos"), col("h"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every `k`-char gram (a rolling-hash equivalent — positions are
    * exploded and each gram hashed independently, which distributes
    * where a sequential rolling hash cannot), then keep the minimum
    * hash of every `w`-wide window of consecutive gram positions. Any
    * shared substring of length ≥ k + w - 1 between two documents is
    * guaranteed to contribute at least one identical fingerprint —
    * the local-sampling property that makes winnowed sets comparable
    * where head/tail hashes ([[graft.queries.PipelineQueries]] q32)
    * only see boundaries. Output: distinct (id, fp) rows.
    *
    * Gram hashing is the polynomial [[Hashing.charHash]] family over
    * characters exploded ONCE per document: each char is decoded to
    * its code point a single time and the k-term Horner fold reads the
    * following k−1 code points via `lead` over the same (id, pos) sort
    * the min-window needs anyway — O(len) work per document. Both
    * per-gram `substr` alternatives are quadratic in disguise (char
    * position lookup rescans the string from the start, O(pos) per
    * gram → O(len²) per doc) and the md5 variant additionally paid a
    * digest per gram; measured at sf0.1: md5 1.87 s, substr-once +
    * char fold 1.95 s, this shape 1.35 s.
    *
    * Plan shape: explode → codegen'd hash → one window (single
    * shuffle keyed by doc) → distinct; same per-doc-bounded cost as
    * [[simhash]], no joins. Documents shorter than k produce no rows;
    * shorter than k + w - 1 produce the min over all their grams
    * (window start capped at 1).
    */
  def winnowFingerprints(docs: DataFrame, id: String, text: String,
                         k: Int = 8, w: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nPos = length(col(text)) - (k - 1)
    // Repartition by doc BEFORE exploding: the windows below need
    // HashPartitioning(id) anyway, and placing the exchange ahead of
    // the explode (a) ships one text per doc instead of ~|text| char
    // rows (fewer shuffle bytes), and (b) spreads the hashing across
    // the cluster even when the input arrives in few splits.
    // Everything downstream — the lead window, the min window, the
    // (id, fp) distinct — then runs with NO further exchange, and the
    // two windows share one (id, pos) sort.
    val chars = docs
      // one guarded compare per DOC (not per char): the ascii() char
      // fold below shares charHash's single-byte domain assumption
      .select(col(id), graft.functions.Hashing.asciiGuard(col(text)).as(text))
      .repartition(col(id))
      .select(col(id),
        greatest(nPos - (w - 1), lit(1)).as("max_start"),
        nPos.as("n_pos"),
        posexplode(split(col(text), ""))
          .as(Seq("pos0", "ch")))
      .select(col(id), col("max_start"), col("n_pos"),
        (col("pos0") + 1).as("pos"), ascii(col("ch")).cast("long").as("c"))
    val byPos = Window.partitionBy(col(id)).orderBy(col("pos"))
    // Horner fold over this char and the k-1 following ones — the
    // polynomial [[Hashing.charHash]] value of the gram at `pos`.
    // Rows past the last full gram fold a null lead into a null h and
    // are dropped by the n_pos filter (which also erases any trailing
    // empty-string token split() may emit — it only feeds grams past
    // n_pos).
    val h = (1 until k).foldLeft(col("c")) { (acc, j) =>
      (acc * lit(Hashing.GB) + lead(col("c"), j).over(byPos)) % lit(Hashing.PG)
    }
    val win = byPos.rowsBetween(Window.currentRow, w - 1)
    chars.withColumn("h", h)
      .filter(col("pos") <= col("n_pos"))
      .withColumn("fp", min(col("h")).over(win))
      .filter(col("pos") <= col("max_start"))
      .select(col(id), col("fp"))
      .distinct()
  }
}
