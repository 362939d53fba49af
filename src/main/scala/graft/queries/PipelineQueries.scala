package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.{Hashing, IntMath, TextFunctions, VectorFunctions}
import graft.multimodal.Multimodal
import graft.plans.CharEnergy
import graft.operators.{Bpe, BpeIndex, Compaction, ConnectedComponents, CountMin, Dedup, DedupIndex, FirstSeenIndex, FleetSnapshot, GraphIndex, HeavyHitters, IndexCatalog, LexIndex, MixManifest, Packing, PqIndex, SimIndex, Similarity, SketchIndex, VectorQuantizer, VersionedDirs}

/** The LLM-training-data pipeline operators (`BASELINE.json:6`):
  * deduplication (exact / Jaccard / MinHash-LSH / SimHash), similarity
  * search over embeddings (exact + LSH-bucketed ANN), and text
  * analysis (quality, language ID, token stats, fingerprints).
  *
  * Every DuckDB oracle here is *generated from the same constants*
  * (hash seeds, band layout, stopword lists) as the Spark
  * implementation — the two sides cannot drift independently.
  */
object PipelineQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables(s, d, n)

  /** One beam-search stage settled in ONE materialize (guide §1.2:
    * fewer actions, same rows): rank the scored frame per query ONCE
    * inside the checkpoint, then serve BOTH consumers as lazy views
    * of it — the visited rows (rank projected away) and the next
    * frontier (rank ≤ beamWidth). The previous shape materialized the
    * scored rows and then ran a SECOND localCheckpoint job for the
    * top-K window over them; the window work is identical here, the
    * second action is gone (measured: one job per beam round per arm
    * across q327/q331/q333/q334/q338). The returned views scan
    * checkpointed blocks — still lineage-free, so the ProbeCache
    * release contract is unchanged.
    */
  private def beamStage(scored: DataFrame, beamWidth: Int)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val ranked = graft.operators.ProbeCache.materialize(
      scored.withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("node")))))
    (ranked.select("query_id", "node", "d2"),
      ranked.filter(col("rnk") <= beamWidth).select("query_id", "node"))
  }

  /** Build independent arms from driver threads (guide §2.6 — overlap
    * independent jobs): each arm's construction runs its OWN chain of
    * Spark actions (index probes, ProbeCache materializes), and a
    * sequential build serializes those latency-bound chains even
    * though the cluster is idle through most of each one. Submitting
    * the chains concurrently lets the scheduler interleave their jobs,
    * so the composition costs ~max(arm), not Σ arm — q290's measured
    * pattern, shared. Arms must be read-only over committed artifacts
    * and caller-persisted frames (every multi-arm judged query is:
    * publishes/pins happen strictly before the arms are built).
    */
  private def concurrently(arms: Seq[() => DataFrame]): Seq[DataFrame] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(arms.map(a => Future(a()))), Duration.Inf)
  }

  // ---------------------------------------------------------------- dedup

  /** Exact dedup over a corpus with synthesized duplicates (each doc
    * injected twice under a shifted id): grouping by content hash must
    * collapse every pair to the original id.
    */
  val exactDedup: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val dupes = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.exactGroups(docs.unionByName(dupes), "doc_id", "text")
        .orderBy("keep_id")
    },
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
      |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      |       count(*)::BIGINT AS n_copies
      |FROM corpus GROUP BY md5(text) ORDER BY keep_id""".stripMargin)

  /** Word-3-gram Jaccard near-dup pairs over the df-capped shingle
    * universe (the verification stage of near-dedup; pairs meet only
    * through shared informative shingles, never a cross join — see
    * [[Dedup.jaccardPairs]] for the maxDf rationale).
    */
  val jaccardPairs: Q = {
    val MAX_DF = 100
    Q(
    (s, d) => Dedup.jaccardPairs(
      t(s, d, "documents"), "doc_id", "text", n = 3, minJaccard = 0.5,
      maxDf = MAX_DF)
      .orderBy("id_a", "id_b"),
    s"""WITH w AS (
       |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
       |sh0 AS (
       |  SELECT DISTINCT doc_id, unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
       |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > $MAX_DF),
       |sh AS (SELECT doc_id, s FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |       n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE AS jaccard
       |FROM inter
       |JOIN sizes sa ON id_a = sa.doc_id
       |JOIN sizes sb ON id_b = sb.doc_id
       |WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE >= 0.5
       |ORDER BY id_a, id_b""".stripMargin)
  }

  /** Dedup threshold sweep (q226) — the tuning table a near-dedup
    * rollout is decided from: for each candidate Jaccard threshold
    * (300–900 milli), how many pairs qualify and how many documents
    * they touch. One pair build (q23's df-capped shingle join, run
    * once at the LOOSEST threshold) serves every threshold via a
    * 5-row broadcast sweep — the thresholds are a post-filter on the
    * exact integer milli score, so the sweep costs a bounded
    * replicate of the (already small) pair list, never a re-run of
    * the shingle join per setting. The milli score is
    * `floor(j·1000)` of the raw IEEE division both engines perform
    * on identical integers (the q23 determinism argument), so the
    * sweep compares identical int64s; the oracle carries the same
    * 0.3 double pre-filter the operator applies.
    */
  val dedupThresholdSweep: Q = {
    val MAX_DF = 100
    val THS = Seq(300L, 450L, 600L, 750L, 900L)
    Q(
      (s, d) => {
        // persisted: the sweep's two aggregates (n_pairs and the
        // doc-explode for n_docs_touched) both traverse `pairs`, and
        // without the cache the df-capped shingle self-join — the
        // expensive part this query exists to amortize — would run
        // twice per execution. The pair list itself is small (it
        // already passed the 0.3 floor), so the cache is cheap.
        val pairs = Dedup.jaccardPairs(t(s, d, "documents"), "doc_id",
            "text", n = 3, minJaccard = 0.3, maxDf = MAX_DF)
          .select(col("id_a"), col("id_b"),
            floor(col("jaccard") * 1000).cast("long").as("j_milli"))
          .persist()
        val ths = s.range(1)
          .select(explode(array(THS.map(lit): _*)).as("th"))
        val ann = pairs.crossJoin(broadcast(ths))
          .filter(col("j_milli") >= col("th"))
        val np = ann.groupBy("th").agg(count(lit(1)).as("n_pairs"))
        val nd = ann
          .select(col("th"),
            explode(array(col("id_a"), col("id_b"))).as("doc"))
          .distinct().groupBy("th")
          .agg(count(lit(1)).as("n_docs_touched"))
        ths.join(np, Seq("th"), "left").join(nd, Seq("th"), "left")
          .na.fill(0L, Seq("n_pairs", "n_docs_touched"))
          .orderBy("th")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents),
         |sh0 AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
         |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > $MAX_DF),
         |sh AS (SELECT doc_id, s FROM sh0
         |       WHERE s NOT IN (SELECT s FROM hot)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pj AS (
         |  SELECT id_a, id_b,
         |    floor((n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE)
         |      * 1000)::BIGINT AS j_milli
         |  FROM inter JOIN sizes sa ON id_a = sa.doc_id
         |             JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE >= 0.3),
         |th(th) AS (VALUES ${THS.map(t => s"($t)").mkString(", ")}),
         |ann AS (SELECT th, id_a, id_b FROM pj, th WHERE j_milli >= th),
         |np AS (SELECT th, count(*)::BIGINT AS n_pairs FROM ann
         |       GROUP BY 1),
         |nd AS (SELECT th, count(*)::BIGINT AS n_docs FROM (
         |         SELECT DISTINCT th, doc FROM (
         |           SELECT th, unnest([id_a, id_b]) AS doc FROM ann))
         |       GROUP BY 1)
         |SELECT th.th::BIGINT AS th,
         |  coalesce(np.n_pairs, 0)::BIGINT AS n_pairs,
         |  coalesce(nd.n_docs, 0)::BIGINT AS n_docs_touched
         |FROM th LEFT JOIN np USING (th) LEFT JOIN nd USING (th)
         |ORDER BY th""".stripMargin)
  }

  // MinHash/LSH family constants shared by q24 (candidate pairs) and
  // q46 (connected components over those pairs) — one definition, so
  // the two queries and both oracles can never disagree on the family.
  private val MH_K = 16; private val MH_BANDS = 4; private val MH_R = 4
  private val MH_THRESH = 0.25

  // shared geometry of the substring-span family (q245/q257): one
  // gram width, one hot-gram cap, one minimum span — and ONE committed
  // posting artifact ([[gramPostings]]) both queries consume, so the
  // family cannot drift. (Declared up here with the other family
  // constants: object vals initialize in declaration order, and the
  // query vals below bake these into their oracle SQL.)
  private val GRAM_K = 24; private val GRAM_MAX_DF = 20
  private val GRAM_MIN_SPAN = 32

  /** MinHash+LSH near-dup pairs (est_sim ≥ threshold) — the Spark
    * side shared by q24 and q46. The signature frame feeds
    * lshCandidates plus both sides of minhashEstimate — persist it so
    * the explode+groupBy subtree runs once, not three times (one
    * shuffle instead of three at any scale; Bench/Verify clearCache()
    * between queries).
    */
  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashEstimates(s, d).filter(col("est_sim") >= MH_THRESH)

  /** The UNFILTERED LSH candidate estimates (id_a, id_b, est_sim) —
    * [[minhashPairs]] is this thresholded at [[MH_THRESH]]. The
    * unthresholded form is the retrieval-pool view: every banding
    * collision with its similarity estimate, which the hard-negative
    * miner (q275) ranks BELOW the duplicate threshold.
    */
  private def minhashEstimates(s: SparkSession, d: String): DataFrame = {
    val sig = Dedup.minhashSignatures(t(s, d, "documents"), "doc_id", "text", MH_K)
      .persist()
    val cands = Dedup.lshCandidates(sig, "doc_id", MH_BANDS, MH_R)
    Dedup.minhashEstimate(cands, sig, "doc_id", MH_K)
  }

  /** COMMITTED loose-banding retrieval pool — the same 16 minhashes
    * banded 8×2 instead of the dedup layout's 4×4: two-row bands
    * collide at far lower similarity (collision prob s² per band vs
    * s⁴), which is exactly the recall/precision trade a RETRIEVAL
    * pool wants versus a DUPLICATE screen (the dedup threshold stays
    * τ = [[MH_THRESH]] on the 4×4 graph). Published once per data
    * version (the gram-posting discipline) because the hard-negative
    * miner consumes it per training run.
    */
  private val POOL_BANDS = 8; private val POOL_R = 2

  private def mhPoolArtifact(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.Artifacts.publishOnce(
      "graft-mh-pool", d, Seq("documents.parquet")) { st =>
      val sig = Dedup.minhashSignatures(
        t(s, d, "documents"), "doc_id", "text", MH_K).persist()
      Dedup.minhashEstimate(
          Dedup.lshCandidates(sig, "doc_id", POOL_BANDS, POOL_R),
          sig, "doc_id", MH_K)
        .write.parquet(st)
    }
    s.read.parquet(root)
  }

  /** The q275 oracle's loose-banding twin of the `bands`/`cand`/`est`
    * CTEs — [[POOL_BANDS]]×[[POOL_R]] over the SAME `sig`.
    */
  private def mhPoolCtes: String = {
    val bandRows = (0 until POOL_BANDS).map { b =>
      val key = (0 until POOL_R).map(r => s"h${b * POOL_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    val matchSum = (0 until MH_K)
      .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""bands2 AS (
       |  $bandRows),
       |cand2 AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands2 a JOIN bands2 b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id),
       |pool AS (
       |  SELECT id_a, id_b, ($matchSum) / ${MH_K}.0 AS est_sim
       |  FROM cand2
       |  JOIN sig sa ON id_a = sa.doc_id
       |  JOIN sig sb ON id_b = sb.doc_id)""".stripMargin
  }

  /** COMMITTED full-corpus component assignment over [[minhashPairs]]
    * — publish-if-absent under a fingerprint-keyed root (q252's exact
    * pattern), so every consumer of the near-dup component graph
    * (q107's cluster census, q119's leak-safe split, and q252's base
    * via its own SPLIT-bounded root) reads ONE committed artifact per
    * data version instead of re-paying the LSH band join + iterative
    * CC in-plan. That recompute was the two biggest r10 bench
    * regressions (~9 s/round combined at sf0.1); at 100× scale the
    * repeated O(log n)-round build is pure waste next to a committed
    * assignment — derive once, consume many (the graph-pair
    * amortization doctrine, SCALE.md). Returns (node, component).
    */
  private def ccAssignment(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.Artifacts.versionedRoot(
      "graft-cc-assign", d, Seq("documents.parquet"))
    if (VersionedDirs.resolve(root).isEmpty)
      VersionedDirs.commit(root) { st =>
        ConnectedComponents.assign(
            minhashPairs(s, d)
              .select(col("id_a").as("u"), col("id_b").as("v")))
          .distinct()
          .write.parquet(st)
      }
    s.read.parquet(VersionedDirs.resolve(root).get)
  }

  /** Oracle CTE chain ending in `pairs(id_a, id_b, est_sim)` — the SQL
    * twin of [[minhashPairs]], generated from the same constants.
    */
  private def minhashPairsCtes: String = {
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i").mkString(",\n    ")
    val bandRows = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    val matchSum = (0 until MH_K)
      .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""w AS (
       |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |est AS (
       |  SELECT id_a, id_b, ($matchSum) / ${MH_K}.0 AS est_sim
       |  FROM cand
       |  JOIN sig sa ON id_a = sa.doc_id
       |  JOIN sig sb ON id_b = sb.doc_id),
       |pairs AS (
       |  SELECT id_a, id_b, est_sim FROM est WHERE est_sim >= $MH_THRESH)""".stripMargin
  }

  /** MinHash(k=16) + LSH(4 bands × 4 rows) near-dup candidates with
    * matching-hash similarity estimate — the sub-quadratic scale path
    * whose candidates [[jaccardPairs]] verifies.
    */
  val minhashLsh: Q = Q(
    (s, d) => minhashPairs(s, d).orderBy("id_a", "id_b"),
    s"""WITH $minhashPairsCtes
       |SELECT id_a, id_b, est_sim FROM pairs ORDER BY id_a, id_b""".stripMargin)

  /** Near-dup clustering: connected components over the MinHash-LSH
    * pair graph ([[ConnectedComponents.assign]] — alternating
    * large-star/small-star, O(log n) groupBy rounds). Every document
    * in a component is a transitive near-duplicate; the component
    * label (= minimum doc_id) is the dedup survivor. The oracle walks
    * the same pair graph with a recursive label-propagation CTE and
    * takes min over reachable labels — exact on the small scale the
    * gate runs at, while the Spark side is the shape that holds at
    * 10⁹ nodes.
    */
  val dedupGroups: Q = Q(
    (s, d) => {
      val edges = minhashPairs(s, d)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      ConnectedComponents.assign(edges)
        .distinct()
        .orderBy("node")
    },
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |walk(n, m) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.v, walk.m FROM walk JOIN edges e ON e.u = walk.n)
       |SELECT n AS node, min(m) AS component
       |FROM walk GROUP BY n ORDER BY node""".stripMargin)

  /** Winnowing fingerprints ([[Dedup.winnowFingerprints]]): the
    * rolling-hash fingerprint family member — any shared run of
    * k+w-1 = 23 chars between two docs yields a shared fingerprint.
    * The oracle replays gram hashing and the window minimum with the
    * same polynomial [[Hashing.charHash]] fold and the same ROWS
    * frame.
    */
  val winnow: Q = {
    val K = 8; val W = 16
    Q(
      (s, d) => Dedup.winnowFingerprints(t(s, d, "documents"), "doc_id", "text", K, W)
        .orderBy("doc_id", "fp"),
      s"""WITH g AS (
         |  SELECT doc_id, text,
         |    greatest(length(text) - ${K - 1} - ${W - 1}, 1) AS max_start,
         |    unnest(range(1, greatest(length(text) - ${K - 1}, 0) + 1)) AS pos
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id, max_start, pos,
         |    substr(text, pos::INT, $K) AS gram
         |  FROM g),
         |h AS (
         |  SELECT doc_id, max_start, pos,
         |    ${Hashing.charHashSql("gram", K)} AS h
         |  FROM gr),
         |f AS (
         |  SELECT doc_id, pos, max_start,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp
         |  FROM h)
         |SELECT DISTINCT doc_id, fp FROM f
         |WHERE pos <= max_start ORDER BY doc_id, fp""".stripMargin)
  }

  /** The dedup pipeline's terminal step: apply the q46 component
    * assignment to the corpus — drop every document whose component
    * label is a smaller doc_id (a transitive near-duplicate of the
    * survivor), report per-language kept counts. The dupe side is NOT
    * hint-broadcast: its size scales with the corpus duplicate rate
    * (30% dupes of 10^10 docs is tens of GB of ids), so the join
    * strategy is left to AQE — broadcast when the runtime size allows,
    * shuffled anti-join when it doesn't.
    */
  val dedupApply: Q = Q(
    (s, d) => {
      val edges = minhashPairs(s, d)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      val dupes = ConnectedComponents.assign(edges)
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id")).distinct()
      t(s, d, "documents").join(dupes, Seq("doc_id"), "leftanti")
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |walk(n, m) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.v, walk.m FROM walk JOIN edges e ON e.u = walk.n),
       |comp AS (SELECT n AS node, min(m) AS component FROM walk GROUP BY n),
       |dupes AS (SELECT node FROM comp WHERE node <> component)
       |SELECT lang, count(*)::BIGINT AS n_kept FROM documents
       |WHERE doc_id NOT IN (SELECT node FROM dupes)
       |GROUP BY lang ORDER BY lang""".stripMargin)

  /** The near-dedup pipeline as it runs at corpus scale: LSH
    * candidates (sub-quadratic generation) verified with EXACT Jaccard
    * ([[Dedup.jaccardFor]] — work linear in candidates, vs q23's
    * shared-shingle meeting which is bounded-quadratic within each
    * shingle). The oracle reuses the MinHash candidate CTEs plus an
    * exact-Jaccard verification over the same `cand` set.
    */
  val lshVerified: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", MH_K).persist()
      val cands = Dedup.lshCandidates(sig, "doc_id", MH_BANDS, MH_R)
      Dedup.jaccardFor(cands, docs, "doc_id", "text", 3, 0.5)
        .orderBy("id_a", "id_b")
    },
    s"""WITH $minhashPairsCtes,
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.id_a
       |  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
       |  GROUP BY c.id_a, c.id_b)
       |SELECT id_a, id_b,
       |  n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE AS jaccard
       |FROM inter
       |JOIN sizes sa ON id_a = sa.doc_id
       |JOIN sizes sb ON id_b = sb.doc_id
       |WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE >= 0.5
       |ORDER BY id_a, id_b""".stripMargin)

  /** 32-bit SimHash fingerprint per document. */
  val simhashFp: Q = {
    val bitSums = (0 until 32)
      .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    val fp = (0 until 32)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    Q(
      (s, d) => Dedup.simhash(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS w FROM documents),
         |h AS (SELECT doc_id, ${Hashing.h32Sql("w")} AS h FROM tok),
         |s AS (
         |  SELECT doc_id,
         |    $bitSums
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM s ORDER BY doc_id""".stripMargin)
  }

  // ------------------------------------------------------ similarity search

  private def cosineCte: String =
    """q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |       FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |scored AS (
      |  SELECT query_id, vec_id,
      |    round(list_dot_product(qv, v) /
      |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
      |      AS cos_sim
      |  FROM q JOIN c ON vec_id <> query_id)""".stripMargin

  /** Exact brute-force cosine top-10 for 5 query vectors — the ANN
    * baseline (broadcast queries, one corpus scan).
    */
  val annBruteForce: Q = Q(
    (s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
    },
    s"""WITH $cosineCte,
       |ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)

  /** Hybrid retrieval fusion (q199) — the RAG-serving shape: a
    * LEXICAL arm (distinct shared informative words between query doc
    * and candidate, df-capped exactly like q23 so stopwords never
    * drive the match) and a VECTOR arm (the q26 brute-force cosine
    * top-k over the aligned embeddings) are each ranked top-10 per
    * query, then fused by integer Borda points (`K+1 − rank`, 0 when
    * an arm missed the candidate) — rank fusion instead of
    * reciprocal-rank so the fused score stays exact int64 (RRF's
    * 1/(60+r) sums are non-associative doubles; Borda keeps the same
    * rank-only robustness). Shapes: the lexical arm is a word-keyed
    * equi-join with a windowed df-cap (one token shuffle — never
    * pairs-first); the vector arm broadcasts 5 probes over one corpus
    * scan; fusion is a full outer join of two ≤K·|Q|-row top lists —
    * constant-sized at any corpus scale. Output: fused top-5 per
    * query with per-arm points, proving which hits came from which
    * modality.
    */
  val hybridFusion: Q = {
    val K = 10; val F = 5; val MAX_DF = 50
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
        val tok = docs.select(col("doc_id"),
          explode(array_distinct(TextFunctions.words(col("text"))))
            .as("w"))
        val capped = tok.withColumn("df",
          count(lit(1)).over(Window.partitionBy("w")))
          .filter(col("df") <= MAX_DF)
          .select("doc_id", "w")
        val qtok = capped.filter(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"), col("w"))
        val lex = qtok.join(capped, Seq("w"))
          .filter(col("query_id") =!= col("doc_id"))
          .groupBy("query_id", "doc_id")
          .agg(count(lit(1)).as("n_shared"))
        val wl = Window.partitionBy("query_id")
          .orderBy(desc("n_shared"), asc("doc_id"))
        val lexTop = lex.withColumn("r", row_number().over(wl))
          .filter(col("r") <= K)
          .select(col("query_id"), col("doc_id"),
            (lit(K + 1) - col("r")).cast("long").as("lex_pts"))
        val emb = t(s, d, "embeddings")
        val vecTop = Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", K)
          .select(col("query_id"), col("vec_id").as("doc_id"),
            (lit(K + 1) - col("rnk")).cast("long").as("vec_pts"))
        val fused = lexTop
          .join(vecTop, Seq("query_id", "doc_id"), "full_outer")
          .na.fill(0L, Seq("lex_pts", "vec_pts"))
          .withColumn("borda", col("lex_pts") + col("vec_pts"))
        val wf = Window.partitionBy("query_id")
          .orderBy(desc("borda"), asc("doc_id"))
        fused.withColumn("rnk", row_number().over(wf).cast("long"))
          .filter(col("rnk") <= F)
          .select("query_id", "doc_id", "lex_pts", "vec_pts", "borda",
            "rnk")
          .orderBy("query_id", "rnk")
      },
      s"""WITH tok0 AS (
         |  SELECT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS w
         |  FROM documents),
         |tok AS (SELECT DISTINCT doc_id, w FROM tok0),
         |dfok AS (SELECT w FROM tok GROUP BY w HAVING count(*) <= $MAX_DF),
         |ct AS (SELECT tok.doc_id, tok.w FROM tok JOIN dfok USING (w)),
         |lex AS (
         |  SELECT qd.doc_id AS query_id, cd.doc_id,
         |    count(*)::BIGINT AS n_shared
         |  FROM ct qd JOIN ct cd
         |    ON qd.w = cd.w AND qd.doc_id < 5 AND cd.doc_id <> qd.doc_id
         |  GROUP BY 1, 2),
         |lexr AS (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY n_shared DESC, doc_id) AS r
         |  FROM lex),
         |lextop AS (
         |  SELECT query_id, doc_id, (${K + 1} - r)::BIGINT AS lex_pts
         |  FROM lexr WHERE r <= $K),
         |$cosineCte,
         |vecr AS (
         |  SELECT query_id, vec_id AS doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS r
         |  FROM scored),
         |vectop AS (
         |  SELECT query_id, doc_id, (${K + 1} - r)::BIGINT AS vec_pts
         |  FROM vecr WHERE r <= $K),
         |fused AS (
         |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         |    coalesce(l.doc_id, v.doc_id) AS doc_id,
         |    coalesce(l.lex_pts, 0)::BIGINT AS lex_pts,
         |    coalesce(v.vec_pts, 0)::BIGINT AS vec_pts
         |  FROM lextop l FULL OUTER JOIN vectop v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
         |fr AS (
         |  SELECT query_id, doc_id, lex_pts, vec_pts,
         |    (lex_pts + vec_pts)::BIGINT AS borda,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY lex_pts + vec_pts DESC, doc_id)
         |      AS r
         |  FROM fused)
         |SELECT query_id, doc_id, lex_pts, vec_pts, borda, r::BIGINT AS rnk
         |FROM fr WHERE r <= $F ORDER BY query_id, rnk""".stripMargin)
  }

  /** Corpus stats for the ANN families: (n, dim) with a ragged-table
    * guard — the bit ceiling must be the real embedding dimension, not
    * an assumed constant (ADVICE r5). Served from the
    * [[graft.sources.TableStats]] sidecar: one aggregate pass per
    * TABLE VERSION instead of one per query build (ADVICE r6's
    * plan-time-pass item).
    */
  private def corpusStats(s: SparkSession, d: String): (Long, Int) =
    graft.sources.TableStats.embeddingStats(s, s"$d/embeddings.parquet")

  /** Shared oracle CTE prefix of the dynamic-bits sign-bucket family
    * (q27): `params` computes bits = [[VectorFunctions.bitsFor]] of
    * the corpus count with the ceiling read from the DATA
    * (`min(len(embedding))` in the same aggregate as the count —
    * mirroring [[corpusStats]]); `e` carries the per-row bucket and
    * the ORIGINAL float embedding (probe keys are generated from it
    * downstream; DuckDB forbids subqueries in lambdas, so `nbits`
    * rides along as a cross-joined column).
    */
  private def bucketedCtes(corpus: String): String =
    s"""params AS (
       |  SELECT least(min(len(embedding)),
       |    greatest(8, length(bin(greatest(1, count(*) // 2) - 1)))) AS nbits
       |  FROM $corpus),
       |e AS (
       |  SELECT vec_id, embedding, embedding::DOUBLE[] AS v, nbits,
       |    ${VectorFunctions.signBucketSqlDyn("embedding", "nbits")} AS bucket
       |  FROM $corpus, params)""".stripMargin

  /** Shared oracle CTE prefix of the MULTI-TABLE LSH family
    * (q28/q42/q74): `params` derives (r, nt) = per-table bits and
    * table count from the corpus count ([[VectorFunctions.mtBitsSql]]
    * / [[VectorFunctions.mtTablesSql]]); `kb` holds one (vec_id, tbl,
    * bucket) row per table per vector, the packed hyperplane key
    * replayed bit-for-bit from [[graft.plans.MultiTableBuckets]]'s
    * σ-mix over the micro-unit scaled components.
    */
  private def mtCtes(corpus: String): String = {
    val rSql = VectorFunctions.mtBitsSql("count(*)")
    s"""params AS (
       |  SELECT ($rSql) AS r, ${VectorFunctions.mtTablesSql(rSql)} AS nt
       |  FROM $corpus),
       |e AS (
       |  SELECT vec_id, embedding,
       |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
       |  FROM $corpus, params),
       |ek AS (
       |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl FROM e),
       |kb AS (
       |  SELECT vec_id, embedding, tbl,
       |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
       |  FROM ek)""".stripMargin
  }

  private def probesSqlDyn(queryCte: String): String =
    s"""SELECT query_id, qv,
       |    unnest(${VectorFunctions.probeBucketsSqlDyn("embedding", "nbits")})
       |      AS bucket
       |  FROM $queryCte""".stripMargin

  /** Sign-bit LSH-bucketed approximate top-5 with Hamming-1
    * multi-probe — scoring confined to the query's probed buckets
    * (the sub-linear scale path; see [[VectorFunctions.probeBuckets]]
    * for the recall math). Bits are CORPUS-DERIVED
    * ([[VectorFunctions.bitsFor]]: ceil-log₂(n/2), floor 8): 2^bits
    * tracks n so in-bucket work stays ~O(probes) per query as the
    * corpus grows — a fixed bit count is quadratic at any real corpus
    * (the r4 `weak` finding). The Spark side derives it from the
    * parquet-footer `count()`; the oracle derives the identical value
    * in its params CTE.
    */
  val annBucketed: Q = Q(
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val (n, dim) = corpusStats(s, d)
      Similarity.bucketedTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 5,
        VectorFunctions.bitsFor(n, dim))
    },
    s"""WITH ${bucketedCtes("embeddings")},
       |q AS (SELECT vec_id AS query_id, embedding, v AS qv, nbits
       |      FROM e WHERE vec_id < 5),
       |probes AS (
       |  ${probesSqlDyn("q")}),
       |scored AS (
       |  SELECT query_id, e.vec_id,
       |    round(list_dot_product(qv, v) /
       |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
       |      AS cos_sim
       |  FROM probes p JOIN e ON p.bucket = e.bucket AND e.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)

  /** Embedding near-dup sweep: every vector's best match across its
    * multi-table LSH collisions ([[Similarity.multiTableSweep]]) —
    * the "is anything a near-copy" report. Near-copies collide in at
    * least one of the T tables with probability ≥ 95% at every corpus
    * size (the recall-budget contract in [[VectorFunctions]]), and
    * the plan is a (tbl, bucket)-keyed self-join — no corpus
    * broadcast, no O(N²) scoring, and no recall decay as the
    * corpus-derived bit count grows (the single-table Hamming-1 form
    * q27 demonstrates loses recall unboundedly there; ADVICE r5).
    */
  val nearestNeighbor: Q = Q(
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val r = VectorFunctions.mtBits(corpusStats(s, d)._1)
      Similarity.multiTableSweep(emb, "vec_id", "embedding", 1,
        r, VectorFunctions.mtTables(r))
    },
    s"""WITH ${mtCtes("embeddings")},
       |scored AS (
       |  SELECT q.vec_id AS query_id, kb.vec_id,
       |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
       |      AS cos_sim
       |  FROM kb q JOIN kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
       |    AND kb.vec_id <> q.vec_id
       |  GROUP BY q.vec_id, kb.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= 1 ORDER BY query_id, rnk""".stripMargin)

  /** Dominant principal direction (q230) — PCA's workhorse step in
    * exact integer arithmetic: the embedding Gramian (uncentered
    * second-moment matrix, D×D = 64×64) accumulated as (i, j)-keyed
    * sums — per-row work is D²-bounded, state is D²-bounded, never
    * corpus-shaped — then 3 power-iteration rounds on that
    * 4096-cell frame, renormalized to 10⁶ L∞ units per round with
    * staged divisions keeping every product under int64. The
    * all-ones start makes the converged sign deterministic, so both
    * engines land on the identical vector (the oracle unrolls the
    * same rounds). This is the direction embedding whitening /
    * top-PC removal ("all-but-the-top") needs; at 100 TB the Gramian
    * build is one map-side-combinable aggregate and the iterations
    * are dimension-bounded algebra.
    */
  val pcaPower: Q = {
    val ITERS = 3; val CDIV = 1000000000L; val VSCALE = 1000000L
    def roundCte(k: Int): String =
      s"""u$k AS (
         |  SELECT cov.i, sum(c * v)::BIGINT AS u
         |  FROM cov JOIN v${k - 1} ON cov.j = v${k - 1}.j GROUP BY 1),
         |m$k AS (SELECT max(abs(u))::BIGINT AS m FROM u$k),
         |v$k AS (
         |  SELECT i AS j,
         |    ((u // 1000) * $VSCALE // greatest(m // 1000, 1))::BIGINT
         |      AS v
         |  FROM u$k, m$k)"""
    Q(
      (s, d) => {
        // join-free Gramian: each row's pair products are emitted by
        // two chained explodes — the first yields (i, x) carrying the
        // array along, the second explodes only the TAIL slice from i
        // (the matrix is symmetric, so only the upper triangle is ever
        // generated: D(D+1)/2 products per row, not D²) — no
        // self-join, no vec_id exchange. The groupBy's map-side
        // combine collapses each partition to ≤ D(D+1)/2 cells before
        // the ONLY shuffle, so shuffle volume is independent of corpus
        // size; the mirror to the full matrix happens on the
        // aggregated 4096-cell frame, where it is free. (Chained
        // generators, not `transform`-built nested arrays:
        // higher-order functions are CodegenFallback — interpreted
        // per element — while Generate and `slice` stay in codegen.)
        // spread rows across the cluster BEFORE exploding: the input
        // is rows-cheap but explode-heavy (D(D+1)/2 products per
        // row), and without the exchange the whole generate+aggregate
        // runs at the parallelism of the file split count (one task,
        // on a small input). Shipping N compact vectors is the cheap
        // side of that trade at any scale.
        val xs = t(s, d, "embeddings")
          .select(VectorFunctions.scaledMicro(col("embedding")).as("xs"))
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
        val upper = xs
          .select(col("xs"), posexplode(col("xs")).as(Seq("i", "x")))
          .select(col("i"), col("x"),
            posexplode(slice(col("xs"), col("i") + 1, lit(Int.MaxValue)))
              .as(Seq("dj", "y")))
          .groupBy(col("i"), (col("i") + col("dj")).as("j"))
          .agg(sum(expr("x * y")).as("craw"))
          .select(col("i"), col("j"), expr(s"craw div $CDIV").as("c"))
          // checkpointed (the PageRank/CC round discipline, eager):
          // BOTH sides of the mirror union below, the v₀ init, and
          // every round's join + broadcast-normalization subtree
          // traverse this frame; a lazy persist() would let the
          // per-round broadcast subtrees race to materialize it and
          // the corpus explode re-enter the plan once per consumer
          // (measured 3-4× the runtime). The checkpoint is the
          // 2080-cell upper triangle — trivial state.
          .localCheckpoint()
        val cov = upper.unionByName(
          upper.filter(col("i") =!= col("j"))
            .select(col("j").as("i"), col("i").as("j"), col("c")))
        var v = cov.select(col("i").as("j")).distinct()
          .select(col("j"), lit(VSCALE).as("v"))
        for (_ <- 1 to ITERS) {
          val u = cov.join(v, Seq("j"))
            .groupBy("i").agg(sum(expr("c * v")).as("u"))
          val m = u.agg(max(abs(col("u"))).as("m"))
          v = u.crossJoin(broadcast(m))
            .select(col("i").as("j"),
              expr(s"(u div 1000) * ${VSCALE}L div " +
                "greatest(m div 1000, 1L)").as("v"))
            // checkpoint each round's 64-row vector so round k+1's
            // broadcast subtree starts from materialized state
            // instead of re-executing rounds 1..k (PageRank's
            // per-round practice)
            .localCheckpoint()
        }
        v.select(col("j").as("dim"), expr("v div 1000").as("v_milli"))
          .orderBy("dim")
      },
      s"""WITH xs AS (
         |  SELECT vec_id, ${VectorFunctions.scaledMicroSql("embedding")} AS xs
         |  FROM embeddings),
         |ti AS (SELECT vec_id, unnest(range(1, len(xs) + 1)) AS i, xs
         |       FROM xs),
         |tx AS (SELECT vec_id, i - 1 AS i, xs[i] AS x FROM ti),
         |cov AS (
         |  SELECT a.i, b.i AS j,
         |    (sum(a.x * b.x) // $CDIV)::BIGINT AS c
         |  FROM tx a JOIN tx b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |v0 AS (SELECT DISTINCT i AS j, $VSCALE::BIGINT AS v FROM cov),
         |${(1 to ITERS).map(roundCte).mkString(",\n")}
         |SELECT j AS dim, (v // 1000)::BIGINT AS v_milli
         |FROM v$ITERS ORDER BY dim""".stripMargin)
  }

  /** Mutual nearest neighbors (q204) — the alignment/matching
    * primitive (MNN batch-effect matching, dataset linking, symmetric
    * near-dup seeding): a pair qualifies only when each vector is the
    * OTHER's top-1, which kills the asymmetric hub matches a plain
    * top-1 sweep keeps (a hub is many vectors' nearest, but its own
    * nearest is elsewhere — those pairs drop). Composes q28's
    * multi-table sweep (k=1, same (r,T) derived from the corpus
    * count) with one (a,b)-keyed self-join of the N-row top-1 list —
    * the mutuality test costs nothing next to the sweep. Pairs
    * emitted once (a < b) with their rounded cosine.
    */
  val mutualNn: Q = Q(
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val r = VectorFunctions.mtBits(corpusStats(s, d)._1)
      val nn1 = Similarity.multiTableSweep(emb, "vec_id", "embedding", 1,
          r, VectorFunctions.mtTables(r))
        .select(col("query_id").as("a"), col("vec_id").as("b"),
          col("cos_sim"))
      nn1.join(nn1.select(col("b").as("a"), col("a").as("b")),
          Seq("a", "b"))
        .filter(col("a") < col("b"))
        .select(col("a").as("id_a"), col("b").as("id_b"), col("cos_sim"))
        .orderBy("id_a", "id_b")
    },
    s"""WITH ${mtCtes("embeddings")},
       |scored AS (
       |  SELECT q.vec_id AS query_id, kb.vec_id,
       |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
       |      AS cos_sim
       |  FROM kb q JOIN kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
       |    AND kb.vec_id <> q.vec_id
       |  GROUP BY q.vec_id, kb.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM scored),
       |nn AS (SELECT query_id AS a, vec_id AS b, cos_sim
       |       FROM ranked WHERE rnk = 1)
       |SELECT x.a AS id_a, x.b AS id_b, x.cos_sim
       |FROM nn x JOIN nn y ON x.a = y.b AND x.b = y.a
       |WHERE x.a < x.b ORDER BY id_a, id_b""".stripMargin)

  /** Neighborhood label purity (q207) — the kNN mislabel/outlier
    * screen: for every vector, how many of its top-5 embedding
    * neighbors carry the SAME source label? A source whose documents
    * sit in neighborhoods dominated by other sources is either
    * mislabeled, boilerplate-contaminated, or genuinely
    * indistinguishable — all three are facts a mixture designer needs
    * before trusting per-source quotas. Same multi-table sweep as
    * q28/q204 (corpus-count-derived (r,T)); labels arrive by two
    * id-keyed joins of the (doc_id, source) projection — never the
    * text, never the vectors. Per-source report: doc count, mean
    * purity (exact integer ppm of per-doc ppms), and the count of
    * low-purity (<50%) docs — the review queue.
    */
  val labelPurity: Q = {
    val K = 5; val LOW = 500000L
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val r = VectorFunctions.mtBits(corpusStats(s, d)._1)
        val knn = Similarity.multiTableSweep(emb, "vec_id", "embedding",
          K, r, VectorFunctions.mtTables(r))
        val lab = t(s, d, "documents").select(col("doc_id"), col("source"))
        val per = knn
          .join(lab.select(col("doc_id").as("query_id"),
            col("source").as("q_src")), Seq("query_id"))
          .join(lab.select(col("doc_id").as("vec_id"),
            col("source").as("n_src")), Seq("vec_id"))
          .groupBy(col("query_id"), col("q_src"))
          .agg(count(lit(1)).as("k"),
            sum(when(col("n_src") === col("q_src"), 1L).otherwise(0L))
              .as("agree"))
          .select(col("q_src").as("source"),
            expr("agree * 1000000L div k").as("purity_ppm"))
        per.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            expr("sum(purity_ppm) div count(1)").as("mean_purity_ppm"),
            count(when(col("purity_ppm") < LOW, 1)).as("n_low"))
          .orderBy("source")
      },
      s"""WITH ${mtCtes("embeddings")},
         |scored AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM kb q JOIN kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |    AND kb.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, kb.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM scored),
         |knn AS (SELECT query_id, vec_id FROM ranked WHERE rnk <= $K),
         |lab AS (SELECT doc_id, source FROM documents),
         |per AS (
         |  SELECT ql.source,
         |    (sum(CASE WHEN nl.source = ql.source THEN 1 ELSE 0 END)
         |      * 1000000 // count(*))::BIGINT AS purity_ppm
         |  FROM knn JOIN lab ql ON knn.query_id = ql.doc_id
         |           JOIN lab nl ON knn.vec_id = nl.doc_id
         |  GROUP BY knn.query_id, ql.source)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  (sum(purity_ppm) // count(*))::BIGINT AS mean_purity_ppm,
         |  count(CASE WHEN purity_ppm < $LOW THEN 1 END)::BIGINT AS n_low
         |FROM per GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Multi-table approximate top-5 for 5 query vectors
    * ([[Similarity.multiTableTopK]]) — the at-scale ANN query: T
    * independent r-bit hyperplane tables hold recall ≥ 95% for
    * cos ≥ 0.95 neighbors at EVERY corpus size, where q27's
    * Hamming-1 probing decays as its corpus-derived bits grow. Both
    * (r, T) reach the plan from the corpus count alone; the oracle
    * derives the identical pair in its params CTE and replays the
    * σ-mix hyperplane keys bit-for-bit.
    */
  val annMultiTable: Q = Q(
    (s, d) => {
      val emb = t(s, d, "embeddings")
      val r = VectorFunctions.mtBits(corpusStats(s, d)._1)
      Similarity.multiTableTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 5, r, VectorFunctions.mtTables(r))
    },
    s"""WITH ${mtCtes("embeddings")},
       |q AS (SELECT vec_id, embedding, tbl, bucket FROM kb WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.vec_id AS query_id, kb.vec_id,
       |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
       |      AS cos_sim
       |  FROM q JOIN kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
       |    AND kb.vec_id <> q.vec_id
       |  GROUP BY q.vec_id, kb.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)

  // ----------------------------------------------------------- text analysis

  /** Quality scoring: length, stopword ratio, type-token ratio, and a
    * blended score — the standard pre-training quality filter features.
    */
  val textQuality: Q = {
    val fn = (s: SparkSession, d: String) => {
      val w = TextFunctions.words(col("text"))
      val nWords = size(w)
      val stopR = TextFunctions.stopwordRatio(w)
      val uniqR = TextFunctions.uniqueRatio(w)
      val score = TextFunctions.qualityScore(w)
      // raw doubles, not round(...,6): both engines compute the same
      // IEEE value from the same integers, so raw is bit-exact, while
      // scale-6 rounding diverges on exact-half rationals (Spark
      // rounds the shortest decimal string HALF_UP, DuckDB rounds the
      // binary value). Same reasoning as Dedup.scorePairs.
      t(s, d, "documents").select(
        col("doc_id"),
        nWords.as("n_words"),
        stopR.as("stop_ratio"),
        uniqR.as("uniq_ratio"),
        score.as("quality_score"))
        .orderBy("doc_id")
    }
    Q(fn,
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM documents)
         |SELECT doc_id,
         |  len(arr)::INT AS n_words,
         |  ${TextFunctions.stopwordRatioSql("arr")} AS stop_ratio,
         |  ${TextFunctions.uniqueRatioSql("arr")} AS uniq_ratio,
         |  ${TextFunctions.qualityScoreSql("arr")} AS quality_score
         |FROM w ORDER BY doc_id""".stripMargin)
  }

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> TextFunctions.stopwordsEn,
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了"))

  /** Language ID via stopword-hit scoring with a deterministic argmax
    * chain (first language in declaration order wins ties).
    */
  val langId: Q = {
    val fn = (s: SparkSession, d: String) => {
      val w = array_distinct(TextFunctions.words(col("text")))
      val scores = langStopwords.map { case (lang, stops) =>
        lang -> size(array_intersect(w, array(stops.map(lit): _*)))
      }
      val langs = scores.map(_._1)
      val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
        case ((lang, i), elseCol) =>
          val rest = langs.drop(i + 1)
          val isMax = rest.map(r =>
            scores(i)._2 >= scores(langs.indexOf(r))._2).reduce(_ && _)
          when(isMax, lit(lang)).otherwise(elseCol)
      }
      t(s, d, "documents").select(
        col("doc_id") +: scores.map { case (l, c) => c.as(s"score_$l") } :+
          pred.as("pred_lang") :+ col("lang"): _*)
        .orderBy("doc_id")
    }
    val scoreSqls = langStopwords.map { case (lang, stops) =>
      val list = stops.map(s => s"'$s'").mkString(", ")
      lang -> s"len(list_intersect(list_distinct(arr), [$list]))::INT"
    }
    val langs = scoreSqls.map(_._1)
    val predSql = langs.init.zipWithIndex.map { case (lang, i) =>
      val cond = langs.drop(i + 1)
        .map(r => s"score_$lang >= score_$r").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
    Q(fn,
      s"""WITH w AS (
         |  SELECT doc_id, lang, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
         |scored AS (
         |  SELECT doc_id, lang,
         |    ${scoreSqls.map { case (l, e) => s"$e AS score_$l" }.mkString(",\n    ")}
         |  FROM w)
         |SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
         |  $predSql AS pred_lang, lang
         |FROM scored ORDER BY doc_id""".stripMargin)
  }

  /** Token counting: whitespace tokens + a chars/4 BPE-ish estimate
    * (the budget heuristic for context-length accounting).
    */
  val tokenStats: Q = Q(
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      size(TextFunctions.words(col("text"))).as("n_ws_tokens"),
      col("n_chars"),
      ceil(col("n_chars") / lit(4.0)).as("n_bpe_approx"))
      .orderBy("doc_id"),
    """SELECT doc_id,
      |  len(regexp_split_to_array(text, ' '))::INT AS n_ws_tokens,
      |  n_chars,
      |  CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_bpe_approx
      |FROM documents ORDER BY doc_id""".stripMargin)

  /** Head/tail content fingerprints — the cheap first-pass signal for
    * prefix/suffix duplication in a crawl.
    */
  val fingerprints: Q = Q(
    (s, d) => t(s, d, "documents").select(
      col("doc_id"),
      Hashing.h32(expr("substring(text, 1, 64)")).as("h_head"),
      Hashing.h32(expr("substring(text, greatest(length(text) - 63, 1), 64)"))
        .as("h_tail"),
      col("n_chars"))
      .orderBy("doc_id"),
    s"""SELECT doc_id,
       |  ${Hashing.h32Sql("substr(text, 1, 64)")} AS h_head,
       |  ${Hashing.h32Sql("substr(text, greatest(length(text) - 63, 1), 64)")} AS h_tail,
       |  n_chars
       |FROM documents ORDER BY doc_id""".stripMargin)

  /** Per-document top TF-IDF term. The scoring uses the rational
    * variant tf · N/df instead of tf · ln(N/df): one IEEE division is
    * bit-identical across engines, whereas libm `ln` implementations
    * can differ in the last ulp and flip a rounded rank — the same
    * determinism-first reasoning as the integer-cents monetary sums.
    * Shape: explode → two grouped counts (term-frequency per doc,
    * document-frequency per term) → broadcast corpus size → window
    * top-1 per doc with a term tie-break.
    */
  val tfidfTop: Q = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val tok = docs.select(col("doc_id"),
        explode(TextFunctions.words(col("text"))).as("w"))
      val tf = tok.groupBy("doc_id", "w").agg(count("*").as("tf"))
      val df = tok.select("doc_id", "w").distinct()
        .groupBy("w").agg(count("*").as("df"))
      val n = docs.agg(countDistinct("doc_id").as("n_docs"))
      val scored = tf.join(df, Seq("w")).crossJoin(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") * col("n_docs") / col("df"))
      val win = Window.partitionBy("doc_id")
        .orderBy(desc("score"), asc("w"))
      // raw double — tf·N/df is the same IEEE arithmetic on the same
      // integers in both engines; scale-6 rounding diverges on exact
      // halves (see Dedup.scorePairs)
      scored.withColumn("rnk", row_number().over(win))
        .filter(col("rnk") === 1)
        .select(col("doc_id"), col("w").as("top_term"),
          col("score").as("tfidf"))
        .orderBy("doc_id")
    },
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (
       |  SELECT w, count(*) AS df
       |  FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, w, tf::DOUBLE * n_docs / df AS score
       |  FROM tf JOIN df USING (w) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, w, score,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, w) AS rnk
       |  FROM scored)
       |SELECT doc_id, w AS top_term, score AS tfidf
       |FROM ranked WHERE rnk = 1 ORDER BY doc_id""".stripMargin)

  /** IVF-probed approximate top-5 — the inverted-file scale path next
    * to LSH ([[Similarity.ivfTopK]]): deterministic pivot quantizer,
    * corpus assigned to nearest cell, queries probe their 2 nearest
    * cells. The oracle replays the same quantizer from the same
    * constants, including the argmax tie-break on cell id.
    */
  val annIvf: Q = {
    val CELLS = 16; val PROBE = 2
    val cos = (a: String, b: String) => VectorFunctions.cosineSql(a, b)
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 5, CELLS, PROBE)
      },
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT vec_id AS cell, v AS pv FROM e WHERE vec_id < $CELLS),
         |ca0 AS (
         |  SELECT e.vec_id, e.v, p.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |                       ORDER BY ${cos("e.v", "p.pv")} DESC, p.cell) AS prnk
         |  FROM e CROSS JOIN p),
         |ca AS (SELECT vec_id, v, cell FROM ca0 WHERE prnk = 1),
         |qa0 AS (
         |  SELECT e.vec_id AS query_id, e.v AS qv, p.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |                       ORDER BY ${cos("e.v", "p.pv")} DESC, p.cell) AS prnk
         |  FROM e CROSS JOIN p WHERE e.vec_id < 5),
         |qa AS (SELECT query_id, qv, cell FROM qa0 WHERE prnk <= $PROBE),
         |scored AS (
         |  SELECT query_id, ca.vec_id,
         |    round(${cos("qv", "ca.v")}, 6) AS cos_sim
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)
  }

  /** Zipf spectrum slope (q240) — q69 plots the frequency spectrum;
    * this fits it: the log₂-log₂ slope of (#distinct words per
    * frequency octave) against the octave index, by q193's integer
    * OLS closed form in milli — natural text lands near the Zipfian
    * slope, while templated/synthetic corpora flatten or kink, so
    * the single number is a corpus-naturalness screen comparable
    * across snapshots. Both axes use `length(bin(n))` (exact
    * ⌊log₂⌋+1, q98's trick) — no floats anywhere; the regression
    * runs over ≤~20 octave points, everything before it map-side
    * combinable word counting.
    */
  val zipfSlope: Q = Q(
    (s, d) => {
      val pts = t(s, d, "documents")
        .select(explode(TextFunctions.words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .groupBy(expr("cast(length(bin(n)) AS bigint)").as("x"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("x"),
          expr("cast(length(bin(cnt)) AS bigint)").as("y"))
      pts.agg(count(lit(1)).as("k"), sum("x").as("sx"),
          sum("y").as("sy"), sum(expr("x * y")).as("sxy"),
          sum(expr("x * x")).as("sxx"))
        .withColumn("slope_milli",
          expr("(k * sxy - sx * sy) * 1000 div (k * sxx - sx * sx)"))
        .select(col("k"), col("slope_milli"),
          expr("(sy * 1000 - slope_milli * sx) div k")
            .as("intercept_milli"))
    },
    s"""WITH tf AS (
       |  SELECT w, count(*)::BIGINT AS n FROM (
       |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS w
       |    FROM documents) GROUP BY w),
       |pts AS (
       |  SELECT length(bin(n))::BIGINT AS x,
       |    length(bin(count(*)))::BIGINT AS y
       |  FROM tf GROUP BY length(bin(n))),
       |m AS (
       |  SELECT count(*)::BIGINT AS k, sum(x)::BIGINT AS sx,
       |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
       |    sum(x * x)::BIGINT AS sxx
       |  FROM pts)
       |SELECT k,
       |  ((k * sxy - sx * sy) * 1000 // (k * sxx - sx * sx))::BIGINT
       |    AS slope_milli,
       |  ((sy * 1000 - ((k * sxy - sx * sy) * 1000
       |      // (k * sxx - sx * sx)) * sx) // k)::BIGINT
       |    AS intercept_milli
       |FROM m""".stripMargin)

  /** Content-defined chunking audit (q236) — the rolling-hash
    * boundary statistics behind CDC dedup storage (restic/LBFS-style:
    * a chunk boundary wherever the W-char window's hash ≡ 0 mod D, so
    * boundaries survive insertions that shift byte offsets — the
    * property fixed-size chunking (q58) fundamentally lacks). Per
    * source: positions scanned, cuts found, the cut rate in ppm
    * (healthy content ≈ 10⁶/D — a far-off rate means degenerate
    * content defeating the chunker), and the implied mean chunk
    * length in milli-chars. The window hash is the native codegen
    * [[graft.plans.CharPolyHash]] per exploded position — map-only
    * until the per-source aggregate, no shuffle of text; at 100 TB
    * chunking parallelizes per document with zero coordination.
    */
  val cdcChunking: Q = {
    val W = 16; val DIV = 64L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"),
            length(col("text")).cast("long").as("len"))
        val pos = docs.filter(col("len") >= W)
          .select(col("source"), col("text"),
            explode(sequence(lit(1),
              (col("len") - W + 1).cast("int"))).as("p"))
        val cuts = pos
          .select(col("source"),
            when(Hashing.charHash(
              expr(s"substring(text, p, $W)"), W) % DIV === 0, 1L)
              .otherwise(0L).as("cut"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_positions"), sum("cut").as("n_cuts"))
        val tot = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("len").as("total_chars"))
        tot.join(cuts, Seq("source"), "left")
          .na.fill(0L, Seq("n_positions", "n_cuts"))
          .select(col("source"), col("n_docs"), col("total_chars"),
            col("n_positions"), col("n_cuts"),
            expr("n_cuts * 1000000L div greatest(n_positions, 1L)")
              .as("cut_ppm"),
            expr("total_chars * 1000L div (n_cuts + n_docs)")
              .as("mean_chunk_milli"))
          .orderBy("source")
      },
      s"""WITH dd AS (
         |  SELECT doc_id, source, text, length(text)::BIGINT AS len
         |  FROM documents),
         |pos AS (
         |  SELECT source, text,
         |    unnest(range(1, len - $W + 2)) AS p
         |  FROM dd WHERE len >= $W),
         |g AS (SELECT source, substr(text, p::INT, $W) AS gram FROM pos),
         |c AS (
         |  SELECT source, count(*)::BIGINT AS n_positions,
         |    sum(CASE WHEN (${Hashing.charHashSql("gram", W)}) % $DIV = 0
         |        THEN 1 ELSE 0 END)::BIGINT AS n_cuts
         |  FROM g GROUP BY source),
         |t AS (SELECT source, count(*)::BIGINT AS n_docs,
         |        sum(len)::BIGINT AS total_chars FROM dd GROUP BY source)
         |SELECT t.source, n_docs, total_chars,
         |  coalesce(n_positions, 0)::BIGINT AS n_positions,
         |  coalesce(n_cuts, 0)::BIGINT AS n_cuts,
         |  (coalesce(n_cuts, 0) * 1000000
         |     // greatest(coalesce(n_positions, 0), 1))::BIGINT AS cut_ppm,
         |  (total_chars * 1000 // (coalesce(n_cuts, 0) + n_docs))::BIGINT
         |    AS mean_chunk_milli
         |FROM t LEFT JOIN c ON t.source = c.source
         |ORDER BY t.source""".stripMargin)
  }

  /** IVF probe-count sweep (q234) — the ANN tuning table (q226's
    * discipline applied to retrieval): recall@5 against the exact
    * brute-force truth for nprobe ∈ 1..4, in ONE judged query. Every
    * arm shares the same pivot cell assignment (the partitioned
    * corpus is built once conceptually; each arm is the same keyed
    * cell join probing more cells), so the sweep measures exactly
    * the knob a deployment turns — more probed cells, more
    * candidates, higher recall — with the cost left implicit in the
    * cell count rather than re-measured. Recall is an exact integer
    * percentage of the NQ·K truth set; the oracle replays all four
    * arms against the same brute-force CTE.
    */
  val ivfSweep: Q = {
    val CELLS = 16; val K = 5; val NQ = 10
    val PROBES = Seq(1, 2, 3, 4)
    val cos = (a: String, b: String) => VectorFunctions.cosineSql(a, b)
    def armCte(np: Int): String =
      s"""qa$np AS (SELECT query_id, qv, cell FROM qa0 WHERE prnk <= $np),
         |sc$np AS (
         |  SELECT query_id, ca.vec_id,
         |    round(${cos("qv", "ca.v")}, 6) AS cos_sim
         |  FROM qa$np JOIN ca ON qa$np.cell = ca.cell
         |    AND ca.vec_id <> qa$np.query_id),
         |rk$np AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM sc$np),
         |hit$np AS (
         |  SELECT count(*)::BIGINT AS n_hits
         |  FROM (SELECT query_id, vec_id FROM rk$np WHERE rnk <= $K) a
         |  WHERE (query_id, vec_id) IN (SELECT (query_id, vec_id) FROM ex))"""
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < NQ)
        val exact = Similarity.bruteForceTopK(
            emb, queries, "vec_id", "embedding", K)
          .select(col("query_id"), col("vec_id"))
        val arms = PROBES.map { np =>
          Similarity.ivfTopK(emb, queries, "vec_id", "embedding", K,
              CELLS, np)
            .select(col("query_id"), col("vec_id"))
            .join(exact, Seq("query_id", "vec_id"), "leftsemi")
            .agg(count(lit(1)).as("n_hits"))
            .select(lit(np.toLong).as("nprobe"), col("n_hits"))
        }
        arms.reduce(_ unionByName _)
          .withColumn("recall_pct",
            expr(s"n_hits * 100 div ${NQ * K}"))
          .orderBy("nprobe")
      },
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |qx AS (SELECT vec_id AS query_id, v AS qv FROM e
         |       WHERE vec_id < $NQ),
         |bs AS (
         |  SELECT query_id, e.vec_id,
         |    round(${cos("qv", "e.v")}, 6) AS cos_sim
         |  FROM qx JOIN e ON e.vec_id <> query_id),
         |br AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM bs),
         |ex AS (SELECT query_id, vec_id FROM br WHERE rnk <= $K),
         |p AS (SELECT vec_id AS cell, v AS pv FROM e
         |      WHERE vec_id < $CELLS),
         |ca0 AS (
         |  SELECT e.vec_id, e.v, p.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cos("e.v", "p.pv")} DESC, p.cell) AS prnk
         |  FROM e CROSS JOIN p),
         |ca AS (SELECT vec_id, v, cell FROM ca0 WHERE prnk = 1),
         |qa0 AS (
         |  SELECT e.vec_id AS query_id, e.v AS qv, p.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cos("e.v", "p.pv")} DESC, p.cell) AS prnk
         |  FROM e CROSS JOIN p WHERE e.vec_id < $NQ),
         |${PROBES.map(armCte).mkString(",\n")}
         |${PROBES.map(np =>
             s"SELECT $np::BIGINT AS nprobe, n_hits, " +
               s"(n_hits * 100 // ${NQ * K})::BIGINT AS recall_pct " +
               s"FROM hit$np").mkString("\nUNION ALL\n")}
         |ORDER BY nprobe""".stripMargin)
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member
    * of the dedup family (exact q22 / Jaccard q23 / MinHash q24 /
    * SimHash q25 cover the text side). The corpus is random synthetic
    * vectors with no natural near-dups (max in-bucket cosine ≈ 0.43),
    * so duplicates are synthesized the same way q22 does: every
    * vector re-injected under a shifted id. [[Similarity.nearDupPairs]]
    * must then recover exactly the injected pairs at cos ≥ 0.999
    * through the multi-probe bucket join, with no random pair leaking
    * past the threshold.
    */
  val embedDupes: Q = {
    val MIN_COS = 0.999
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val dupes = emb.select((col("vec_id") + 1000000L).as("vec_id"),
          col("embedding"))
        val corpus = emb.unionByName(dupes)
        // (r, T) from the DEDUP corpus size (injected copies included)
        val r = VectorFunctions.mtBits(2L * corpusStats(s, d)._1)
        Similarity.multiTableNearDupPairs(corpus, "vec_id", "embedding",
            MIN_COS, r, VectorFunctions.mtTables(r))
          .orderBy("id_a", "id_b")
      },
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings),
         |${mtCtes("corpus")},
         |scored AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    max(round(${VectorFunctions.cosineSql("a.embedding", "b.embedding")}, 6))
         |      AS cos_sim
         |  FROM kb a JOIN kb b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id
         |  GROUP BY a.vec_id, b.vec_id)
         |SELECT id_a, id_b, cos_sim FROM scored
         |WHERE cos_sim >= $MIN_COS ORDER BY id_a, id_b""".stripMargin)
  }

  /** Deterministic train/val/test split by content-independent id
    * hash (80/10/10) — the reproducible alternative to `TABLESAMPLE`
    * (sample membership must not depend on partitioning, execution
    * order, or a seed's RNG stream; h32(id) mod 100 is the same on
    * every engine and every run). Reported as per-(lang, split)
    * counts.
    */
  val hashSplit: Q = {
    Q(
      (s, d) => {
        val bucket = Hashing.h32(col("doc_id").cast("string")) % 100
        val split = when(bucket < 80, "train")
          .when(bucket < 90, "val").otherwise("test")
        t(s, d, "documents")
          .select(col("lang"), split.as("split"))
          .groupBy("lang", "split").agg(count("*").as("n"))
          .orderBy("lang", "split")
      },
      s"""WITH s AS (
         |  SELECT lang,
         |    CASE WHEN ${Hashing.h32Sql("doc_id::VARCHAR")} % 100 < 80 THEN 'train'
         |         WHEN ${Hashing.h32Sql("doc_id::VARCHAR")} % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT lang, split, count(*)::BIGINT AS n
         |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin)
  }

  /** Deterministic stratified sample: the first N documents per
    * language in content-independent h32(id) order — balanced
    * cross-language subsets whose membership is reproducible on any
    * engine, any partitioning, any run (the same determinism stance
    * as [[hashSplit]]; `TABLESAMPLE`/`rand()` give neither balance
    * nor reproducibility). One window shuffle keyed by the stratum.
    */
  val stratifiedSample: Q = {
    val N = 20
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val win = Window.partitionBy("lang")
          .orderBy(Hashing.h32(col("doc_id").cast("string")), col("doc_id"))
        t(s, d, "documents").select(col("lang"), col("doc_id"))
          .withColumn("rnk", row_number().over(win).cast("long"))
          .filter(col("rnk") <= N)
          .orderBy("lang", "rnk")
      },
      s"""WITH r AS (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY ${Hashing.h32Sql("doc_id::VARCHAR")}, doc_id) AS rnk
         |  FROM documents)
         |SELECT lang, doc_id, CAST(rnk AS BIGINT) AS rnk FROM r
         |WHERE rnk <= $N ORDER BY lang, rnk""".stripMargin)
  }

  /** Benchmark decontamination: flag corpus documents sharing ≥
    * `MIN_SHARED` distinct word-3-gram shingles with a benchmark set
    * (here: doc_id < 25 stands in for the eval suite). The shape that
    * matters at 100 TB: the benchmark shingle set is bounded by the
    * *benchmark* (small by construction), so it broadcasts and the
    * corpus is scanned once with a semi-join probe — no corpus-sized
    * shuffle, no pair materialization.
    */
  val decontaminate: Q = {
    val BENCH_MAX = 25L; val MIN_SHARED = 5
    Q(
      (s, d) => {
        val sh = Dedup.shingleKeys(t(s, d, "documents"), "doc_id", "text", 3)
        val bench = sh.filter(col("doc_id") < BENCH_MAX).select("s").distinct()
        sh.filter(col("doc_id") >= BENCH_MAX)
          .join(broadcast(bench), Seq("s"), "leftsemi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MIN_SHARED)
          .orderBy("doc_id")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < $BENCH_MAX)
         |SELECT doc_id, count(*)::BIGINT AS n_shared
         |FROM sh WHERE doc_id >= $BENCH_MAX AND s IN (SELECT s FROM bench)
         |GROUP BY doc_id HAVING count(*) >= $MIN_SHARED
         |ORDER BY doc_id""".stripMargin)
  }

  /** Intra-document repetition: duplicate-trigram fraction
    * (1 − distinct/total 3-grams) — the Gopher-style repetition
    * signal that catches boilerplate loops [[textQuality]]'s
    * type-token ratio sees only at the word level. Per-doc bounded:
    * one explode + one groupBy, no cross-doc work.
    */
  val repetition: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val total = docs.select(col("doc_id"),
        greatest(size(TextFunctions.words(col("text"))) - 2, lit(0)).as("n_total"))
      val dist = Dedup.shingleKeys(docs, "doc_id", "text", 3)
        .groupBy("doc_id").agg(count(lit(1)).as("n_distinct"))
      // raw double: identical integer inputs -> identical IEEE result
      // on both engines; scale-6 rounding would diverge on exact
      // halves (see Dedup.scorePairs)
      total.join(dist, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_total"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          when(col("n_total") > 0,
            lit(1.0) - coalesce(col("n_distinct"), lit(0L)) / col("n_total").cast("double"))
            .otherwise(lit(0.0)).as("rep_ratio"))
        .orderBy("doc_id")
    },
    s"""WITH w AS (
       |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
       |tot AS (SELECT doc_id, greatest(len(arr) - 2, 0)::INT AS n_total FROM w),
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
       |dst AS (SELECT doc_id, count(*)::BIGINT AS n_distinct FROM sh GROUP BY doc_id)
       |SELECT t.doc_id, t.n_total, coalesce(d.n_distinct, 0)::BIGINT AS n_distinct,
       |  CASE WHEN t.n_total > 0
       |       THEN 1.0 - coalesce(d.n_distinct, 0) / t.n_total::DOUBLE
       |       ELSE 0.0 END AS rep_ratio
       |FROM tot t LEFT JOIN dst d ON t.doc_id = d.doc_id
       |ORDER BY t.doc_id""".stripMargin)

  /** K-means vector quantization ([[VectorQuantizer]]): 2 Lloyd
    * rounds, 8 cells, first-8-vectors seeding — the trained codebook
    * for the IVF index (q34 uses raw pivots; this is the same seam
    * with learned centroids). All-integer arithmetic end to end, so
    * the oracle unrolls the identical two iterations in SQL and every
    * centroid component matches bit-for-bit.
    */
  // k-means constants shared by q53 (codebook) and q54 (trained IVF
  // search) — like the MinHash family, one definition for both queries
  // and both oracles.
  private val KM_C = 8; private val KM_ITERS = 2

  /** Oracle CTE chain replaying [[VectorQuantizer.fitCentroids]]:
    * scaled long-form corpus `e`, seeds `c0`, then per Lloyd round i
    * the distances `d_i`, assignment `a_i`, and centroids `c_i` —
    * ending at `c$KM_ITERS` / `a$KM_ITERS`. Bit-exact because both
    * sides work in the same integer domain. `seedBound` is the
    * exclusive seed-id bound — the cell count: the `$KM_C` literal
    * for the fixed shared codebook (q53/q54/q66), or a scalar
    * subquery over a params CTE when the count is corpus-derived
    * (q71). `fitPred` restricts which `e` rows the fit SEES (seeds,
    * distance rounds, centroid updates) — the persisted-index
    * queries train on the index corpus only while `e` also carries
    * the out-of-corpus query vectors (q270). `eSql` overrides the
    * scaled corpus CTE body itself — q302 swaps in a CONSTRUCTED
    * clustered world (exact integers, no float in the oracle at all)
    * while reusing the whole Lloyd/PQ chain unchanged.
    */
  private val defaultESql: String =
    """e AS (
      |  SELECT vec_id,
      |    unnest(range(1, len(embedding) + 1)) AS dim,
      |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs
      |  FROM embeddings)""".stripMargin

  private def kmeansCtes(seedBound: String = KM_C.toString,
                         fitPred: String = "TRUE",
                         eSql: String = defaultESql): String = {
    def iterCte(i: Int): String =
      s"""d$i AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
         |  FROM e JOIN c${i - 1} c USING (dim)
         |  WHERE $fitPred
         |  GROUP BY e.vec_id, c.cell),
         |a$i AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM d$i) WHERE rnk = 1),
         |c$i AS (
         |  SELECT a$i.cell, e.dim, round(sum(e.xs) / count(*))::BIGINT AS cs
         |  FROM e JOIN a$i USING (vec_id)
         |  GROUP BY a$i.cell, e.dim)"""
    s"""$eSql,
       |c0 AS (SELECT vec_id AS cell, dim, xs AS cs FROM e
       |       WHERE vec_id < $seedBound AND $fitPred),
       |${(1 to KM_ITERS).map(iterCte).mkString(",\n")}""".stripMargin
  }

  val kmeansCodebook: Q = Q(
    (s, d) => {
      val fitted = VectorQuantizer.fit(
        t(s, d, "embeddings"), "vec_id", "embedding", KM_C, KM_ITERS)
      fitted.select(col("cell"), col("dim"),
          round(VectorQuantizer.unscale(col("cs")), 6).as("centroid"),
          col("n"))
        .orderBy("cell", "dim")
    },
    s"""WITH ${kmeansCtes()},
       |n AS (SELECT cell, count(*)::BIGINT AS n FROM a$KM_ITERS GROUP BY cell)
       |SELECT c$KM_ITERS.cell, c$KM_ITERS.dim,
       |  round(c$KM_ITERS.cs / 1000000.0, 6) AS centroid, n.n
       |FROM c$KM_ITERS JOIN n USING (cell) ORDER BY cell, dim""".stripMargin)

  /** Trained-codebook IVF search: the q34 shape with the q53 codebook
    * in place of raw pivots — fit, assign the corpus to its nearest
    * trained cell (exact integer L2), probe each query's 2 nearest
    * cells, score only within probed cells with the native cosine on
    * the ORIGINAL float vectors. Centroids exist solely in the integer
    * domain, so assignment is engine-exact end to end; the cosine path
    * is the same float-array parity every other ANN query relies on.
    */
  val annTrained: Q = {
    val PROBE = 2; val K = 5
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
        val e = VectorQuantizer.scaled(emb, "vec_id", "embedding").persist()
        val cent = VectorQuantizer.fitCentroids(e, "vec_id", KM_C, KM_ITERS)
        val corpusCells = VectorQuantizer.assignCells(e, cent, "vec_id")
        val queryCells = VectorQuantizer.assignCells(
            e.filter(col("vec_id") < 5), cent, "vec_id", PROBE)
          .withColumnRenamed("vec_id", "query_id")
        val corpusSide = emb.select(col("vec_id"), col("embedding"))
          .join(corpusCells, Seq("vec_id"))
        val querySide = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
          .join(queryCells, Seq("query_id"))
        val scored = corpusSide.join(querySide, Seq("cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            round(VectorFunctions.cosineNative(col("qv"), col("embedding")), 6)
              .as("cos_sim"))
        val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("vec_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= K)
          .orderBy("query_id", "rnk")
      },
      s"""WITH ${kmeansCtes()},
         |fa AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
         |  FROM e JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY e.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa) WHERE rnk = 1),
         |qa AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id < 5) WHERE rnk <= $PROBE),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |scored AS (
         |  SELECT qa.query_id, ca.vec_id,
         |    round(${VectorFunctions.cosineSql("qv.v", "cv.v")}, 6) AS cos_sim
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.query_id
         |  JOIN v cv ON cv.vec_id = ca.vec_id
         |  JOIN v qv ON qv.vec_id = qa.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk""".stripMargin)
  }

  /** Corpus vocabulary: top terms by raw frequency — the seed stage
    * of tokenizer/vocab training. Map-side partial counts into one
    * term-keyed shuffle, then a TakeOrderedAndProject top-k (no global
    * sort; asserted shape, same as q13).
    */
  val vocabTop: Q = {
    val K = 100
    Q(
      (s, d) => t(s, d, "documents")
        .select(explode(TextFunctions.words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("w"))
        .limit(K),
      s"""WITH tok AS (
         |  SELECT unnest(${TextFunctions.wordsSql("text")}) AS w FROM documents)
         |SELECT w, count(*)::BIGINT AS n FROM tok GROUP BY w
         |ORDER BY n DESC, w LIMIT $K""".stripMargin)
  }

  /** Source-level filtering (the RefinedWeb/C4 pattern): compute each
    * source's mean quality score, drop every document from sources
    * below threshold, report kept docs per language. The mean is an
    * exact integer (sum of micro-unit-scaled scores / count), so the
    * threshold comparison cannot flap with partitioning — a double
    * `avg` would be ulp-nondeterministic across executor counts, and
    * a source sitting on the boundary would make the whole filter
    * unstable. Two shuffles (per-source agg, per-lang count) plus a
    * broadcast semi-join of the small good-source list.
    */
  val sourceFilter: Q = {
    val T_SCALED = 500000L // 0.5 in micro-units
    Q(
      (s, d) => {
        // quantize straight to micro-unit longs: round-to-integer of
        // an identical double agrees across engines (an exact half is
        // binary-representable), whereas an inner round(score, 6)
        // would hit the scale-6 exact-half divergence
        val score = TextFunctions.qualityScore(TextFunctions.words(col("text")))
        val scored = t(s, d, "documents").select(
          col("source"), col("lang"),
          round(score * 1e6).cast("long").as("qs"))
        val good = scored.groupBy("source")
          .agg((sum(col("qs")) / count(lit(1))).as("mean_q_scaled"))
          .filter(col("mean_q_scaled") >= T_SCALED.toDouble)
          .select("source")
        scored.join(broadcast(good), Seq("source"), "leftsemi")
          .groupBy("lang").agg(count(lit(1)).as("n_kept"))
          .orderBy("lang")
      },
      s"""WITH w AS (
         |  SELECT source, lang, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
         |sc AS (
         |  SELECT source, lang,
         |    round((${TextFunctions.qualityScoreSql("arr")}) * 1000000)::BIGINT AS qs
         |  FROM w),
         |good AS (
         |  SELECT source FROM sc GROUP BY source
         |  HAVING sum(qs) / count(*) >= $T_SCALED.0)
         |SELECT lang, count(*)::BIGINT AS n_kept FROM sc
         |WHERE source IN (SELECT source FROM good)
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** PII scrubbing: redact phone-shaped patterns, count hits per doc,
    * fingerprint the redacted text (the md5 proves byte-exact
    * redaction, not just matching counts). The corpus carries no PII,
    * so patterns are injected deterministically the way q22 injects
    * duplicates. Stateless projection — embarrassingly parallel at
    * any scale; the pattern set is where a production rule pack
    * (emails, SSNs, keys) plugs in.
    */
  val piiScrub: Q = {
    val PAT = "[0-9]{3}-[0-9]{4}" // 8-char matches, so hits = len-delta / 8
    Q(
      (s, d) => {
        val injected = when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" call 555-0199 or 555-0100")))
          .otherwise(col("text"))
        t(s, d, "documents").select(col("doc_id"), injected.as("text"))
          .select(col("doc_id"),
            ((length(col("text")) -
              length(regexp_replace(col("text"), PAT, ""))) / 8)
              .cast("long").as("n_hits"),
            md5(regexp_replace(col("text"), PAT, "<PHONE>")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      s"""WITH c AS (
         |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |    THEN text || ' call 555-0199 or 555-0100' ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  ((length(text) - length(regexp_replace(text, '$PAT', '', 'g'))) // 8)::BIGINT AS n_hits,
         |  md5(regexp_replace(text, '$PAT', '<PHONE>', 'g')) AS redacted_md5
         |FROM c ORDER BY doc_id""".stripMargin)
  }

  /** Context-length chunking: split each document into fixed-size
    * token windows (the packing stage that turns documents into
    * training sequences). Pure per-doc arithmetic — explode of a
    * computed range, no shuffle at all until the output sort; at
    * scale this is a map-only stage.
    */
  val chunks: Q = {
    val CHUNK = 32
    Q(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          size(TextFunctions.words(col("text"))).as("n_tok"))
        // greatest(…, 0): Spark `div` truncates toward zero, DuckDB `//`
        // floors — they disagree at n_tok = 0 (-1 div C = 0 vs -1 // C
        // = -1). Unreachable today (split('', ' ') yields ['']), but
        // the guard makes both engines agree for ALL inputs.
        .select(col("doc_id"), col("n_tok"),
          explode(sequence(lit(0),
            expr(s"greatest(n_tok - 1, 0) div $CHUNK"))).as("chunk"))
        .select(col("doc_id"), col("chunk").cast("long").as("chunk"),
          (col("chunk") * CHUNK + 1).as("tok_start"),
          least(col("n_tok"), (col("chunk") + 1) * CHUNK).as("tok_end"))
        .orderBy("doc_id", "chunk"),
      s"""WITH n AS (
         |  SELECT doc_id, len(${TextFunctions.wordsSql("text")})::INT AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tok,
         |    unnest(range(0, greatest(n_tok - 1, 0) // $CHUNK + 1)) AS chunk
         |  FROM n)
         |SELECT doc_id, chunk,
         |  (chunk * $CHUNK + 1)::BIGINT AS tok_start,
         |  least(n_tok, (chunk + 1) * $CHUNK)::BIGINT AS tok_end
         |FROM c ORDER BY doc_id, chunk""".stripMargin)
  }

  /** Adaptive quality filtering: keep documents at or above their
    * language's MEDIAN quality — per-stratum thresholds instead of
    * q56's global cutoff (low-resource languages aren't graded on the
    * dominant language's curve). The threshold compare AND the emitted
    * median stay in the scaled-integer domain: an interpolated median
    * of micro-unit longs is an exact integer or exact half in IEEE
    * double on every engine (values ≪ 2⁵³), so `qs >= median` cannot
    * flap on a last-ulp disagreement, and `med_q_us` is emitted as
    * that exact value — dividing back to vector units and rounding
    * would reintroduce the exact-half rounding divergence between
    * Spark and DuckDB. Shapes: one per-lang percentile agg, one
    * broadcast join back, one count agg.
    */
  val adaptiveFilter: Q = Q(
    (s, d) => {
      val score = TextFunctions.qualityScore(TextFunctions.words(col("text")))
      // direct micro-unit quantization: round-to-integer of identical
      // doubles agrees across engines; an inner round(score, 6) would
      // hit the scale-6 exact-half divergence
      val sc = t(s, d, "documents").select(col("lang"),
        round(score * 1e6).cast("long").as("qs"))
      val med = sc.groupBy("lang")
        .agg(expr("percentile(qs, 0.5D)").as("ms"))
      sc.join(broadcast(med), Seq("lang"))
        .groupBy("lang", "ms")
        .agg(sum(when(col("qs") >= col("ms"), 1L).otherwise(0L)).as("n_kept"),
          count(lit(1)).as("n_docs"))
        .select(col("lang"), col("ms").as("med_q_us"),
          col("n_kept"), col("n_docs"))
        .orderBy("lang")
    },
    s"""WITH w AS (
       |  SELECT lang, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
       |sc AS (
       |  SELECT lang,
       |    round((${TextFunctions.qualityScoreSql("arr")}) * 1000000)::BIGINT AS qs
       |  FROM w),
       |med AS (SELECT lang, quantile_cont(qs, 0.5) AS ms FROM sc GROUP BY lang)
       |SELECT sc.lang, ms AS med_q_us,
       |  count(*) FILTER (qs >= ms)::BIGINT AS n_kept,
       |  count(*)::BIGINT AS n_docs
       |FROM sc JOIN med USING (lang)
       |GROUP BY sc.lang, ms ORDER BY sc.lang""".stripMargin)

  /** Corpus-level duplicate-span removal (the C4/CCNet rule at span
    * granularity): chunk every document into fixed W-word spans, drop
    * each span occurrence except the corpus-first one (ordered by
    * (doc_id, span index)), and prove the reassembled text byte-exact
    * with an md5. The corpus carries a deterministic injected
    * duplicate (an 8-word preamble on every 10th doc — the same
    * synthesis pattern as q22/q57) so the removal path is genuinely
    * exercised. Two shuffles, both linear in corpus spans: a ranking
    * window keyed by span text, then the per-doc reassembly agg.
    */
  val spanDedup: Q = {
    val W = 8
    val DUP = "alpha beta gamma delta epsilon zeta eta theta"
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val injected = when(col("doc_id") % 10 === 0,
          concat(lit(DUP + " "), col("text"))).otherwise(col("text"))
        val spans = t(s, d, "documents")
          .select(col("doc_id"), TextFunctions.words(injected).as("arr"))
          .select(col("doc_id"), posexplode(
            // greatest guard: see chunks — div/`//` disagree below zero
            transform(sequence(lit(0),
                expr(s"greatest(size(arr) - 1, 0) div $W")),
              i => array_join(slice(col("arr"), i * W + 1, lit(W)), " ")))
            .as(Seq("idx", "span")))
        spans
          .withColumn("keep", row_number().over(
            Window.partitionBy("span").orderBy("doc_id", "idx")) === 1)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(!col("keep"), 1L).otherwise(0L)).as("n_removed"),
            md5(array_join(transform(
              array_sort(collect_list(when(col("keep"),
                struct(col("idx"), col("span"))))),
              x => x.getField("span")), " ")).as("kept_md5"))
          .orderBy("doc_id")
      },
      s"""WITH c AS (
         |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |    THEN '$DUP ' || text ELSE text END AS text
         |  FROM documents),
         |w AS (SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM c),
         |e AS (SELECT doc_id, arr,
         |  unnest(range(0, greatest(len(arr) - 1, 0) // $W + 1)) AS idx FROM w),
         |sp AS (SELECT doc_id, idx,
         |  array_to_string(arr[(idx * $W + 1):(idx * $W + $W)], ' ') AS span
         |  FROM e),
         |k AS (SELECT doc_id, idx, span,
         |  row_number() OVER (PARTITION BY span ORDER BY doc_id, idx) = 1 AS keep
         |  FROM sp)
         |SELECT doc_id, count(*)::BIGINT AS n_spans,
         |  count(*) FILTER (NOT keep)::BIGINT AS n_removed,
         |  md5(coalesce(string_agg(span, ' ' ORDER BY idx) FILTER (keep), ''))
         |    AS kept_md5
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }

  // the ONE definition of the pack geometry and its oracle replay —
  // q62 judges the assignment, q286 audits attention leakage OVER
  // that assignment, so the two must never drift (the contribSql
  // discipline applied to packing)
  private val PACK_BUDGET = 64L
  private val PACK_STRATA = 16

  /** The shared recursive next-fit CTE chain (n/o/p) of q62 and
    * q286's oracles: per-stratum sequential fold with exact-integer
    * bin boundaries.
    */
  private def packCtes: String =
    s"""n AS (
       |  SELECT doc_id % $PACK_STRATA AS stratum, doc_id,
       |    len(${TextFunctions.wordsSql("text")})::BIGINT AS n_tok
       |  FROM documents),
       |o AS (
       |  SELECT stratum, doc_id, n_tok,
       |    row_number() OVER (PARTITION BY stratum ORDER BY doc_id) AS rn
       |  FROM n),
       |p AS (
       |  SELECT stratum, rn, n_tok, 0::BIGINT AS bin, n_tok AS cum
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.stratum, o.rn, o.n_tok,
       |    CASE WHEN p.cum + o.n_tok > $PACK_BUDGET THEN p.bin + 1
       |         ELSE p.bin END,
       |    CASE WHEN p.cum + o.n_tok > $PACK_BUDGET THEN o.n_tok
       |         ELSE p.cum + o.n_tok END
       |  FROM p JOIN o ON o.stratum = p.stratum AND o.rn = p.rn + 1)"""
      .stripMargin

  /** The shared Spark-side pack assignment of q62 and q286. */
  private def packAssignment(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "documents").select(
      (col("doc_id") % PACK_STRATA).as("stratum"), col("doc_id"),
      size(TextFunctions.words(col("text"))).cast("long").as("n_tok"))
    Packing.nextFitPack(n, "stratum", "doc_id", "n_tok", PACK_BUDGET)
  }

  /** Sequence packing: next-fit documents into fixed token-budget
    * training bins, independently per hash stratum
    * ([[graft.operators.Packing]]). The oracle replays the identical
    * sequential fold as a DuckDB recursive CTE — bin boundaries are
    * exact-integer decisions on both sides, so the assignment (not
    * just the totals) must agree. Emits per-bin occupancy.
    */
  val packSequences: Q = Q(
    (s, d) => packAssignment(s, d)
      .groupBy("stratum", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .orderBy("stratum", "bin"),
    s"""WITH RECURSIVE $packCtes
       |SELECT stratum, bin, count(*)::BIGINT AS n_docs,
       |  sum(n_tok)::BIGINT AS sum_tokens
       |FROM p GROUP BY stratum, bin ORDER BY stratum, bin""".stripMargin)

  /** Packed-window attention-leakage audit (q286) — the mask-side
    * complement of q62/q145: packing documents into fixed context
    * windows WITHOUT per-document attention masks lets every token
    * causally attend across document boundaries (the cross-doc
    * contamination the block-diagonal mask exists to stop). Per
    * packed bin with doc lengths l₁..lₘ the attendable cross-doc
    * pairs have the closed form (T² − Σlᵢ²)/2 (T = Σlᵢ — always
    * even, exact in int64) against T(T+1)/2 total causal pairs, so
    * the audit is THREE integer aggregates over the q62 pack
    * assignment — no pair enumeration, no recursion on the Spark
    * side (the oracle replays the same next-fit recursive CTE as
    * q62 and then the same closed form, so a hash match proves both
    * the assignment and the algebra). leak_ppm is the fraction of a
    * window's attention budget that crosses document boundaries —
    * the number a masking bug actually moves.
    */
  val packMaskAudit: Q = Q(
    (s, d) => packAssignment(s, d)
      .groupBy("stratum", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("t"),
        sum(expr("n_tok * n_tok")).as("s2"))
      .selectExpr("stratum", "bin", "n_docs", "t AS sum_tokens",
        "(t * t - s2) div 2 AS cross_pairs",
        """CASE WHEN t = 0 THEN 0
          | ELSE ((t * t - s2) div 2 * 1000000)
          |      div ((t * (t + 1)) div 2) END AS leak_ppm"""
          .stripMargin)
      .orderBy("stratum", "bin"),
    s"""WITH RECURSIVE $packCtes,
       |a AS (
       |  SELECT stratum, bin, count(*)::BIGINT AS n_docs,
       |    sum(n_tok)::BIGINT AS t,
       |    sum(n_tok * n_tok)::BIGINT AS s2
       |  FROM p GROUP BY stratum, bin)
       |SELECT stratum, bin, n_docs, t AS sum_tokens,
       |  ((t * t - s2) // 2)::BIGINT AS cross_pairs,
       |  (CASE WHEN t = 0 THEN 0
       |   ELSE ((t * t - s2) // 2 * 1000000) // ((t * (t + 1)) // 2)
       |   END)::BIGINT AS leak_ppm
       |FROM a ORDER BY stratum, bin""".stripMargin)

  /** Collocation mining: top-K adjacent-word bigrams with an exact
    * integer association strength (P(y|x) in ppm — the ln-free stand-in
    * for PMI, same discipline as q36's rational TF-IDF). The bigram
    * explode is map-side; one shuffle keyed by bigram; the per-head
    * totals frame is vocabulary-sized, so it broadcasts; the top-K is
    * a TakeOrderedAndProject, never a global sort.
    */
  val collocations: Q = {
    val K = 50
    Q(
      (s, d) => {
        val bigrams = t(s, d, "documents")
          .select(TextFunctions.words(col("text")).as("arr"))
          .filter(size(col("arr")) >= 2) // sequence(2,1) would descend
          .select(explode(transform(sequence(lit(2), size(col("arr"))),
            i => struct(element_at(col("arr"), i - 1).as("x"),
              element_at(col("arr"), i).as("y")))).as("b"))
          .select(col("b.x").as("x"), col("b.y").as("y"))
        val c = bigrams.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
        val cx = c.groupBy("x").agg(sum("n_xy").as("n_x"))
        c.join(broadcast(cx), Seq("x"))
          .select(col("x"), col("y"), col("n_xy"),
            expr("(n_xy * 1000000) div n_x").as("strength_ppm"))
          .orderBy(desc("n_xy"), asc("x"), asc("y"))
          .limit(K)
      },
      s"""WITH w AS (
         |  SELECT ${TextFunctions.wordsSql("text")} AS arr FROM documents
         |  WHERE len(${TextFunctions.wordsSql("text")}) >= 2),
         |i AS (SELECT arr, unnest(range(2, len(arr) + 1)) AS i FROM w),
         |b AS (SELECT arr[i - 1] AS x, arr[i] AS y FROM i),
         |c AS (SELECT x, y, count(*)::BIGINT AS n_xy FROM b GROUP BY x, y),
         |cx AS (SELECT x, sum(n_xy)::BIGINT AS n_x FROM c GROUP BY x)
         |SELECT x, y, n_xy, ((n_xy * 1000000) // n_x)::BIGINT AS strength_ppm
         |FROM c JOIN cx USING (x)
         |ORDER BY n_xy DESC, x, y LIMIT $K""".stripMargin)
  }

  /** Document-partitioned inverted index: per (term, shard) posting
    * lists, proven byte-exact with an md5 over the sorted doc-id list.
    * Sharding by doc id is how distributed indexes actually bound
    * memory — a ubiquitous term's posting list is capped at shard df,
    * and shard count grows with the corpus, so per-group state stays
    * executor-sized at any scale. Two shuffles: the (doc, term)
    * distinct and the (term, shard) group.
    */
  val invertedIndex: Q = {
    val SHARDS = 8
    Q(
      (s, d) => {
        val tok = t(s, d, "documents")
          .select(col("doc_id"), (col("doc_id") % SHARDS).as("shard"),
            explode(TextFunctions.words(col("text"))).as("w"))
          .distinct()
        tok.groupBy("w", "shard")
          .agg(count(lit(1)).as("df"),
            md5(array_join(transform(array_sort(collect_set(col("doc_id"))),
              _.cast("string")), ",")).as("postings_md5"))
          .orderBy("w", "shard")
      },
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, doc_id % $SHARDS AS shard,
         |    unnest(${TextFunctions.wordsSql("text")}) AS w
         |  FROM documents)
         |SELECT w, shard, count(*)::BIGINT AS df,
         |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS postings_md5
         |FROM tok GROUP BY w, shard ORDER BY w, shard""".stripMargin)
  }

  // ------------------------------------------------------------ multimodal

  /** Multimodal pipeline over opaque binary content: stub-decoded
    * metadata (via the typed mapPartitions batch path —
    * [[Multimodal.decodeMeta]]), codegen frame sampling, per-frame
    * fingerprints, and aspect-fit resize targets. The oracle
    * recomputes every value from the same constants; byte slicing is
    * mirrored with char slicing, which is exact because the corpus is
    * ASCII (octet_length == length for every document — verified).
    */
  val multimodalFrames: Q = {
    val FRAME = 32; val STRIDE = 64; val MAXF = 4
    val MAXW = 320; val MAXH = 240
    val fn = (s: SparkSession, d: String) => {
      val media = Multimodal.mediaTable(t(s, d, "documents"), "doc_id", "text")
      val decoded = Multimodal.decodeMeta(media, "doc_id").toDF()
        .select(col("media_id").as("doc_id"),
          col("n_bytes"), col("width"), col("height"))
      val frames = Multimodal.sampleFrames(media, "doc_id", FRAME, STRIDE, MAXF)
      val (fitW, fitH) = Multimodal.fitWithin(col("width"), col("height"), MAXW, MAXH)
      frames.join(decoded, Seq("doc_id"))
        .select(col("doc_id"), col("f").cast("long").as("f"),
          Hashing.h32(col("frame")).as("frame_h"),
          col("n_bytes"), col("width"), col("height"),
          fitW.as("fit_w"), fitH.as("fit_h"))
        .orderBy("doc_id", "f")
    }
    val (wSql, hSql) = Multimodal.fakeDecodeSql("n_bytes")
    val (fitWSql, fitHSql) = Multimodal.fitWithinSql("width", "height", MAXW, MAXH)
    Q(fn,
      s"""WITH m AS (
         |  SELECT doc_id, text, octet_length(encode(text))::INT AS n_bytes
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, n_bytes, ($wSql) AS width, ($hSql) AS height FROM m),
         |f AS (
         |  SELECT doc_id,
         |    unnest(range(0, least(${MAXF - 1}, greatest(n_bytes - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM m),
         |s AS (
         |  SELECT f.doc_id, f.f,
         |    substr(m.text, (f.f * $STRIDE + 1)::INT, $FRAME) AS frame
         |  FROM f JOIN m ON f.doc_id = m.doc_id)
         |SELECT s.doc_id, s.f, ${Hashing.h32Sql("frame")} AS frame_h,
         |  d.n_bytes, d.width, d.height,
         |  $fitWSql AS fit_w, $fitHSql AS fit_h
         |FROM s JOIN d ON s.doc_id = d.doc_id
         |ORDER BY s.doc_id, f""".stripMargin)
  }

  /** Windowed frame-energy audit (q174) — the audio arm of the
    * multimodal family (q33 covers image-shaped decode/resize; this
    * is the PCM-shaped path): contiguous fixed-size frames are
    * sampled from the opaque binary content ([[Multimodal
    * .sampleFrames]], pure codegen), each full frame folds to an
    * energy scalar via the native [[graft.plans.CharEnergy]]
    * expression (one fused byte loop — the windowed-RMS computation a
    * loudness/silence-trim stage runs per frame), and per-media stats
    * roll up to a per-source report (frame counts, total and peak
    * energy, quiet-frame counts). Aggregation is two-level — per media
    * FIRST, then per source — so the frame-grain rows never shuffle
    * on the wide source key; at 100 TB the per-media combine happens
    * map-side next to the decode. Media too short for one full frame
    * drop out on both engines.
    */
  val audioEnergy: Q = {
    val FRAME = 32; val STRIDE = 32; val MAXF = 8
    val CENTER = 96; val QUIET = 8000L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val media = Multimodal.mediaTable(docs, "doc_id", "text")
        val perDoc = Multimodal
          .sampleFrames(media, "doc_id", FRAME, STRIDE, MAXF)
          .filter(octet_length(col("frame")) === FRAME)
          .select(col("doc_id"),
            Multimodal.frameEnergy(decode(col("frame"), "UTF-8"),
              FRAME, CENTER).as("energy"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nf"), sum("energy").as("se"),
            max("energy").as("pk"),
            count(when(col("energy") < QUIET, 1)).as("nq"))
        perDoc.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_media"),
            sum("nf").as("n_frames"),
            sum("se").as("sum_energy"),
            max("pk").as("peak_energy"),
            sum("nq").as("n_quiet"))
          .orderBy("source")
      },
      s"""WITH m AS (
         |  SELECT doc_id, source, text,
         |    octet_length(encode(text))::INT AS n_bytes
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    unnest(range(0, least(${MAXF - 1}, greatest(n_bytes - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM m),
         |fr AS (
         |  SELECT f.doc_id,
         |    substr(m.text, (f.f * $STRIDE + 1)::INT, $FRAME) AS frame
         |  FROM f JOIN m ON f.doc_id = m.doc_id),
         |fe AS (
         |  SELECT doc_id, ${CharEnergy.sql("frame", FRAME, CENTER)} AS energy
         |  FROM fr WHERE length(frame) = $FRAME),
         |pd AS (
         |  SELECT doc_id, count(*) AS nf, sum(energy) AS se,
         |    max(energy) AS pk,
         |    count(CASE WHEN energy < $QUIET THEN 1 END) AS nq
         |  FROM fe GROUP BY 1)
         |SELECT m.source, count(*)::BIGINT AS n_media,
         |  sum(pd.nf)::BIGINT AS n_frames, sum(pd.se)::BIGINT AS sum_energy,
         |  max(pd.pk)::BIGINT AS peak_energy, sum(pd.nq)::BIGINT AS n_quiet
         |FROM pd JOIN m ON pd.doc_id = m.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Voice-activity segmentation (q209) — the audio arm grows
    * structure: q174 counts quiet frames, this finds the voiced
    * SEGMENTS (maximal runs of consecutive frames with energy ≥
    * threshold) via the islands-and-gaps idiom — `frame_idx −
    * row_number` inside each media is constant exactly along a run,
    * so one per-media window + one groupBy turns runs into rows, no
    * self-join, no iteration. Per source: media/frame/voiced counts,
    * segment count, the longest run, and mean segment length in
    * milli-frames. The window partitions per media and is bounded by
    * the ≤8-frame cap; everything else is two-level map-side
    * aggregation (q174's shape). This is the VAD summary an audio
    * curation pass runs (speech/music/silence triage) with the real
    * energy fn swappable at the same [[graft.plans.CharEnergy]] seam.
    */
  val vadSegments: Q = {
    val FRAME = 32; val STRIDE = 32; val MAXF = 8
    val CENTER = 96; val QUIET = 8000L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
        val media = Multimodal.mediaTable(docs, "doc_id", "text")
        val fe = Multimodal
          .sampleFrames(media, "doc_id", FRAME, STRIDE, MAXF)
          .filter(octet_length(col("frame")) === FRAME)
          .select(col("doc_id"), col("f"),
            (Multimodal.frameEnergy(decode(col("frame"), "UTF-8"),
              FRAME, CENTER) >= QUIET).as("voiced"))
        val segs = fe.filter(col("voiced"))
          .withColumn("grp", col("f") - row_number().over(
            Window.partitionBy("doc_id").orderBy("f")))
          .groupBy("doc_id", "grp").agg(count(lit(1)).as("len"))
        val perDoc = fe.groupBy("doc_id")
          .agg(count(lit(1)).as("nf"),
            count(when(col("voiced"), 1)).as("nv"))
          .join(segs.groupBy("doc_id")
            .agg(count(lit(1)).as("nseg"), max("len").as("maxrun")),
            Seq("doc_id"), "left")
          .na.fill(0L, Seq("nseg", "maxrun"))
        perDoc
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_media"), sum("nf").as("n_frames"),
            sum("nv").as("n_voiced"), sum("nseg").as("n_segments"),
            max("maxrun").as("longest_run"))
          .withColumn("mean_seg_milli", when(col("n_segments") > 0,
            expr("n_voiced * 1000L div n_segments")).otherwise(0L))
          .orderBy("source")
      },
      s"""WITH m AS (
         |  SELECT doc_id, source, text,
         |    octet_length(encode(text))::INT AS n_bytes
         |  FROM documents),
         |fx AS (
         |  SELECT doc_id,
         |    unnest(range(0, least(${MAXF - 1}, greatest(n_bytes - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM m),
         |fr AS (
         |  SELECT fx.doc_id, fx.f,
         |    substr(m.text, (fx.f * $STRIDE + 1)::INT, $FRAME) AS frame
         |  FROM fx JOIN m ON fx.doc_id = m.doc_id),
         |fe AS (
         |  SELECT doc_id, f,
         |    (${CharEnergy.sql("frame", FRAME, CENTER)} >= $QUIET) AS voiced
         |  FROM fr WHERE length(frame) = $FRAME),
         |voi AS (
         |  SELECT doc_id, f,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY f) AS rn
         |  FROM fe WHERE voiced),
         |seg AS (SELECT doc_id, f - rn AS grp, count(*)::BIGINT AS len
         |        FROM voi GROUP BY doc_id, f - rn),
         |sd AS (SELECT doc_id, count(*)::BIGINT AS nseg,
         |         max(len)::BIGINT AS maxrun FROM seg GROUP BY doc_id),
         |pd AS (
         |  SELECT doc_id, count(*)::BIGINT AS nf,
         |    count(CASE WHEN voiced THEN 1 END)::BIGINT AS nv
         |  FROM fe GROUP BY doc_id),
         |pj AS (
         |  SELECT pd.doc_id, nf, nv, coalesce(nseg, 0) AS nseg,
         |    coalesce(maxrun, 0) AS maxrun
         |  FROM pd LEFT JOIN sd USING (doc_id))
         |SELECT m.source, count(*)::BIGINT AS n_media,
         |  sum(nf)::BIGINT AS n_frames, sum(nv)::BIGINT AS n_voiced,
         |  sum(nseg)::BIGINT AS n_segments,
         |  max(maxrun)::BIGINT AS longest_run,
         |  (CASE WHEN sum(nseg) > 0 THEN sum(nv) * 1000 // sum(nseg)
         |        ELSE 0 END)::BIGINT AS mean_seg_milli
         |FROM pj JOIN m ON pj.doc_id = m.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Scene-change detection (q186) — the video arm of the multimodal
    * family (q33 image decode, q174 audio energy): frames sampled
    * from the opaque binary content, per-frame energy via the native
    * [[graft.plans.CharEnergy]] fold, and a cut flagged wherever the
    * energy jumps by more than a threshold between ADJACENT frames —
    * the |Δ| shot-boundary heuristic every scene segmenter starts
    * from (a real system swaps frame-difference histograms in at the
    * same seam). The lag window is partitioned per media and bounded
    * by the frame cap (≤ 12 rows), so it never becomes a corpus-scale
    * sort; per-media shot stats aggregate map-side before the
    * per-source rollup, the same two-level shape as q174. Mean shot
    * length is reported in milli-frames (`frames·1000 div shots`,
    * shots = cuts + media) to stay integer-exact.
    */
  val sceneCuts: Q = {
    val FRAME = 48; val STRIDE = 48; val MAXF = 12
    val CENTER = 96; val CUT = 2000L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
        val media = Multimodal.mediaTable(docs, "doc_id", "text")
        val fe = Multimodal
          .sampleFrames(media, "doc_id", FRAME, STRIDE, MAXF)
          .filter(octet_length(col("frame")) === FRAME)
          .select(col("doc_id"), col("f"),
            Multimodal.frameEnergy(decode(col("frame"), "UTF-8"),
              FRAME, CENTER).as("energy"))
        val perDoc = fe
          .withColumn("prev", lag("energy", 1).over(
            Window.partitionBy("doc_id").orderBy("f")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nf"),
            count(when(abs(col("energy") - col("prev")) > CUT, 1))
              .as("cuts"))
        perDoc.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_media"),
            sum("nf").as("n_frames"),
            sum("cuts").as("n_cuts"),
            max("cuts").as("max_cuts"))
          .select(col("source"), col("n_media"), col("n_frames"),
            col("n_cuts"), col("max_cuts"),
            expr("n_frames * 1000L div (n_cuts + n_media)")
              .as("shot_mframes"))
          .orderBy("source")
      },
      s"""WITH m AS (
         |  SELECT doc_id, source, text,
         |    octet_length(encode(text))::INT AS n_bytes
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    unnest(range(0, least(${MAXF - 1}, greatest(n_bytes - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM m),
         |fr AS (
         |  SELECT f.doc_id, f.f,
         |    substr(m.text, (f.f * $STRIDE + 1)::INT, $FRAME) AS frame
         |  FROM f JOIN m ON f.doc_id = m.doc_id),
         |fe AS (
         |  SELECT doc_id, f, ${CharEnergy.sql("frame", FRAME, CENTER)} AS energy
         |  FROM fr WHERE length(frame) = $FRAME),
         |lg AS (
         |  SELECT doc_id, energy,
         |    lag(energy) OVER (PARTITION BY doc_id ORDER BY f) AS prev
         |  FROM fe),
         |pd AS (
         |  SELECT doc_id, count(*) AS nf,
         |    count(CASE WHEN abs(energy - prev) > $CUT THEN 1 END) AS cuts
         |  FROM lg GROUP BY 1)
         |SELECT m.source, count(*)::BIGINT AS n_media,
         |  sum(pd.nf)::BIGINT AS n_frames, sum(pd.cuts)::BIGINT AS n_cuts,
         |  max(pd.cuts)::BIGINT AS max_cuts,
         |  (sum(pd.nf) * 1000 // (sum(pd.cuts) + count(*)))::BIGINT
         |    AS shot_mframes
         |FROM pd JOIN m ON pd.doc_id = m.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Schema-evolution read (q192) — the format-matrix member q164/165
    * (JSONL/ORC) don't cover: a table whose NEWER partition carries a
    * column the older one predates. The artifact is one
    * fingerprint-keyed root with two hive-style partitions (`gen=1`
    * without `quality_ppm`, `gen=2` with it — the everyday "we
    * started scoring docs mid-corpus" layout); the judged read uses
    * `mergeSchema` + partition discovery, and the report proves the
    * contract: old rows surface with NULL fill (counted per
    * generation), new rows carry their scores, and the partition
    * column arrives as data. At 100 TB this is how schema changes
    * ship WITHOUT rewriting history — additive columns, per-partition
    * footers merged at planning time; the oracle derives both
    * generations relationally from the base table, so hash equality
    * proves the on-disk evolution faithful. The split is
    * `doc_id % 2`, deterministic on both engines.
    */
  val schemaEvolution: Q = Q(
    (s, d) => {
      val root = graft.sources.Artifacts.publishOnce(
        "graft-schemaevo", d, Seq("documents.parquet")) { stage =>
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$stage/gen=1")
        docs.filter(col("doc_id") % 2 === 1)
          .withColumn("quality_ppm",
            expr("least(n_chars, 1000L) * 1000L"))
          .write.mode("overwrite").parquet(s"$stage/gen=2")
        // publishOnce's commit marker sits at the artifact root; the
        // per-partition writes left theirs one level down
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(stage, "_SUCCESS"))
        ()
      }
      s.read.option("mergeSchema", "true").parquet(root)
        .groupBy(col("gen").cast("long").as("gen"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("quality_ppm")).as("n_scored"),
          count(when(col("quality_ppm").isNull, 1)).as("n_nullfill"),
          coalesce(sum("quality_ppm"), lit(0L)).as("sum_quality"))
        .orderBy("gen")
    },
    """WITH evo AS (
      |  SELECT 1 AS gen, doc_id, CAST(NULL AS BIGINT) AS quality_ppm
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT 2, doc_id, least(n_chars, 1000) * 1000
      |  FROM documents WHERE doc_id % 2 = 1)
      |SELECT gen::BIGINT AS gen, count(*)::BIGINT AS n_rows,
      |  count(quality_ppm)::BIGINT AS n_scored,
      |  count(CASE WHEN quality_ppm IS NULL THEN 1 END)::BIGINT
      |    AS n_nullfill,
      |  coalesce(sum(quality_ppm), 0)::BIGINT AS sum_quality
      |FROM evo GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Document-length Gini coefficient (q194) — the inequality audit a
    * curation team runs per source: is the token budget spread across
    * documents or owned by a few giants? Gini comes from the rank
    * form `(2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) · 10⁶ div (n·Σx)`, but WITHOUT
    * ranking rows: group docs by (source, length) into a value
    * histogram, and each distinct length v with count c after C
    * smaller rows contributes `v·(c·C + c(c+1) div 2)` — the sum of
    * its block's ranks in closed form (tie-invariant, so no tiebreak
    * column is needed for parity). The only window is the cumulative
    * count over the DISTINCT-length histogram per source — bounded by
    * the length alphabet, not the corpus — and everything else is
    * map-side-combinable aggregation; the oracle ranks the raw
    * multiset with row_number, so hash equality proves histogram
    * algebra ≡ per-row ranks. All operands non-negative int64.
    */
  val giniLengths: Q = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = t(s, d, "documents")
        .groupBy(col("source"), col("n_chars").as("x"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("source").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cb", coalesce(sum("c").over(w), lit(0L)))
        .groupBy("source")
        .agg(sum("c").as("n"),
          sum(expr("x * c")).as("t"),
          sum(expr("x * (c * cb + c * (c + 1) div 2)")).as("srank"))
        .select(col("source"), col("n").as("n_docs"),
          col("t").as("sum_chars"),
          expr("(2 * srank - (n + 1) * t) * 1000000L div (n * t)")
            .as("gini_ppm"))
        .orderBy("source")
    },
    """WITH rk AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars)::BIGINT
      |      AS i
      |  FROM documents),
      |ag AS (
      |  SELECT source, count(*)::BIGINT AS n,
      |    sum(n_chars)::BIGINT AS t,
      |    sum(i * n_chars)::BIGINT AS srank
      |  FROM rk GROUP BY 1)
      |SELECT source, n AS n_docs, t AS sum_chars,
      |  ((2 * srank - (n + 1) * t) * 1000000 // (n * t))::BIGINT
      |    AS gini_ppm
      |FROM ag ORDER BY source""".stripMargin)

  /** Per-source unigram divergence (q195) — the distribution-level
    * source audit q178 runs on event categories, applied to TEXT: how
    * far each source's word distribution sits from the corpus-wide
    * one, as total-variation distance in integer ppm (`Σ|p_s − p|
    * div 2`, per-word rates in ppm — TV needs no logs, so unlike KL
    * it stays in exact int64; the metric a mixture designer uses to
    * spot an off-distribution source before it skews training).
    * Shape: one (source, word) count from the exploded token stream
    * (map-side combinable), a vocabulary-keyed join to the global
    * word rates, and a per-source rollup — the join is keyed on the
    * word, never a cross product, and the only state is
    * vocabulary-sized. Words absent from a source contribute that
    * word's full global rate; the UNION-side accounting makes both
    * engines see the identical term set.
    */
  val sourceDivergence: Q = Q(
    (s, d) => {
      val words = t(s, d, "documents")
        .select(col("source"),
          explode(TextFunctions.words(col("text"))).as("w"))
      val bySrc = words.groupBy("source", "w")
        .agg(count(lit(1)).as("c")).persist()
      val srcTot = bySrc.groupBy("source").agg(sum("c").as("st"))
      val glob = bySrc.groupBy("w").agg(sum("c").as("g"))
      val globTot = bySrc.agg(sum("c").as("gt"))
      // full outer on the word key per source would explode; instead
      // compute Σ|p_s − p| over the source's OWN words, then add the
      // mass of words the source never uses: Σ_{w∉S} p(w) =
      // 1 − Σ_{w∈S} p(w) — one subtraction instead of a vocab×source
      // cross join.
      val joined = bySrc.join(srcTot, Seq("source"))
        .join(glob, Seq("w")).crossJoin(broadcast(globTot))
        .withColumn("ps_ppm", expr("c * 1000000L div st"))
        .withColumn("p_ppm", expr("g * 1000000L div gt"))
      joined.groupBy("source")
        .agg(count(lit(1)).as("vocab_used"),
          sum(abs(col("ps_ppm") - col("p_ppm"))).as("overlap_dev"),
          sum("p_ppm").as("covered_ppm"))
        .select(col("source"), col("vocab_used"),
          expr("(overlap_dev + (1000000L - covered_ppm)) div 2")
            .as("tv_ppm"))
        .orderBy("source")
    },
    s"""WITH words AS (
       |  SELECT source, unnest(${TextFunctions.wordsSql("text")}) AS w
       |  FROM documents),
       |bs AS (SELECT source, w, count(*)::BIGINT AS c
       |       FROM words GROUP BY 1, 2),
       |st AS (SELECT source, sum(c)::BIGINT AS st FROM bs GROUP BY 1),
       |g AS (SELECT w, sum(c)::BIGINT AS g FROM bs GROUP BY 1),
       |gt AS (SELECT sum(c)::BIGINT AS gt FROM bs),
       |j AS (
       |  SELECT bs.source,
       |    bs.c * 1000000 // st.st AS ps_ppm,
       |    g.g * 1000000 // gt.gt AS p_ppm
       |  FROM bs JOIN st USING (source) JOIN g USING (w), gt)
       |SELECT source, count(*)::BIGINT AS vocab_used,
       |  ((sum(abs(ps_ppm - p_ppm)) + (1000000 - sum(p_ppm))) // 2)::BIGINT
       |    AS tv_ppm
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)

  /** Held-out centroid-classifier agreement, Cohen's kappa (q175) —
    * the labeled-data quality gate q117's unsupervised cluster audit
    * doesn't cover: train-half label centroids (q89's exact integer
    * micro-unit means), nearest-centroid assignment of the held-out
    * half, and chance-corrected agreement between true and assigned
    * labels as scaled-integer kappa — `(N·D − E)·10⁶ // (N² − E)`
    * with D the diagonal and E the Σ row·col expectation, all BIGINT
    * (a worse-than-chance classifier goes negative — measured here,
    * both engines truncate toward zero). The argmin is deterministic on
    * both engines by packing `(dist, label)` into one integer key
    * (`dist·1024 + label`, exact: 64·(10⁶)²·1024 < 2⁶³). Shapes:
    * component explode + (label, dim) centroid groupBy
    * (label-bounded state), test×centroid join keyed on dim with
    * label-count-bounded fanout, then class-cardinality-sized
    * confusion algebra — nothing scales with corpus² at any stage.
    */
  val centroidKappa: Q = {
    val PACK = 1024L
    Q(
      (s, d) => {
        val ex = t(s, d, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("label"),
            posexplode(VectorFunctions.scaledMicro(col("embedding"))))
          .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
        val cent = ex.filter(col("vec_id") % 2 === 0)
          .groupBy(col("label").as("clabel"), col("dim"))
          .agg(expr("sum(x) div count(1)").as("c"))
        val pred = ex.filter(col("vec_id") % 2 === 1)
          .join(cent, Seq("dim"))
          .groupBy("vec_id", "label", "clabel")
          .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
          .groupBy("vec_id", "label")
          .agg(min(col("dist") * PACK + col("clabel")).as("mk"))
          .select(col("label"), (col("mk") % PACK).as("pred"))
        val conf = pred.groupBy("label", "pred")
          .agg(count(lit(1)).as("n")).persist()
        val tot = conf.agg(sum("n").as("n_test"),
          sum(when(col("label") === col("pred"), col("n")).otherwise(0L))
            .as("n_agree"),
          countDistinct("label").as("n_labels"))
        val e = conf.groupBy("label").agg(sum("n").as("rn"))
          .join(conf.groupBy(col("pred").as("label"))
            .agg(sum("n").as("cn")), Seq("label"))
          .agg(coalesce(sum(col("rn") * col("cn")), lit(0L)).as("e"))
        tot.crossJoin(broadcast(e))
          .select(col("n_labels"), col("n_test"), col("n_agree"),
            expr("(n_test * n_agree - e) * 1000000L div (n_test * n_test - e)")
              .as("kappa_ppm"))
      },
      s"""WITH ex AS (
         |  SELECT vec_id, label::BIGINT AS label,
         |    generate_subscripts(embedding, 1) - 1 AS dim,
         |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
         |  FROM embeddings),
         |cent AS (
         |  SELECT label AS clabel, dim,
         |    (CASE WHEN sum(x) >= 0 THEN sum(x)::BIGINT // count(*)
         |          ELSE -((-(sum(x)::BIGINT)) // count(*)) END)::BIGINT AS c
         |  FROM ex WHERE vec_id % 2 = 0 GROUP BY 1, 2),
         |dist AS (
         |  SELECT t.vec_id, t.label, cent.clabel,
         |    sum((t.x - cent.c) * (t.x - cent.c))::BIGINT AS dist
         |  FROM ex t JOIN cent ON t.dim = cent.dim
         |  WHERE t.vec_id % 2 = 1 GROUP BY 1, 2, 3),
         |pr AS (
         |  SELECT label, min(dist * $PACK + clabel) % $PACK AS pred
         |  FROM dist GROUP BY vec_id, label),
         |conf AS (
         |  SELECT label, pred, count(*)::BIGINT AS n FROM pr GROUP BY 1, 2),
         |tot AS (
         |  SELECT sum(n)::BIGINT AS n_test,
         |    sum(CASE WHEN label = pred THEN n ELSE 0 END)::BIGINT AS n_agree,
         |    count(DISTINCT label)::BIGINT AS n_labels
         |  FROM conf),
         |ee AS (
         |  SELECT coalesce(sum(rn * cn), 0)::BIGINT AS e FROM
         |    (SELECT label, sum(n)::BIGINT AS rn FROM conf GROUP BY 1) r
         |    JOIN (SELECT pred AS label, sum(n)::BIGINT AS cn
         |          FROM conf GROUP BY 1) c USING (label))
         |SELECT n_labels, n_test, n_agree,
         |  ((n_test * n_agree - e) * 1000000 // (n_test * n_test - e))::BIGINT
         |    AS kappa_ppm
         |FROM tot, ee""".stripMargin)
  }

  /** Global ordinal assignment without a global sort (q179) — the
    * shard/packing prerequisite (q62/q130 consume stable orderings):
    * every document gets a contiguous global ordinal under
    * (source, doc_id) order, but the naive `row_number() OVER (ORDER
    * BY ...)` is a single-partition sort — the canonical scale
    * anti-pattern. The distributed form: per-source ranks (windows
    * partitioned by source — source is the parallelism unit), a
    * 20-row per-source count table whose prefix-sum window is
    * taxonomy-bounded, and one broadcast-sized offset join;
    * `ordinal = offset + rank`. The oracle IS the naive global
    * row_number — equality proves the decomposition. Readout is
    * per-source boundary evidence plus an ordinal·id checksum: the
    * boundaries certify contiguity (last − first + 1 = n, consecutive
    * sources abut), the checksum pins every individual assignment.
    */
  val globalOrdinals: Q = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
      val rn = docs.withColumn("rank",
        row_number().over(Window.partitionBy("source").orderBy("doc_id")))
      val off = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
        .withColumn("offset",
          coalesce(sum("cnt").over(Window.orderBy("source")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      rn.join(broadcast(off.select("source", "offset")), Seq("source"))
        .select(col("source"), col("doc_id"),
          (col("offset") + col("rank")).as("ordinal"))
        .groupBy("source")
        .agg(min("ordinal").as("first_ord"), max("ordinal").as("last_ord"),
          count(lit(1)).as("n_docs"),
          sum(col("ordinal") * col("doc_id")).as("chk"))
        .orderBy("source")
    },
    """WITH o AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (ORDER BY source, doc_id) AS ordinal
      |  FROM documents)
      |SELECT source, min(ordinal)::BIGINT AS first_ord,
      |  max(ordinal)::BIGINT AS last_ord, count(*)::BIGINT AS n_docs,
      |  sum(ordinal * doc_id)::BIGINT AS chk
      |FROM o GROUP BY source ORDER BY source""".stripMargin)

  /** Judged batch twin of the streaming dedup (q170) — the
    * [[graft.streaming.DedupStream]] algebra replayed as a
    * deterministic batch sequence so the driver's DuckDB oracle
    * guards it too (it was spec-only through r7): the duplicated
    * corpus (q22's injection — every copy lands in a different
    * micro-batch than its original, since 10⁶ % 3 ≠ 0) is split into
    * three batches by id, processed in order with an at-least-once
    * REPLAY of batch 1 (must be absorbed) and a COMPACTION + VACUUM
    * between batches 1 and 2 — so batch 2 can only meet batches 0/1
    * through the compacted [[DedupIndex]] generation, while batch 1
    * met batch 0 through the sig-dir tail. The emitted candidate set
    * must equal the flat SQL algebra (pairs sharing a band key with
    * strictly-later batch id on the probe side) — proving candidate-
    * set equality across the compaction boundary, replays included.
    * State roots are fingerprint-keyed ([[graft.sources.Artifacts
    * .versionedRoot]]): a rerun against unchanged data absorbs every
    * batch as a replay and re-reads the committed matches.
    */
  val streamBatchTwin: Q = {
    val NB = 3L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, b, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val corpus = docs.unionByName(
            docs.select((col("doc_id") + 1000000L).as("doc_id"),
              col("text")))
          .withColumn("b", col("doc_id") % NB)
        def batch(i: Long) =
          corpus.filter(col("b") === i).select("doc_id", "text")
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-dedup-stream", d, Seq("documents.parquet"))
        val ds = new graft.streaming.DedupStream(s, root, "doc_id", "text",
          MH_K, MH_BANDS, MH_R)
        ds.processBatch(batch(0), 0)
        ds.processBatch(batch(1), 1)
        ds.processBatch(batch(1), 1) // at-least-once redelivery: absorbed
        ds.compactIndex() // fold 0,1 into the bucketed index generation
        ds.vacuumFolded() // batch 2 must probe THROUGH the compaction
        ds.processBatch(batch(2), 2)
        ds.matches().orderBy("new_id", "index_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id, text, doc_id % $NB AS b FROM docs
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, (doc_id + 1000000) % $NB FROM docs),
         |w AS (SELECT doc_id, b, ${TextFunctions.wordsSql("text")} AS arr
         |      FROM corpus),
         |sh AS (SELECT DISTINCT doc_id, b,
         |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
         |sig AS (
         |  SELECT doc_id, b,
         |    $sigCols
         |  FROM sh GROUP BY doc_id, b),
         |bands AS (
         |  $bandRowsSql)
         |SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |FROM bands a JOIN bands x
         |  ON a.band = x.band AND a.band_key = x.band_key
         |WHERE a.b > x.b
         |ORDER BY new_id, index_id""".stripMargin)
  }

  /** Streaming dedup across a PURGE boundary (q308) — the streaming ×
    * delete cell for the dedup family's CONTINUOUS form, closing the
    * one masking gap the family had: [[graft.streaming.DedupStream]]'s
    * probe reads the compacted generation (tombstone-masked by
    * [[DedupIndex.probeBanded]]) PLUS the uncompacted sig-dir tail —
    * and until this round the tail join did not mask, so a purged doc
    * whose batch had not yet been folded kept surfacing through every
    * probe. The judged chain exercises BOTH masking paths at once:
    * batch 0 folds into the compacted generation, batch 1 stays in
    * the tail, the purge tombstones every 10th doc (originals AND
    * their +10⁶ redelivered copies — copies of %10 docs share the
    * residue), batch 1 REDELIVERS (absorbed — its committed match dir
    * is the pre-purge audit record and must NOT be rewritten), and
    * batch 2 probes generation + tail with the purged docs invisible
    * through both. The final compaction folds tail + purge physically
    * and resets the log. Oracle: band-collision pairs with strictly-
    * later probe batch, where batch-1 pairs see the full pre-purge
    * index and batch-2 pairs exclude the purged docs.
    */
  val dedupPurgeStream: Q = {
    val NB = 3L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, b, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val corpus = docs.unionByName(
            docs.select((col("doc_id") + 1000000L).as("doc_id"),
              col("text")))
          .withColumn("b", col("doc_id") % NB)
        def batch(i: Long) =
          corpus.filter(col("b") === i).select("doc_id", "text")
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-dedup-pstream", d, Seq("documents.parquet"))
        val compactedRoot = s"$root/compacted"
        val ds = new graft.streaming.DedupStream(s, root, "doc_id", "text",
          MH_K, MH_BANDS, MH_R)
        ds.processBatch(batch(0), 0)
        ds.compactIndex() // batch 0 → the generation
        ds.vacuumFolded()
        ds.processBatch(batch(1), 1) // batch 1 stays in the TAIL
        // the purge: pending tombstones must mask generation AND tail
        // (batch 1 is not folded yet); +10⁶ copies share the residue
        if (VersionedDirs.versionsOf(compactedRoot).size < 2)
          DedupIndex.addTombstones(s,
            corpus.filter(col("b") < 2 && col("doc_id") % 10 === 0)
              .select(col("doc_id")), "doc_id", compactedRoot)
        ds.processBatch(batch(1), 1) // redelivery: absorbed, the
                                     // committed pre-purge audit record
        ds.processBatch(batch(2), 2) // probes the purged world
        // fold tail + purge physically; the log resets
        ds.compactIndex()
        ds.vacuumFolded()
        ds.matches().orderBy("new_id", "index_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id, text, doc_id % $NB AS b FROM docs
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, (doc_id + 1000000) % $NB FROM docs),
         |w AS (SELECT doc_id, b, ${TextFunctions.wordsSql("text")} AS arr
         |      FROM corpus),
         |sh AS (SELECT DISTINCT doc_id, b,
         |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
         |sig AS (
         |  SELECT doc_id, b,
         |    $sigCols
         |  FROM sh GROUP BY doc_id, b),
         |bands AS (
         |  $bandRowsSql)
         |SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |FROM bands a JOIN bands x
         |  ON a.band = x.band AND a.band_key = x.band_key
         |WHERE a.b > x.b AND (a.b = 1 OR x.doc_id % 10 <> 0)
         |ORDER BY new_id, index_id""".stripMargin)
  }

  /** Small-file compaction plan + report (q169) — the write half of
    * the q129 balance audit ([[graft.operators.Compaction]]): the 64
    * hash shards of the documents corpus (q129's layout) are re-binned
    * into target-sized output shards by the deterministic sorted-fill
    * rule, and the judged report shows, per output bin, how many input
    * shards and docs merged and the bin's fill against the target —
    * the before/after a compaction job logs. The plan window runs over
    * the 64 stats rows (layout-constant state); the physical rewrite
    * (one exchange, one file per bin) is exercised by CompactionSpec,
    * file counts and all — a filesystem effect no SQL oracle can see.
    */
  val compactionPlan: Q = {
    val S = 64; val TARGET = 16000L
    Q(
      (s, d) => {
        val stats = t(s, d, "documents")
          .select(
            (Hashing.h32(col("doc_id").cast("string")) % S).as("shard"),
            col("n_chars"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
        Compaction.plan(stats, "shard", "bytes", TARGET)
          .groupBy("out_shard")
          .agg(count(lit(1)).as("n_inputs"), sum("n_docs").as("n_docs"),
            sum("bytes").as("bytes"), min("shard").as("first_shard"))
          .withColumn("fill_th", expr(s"bytes * 1000 div $TARGET"))
          .orderBy("out_shard")
      },
      s"""WITH sh AS (
         |  SELECT (${Hashing.h32Sql("doc_id::VARCHAR")}) % $S AS shard,
         |    n_chars
         |  FROM documents),
         |agg AS (
         |  SELECT shard, count(*)::BIGINT AS n_docs,
         |    sum(n_chars)::BIGINT AS bytes
         |  FROM sh GROUP BY shard),
         |pl AS (
         |  SELECT shard, n_docs, bytes,
         |    ${Compaction.planSql("shard", "bytes", TARGET)} AS out_shard
         |  FROM agg)
         |SELECT out_shard, count(*)::BIGINT AS n_inputs,
         |  sum(n_docs)::BIGINT AS n_docs, sum(bytes)::BIGINT AS bytes,
         |  min(shard)::BIGINT AS first_shard,
         |  (sum(bytes) * 1000 // $TARGET)::BIGINT AS fill_th
         |FROM pl GROUP BY out_shard ORDER BY out_shard""".stripMargin)
  }

  /** Avro roundtrip (q168) — the row-format member of the source
    * matrix (q164 JSONL, q165 ORC), through the same
    * [[graft.sources.Artifacts.publishOnce]] discipline: documents are
    * published once as Avro container files (schema-first — the write
    * itself enforces types, the strict-parse rule of
    * buzzdb_lab1.cpp:144-154 moved to write time) and read back under
    * an explicit schema via [[graft.sources.AvroTable]] (this
    * container ships Avro core but not the spark-avro connector, so
    * the codec lives at the engine's own source seam — distributed
    * per-partition write, file-parallel read, no driver funnel). The
    * judged aggregate must reproduce the parquet truth exactly,
    * including a content hash sum over `text` — proving every column
    * (strings with embedded quotes/newlines included) survives the
    * binary roundtrip bit-for-bit. Being a row format there is no
    * pushdown to audit (q165 covers that for columnar); projection
    * happens post-decode by construction.
    */
  val avroSource: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val schema = docs.schema
      val root = graft.sources.Artifacts.publishOnce(
        "graft-avro", d, Seq("documents.parquet")) { stage =>
        graft.sources.AvroTable.write(docs.repartition(4), stage)
      }
      graft.sources.AvroTable.read(s, root, schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"),
          countDistinct("source").as("n_srcs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"),
          sum(Hashing.h32(col("text"))).as("text_hash_sum"))
        .orderBy("lang")
    },
    s"""SELECT lang, count(*)::BIGINT AS n_docs,
       |  sum(n_chars)::BIGINT AS chars,
       |  count(DISTINCT source)::BIGINT AS n_srcs,
       |  min(doc_id) AS min_id, max(doc_id) AS max_id,
       |  sum(${Hashing.h32Sql("text")})::BIGINT AS text_hash_sum
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)

  /** Cross-modal alignment curation (q167) — the LAION-style judged
    * pair filter that turns the multimodal primitives into a curation
    * decision: every media item (the opaque-binary table of
    * [[Multimodal.mediaTable]]) is scored against its caption
    * document's embedding, and a per-source keep/drop report says
    * which sources survive an alignment threshold. The media-side
    * embedding comes out of the decode seam deterministically — the
    * [[Multimodal.sampleFrames]] frames are hashed twice
    * ([[Hashing.seeded]]) and each of the 64 hash bits contributes a
    * ±1 sign feature, summed over the frames (where a real pipeline
    * would emit CLIP image features, it would swap exactly this step;
    * everything downstream — the join, the cosine, the report — is
    * the production shape). The text side rides the exact micro-int
    * space ([[VectorFunctions.scaledMicro]], the q89 discipline), so
    * dot products and norms are integer-exact on both engines and
    * only the final rounded cosine is floating point.
    *
    * Scale: frames → features is O(docs · 64) exploded rows into one
    * (doc, dim) groupBy; the alignment itself is an equi-join on
    * (doc, dim) + a per-doc sum — embedding-linear, no pair
    * explosion, no media×media pass, no collect. The embedding
    * dimension is a layout constant shared with the oracle (the
    * testdata ships dim=64; [[graft.sources.TableStats]] would derive
    * it at ingest).
    */
  val crossModalAlignment: Q = {
    val FRAME = 32; val STRIDE = 64; val MAXF = 4
    val DIM = 64; val TAU = 0.05
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val media = Multimodal.mediaTable(docs, "doc_id", "text")
        val fh = Multimodal
          .sampleFrames(media, "doc_id", FRAME, STRIDE, MAXF)
          .select(col("doc_id"),
            Hashing.seeded(101, col("frame")).as("h0"),
            Hashing.seeded(202, col("frame")).as("h1"))
        // 64 ±1 sign features per frame, summed per (doc, dim) — the
        // stub "image embedding" at the decode seam
        val iv = fh
          .select(col("doc_id"), col("h0"), col("h1"),
            explode(sequence(lit(0), lit(DIM - 1))).as("dim"))
          .select(col("doc_id"), col("dim"),
            expr("(CASE WHEN dim < 32 THEN shiftright(h0, dim) " +
              "ELSE shiftright(h1, dim - 32) END) & 1").as("bit"))
          .groupBy("doc_id", "dim")
          .agg(sum(when(col("bit") === 1, 1L).otherwise(-1L)).as("v"))
        val te = t(s, d, "embeddings")
          .select(col("vec_id").as("doc_id"),
            posexplode(VectorFunctions.scaledMicro(col("embedding"))))
          .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
        val dots = te.join(iv, Seq("doc_id", "dim"))
          .groupBy("doc_id").agg(sum(col("x") * col("v")).as("dot"))
        val na = te.groupBy("doc_id").agg(sum(col("x") * col("x")).as("na"))
        val nb = iv.groupBy("doc_id").agg(sum(col("v") * col("v")).as("nb"))
        val cs = dots.join(na, Seq("doc_id")).join(nb, Seq("doc_id"))
          .select(col("doc_id"),
            round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6)
              .as("a"))
        cs.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("a") >= TAU, 1L).otherwise(0L)).as("n_keep"),
            sum(when(col("a") < TAU, 1L).otherwise(0L)).as("n_drop"),
            sum(round(col("a") * 1000000).cast("long"))
              .as("sum_align_micro"),
            max(col("a")).as("max_align"))
          .orderBy("source")
      },
      s"""WITH m AS (SELECT doc_id, text, source FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    unnest(range(0, least(${MAXF - 1},
         |      greatest(octet_length(encode(text)) - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM m),
         |fr AS (
         |  SELECT f.doc_id, substr(m.text, (f.f * $STRIDE + 1)::INT, $FRAME) AS frame
         |  FROM f JOIN m ON f.doc_id = m.doc_id),
         |fh AS (
         |  SELECT doc_id, ${Hashing.seededSql(101, "frame")} AS h0,
         |    ${Hashing.seededSql(202, "frame")} AS h1
         |  FROM fr),
         |iv AS (
         |  SELECT doc_id, dim,
         |    sum(CASE WHEN ((CASE WHEN dim < 32 THEN h0 >> dim
         |                         ELSE h1 >> (dim - 32) END) & 1) = 1
         |        THEN 1 ELSE -1 END)::BIGINT AS v
         |  FROM fh CROSS JOIN (SELECT unnest(range(0, $DIM)) AS dim) dims
         |  GROUP BY 1, 2),
         |te AS (
         |  SELECT vec_id AS doc_id, generate_subscripts(embedding, 1) - 1 AS dim,
         |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
         |  FROM embeddings),
         |dots AS (
         |  SELECT te.doc_id, sum(te.x * iv.v)::BIGINT AS dot
         |  FROM te JOIN iv ON te.doc_id = iv.doc_id AND te.dim = iv.dim
         |  GROUP BY 1),
         |na AS (SELECT doc_id, sum(x * x)::BIGINT AS na FROM te GROUP BY 1),
         |nb AS (SELECT doc_id, sum(v * v)::BIGINT AS nb FROM iv GROUP BY 1),
         |cs AS (
         |  SELECT d.doc_id, round(d.dot / (sqrt(na.na) * sqrt(nb.nb)), 6) AS a
         |  FROM dots d JOIN na ON d.doc_id = na.doc_id
         |  JOIN nb ON d.doc_id = nb.doc_id)
         |SELECT m.source, count(*)::BIGINT AS n_pairs,
         |  sum(CASE WHEN a >= $TAU THEN 1 ELSE 0 END)::BIGINT AS n_keep,
         |  sum(CASE WHEN a < $TAU THEN 1 ELSE 0 END)::BIGINT AS n_drop,
         |  sum(round(a * 1000000)::BIGINT)::BIGINT AS sum_align_micro,
         |  max(a) AS max_align
         |FROM cs JOIN m ON cs.doc_id = m.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Count-min heavy hitters ([[graft.operators.CountMin]]): build
    * the d×w sketch over every corpus token (one bounded groupBy —
    * the sketch is ≤ d·w rows at ANY corpus size), then read the
    * true top-25 terms' estimates back out of it next to their exact
    * counts — the never-undercount ε-overcount contract, judged
    * value-exactly: the affine hash family is engine-identical, so
    * every cell and every min-estimate matches the oracle
    * bit-for-bit. The at-100TB story is the build: map-side partial
    * counts into d·w cells, mergeable across partitions/days by
    * summing — the hot-key detector that tells [[graft.operators
    * .Salting]] which keys need salt without a full key-domain
    * groupBy.
    */
  val cmsHeavy: Q = {
    val D = 4; val W = 1024; val K = 25
    Q(
      (s, d) => {
        val wds = t(s, d, "documents")
          .select(explode(TextFunctions.words(col("text"))).as("term"))
          .filter(length(col("term")) > 0)
        val sketch = CountMin.build(wds, "term", D, W)
        val top = wds.groupBy("term").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("term")).limit(K)
        top.join(CountMin.estimate(sketch, top.select("term"), "term", D, W),
            Seq("term"))
          .select(col("term"), col("n"), col("cms_est"))
          .orderBy(desc("n"), asc("term"))
      },
      s"""WITH wds AS (
         |  SELECT unnest(${TextFunctions.wordsSql("text")}) AS term
         |  FROM documents),
         |wf AS (SELECT term FROM wds WHERE length(term) > 0),
         |params(r, a, b) AS (VALUES ${CountMin.paramsSqlValues(D)}),
         |sketch AS (
         |  SELECT r, ${CountMin.cellOfSql("term", "a", "b", W)} AS cell,
         |    count(*)::BIGINT AS cnt
         |  FROM wf, params GROUP BY 1, 2),
         |top AS (
         |  SELECT term, count(*)::BIGINT AS n FROM wf GROUP BY term
         |  ORDER BY n DESC, term LIMIT $K),
         |est AS (
         |  SELECT t.term, min(coalesce(s.cnt, 0))::BIGINT AS cms_est
         |  FROM top t CROSS JOIN params p
         |  LEFT JOIN sketch s ON s.r = p.r
         |    AND s.cell = ${CountMin.cellOfSql("t.term", "p.a", "p.b", W)}
         |  GROUP BY t.term)
         |SELECT t.term, t.n, e.cms_est FROM top t JOIN est e USING (term)
         |ORDER BY t.n DESC, t.term""".stripMargin)
  }

  /** BPE tokenizer training ([[graft.operators.Bpe.trainMerges]]):
    * learn the first N subword merges over the corpus vocabulary —
    * the vocabulary-learning stage q55's raw vocab feeds. The oracle
    * unrolls the IDENTICAL N rounds in SQL: per round, adjacent-pair
    * counts via a lead window over the long-form (word, pos, sym)
    * state, the same (cnt DESC, lhs, rhs) top-pair rule, and greedy
    * left-to-right merging replayed as run-parity window selection
    * (Spark's merge fold and the parity rule are the same greedy
    * scan — see the operator doc). Integer counts + single-byte text
    * ⇒ every round's pick is bit-identical on both engines. The
    * multiply-referenced round CTEs are MATERIALIZED: DuckDB inlines
    * CTEs by default, and each round referencing its predecessor
    * twice would expand the plan exponentially in the round count.
    */
  /** Feature-hashed document vectors (q78) — the hashing-trick
    * text→vector bridge (Weinberger et al. '09): dimension
    * j = h₀(term) mod D, signed ±1 by an independent h₁ parity, value
    * = signed term frequency. No vocabulary table, no fit — the
    * stateless embedding that feeds the ANN/dedup vector family when
    * no trained model is at hand (the signed sum keeps collision bias
    * zero-mean). One explode + one (doc, dim) groupBy, all integer
    * ([[Hashing.seeded]] family), so every component hash-matches.
    * Dimensions with no hashed term are absent (sparse long form).
    */
  val featureHash: Q = {
    val D = 16
    Q(
      (s, d) => {
        val wds = t(s, d, "documents")
          .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("term"))
          .filter(length(col("term")) > 0)
        wds.select(col("doc_id"),
            (Hashing.seeded(0, col("term")) % D).as("dim"),
            (lit(1L) - lit(2L) * (Hashing.seeded(1, col("term")) % 2)).as("sgn"))
          .groupBy("doc_id", "dim").agg(sum("sgn").as("val"))
          .orderBy("doc_id", "dim")
      },
      s"""WITH wds AS (
         |  SELECT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS term
         |  FROM documents),
         |wf AS (SELECT doc_id, term FROM wds WHERE length(term) > 0)
         |SELECT doc_id, (${Hashing.seededSql(0, "term")}) % $D AS dim,
         |  sum(1 - 2 * ((${Hashing.seededSql(1, "term")}) % 2))::BIGINT AS val
         |FROM wf GROUP BY 1, 2 ORDER BY doc_id, dim""".stripMargin)
  }

  /** Temperature-flattened source mixing (q77) — the data-mixing
    * stage of a training pipeline: downsample each source toward
    * balance with keep probability √(n_min/n_s) (α = 0.5 temperature;
    * expected kept ∝ √(n_s·n_min), flattening the source distribution
    * without discarding the small sources' signal). Membership is the
    * content-independent h32(doc_id) rule of q43 — reproducible on
    * any engine, any partitioning — and the per-source threshold is
    * derived in-plan from a broadcast 1-row min (never collected).
    * Engine parity: n_min/n_s (one IEEE division), sqrt (correctly
    * rounded by IEEE-754), ×10⁶ and half-up round are each
    * bit-identical ops on both engines, and there is NO cross-source
    * float summation anywhere (a Σ√n normalizer would be
    * order-dependent — the reason the rule is a pairwise ratio).
    * Output: per source, total docs, scaled threshold, kept count.
    */
  val mixSample: Q = {
    val SCALE = 1000000L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        val nmin = counts.agg(min("n_docs").as("n_min"))
        val thr = counts.crossJoin(broadcast(nmin))
          .select(col("source"), col("n_docs"),
            round(sqrt(col("n_min").cast("double") / col("n_docs").cast("double"))
              * SCALE).cast("long").as("thr"))
        val kept = docs.join(broadcast(thr), Seq("source"))
          .filter(Hashing.h32(col("doc_id").cast("string")) % SCALE < col("thr"))
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
        thr.join(kept, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("thr"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy("source")
      },
      s"""WITH counts AS (
         |  SELECT source, count(*)::BIGINT AS n_docs FROM documents
         |  GROUP BY source),
         |nmin AS (SELECT min(n_docs) AS n_min FROM counts),
         |thr AS (
         |  SELECT source, n_docs,
         |    round(sqrt(n_min::DOUBLE / n_docs::DOUBLE) * $SCALE)::BIGINT AS thr
         |  FROM counts, nmin),
         |kept AS (
         |  SELECT d.source, count(*)::BIGINT AS n_kept
         |  FROM documents d JOIN thr USING (source)
         |  WHERE (${Hashing.h32Sql("doc_id::VARCHAR")}) % $SCALE < thr
         |  GROUP BY d.source)
         |SELECT t.source, t.n_docs, t.thr, coalesce(k.n_kept, 0)::BIGINT AS n_kept
         |FROM thr t LEFT JOIN kept k USING (source)
         |ORDER BY t.source""".stripMargin)
  }

  // shared by q72 (merge log) and q76 (segmentation apply): one
  // definition of the round count and the oracle's round-replay CTEs
  private val BPE_ROUNDS = 8

  private object BpeOracle {
    /** `tp` prefixes every train-chain CTE name, so TWO independently
      * trained worlds can coexist in one oracle (q340's pinned
      * re-train foil); "" keeps the original names for all existing
      * call sites.
      */
    def roundCte(i: Int, tp: String = ""): String =
      s"""${tp}p$i AS MATERIALIZED (
         |  SELECT word, freq, pos, sym AS a,
         |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b
         |  FROM ${tp}s${i - 1}),
         |${tp}c$i AS (
         |  SELECT a, b, sum(freq)::BIGINT AS cnt FROM ${tp}p$i
         |  WHERE b IS NOT NULL GROUP BY a, b),
         |${tp}b$i AS MATERIALIZED (SELECT a, b, cnt FROM ${tp}c$i ORDER BY cnt DESC, a, b LIMIT 1),
         |${tp}mm$i AS (
         |  SELECT p.word, p.pos,
         |    row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS rn
         |  FROM ${tp}p$i p JOIN ${tp}b$i t ON p.a = t.a AND p.b = t.b),
         |${tp}sel$i AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |      row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS k
         |    FROM ${tp}mm$i)
         |  WHERE k % 2 = 1),
         |${tp}s$i AS MATERIALIZED (
         |  SELECT word, freq,
         |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
         |  FROM (
         |    SELECT s.word, s.freq, s.pos,
         |      CASE WHEN m1.pos IS NOT NULL THEN t.a || t.b ELSE s.sym END AS sym
         |    FROM ${tp}s${i - 1} s
         |    CROSS JOIN ${tp}b$i t
         |    LEFT JOIN ${tp}sel$i m1 ON s.word = m1.word AND s.pos = m1.pos
         |    LEFT JOIN ${tp}sel$i m2 ON s.word = m2.word AND s.pos = m2.pos + 1
         |    WHERE m2.pos IS NULL))""".stripMargin

    /** WITH-body through the final round state `s$BPE_ROUNDS`, with an
      * optional document filter (e.g. a train split) on the vocab
      * source.
      */
    def chainFor(where: String): String = chainForText(where, "text")

    /** [[chainFor]] with an arbitrary text expression (e.g.
      * `reverse(text)` — q294's re-crawled drift world) and an
      * optional train-chain CTE prefix (see [[roundCte]]).
      */
    def chainForText(where: String, textExpr: String,
                     tp: String = ""): String =
      s"""${tp}w AS (
         |  SELECT word, count(*)::BIGINT AS freq FROM (
         |    SELECT unnest(${TextFunctions.wordsSql(textExpr)}) AS word
         |    FROM documents $where)
         |  WHERE length(word) > 0 GROUP BY word),
         |${tp}s0p AS (
         |  SELECT word, freq, unnest(range(1, length(word) + 1)) AS pos FROM ${tp}w),
         |${tp}s0 AS MATERIALIZED (SELECT word, freq, pos, substr(word, pos::INT, 1) AS sym FROM ${tp}s0p),
         |${(1 to BPE_ROUNDS).map(roundCte(_, tp)).mkString(",\n")}""".stripMargin

    val chain: String = chainFor("")

    /** APPLY the chain's learned pairs (its b1..bR CTEs) to a
      * separate word set — the frozen-tokenizer replay (q293/q294):
      * same run-parity merge machinery as [[roundCte]], but the
      * per-round pair comes from the TRAIN chain instead of being
      * re-derived, so any word — seen or unseen at train time —
      * segments exactly as [[graft.operators.BpeIndex.applyMerges]]'
      * greedy fold does. `src` must provide CTE `$pfx0` =
      * (word, pos, sym) char rows; produces `$pfx$BPE_ROUNDS`.
      */
    def applyCte(i: Int, pfx: String, tp: String = ""): String =
      s"""${pfx}p$i AS MATERIALIZED (
         |  SELECT word, pos, sym AS a,
         |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b
         |  FROM $pfx${i - 1}),
         |${pfx}m$i AS (
         |  SELECT p.word, p.pos,
         |    row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS rn
         |  FROM ${pfx}p$i p JOIN ${tp}b$i t ON p.a = t.a AND p.b = t.b),
         |${pfx}sel$i AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |      row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS k
         |    FROM ${pfx}m$i)
         |  WHERE k % 2 = 1),
         |$pfx$i AS MATERIALIZED (
         |  SELECT word,
         |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
         |  FROM (
         |    SELECT s.word, s.pos,
         |      CASE WHEN m1.pos IS NOT NULL THEN t.a || t.b ELSE s.sym END AS sym
         |    FROM $pfx${i - 1} s
         |    CROSS JOIN ${tp}b$i t
         |    LEFT JOIN ${pfx}sel$i m1 ON s.word = m1.word AND s.pos = m1.pos
         |    LEFT JOIN ${pfx}sel$i m2 ON s.word = m2.word AND s.pos = m2.pos + 1
         |    WHERE m2.pos IS NULL))""".stripMargin

    /** Char-row seed + all apply rounds for a distinct word set CTE
      * `wordsCte` (one column `word`) — yields `$pfx$BPE_ROUNDS` and
      * `${pfx}n` = (word, n_sub). `tp` names which train chain's
      * learned pairs to apply (see [[roundCte]]).
      */
    def applyChain(wordsCte: String, pfx: String,
                   tp: String = ""): String =
      s"""${pfx}0p AS (
         |  SELECT word, unnest(range(1, length(word) + 1)) AS pos
         |  FROM $wordsCte),
         |${pfx}0 AS MATERIALIZED (
         |  SELECT word, pos, substr(word, pos::INT, 1) AS sym FROM ${pfx}0p),
         |${(1 to BPE_ROUNDS).map(applyCte(_, pfx, tp)).mkString(",\n")},
         |${pfx}n AS (
         |  SELECT word, count(*)::BIGINT AS n_sub FROM $pfx$BPE_ROUNDS
         |  GROUP BY word)""".stripMargin
  }

  /** Corpus vocab (word, freq) — the shared q72/q76 pre-tokenization,
    * optionally restricted to a document split.
    */
  private def bpeVocab(s: org.apache.spark.sql.SparkSession, d: String,
                       docFilter: org.apache.spark.sql.Column = lit(true)) =
    t(s, d, "documents").filter(docFilter)
      .select(explode(TextFunctions.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  val bpeMerges: Q = Q(
    (s, d) => Bpe.trainMerges(bpeVocab(s, d), BPE_ROUNDS),
    s"""WITH ${BpeOracle.chain}
       |SELECT * FROM (
       |${(1 to BPE_ROUNDS).map(i =>
            s"SELECT $i AS round, a AS lhs, b AS rhs, a||b AS merged, cnt FROM b$i")
            .mkString("\nUNION ALL ")}
       |) ORDER BY round""".stripMargin)

  /** BPE APPLY (q76): segment the corpus with the q72-learned merges
    * — the tokenize step of the trained tokenizer. The segmentation
    * is computed once per DISTINCT word (train's final round state is
    * exactly that table) and joined back to the corpus occurrences:
    * corpus-sized work only at the final join, everything iterative
    * stays vocab-sized. Reported per document: whitespace word count
    * and subword token count — the compression the learned merges buy
    * on the corpus they were trained on. The oracle reuses the q72
    * round-replay chain and counts rows of the final state per word.
    */
  val bpeTokenize: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
      val seg = Bpe.train(bpeVocab(s, d), BPE_ROUNDS)._2
        .select(col("word"), size(col("syms")).cast("long").as("n_sub"))
      docs.join(seg, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
        .orderBy("doc_id")
    },
    s"""WITH ${BpeOracle.chain},
       |segn AS (
       |  SELECT word, count(*)::BIGINT AS n_sub FROM s$BPE_ROUNDS
       |  GROUP BY word),
       |dw AS (
       |  SELECT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS word
       |  FROM documents),
       |dwf AS (SELECT doc_id, word FROM dw WHERE length(word) > 0)
       |SELECT d.doc_id, count(*)::BIGINT AS n_words,
       |  sum(s.n_sub)::BIGINT AS n_subwords
       |FROM dwf d JOIN segn s USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)

  /** Semantic dedup (the SemDeDup recipe: embed → cluster → pairwise
    * cosine within clusters → drop all but one of each semantic-dup
    * set). Reuses the q53 trained codebook — same constants, same
    * oracle CTEs — for the cluster assignment, which is what bounds
    * pairwise work to O(Σ cell²) where a corpus-wide pair join would
    * be O(N²); the fixed 8-cell codebook is this query's SHARED-MODEL
    * demonstration — q71 is the same pipeline with the corpus-derived
    * [[Similarity.cellsFor]] count, the form that holds at scale.
    * Duplicates are synthesized (+10⁶ ids, as in
    * q22/q42): an injected copy lands in its original's cell at
    * cosine 1.0, so every copy must drop; natural within-cell
    * near-dups above τ drop too. Output: surviving (vec_id, cell).
    */
  val semanticDedup: Q = {
    val TAU = 0.95
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(
          emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        val e = VectorQuantizer.scaled(emb, "vec_id", "embedding").persist()
        val cent = VectorQuantizer.fitCentroids(e, "vec_id", KM_C, KM_ITERS)
        val cells = VectorQuantizer.assignCells(
          VectorQuantizer.scaled(corpus, "vec_id", "embedding"), cent, "vec_id")
        Similarity.semanticKeep(corpus, "vec_id", "embedding", cells, TAU)
          .orderBy("vec_id")
      },
      s"""WITH ${kmeansCtes()},
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings),
         |ec AS (
         |  SELECT vec_id,
         |    unnest(range(1, len(embedding) + 1)) AS dim,
         |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs
         |  FROM corpus),
         |fa AS (
         |  SELECT ec.vec_id, c.cell,
         |    sum((ec.xs - c.cs) * (ec.xs - c.cs)) AS d2
         |  FROM ec JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY ec.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa) WHERE rnk = 1),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN v va ON va.vec_id = a.vec_id
         |  JOIN v vb ON vb.vec_id = b.vec_id
         |  WHERE round(${VectorFunctions.cosineSql("va.v", "vb.v")}, 6) >= $TAU)
         |SELECT ca.vec_id, ca.cell FROM ca
         |WHERE ca.vec_id NOT IN (SELECT vec_id FROM dropped)
         |ORDER BY ca.vec_id""".stripMargin)
  }

  /** Semantic dedup with the SCALE-DERIVED cluster count
    * ([[Similarity.cellsFor]]): the q66 pipeline with c = ⌈2·√n⌉
    * cells instead of the fixed shared codebook — 64 cells at this
    * gate's 1 000-vector corpus, 200 at sf0.1's 10 000, ~632 000 at
    * 10¹¹ vectors: in-cell pair work stays Σ(n/c)²·c = n^1.5/2, the
    * sub-quadratic regime web-scale SemDeDup runs (~10⁵ clusters),
    * where q66's fixed 8 cells would be O(n²/8) at any real corpus.
    * The cell count reaches the plan from `count()` on the Spark side
    * (parquet-footer metadata) and from a params CTE computing the
    * identical ⌈2·√n⌉ on the oracle side, so both engines derive the
    * same codebook size from the data alone. SimilaritySpec asserts
    * the quadratic fraction Σcell²/n² SHRINKS under 10× replication
    * with this knob — the property a fixed count lacks.
    */
  val semanticDedupScaled: Q = {
    val TAU = 0.95
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(
          emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        val n = corpusStats(s, d)._1 // sidecar-cached, not a per-build pass
        // fit runs on the originals; clamp cells to that corpus
        val c = Similarity.cellsFor(2L * n, n)
        val e = VectorQuantizer.scaled(emb, "vec_id", "embedding").persist()
        val cent = VectorQuantizer.fitCentroids(e, "vec_id", c, KM_ITERS)
        val cells = VectorQuantizer.assignCells(
          VectorQuantizer.scaled(corpus, "vec_id", "embedding"), cent, "vec_id")
        Similarity.semanticKeep(corpus, "vec_id", "embedding", cells, TAU)
          .orderBy("vec_id")
      },
      s"""WITH params AS (
         |  SELECT ${Similarity.cellsForSql("2 * count(*)", "count(*)")} AS c
         |  FROM embeddings),
         |${kmeansCtes("(SELECT c FROM params)")},
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings),
         |ec AS (
         |  SELECT vec_id,
         |    unnest(range(1, len(embedding) + 1)) AS dim,
         |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs
         |  FROM corpus),
         |fa AS (
         |  SELECT ec.vec_id, c.cell,
         |    sum((ec.xs - c.cs) * (ec.xs - c.cs)) AS d2
         |  FROM ec JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY ec.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa) WHERE rnk = 1),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN v va ON va.vec_id = a.vec_id
         |  JOIN v vb ON vb.vec_id = b.vec_id
         |  WHERE round(${VectorFunctions.cosineSql("va.v", "vb.v")}, 6) >= $TAU)
         |SELECT ca.vec_id, ca.cell FROM ca
         |WHERE ca.vec_id NOT IN (SELECT vec_id FROM dropped)
         |ORDER BY ca.vec_id""".stripMargin)
  }

  /** Zipf frequency-of-frequency histogram: how many vocabulary terms
    * occur exactly n times — the corpus-statistics curve behind
    * vocabulary sizing and Good-Turing smoothing. Two grouped counts
    * (term-keyed, then count-keyed); the second key space is tiny by
    * construction, and `n` is unique per output row so the total
    * order needs no tiebreaker.
    */
  val zipfHistogram: Q = Q(
    (s, d) => t(s, d, "documents")
      .select(explode(TextFunctions.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_terms"), min("w").as("first_term"))
      .orderBy(desc("n")),
    s"""WITH tok AS (
       |  SELECT unnest(${TextFunctions.wordsSql("text")}) AS w FROM documents),
       |tf AS (SELECT w, count(*)::BIGINT AS n FROM tok GROUP BY w)
       |SELECT n, count(*)::BIGINT AS n_terms, min(w) AS first_term
       |FROM tf GROUP BY n ORDER BY n DESC""".stripMargin)

  /** The whole preprocessing funnel COMPOSED — duplicate-injected
    * corpus → exact dedup (q22 rule) → source-quality filter (q56
    * rule) → benchmark decontamination (q50 rule) → context-length
    * chunking (q58 rule) — with per-stage survivor counts as the
    * judged artifact. This is the query a user actually ships: it
    * proves the operators compose in one plan (each stage's output
    * feeds the next; intermediate frames persisted once, counted
    * in-plan via unioned 1-row aggregates — no driver-side counts),
    * and that the composition matches the stage oracles chained as
    * CTEs. Shapes stay what each stage proved alone: one hash groupBy,
    * one broadcast semi-join, one shingle semi-join + per-doc agg, one
    * map-only arithmetic sum.
    */
  val pipelineE2e: Q = {
    val BENCH_MAX = 25L; val MIN_SHARED = 5; val T_SCALED = 500000L
    val CHUNK = 32
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
        val corpus = docs.unionByName(docs.select(
          (col("doc_id") + 1000000L).as("doc_id"), col("text"),
          col("source")))
        val keepIds = corpus
          .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val s1 = corpus.join(keepIds, Seq("doc_id"), "leftsemi").persist()
        val score =
          TextFunctions.qualityScore(TextFunctions.words(col("text")))
        val scored = s1.withColumn("qs", round(score * 1e6).cast("long"))
        val good = scored.groupBy("source")
          .agg((sum(col("qs")) / count(lit(1))).as("mean_q_scaled"))
          .filter(col("mean_q_scaled") >= T_SCALED.toDouble)
          .select("source")
        val s2 = s1.join(broadcast(good), Seq("source"), "leftsemi").persist()
        val sh = Dedup.shingleKeys(s2, "doc_id", "text", 3)
        val bench = sh.filter(col("doc_id") < BENCH_MAX)
          .select("s").distinct()
        val contaminated = sh.filter(col("doc_id") >= BENCH_MAX)
          .join(broadcast(bench), Seq("s"), "leftsemi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MIN_SHARED).select("doc_id")
        val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti").persist()
        def stageRow(stage: String, df: DataFrame) =
          df.agg(count(lit(1)).as("n"))
            .select(lit(stage).as("stage"), col("n"))
        val chunksRow = s3
          .select(size(TextFunctions.words(col("text"))).as("n_tok"))
          .agg(coalesce(sum(
            expr(s"greatest(n_tok - 1, 0) div $CHUNK + 1")), lit(0L))
            .as("n"))
          .select(lit("4_chunks").as("stage"), col("n"))
        stageRow("0_raw", corpus)
          .unionByName(stageRow("1_exact_dedup", s1))
          .unionByName(stageRow("2_source_quality", s2))
          .unionByName(stageRow("3_decontaminated", s3))
          .unionByName(chunksRow)
          .orderBy("stage")
      },
      s"""WITH docs AS (SELECT doc_id, text, source FROM documents),
         |corpus AS (SELECT * FROM docs
         |           UNION ALL SELECT doc_id + 1000000, text, source FROM docs),
         |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
         |s1 AS (SELECT * FROM corpus WHERE doc_id IN (SELECT doc_id FROM keep)),
         |w1 AS (SELECT doc_id, source,
         |         ${TextFunctions.wordsSql("text")} AS arr FROM s1),
         |sc AS (SELECT doc_id, source, arr,
         |    round((${TextFunctions.qualityScoreSql("arr")}) * 1000000)::BIGINT AS qs
         |  FROM w1),
         |good AS (SELECT source FROM sc GROUP BY source
         |         HAVING sum(qs) / count(*) >= $T_SCALED.0),
         |s2 AS (SELECT * FROM sc WHERE source IN (SELECT source FROM good)),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM s2),
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < $BENCH_MAX),
         |contaminated AS (
         |  SELECT doc_id FROM sh
         |  WHERE doc_id >= $BENCH_MAX AND s IN (SELECT s FROM bench)
         |  GROUP BY doc_id HAVING count(*) >= $MIN_SHARED),
         |s3 AS (SELECT * FROM s2
         |       WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
         |SELECT '0_raw' AS stage, count(*)::BIGINT AS n FROM corpus
         |UNION ALL SELECT '1_exact_dedup', count(*)::BIGINT FROM s1
         |UNION ALL SELECT '2_source_quality', count(*)::BIGINT FROM s2
         |UNION ALL SELECT '3_decontaminated', count(*)::BIGINT FROM s3
         |UNION ALL SELECT '4_chunks',
         |  coalesce(sum(greatest(len(arr) - 1, 0) // $CHUNK + 1), 0)::BIGINT
         |  FROM s3
         |ORDER BY stage""".stripMargin)
  }

  /** Tokenizer coverage on a HELD-OUT split — the evaluation stage
    * every trained tokenizer ships with. Train the q72 merges on the
    * even-id half of the corpus, then tokenize the odd-id half: a
    * held-out word seen in training segments by the learned table; an
    * unseen (OOV) word falls back to characters, exactly a real BPE's
    * byte-fallback. Per source: held-out word count, OOV count, and
    * total emitted tokens (the compression the tokenizer actually
    * achieves off-train). The synthetic corpus draws both splits from
    * one vocabulary, so genuinely-unseen words are INJECTED into the
    * held-out docs (`zzq<doc_id mod 7>` — the q22/q57 injection
    * pattern) to exercise the fallback on data, not just in the spec.
    * Shapes: the train rounds are vocab-sized (q72's discipline);
    * evaluation is one corpus explode + one left join against the
    * word-distinct segmentation.
    */
  val bpeCoverage: Q = Q(
    (s, d) => {
      val seg = Bpe.train(
        bpeVocab(s, d, col("doc_id") % 2 === 0), BPE_ROUNDS)._2
        .select(col("word"), size(col("syms")).cast("long").as("n_sub"))
      val held = t(s, d, "documents").filter(col("doc_id") % 2 === 1)
        .select(col("source"),
          explode(TextFunctions.words(concat(col("text"), lit(" zzq"),
            (col("doc_id") % 7).cast("string")))).as("word"))
        .filter(length(col("word")) > 0)
      held.join(seg, Seq("word"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          count(when(col("n_sub").isNull, 1)).as("n_oov"),
          sum(coalesce(col("n_sub"), length(col("word")).cast("long")))
            .as("n_tokens"))
        .orderBy("source")
    },
    s"""WITH ${BpeOracle.chainFor("WHERE doc_id % 2 = 0")},
       |segn AS (
       |  SELECT word, count(*)::BIGINT AS n_sub FROM s$BPE_ROUNDS
       |  GROUP BY word),
       |held AS (
       |  SELECT source, unnest(${TextFunctions.wordsSql(
                "text || ' zzq' || (doc_id % 7)::VARCHAR")}) AS word
       |  FROM documents WHERE doc_id % 2 = 1),
       |hf AS (SELECT source, word FROM held WHERE length(word) > 0)
       |SELECT source, count(*)::BIGINT AS n_words,
       |  count(CASE WHEN s.n_sub IS NULL THEN 1 END)::BIGINT AS n_oov,
       |  sum(coalesce(s.n_sub, length(h.word)))::BIGINT AS n_tokens
       |FROM hf h LEFT JOIN segn s USING (word)
       |GROUP BY source ORDER BY source""".stripMargin)

  /** Per-label embedding centroids + cross-label cosine matrix — the
    * corpus-cartography readout (which semantic clusters sit close)
    * and the vector form of a grouped aggregate: centroid components
    * are exact integer micro-unit truncated means (Spark `div`
    * truncates toward zero; the oracle emulates that with a sign-case
    * around DuckDB's flooring `//` — the established div-parity
    * guard), so both engines build the identical centroid table and
    * the final rounded cosines hash-match. Shapes: one explode +
    * (label, dim) groupBy — label-count-bounded state — then a
    * label×label join over a 640-row centroid table.
    */
  val labelCentroids: Q = Q(
    (s, d) => {
      val ex = t(s, d, "embeddings").select(col("label"),
          posexplode(VectorFunctions.scaledMicro(col("embedding"))))
        .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
      val cent = ex.groupBy("label", "dim")
        .agg(expr("sum(x) div count(1)").as("c")).persist()
      val nrm = cent.groupBy("label").agg(sum(col("c") * col("c")).as("n2"))
      val dots = cent.as("a").join(cent.as("b"),
          col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
        .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
        .agg(sum(col("a.c") * col("b.c")).as("dot"))
      dots
        .join(nrm.select(col("label").as("label_a"), col("n2").as("na")),
          Seq("label_a"))
        .join(nrm.select(col("label").as("label_b"), col("n2").as("nb")),
          Seq("label_b"))
        .select(col("label_a"), col("label_b"),
          round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6)
            .as("cos_sim"))
        .orderBy("label_a", "label_b")
    },
    s"""WITH ex AS (
       |  SELECT label, generate_subscripts(embedding, 1) AS dim,
       |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, dim,
       |    (CASE WHEN sum(x) >= 0 THEN sum(x)::BIGINT // count(*)
       |          ELSE -((-(sum(x)::BIGINT)) // count(*)) END)::BIGINT AS c
       |  FROM ex GROUP BY 1, 2),
       |nrm AS (SELECT label, sum(c * c)::BIGINT AS n2 FROM cent GROUP BY 1),
       |dots AS (
       |  SELECT a.label AS label_a, b.label AS label_b,
       |    sum(a.c * b.c)::BIGINT AS dot
       |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
       |  GROUP BY 1, 2)
       |SELECT label_a, label_b,
       |  round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cos_sim
       |FROM dots
       |JOIN nrm na ON label_a = na.label
       |JOIN nrm nb ON label_b = nb.label
       |ORDER BY label_a, label_b""".stripMargin)

  /** Incremental dedup — today's batch against the historical index
    * ([[Dedup.incrementalCandidates]]): docs < 400 are the indexed
    * corpus, the new batch is docs ≥ 400 plus redelivered copies of
    * 50 index docs (+10⁶ ids, the q22 injection). Candidates come
    * from a NEW × INDEX band join only (the index is never re-paired
    * with itself), then exact-Jaccard verification is linear in
    * candidates (q59's rule). Every redelivered copy must surface at
    * jaccard 1.0 against its original.
    */
  val incrementalDedup: Q = {
    val INDEX_MAX = 400L; val REDELIVER = 50L; val MIN_J = 0.5
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i").mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}").mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val index = docs.filter(col("doc_id") < INDEX_MAX)
        val fresh = docs.filter(col("doc_id") >= INDEX_MAX).unionByName(
          docs.filter(col("doc_id") < REDELIVER)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val sigI = Dedup.minhashSignatures(index, "doc_id", "text", MH_K)
        val sigN = Dedup.minhashSignatures(fresh, "doc_id", "text", MH_K)
        // the production shape: the index is a PERSISTED bucketed
        // artifact ([[DedupIndex]]), published once per re-index
        // (amortized — not per batch) and probed with bucket pruning;
        // candidates are identical to the in-plan NEW × INDEX band
        // join, which the oracle below mirrors. The index root is
        // keyed by the source table's fingerprint, so a rerun against
        // unchanged data probes the existing generation instead of
        // re-publishing (the amortization, made literal), while any
        // data change re-indexes under a fresh key.
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-dedup-index", d, Seq("documents.parquet"))
        if (DedupIndex.resolve(root).isEmpty)
          DedupIndex.publish(sigI, "doc_id", MH_BANDS, MH_R, root)
        val cands = DedupIndex.probe(s, sigN, "doc_id", MH_BANDS, MH_R, root)
        Dedup.jaccardFor(
            cands.select(col("new_id").as("id_a"), col("index_id").as("id_b")),
            index.unionByName(fresh), "doc_id", "text", 3, MIN_J)
          .select(col("id_a").as("new_id"), col("id_b").as("index_id"),
            col("jaccard"))
          .orderBy("new_id", "index_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id, text, 0 AS is_new FROM docs WHERE doc_id < $INDEX_MAX
         |  UNION ALL SELECT doc_id, text, 1 FROM docs WHERE doc_id >= $INDEX_MAX
         |  UNION ALL SELECT doc_id + 1000000, text, 1 FROM docs
         |    WHERE doc_id < $REDELIVER),
         |w AS (SELECT doc_id, is_new,
         |        ${TextFunctions.wordsSql("text")} AS arr FROM corpus),
         |sh AS (SELECT DISTINCT doc_id, is_new,
         |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
         |sig AS (
         |  SELECT doc_id, is_new,
         |    $sigCols
         |  FROM sh GROUP BY doc_id, is_new),
         |bands AS (
         |  $bandRowsSql),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS index_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |  WHERE a.is_new = 1 AND b.is_new = 0),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.new_id, c.index_id, count(*) AS n_inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.new_id
         |  JOIN sh b ON b.doc_id = c.index_id AND b.s = a.s
         |  GROUP BY 1, 2)
         |SELECT new_id, index_id,
         |  n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE AS jaccard
         |FROM inter
         |JOIN sizes sa ON new_id = sa.doc_id
         |JOIN sizes sb ON index_id = sb.doc_id
         |WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE >= $MIN_J
         |ORDER BY new_id, index_id""".stripMargin)
  }

  /** Incremental ANN with a PERSISTED index (q243) — the similarity
    * twin of q91, closing the round-8 gap: vectors < 400 are the
    * indexed corpus, published ONCE per data version as
    * [[graft.operators.SimIndex]]'s bucket-partitioned multi-table
    * LSH artifact (with the (r, T) it was built under frozen into the
    * artifact); vectors ≥ 400 are the daily query batch, probed with
    * partition pruning at batch cost. Judged output is the q96-style
    * recall audit of the probe against in-plan exact truth
    * ([[graft.operators.Similarity.bruteForceTopK]] of the batch vs
    * the index): per query, how many of its exact top-[[K]] the index
    * probe surfaced. The audit side is the oracle's burden too, so
    * the whole candidate-generation + scoring + ranking chain must
    * match bit-for-bit. At 100 TB the probe is the per-batch cost
    * (touched buckets only) and the exact audit runs on a SAMPLE of
    * queries as a recall monitor — here the full batch keeps the
    * oracle total.
    */
  val simIndexProbe: Q = {
    // the judged batch is a FIXED 100-query set: the exact-truth audit
    // broadcasts its query side (the q96 pattern), and the suite-wide
    // broadcast rule requires hinted sides to be constant-bounded — a
    // full daily batch would be probed WITHOUT the audit arm (the
    // probe itself hints nothing and scales with the batch)
    val INDEX_MAX = 400L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        // (r, T) derive from the INDEX corpus size at publish time and
        // travel inside the artifact — a probe against last month's
        // index must key with last month's parameters, not parameters
        // re-derived from a grown corpus
        val r = VectorFunctions.mtBits(index.count())
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-sim-index", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(root).isEmpty)
          SimIndex.publish(index, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), root)
        val approx = SimIndex.probeTopK(s, queries, "vec_id",
            "embedding", K, root)
          .select(col("query_id"), col("index_id"))
        val exact = Similarity.bruteForceTopK(
            index, queries, "vec_id", "embedding", K)
          .select(col("query_id"), col("vec_id").as("index_id"))
        val hits = exact.join(approx, Seq("query_id", "index_id"),
            "leftsemi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
          .selectExpr("query_id", "n_hit",
            s"n_hit * 100 div $K AS recall_pct")
          .orderBy("query_id")
      },
      s"""WITH idx AS (SELECT vec_id, embedding FROM embeddings
         |             WHERE vec_id < $INDEX_MAX),
         |${mtCtes("idx")},
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |ascore AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  GROUP BY 1, 2),
         |ar AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM ascore),
         |ax AS (SELECT query_id, index_id FROM ar WHERE rnk <= $K),
         |qx AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |       FROM embeddings
         |       WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
         |cx AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM idx),
         |bs AS (
         |  SELECT query_id, vec_id AS index_id,
         |    round(list_dot_product(qv, v) /
         |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
         |      AS cos_sim
         |  FROM qx JOIN cx ON vec_id <> query_id),
         |br AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM bs),
         |ex AS (SELECT query_id, index_id FROM br WHERE rnk <= $K),
         |hit AS (
         |  SELECT e.query_id, count(*)::BIGINT AS n_hit
         |  FROM ex e JOIN ax a
         |    ON e.query_id = a.query_id AND e.index_id = a.index_id
         |  GROUP BY 1)
         |SELECT q.query_id, coalesce(n_hit, 0)::BIGINT AS n_hit,
         |  (coalesce(n_hit, 0) * 100 // $K)::BIGINT AS recall_pct
         |FROM qx q LEFT JOIN hit ON q.query_id = hit.query_id
         |ORDER BY q.query_id""".stripMargin)
  }

  /** ANN index delta append (q250) — the growth half of the index
    * lifecycle (q243 publishes and probes, q246 deletes; this
    * appends): a new vector batch lands as an append-log delta keyed
    * with the BASE index's frozen (r, T)
    * ([[SimIndex.appendDelta]] — batch cost, no re-index), and probes
    * read base ∪ deltas with bucket pruning applied to each root.
    * The judged output is the probe's top-3 against the combined
    * index, and the oracle replays the SAME frozen-parameter rule:
    * its banding parameters derive from the BASE corpus only (300
    * vectors), while its key table spans base + delta (400) — so a
    * hash match proves the delta was keyed with the base's
    * parameters, not re-derived ones, which is the whole correctness
    * burden of an append. ([[SimIndex.mergeCompact]], the fold-back,
    * is spec-tested — its result is definitionally the same rows.)
    */
  val simIndexAppend: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val queries = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < Q_MAX)
        val r = VectorFunctions.mtBits(base.count())
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-sim-append", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(root).isEmpty) {
          SimIndex.publish(base, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), root)
          SimIndex.appendDelta(delta, "vec_id", "embedding", root)
        }
        SimIndex.probeTopK(s, queries, "vec_id", "embedding", K, root)
          .select(col("query_id"), col("index_id"), col("cos_sim"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
         |              WHERE vec_id < $BASE_MAX),
         |params AS (
         |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
         |    ${VectorFunctions.mtTablesSql(VectorFunctions.mtBitsSql("count(*)"))} AS nt
         |  FROM idx0),
         |ie AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params WHERE vec_id < $DELTA_MAX),
         |iek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM ie),
         |ikb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM iek),
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $DELTA_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |scored AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN ikb kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** ANN index purge (q258) — the GDPR chain judged end-to-end on the
    * SIMILARITY index, the exact twin of q246's dedup-index lifecycle
    * (the r9 verdict's top missing piece): a purge that must forget
    * VECTORS, not just documents — an embedding of deleted user
    * content kept serving as a nearest neighbor is the same
    * compliance failure as a resurfaced dedup link. Cold path runs
    * the full lifecycle — publish the [[SimIndex]] over the corpus,
    * tombstone every 10th indexed vector
    * ([[SimIndex.addTombstones]]: O(deletes), no rewrite),
    * merge-compact ([[SimIndex.mergeCompact]]: pure row filter, no
    * re-hashing), hard-vacuum the pre-purge generation
    * ([[SimIndex.vacuumOld]]) — and the probe then runs against
    * physically purged state: purged vectors MUST be absent from
    * every top-k (their rows simply gone, ranks closed up over the
    * survivors). The oracle replays q243's banding recurrence with
    * the purged ids removed from the KEY side while the banding
    * parameters still derive from the FULL pre-purge corpus — so the
    * hash match proves two things at once: the chain dropped exactly
    * the tombstoned rows, and compaction carried the FROZEN (r, T)
    * forward instead of re-deriving from the shrunken corpus.
    */
  val simIndexPurge: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val r = VectorFunctions.mtBits(index.count())
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-sim-purge", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(root).isEmpty) {
          SimIndex.publish(index, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), root)
          SimIndex.addTombstones(s,
            index.filter(col("vec_id") % 10 === 0).select("vec_id"),
            "vec_id", root)
          SimIndex.mergeCompact(s, root)
          SimIndex.vacuumOld(root)
        }
        SimIndex.probeTopK(s, queries, "vec_id", "embedding", K, root)
          .select(col("query_id"), col("index_id"), col("cos_sim"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
         |              WHERE vec_id < $INDEX_MAX),
         |params AS (
         |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
         |    ${VectorFunctions.mtTablesSql(VectorFunctions.mtBitsSql("count(*)"))} AS nt
         |  FROM idx0),
         |ie AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id < $INDEX_MAX AND vec_id % 10 <> 0),
         |iek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM ie),
         |ikb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM iek),
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |scored AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN ikb kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** ANN delta redelivery across a purge boundary (q301) — the last
    * family without the fold-ledger closure, closed: [[SimIndex]]
    * delta appends are now TAG-named and [[SimIndex.mergeCompact]]
    * records consumed names in `_folded.json`
    * ([[FirstSeenIndex]]'s pattern), so an at-least-once redelivery
    * of an append arriving AFTER a purge + merge consumed its delta
    * is ABSORBED instead of re-committed — without the ledger the
    * replay would re-append the purged vectors' band rows and
    * resurrect them through every probe (the r12 verdict's top
    * finding). The judged chain: publish base → tagged append →
    * tombstone every 10th indexed vector → mergeCompact (folds the
    * delta AND applies the purge, recording the tag) → REDELIVER the
    * same tagged append (runs on every execution, warm or cold — the
    * absorption is the judged claim) → probe. The oracle is the
    * never-ingested survivor index with the banding parameters still
    * frozen from the base corpus, so a hash match proves the purged
    * vec_ids stayed unfindable THROUGH the redelivery.
    */
  val simRedelivery: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val queries = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < Q_MAX)
        val r = VectorFunctions.mtBits(base.count())
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-sim-redeliver", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(root).isEmpty)
          SimIndex.publish(base, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), root)
        if (VersionedDirs.versionsOf(root).size < 2) {
          if (!SimIndex.folded(root, "b0"))
            SimIndex.appendDelta(delta, "vec_id", "embedding", root,
              tag = "b0")
          SimIndex.addTombstones(s,
            emb.filter(col("vec_id") < DELTA_MAX &&
              col("vec_id") % 10 === 0).select("vec_id"), "vec_id", root)
          SimIndex.mergeCompact(s, root)
        }
        // the at-least-once redelivery, after the purge consumed the
        // delta: absorbed through the generation's _folded.json —
        // deliberately UNguarded so it replays on every run
        SimIndex.appendDelta(delta, "vec_id", "embedding", root, tag = "b0")
        SimIndex.probeTopK(s, queries, "vec_id", "embedding", K, root)
          .select(col("query_id"), col("index_id"), col("cos_sim"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
         |              WHERE vec_id < $BASE_MAX),
         |params AS (
         |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
         |    ${VectorFunctions.mtTablesSql(VectorFunctions.mtBitsSql("count(*)"))} AS nt
         |  FROM idx0),
         |ie AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id < $DELTA_MAX AND vec_id % 10 <> 0),
         |iek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM ie),
         |ikb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM iek),
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $DELTA_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |scored AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN ikb kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Judged batch twin of the continuous ANN probe (q259) — the
    * [[graft.streaming.AnnStream]] algebra replayed as a
    * deterministic batch sequence so the DuckDB oracle guards it too
    * (spec-only through r9; same closure move as q170 for
    * [[graft.streaming.DedupStream]]): batch 0 probes the base
    * generation, is REDELIVERED (at-least-once — the committed batch
    * dir absorbs it byte-for-byte), then a delta append lands (the
    * re-publish boundary), and batch 1 probes base ∪ delta keyed
    * with the base's frozen (r, T). The emitted union of committed
    * batch results must equal the flat SQL where batch-0 queries see
    * ONLY base keys and batch-1 queries see base + delta — a hash
    * match proves per-batch snapshot isolation across the append
    * boundary: each batch scored against exactly one committed index
    * state, replays absorbed, no batch rescored after the index
    * moved.
    */
  val annStreamTwin: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L
    val B0_MAX = 450L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val b0 = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < B0_MAX)
        val b1 = emb.filter(
          col("vec_id") >= B0_MAX && col("vec_id") < Q_MAX)
        val r = VectorFunctions.mtBits(base.count())
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ann-stream-idx", d, Seq("embeddings.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ann-stream-out", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(idxRoot).isEmpty)
          SimIndex.publish(base, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), idxRoot)
        val ann = new graft.streaming.AnnStream(
          s, idxRoot, outRoot, "vec_id", "embedding", K)
        ann.processBatch(b0, 0)
        ann.processBatch(b0, 0) // at-least-once redelivery: absorbed
        // the re-publish boundary: the index grows AFTER batch 0
        // committed — batch 1 must see it, batch 0 must not
        if (SimIndex.deltas(idxRoot).isEmpty)
          SimIndex.appendDelta(delta, "vec_id", "embedding", idxRoot)
        ann.processBatch(b1, 1)
        ann.results().orderBy("query_id", "rnk")
      },
      s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
         |              WHERE vec_id < $BASE_MAX),
         |params AS (
         |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
         |    ${VectorFunctions.mtTablesSql(VectorFunctions.mtBitsSql("count(*)"))} AS nt
         |  FROM idx0),
         |ie AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params WHERE vec_id < $DELTA_MAX),
         |iek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM ie),
         |ikb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM iek),
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $DELTA_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |scored AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN ikb kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  WHERE kb.vec_id < $BASE_MAX OR q.vec_id >= $B0_MAX
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Streaming ANN gate across a PURGE boundary (q305) — the
    * streaming × delete cell for the similarity family, and the
    * judged STREAMING context for q301's fold ledger: a self-growing
    * retrieval index (each batch probes, then INGESTS as a tagged
    * delta — the continuous near-dup-alerting shape) hit by a GDPR
    * purge between batches. Batch 0 probes the base generation and
    * folds in (tag `b0`); the purge tombstones every 10th indexed
    * vector and merge-compacts — folding batch 0's delta AND the
    * deletes into one generation, recording the tag; batch 0 is then
    * REDELIVERED (probe absorbed by its committed dir, ingest
    * absorbed via `_folded.json` — without the ledger the replay
    * re-appends batch 0's purged vectors and batch 1 retrieves
    * them); batch 1 probes the purged, folded world keyed with the
    * STILL-frozen base (r, T). Batches are id-disjoint, so the
    * oracle is one banding replay with a per-arm index predicate
    * (q259's scheme): batch-0 queries must collide only with the
    * full pre-purge base, batch-1 queries only with the never-
    * ingested survivor world — scoring either batch against the
    * other's index state hash-mismatches.
    */
  val annPurgeStream: Q = {
    val BASE = 250L; val B0 = 400L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE)
        val b0 = emb.filter(
          col("vec_id") >= BASE && col("vec_id") < B0)
        val b1 = emb.filter(
          col("vec_id") >= B0 && col("vec_id") < Q_MAX)
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ann-pstream-idx", d, Seq("embeddings.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ann-pstream-out", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(idxRoot).isEmpty) {
          val r = VectorFunctions.mtBits(base.count())
          SimIndex.publish(base, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), idxRoot)
        }
        val ann = new graft.streaming.AnnStream(
          s, idxRoot, outRoot, "vec_id", "embedding", K)
        ann.processBatch(b0, 0) // probe the base, THEN ingest
        if (!SimIndex.folded(idxRoot, "b0"))
          SimIndex.appendDelta(b0, "vec_id", "embedding", idxRoot,
            tag = "b0")
        // the purge: runs exactly once (compacted generation is the
        // second committed version)
        if (VersionedDirs.versionsOf(idxRoot).size < 2) {
          SimIndex.addTombstones(s,
            emb.filter(col("vec_id") < B0 && col("vec_id") % 10 === 0)
              .select("vec_id"), "vec_id", idxRoot)
          SimIndex.mergeCompact(s, idxRoot)
        }
        // at-least-once redelivery AFTER the purge consumed the
        // delta — probe AND ingest absorbed, on every run
        ann.processBatch(b0, 0)
        SimIndex.appendDelta(b0, "vec_id", "embedding", idxRoot,
          tag = "b0")
        ann.processBatch(b1, 1) // probes the purged, folded world
        ann.results().orderBy("query_id", "rnk")
      },
      s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
         |              WHERE vec_id < $BASE),
         |params AS (
         |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
         |    ${VectorFunctions.mtTablesSql(VectorFunctions.mtBitsSql("count(*)"))} AS nt
         |  FROM idx0),
         |ie AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params WHERE vec_id < $B0),
         |iek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM ie),
         |ikb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM iek),
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $BASE AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |scored AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN ikb kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  WHERE (q.vec_id < $B0 AND kb.vec_id < $BASE)
         |     OR (q.vec_id >= $B0 AND kb.vec_id % 10 <> 0)
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Persisted product-quantization index (q260) — q247's PQ/ADC
    * family moved onto the train-once / publish / probe-per-batch
    * lifecycle ([[PqIndex]], the production IVFPQ shape and the r9
    * verdict's item 5): codebooks train ONCE on the index corpus,
    * freeze into the artifact with their (m, dsub, ks, iters)
    * sidecar, the corpus persists as m-code rows, and the timed path
    * is a pure ADC probe — broadcast distance tables over a
    * code-table-only scan, no retrain, no decompression, `art:warm`
    * once published. Unlike q247 (queries inside the train set), the
    * query batch here is DISJOINT from the training corpus — the
    * serving situation — so the oracle's replay (fit on the corpus
    * alone → encode → ADC from out-of-corpus queries) hash-matching
    * proves the probe used the artifact's frozen codebooks, not
    * codebooks re-derived from corpus + queries.
    */
  // shared PQ oracle constants + CTE fragments (q260/q261/q262): the
  // three lifecycle queries replay the SAME fit — ITERS Lloyd rounds
  // over the subspace rows of the train CTE `ix` — so the family
  // cannot drift internally
  private val PQ_M = 8; private val PQ_DSUB = 8
  private val PQ_KS = 16; private val PQ_ITERS = 2; private val PQ_K = 10

  /** One Lloyd round of the PQ oracle fit (assign to pc(i−1), then
    * truncated-integer per-dim means) — chains pc0 → pc[[PQ_ITERS]].
    */
  private def pqIterCte(i: Int): String =
    s"""pd$i AS (
       |  SELECT ix.vec_id, c.sub, c.cell,
       |    sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
       |  FROM ix JOIN pc${i - 1} c ON ix.sub = c.sub AND ix.sdim = c.sdim
       |  GROUP BY 1, 2, 3),
       |pa$i AS (
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT vec_id, sub, cell,
       |      row_number() OVER (PARTITION BY vec_id, sub
       |                         ORDER BY d2, cell) AS rnk
       |    FROM pd$i) WHERE rnk = 1),
       |pc$i AS (
       |  SELECT a.sub, a.cell, ix.sdim,
       |    round(sum(ix.xs) / count(*))::BIGINT AS cs
       |  FROM ix JOIN pa$i a
       |    ON ix.vec_id = a.vec_id AND ix.sub = a.sub
       |  GROUP BY 1, 2, 3)"""

  /** The subspace-row base of the PQ oracles: e (scaled long-form) →
    * ep (sub, sdim, xs).
    */
  private def pqEpCtes: String =
    s"""e AS (
       |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
       |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs
       |  FROM embeddings),
       |ep AS (
       |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
       |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
       |  FROM e)""".stripMargin

  /** Encode `encodeCte`'s vectors with the pc[[PQ_ITERS]] codebook and
    * ADC-score `queriesPred` rows against them — CTE chain ending at
    * `ranked` (query_id, index_id, adc_d2, rnk). `pairPred` restricts
    * which (code row `cd`, query `dt`) pairs score at all — the
    * snapshot-isolation predicate of the streaming twin (default:
    * every pair).
    */
  private def pqRankCtes(encodeCte: String, queriesPred: String,
                         pairPred: String = "TRUE"): String =
    s"""fd AS (
       |  SELECT ib.vec_id, c.sub, c.cell,
       |    sum((ib.xs - c.cs) * (ib.xs - c.cs)) AS d2
       |  FROM $encodeCte ib JOIN pc$PQ_ITERS c
       |    ON ib.sub = c.sub AND ib.sdim = c.sdim
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT vec_id, sub, cell,
       |      row_number() OVER (PARTITION BY vec_id, sub
       |                         ORDER BY d2, cell) AS rnk
       |    FROM fd) WHERE rnk = 1),
       |dtab AS (
       |  SELECT q.vec_id AS query_id, c.sub, c.cell,
       |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
       |  FROM ep q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
       |  WHERE $queriesPred
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT dt.query_id, cd.vec_id AS index_id,
       |    sum(dt.d2)::BIGINT AS adc_d2
       |  FROM codes cd JOIN dtab dt
       |    ON cd.sub = dt.sub AND cd.cell = dt.cell
       |  WHERE $pairPred
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, index_id, adc_d2,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY adc_d2, index_id) AS rnk
       |  FROM scored)""".stripMargin

  /** [[pqRankCtes]] closed with the top-[[PQ_K]] select. */
  private def pqScoreSql(encodeCte: String, queriesPred: String): String =
    s"""${pqRankCtes(encodeCte, queriesPred)}
       |SELECT query_id, index_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= $PQ_K
       |ORDER BY query_id, rnk""".stripMargin

  val pqIndexProbe: Q = {
    val M = PQ_M; val DSUB = PQ_DSUB; val KS = PQ_KS; val ITERS = PQ_ITERS
    val INDEX_MAX = 400L; val Q_MAX = 420L; val K = PQ_K
    def iterCte(i: Int): String = pqIterCte(i)
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-pq-index", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            M, DSUB, KS, ITERS, root)
        PqIndex.probeTopK(s, queries, "vec_id", "embedding", K, root)
          .select(col("query_id"), col("index_id"), col("adc_d2"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH $pqEpCtes,
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $KS),
         |${(1 to ITERS).map(iterCte).mkString(",\n")},
         |${pqScoreSql("ix",
             s"q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX")}""".stripMargin)
  }

  /** PQ index delta append (q261) — the growth half of the PQ
    * lifecycle, the code-table twin of q250: a new vector batch is
    * ENCODED with the base index's FROZEN codebooks
    * ([[PqIndex.appendDelta]]: one argmin pass against the broadcast
    * m·ks codebook — batch cost, never a Lloyd round) and lands as
    * an append-log code delta; probes scan base codes ∪ delta codes.
    * The oracle trains its codebooks on the BASE corpus only (300
    * vectors) while its code table spans base + delta (400) — so a
    * hash match proves the delta was encoded with the base's frozen
    * codebooks, not codebooks re-trained on the grown corpus, which
    * is the entire correctness burden of a PQ append
    * ([[PqIndex.mergeCompact]], the fold-back, is spec-tested — a
    * pure row union, definitionally the same rows).
    */
  val pqIndexAppend: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L; val Q_MAX = 420L
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val queries = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-pq-append", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty) {
          PqIndex.publish(base, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, root)
          PqIndex.appendDelta(delta, "vec_id", "embedding", root)
        }
        PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K, root)
          .select(col("query_id"), col("index_id"), col("adc_d2"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH $pqEpCtes,
         |ix AS (SELECT * FROM ep WHERE vec_id < $BASE_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |enc AS (SELECT * FROM ep WHERE vec_id < $DELTA_MAX),
         |${pqScoreSql("enc",
             s"q.vec_id >= $DELTA_MAX AND q.vec_id < $Q_MAX")}""".stripMargin)
  }

  /** PQ index purge (q262) — the GDPR chain on the THIRD index
    * family, completing the lifecycle matrix ({dedup, ANN-LSH, PQ} ×
    * {publish, probe, append, delete, compact, vacuum}): codes are
    * derived state too — a purged vector still scoring as an ADC
    * neighbor through its code row is the same compliance failure as
    * q246/q258. Cold path: publish over the corpus, tombstone every
    * 10th indexed vector (shared [[graft.operators.Tombstones]] log,
    * O(deletes)), merge-compact (pure row filter of the code table —
    * codebook and params byte-identical), vacuum the pre-purge
    * generation; the probe then runs against physically purged
    * codes. The oracle trains on the FULL pre-purge corpus (the
    * codebooks were fit before the deletions and must NOT be
    * re-trained by a purge — re-clustering on deletion would shift
    * every surviving vector's codes) but keeps only live rows in its
    * code table — a hash match proves exact-row removal AND
    * frozen-codebook carry-forward through the compaction.
    */
  val pqIndexPurge: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-pq-purge", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty) {
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, root)
          PqIndex.addTombstones(s,
            index.filter(col("vec_id") % 10 === 0).select("vec_id"),
            "vec_id", root)
          PqIndex.mergeCompact(s, root)
          PqIndex.vacuumOld(root)
        }
        PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K, root)
          .select(col("query_id"), col("index_id"), col("adc_d2"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH $pqEpCtes,
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |enc AS (SELECT * FROM ix WHERE vec_id % 10 <> 0),
         |${pqScoreSql("enc",
             s"q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX")}""".stripMargin)
  }

  /** IVFPQ (q263) — the two PQ halves composed into FAISS's
    * production serving shape (IndexIVFPQ with by_residual=false):
    * a trained coarse quantizer (q53/q54's [[VectorQuantizer
    * .fitCentroids]]) prunes the CANDIDATE SET — each query probes
    * its nprobe nearest coarse cells and only vectors assigned there
    * are scored at all — while PQ codes + broadcast ADC tables
    * (q247/q260's machinery) compress the SCORING — candidates cost
    * m integer lookups + a sum, never a float-vector fetch. Together:
    * sub-linear candidate generation × constant-memory scoring, the
    * combination that serves billion-vector indexes from RAM. Both
    * quantizers live in the exact integer domain, so the oracle
    * replays coarse fit → coarse assign → PQ fit → encode → pruned
    * ADC bit-for-bit. In-plan form (the q247 stance); the persisted
    * path is exactly [[PqIndex]] plus a `ccell` column on the code
    * table — every lifecycle property is already proven by
    * q260/q261/q262.
    */
  val ivfPq: Q = {
    // coarse geometry is the shared q53/q54 codebook (KM_C cells,
    // KM_ITERS rounds) because the oracle's kmeansCtes() is generated
    // from exactly those constants — a local copy would be a hidden
    // must-stay-equal coupling the compiler can't see
    val NQ = 5L; val PROBE = 2
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = VectorQuantizer.scaled(
          t(s, d, "embeddings"), "vec_id", "embedding").persist()
        // coarse quantizer: 8 trained cells, 2 Lloyd rounds (the
        // q53/q54 codebook constants)
        val coarse = VectorQuantizer.fitCentroids(e, "vec_id", KM_C, KM_ITERS)
        val corpusCells = VectorQuantizer.assignCells(e, coarse, "vec_id")
          .withColumnRenamed("cell", "ccell")
        val queryCells = VectorQuantizer.assignCells(
            e.filter(col("vec_id") < NQ), coarse, "vec_id", PROBE)
          .select(col("vec_id").as("query_id"), col("cell").as("ccell"))
        // PQ: subspace codebooks + long-form codes (the q247 fit)
        val pqCent = VectorQuantizer.fitPQ(
          e, "vec_id", PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS)
        // both fits (the multi-pass consumers) have materialized their
        // eager checkpoints — release the cache here so the query
        // never leaks executor storage on library callers; the
        // remaining single-pass consumers recompute the (projection-
        // only) scaled read
        e.unpersist()
        val epq = VectorQuantizer.subVectors(e, "vec_id", PQ_M, PQ_DSUB)
        val codes = VectorQuantizer.assignSubCells(epq, pqCent, "vec_id")
        val dtab = epq.filter(col("vec_id") < NQ)
          .withColumnRenamed("vec_id", "query_id")
          .join(broadcast(pqCent), Seq("sub"))
          .select(col("query_id"), col("sub"), col("cell"),
            VectorQuantizer.l2DistSq(col("xs"), col("cs")).as("d2"))
        // the IVF prune: only (query, vector) pairs meeting in a
        // probed coarse cell are ever scored
        val cand = corpusCells.join(queryCells, Seq("ccell"))
          .filter(col("vec_id") =!= col("query_id"))
          .select("query_id", "vec_id")
        val scored = cand.join(codes, Seq("vec_id"))
          .join(broadcast(dtab), Seq("query_id", "sub", "cell"))
          .groupBy("query_id", "vec_id").agg(sum("d2").as("adc_d2"))
        val w = Window.partitionBy("query_id")
          .orderBy(asc("adc_d2"), asc("vec_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= PQ_K)
          .select(col("query_id"), col("vec_id").as("index_id"),
            col("adc_d2"), col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH ${kmeansCtes()},
         |fa AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
         |  FROM e JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY e.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa) WHERE rnk = 1),
         |qa AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id < $NQ) WHERE rnk <= $PROBE),
         |cand AS (
         |  SELECT qa.query_id, ca.vec_id
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.query_id),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM e),
         |ix AS (SELECT * FROM ep),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ix.vec_id, c.sub, c.cell,
         |    sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |  FROM ix JOIN pc$PQ_ITERS c ON ix.sub = c.sub AND ix.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |dtab AS (
         |  SELECT q.vec_id AS query_id, c.sub, c.cell,
         |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
         |  FROM ep q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
         |  WHERE q.vec_id < $NQ
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT cand.query_id, cd.vec_id AS index_id,
         |    sum(dt.d2)::BIGINT AS adc_d2
         |  FROM cand
         |  JOIN codes cd ON cd.vec_id = cand.vec_id
         |  JOIN dtab dt ON dt.query_id = cand.query_id
         |    AND dt.sub = cd.sub AND dt.cell = cd.cell
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, adc_d2,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc_d2, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $PQ_K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** PERSISTED IVFPQ serving (q270) — q263's pruning algebra served
    * from the committed artifact (the r10 verdict's top item): the
    * coarse quantizer trains at publish and freezes into `coarse/`
    * beside the PQ codebook, `codes/` is PARTITIONED BY each vector's
    * coarse cell, and the probe ([[PqIndex.probeTopK]] with nprobe)
    * statically prunes to the probed cells' partition directories
    * before any ADC work — never a retrain, never a full code-table
    * scan (the q260 probe's linear weakness, closed). The query batch
    * is DISJOINT from the training corpus (the serving situation), so
    * the oracle's replay — coarse fit on the corpus alone → corpus
    * assign → query probe cells → PQ fit → encode → candidate-pruned
    * ADC — hash-matching proves BOTH frozen quantizers came from the
    * artifact and the candidate set was exactly the probed cells'.
    * `art:warm` once published; PqIndexSpec carries the
    * partition-filter proof, PlanAuditSpec the no-cartesian audit.
    */
  val ivfPqIndexProbe: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L; val NPROBE = 2
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-index", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, root,
            coarseC = KM_C, coarseIters = KM_ITERS)
        PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K, root,
            NPROBE)
          .select(col("query_id"), col("index_id"), col("adc_d2"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $INDEX_MAX")},
         |fa AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
         |  FROM e JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY e.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id < $INDEX_MAX) WHERE rnk = 1),
         |qa AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX)
         |  WHERE rnk <= $NPROBE),
         |cand AS (
         |  SELECT qa.query_id, ca.vec_id
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.query_id),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM e),
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ix.vec_id, c.sub, c.cell,
         |    sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |  FROM ix JOIN pc$PQ_ITERS c ON ix.sub = c.sub AND ix.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |dtab AS (
         |  SELECT q.vec_id AS query_id, c.sub, c.cell,
         |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
         |  FROM ep q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
         |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT cand.query_id, cd.vec_id AS index_id,
         |    sum(dt.d2)::BIGINT AS adc_d2
         |  FROM cand
         |  JOIN codes cd ON cd.vec_id = cand.vec_id
         |  JOIN dtab dt ON dt.query_id = cand.query_id
         |    AND dt.sub = cd.sub AND dt.cell = cd.cell
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, adc_d2,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc_d2, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $PQ_K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** IVFPQ nprobe/recall tuning sweep (q274) — THE operating knob of
    * an IVF deployment, measured on the PERSISTED artifact: for each
    * nprobe in the sweep, the pruned probe's top-K is compared
    * against the exhaustive flat-ADC top-K from the SAME artifact
    * (same frozen codebooks, same codes — so the sweep isolates
    * exactly what candidate pruning costs in recall, not quantization
    * noise). Shares q270's committed index root, so every probe is
    * `art:warm`; reported per nprobe: pruned-pair count, hits inside
    * the flat top-K, and recall in ppm of the full nq·K budget
    * (pruned lists can run short — nprobe=1 sees one cell's
    * candidates only — and the shortfall is recall loss by
    * definition). The oracle replays both quantizers and both
    * rankings; a hash match proves the artifact-served sweep equals
    * the from-scratch replay at every operating point.
    */
  val ivfPqRecallSweep: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L; val NQ = Q_MAX - INDEX_MAX
    val NPS = Seq(1, 2, 4)
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-index", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, root,
            coarseC = KM_C, coarseIters = KM_ITERS)
        val flat = PqIndex.probeTopK(s, queries, "vec_id", "embedding",
            PQ_K, root)
          .select(col("query_id"), col("index_id"))
        val pruned = NPS.map { np =>
          PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K, root, np)
            .select(col("query_id"), col("index_id"))
            .withColumn("np", lit(np.toLong))
        }.reduce(_.unionByName(_))
        pruned
          .join(flat.withColumn("hit", lit(1L)),
            Seq("query_id", "index_id"), "left")
          .groupBy("np")
          .agg(count(lit(1)).as("n_pairs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * PQ_K})"))
          .orderBy("np")
      },
      s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $INDEX_MAX")},
         |fa AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
         |  FROM e JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY e.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id < $INDEX_MAX) WHERE rnk = 1),
         |qa AS (
         |  SELECT vec_id AS query_id, cell, rnk FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX)
         |  WHERE rnk <= ${NPS.max}),
         |nps(np) AS (VALUES ${NPS.map(n => s"($n)").mkString(", ")}),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM e),
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ix.vec_id, c.sub, c.cell,
         |    sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |  FROM ix JOIN pc$PQ_ITERS c ON ix.sub = c.sub AND ix.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |dtab AS (
         |  SELECT q.vec_id AS query_id, c.sub, c.cell,
         |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
         |  FROM ep q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
         |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
         |  GROUP BY 1, 2, 3),
         |adc AS (
         |  SELECT dt.query_id, cd.vec_id AS index_id,
         |    sum(dt.d2)::BIGINT AS adc_d2
         |  FROM codes cd JOIN dtab dt ON dt.sub = cd.sub AND dt.cell = cd.cell
         |  WHERE cd.vec_id <> dt.query_id
         |  GROUP BY 1, 2),
         |flat AS (
         |  SELECT query_id, index_id FROM (
         |    SELECT query_id, index_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc_d2, index_id) AS rnk
         |    FROM adc) WHERE rnk <= $PQ_K),
         |cand AS (
         |  SELECT nps.np, qa.query_id, ca.vec_id
         |  FROM qa JOIN nps ON qa.rnk <= nps.np
         |  JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.query_id),
         |ranked_np AS (
         |  SELECT np, query_id, index_id FROM (
         |    SELECT c.np, c.query_id, a.index_id,
         |      row_number() OVER (PARTITION BY c.np, c.query_id
         |                         ORDER BY a.adc_d2, a.index_id) AS rnk
         |    FROM cand c JOIN adc a
         |      ON a.query_id = c.query_id AND a.index_id = c.vec_id)
         |  WHERE rnk <= $PQ_K)
         |SELECT p.np::BIGINT AS np, count(*)::BIGINT AS n_pairs,
         |  sum(CASE WHEN f.query_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |    AS n_hit,
         |  (sum(CASE WHEN f.query_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // ${NQ * PQ_K})::BIGINT AS recall_ppm
         |FROM ranked_np p LEFT JOIN flat f
         |  ON f.query_id = p.query_id AND f.index_id = p.index_id
         |GROUP BY p.np ORDER BY np""".stripMargin)
  }

  /** Hard-negative mining (q275) — the retrieval-training step that
    * composes TWO committed artifacts: for each eval-slice query doc,
    * rank the LOOSE-banding retrieval pool ([[mhPoolArtifact]] — 8×2
    * bands over the same signatures, the recall-oriented layout) by
    * estimated similarity and EXCLUDE candidates in the query's
    * near-dup component ([[ccAssignment]] — the 4×4/τ duplicate
    * graph's transitive closure: duplicates are positives, not
    * negatives; training on them as negatives poisons the
    * objective). Judged per eval query touching the pool: the
    * candidate count, how many the duplicate screen excluded, the
    * surviving negative count, and the TOP surviving negative with
    * its estimate (-1 sentinels when every candidate was a
    * duplicate — the rows that prove the screen actually fires).
    * Both artifacts are `art:warm` after first publish; the oracle
    * replays BOTH bandings, the estimates, AND the recursive
    * component walk — the hash match proves the cross-artifact
    * composition (pool minus transitive closure) end to end.
    */
  val hardNegatives: Q = {
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val est = mhPoolArtifact(s, d)
        val sym = est.select(col("id_a").as("query_id"),
            col("id_b").as("cand"), col("est_sim"))
          .unionByName(est.select(col("id_b").as("query_id"),
            col("id_a").as("cand"), col("est_sim")))
          .filter(col("query_id") % 2 === 0)
        val comp = ccAssignment(s, d)
        val flagged = sym
          .join(comp.select(col("node").as("query_id"),
            col("component").as("qc")), Seq("query_id"), "left")
          .join(comp.select(col("node").as("cand"),
            col("component").as("cc")), Seq("cand"), "left")
          .withColumn("dup",
            when(col("qc").isNotNull && col("cc").isNotNull &&
              col("qc") === col("cc"), 1L).otherwise(0L))
        val perQ = flagged.groupBy("query_id")
          .agg(count(lit(1)).as("n_cand"), sum("dup").as("n_excluded"))
        val top1 = flagged.filter(col("dup") === 0)
          .withColumn("rnk", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(desc("est_sim"), col("cand"))))
          .filter(col("rnk") === 1)
          .select(col("query_id"), col("cand"), col("est_sim"))
        perQ.join(top1, Seq("query_id"), "left")
          .select(col("query_id"), col("n_cand"), col("n_excluded"),
            (col("n_cand") - col("n_excluded")).as("n_negs"),
            coalesce(col("cand"), lit(-1L)).as("top_neg_id"),
            coalesce(col("est_sim"), lit(-1.0)).as("top_neg_est"))
          .orderBy("query_id")
      },
      s"""WITH RECURSIVE $minhashPairsCtes,
         |$mhPoolCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk(n, m) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, walk.m FROM walk JOIN edges e ON e.u = walk.n),
         |comp AS (SELECT n AS node, min(m) AS component FROM walk GROUP BY n),
         |sym AS (
         |  SELECT id_a AS query_id, id_b AS cand, est_sim FROM pool
         |  UNION ALL SELECT id_b, id_a, est_sim FROM pool),
         |f AS (
         |  SELECT s.query_id, s.cand, s.est_sim,
         |    CASE WHEN ca.component IS NOT NULL AND cb.component IS NOT NULL
         |      AND ca.component = cb.component THEN 1 ELSE 0 END AS dup
         |  FROM sym s
         |  LEFT JOIN comp ca ON ca.node = s.query_id
         |  LEFT JOIN comp cb ON cb.node = s.cand
         |  WHERE s.query_id % 2 = 0),
         |perq AS (
         |  SELECT query_id, count(*)::BIGINT AS n_cand,
         |    sum(dup)::BIGINT AS n_excluded
         |  FROM f GROUP BY query_id),
         |top1 AS (
         |  SELECT query_id, cand, est_sim FROM (
         |    SELECT query_id, cand, est_sim,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY est_sim DESC, cand) AS rnk
         |    FROM f WHERE dup = 0) WHERE rnk = 1)
         |SELECT p.query_id, p.n_cand, p.n_excluded,
         |  (p.n_cand - p.n_excluded)::BIGINT AS n_negs,
         |  coalesce(t.cand, -1)::BIGINT AS top_neg_id,
         |  coalesce(t.est_sim, -1.0) AS top_neg_est
         |FROM perq p LEFT JOIN top1 t USING (query_id)
         |ORDER BY query_id""".stripMargin)
  }

  /** Corpus novelty audit (q264) — the data-curation signal between
    * exact dedup (q22) and near-dup (q24): how much of each document
    * is REPEATED SUBMATTER — word shingles already seen in an earlier
    * document (by ingestion order = doc_id) — without any pairing.
    * Boilerplate-heavy sources score low novelty long before whole
    * documents duplicate, which is the early filter signal (Lee et
    * al.'s motivation for sub-document dedup). Per shingle, ONE
    * window-min over the shingle exchange finds its first-occurrence
    * doc; a doc's novelty is the fraction of its shingles it
    * introduced. Scale: one shingle-keyed exchange + doc agg +
    * source agg — corpus-linear, no pair join anywhere; the judged
    * report is the per-source rollup (ppm novelty, integer).
    */
  val noveltyAudit: Q = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        col("text"))
      val sh = Dedup.shingleSet(docs, "doc_id", "text", 3)
      val firsts = sh
        .withColumn("first_doc", min("doc_id").over(Window.partitionBy("s")))
      val perDoc = firsts.groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum((col("first_doc") === col("doc_id")).cast("long"))
            .as("n_novel"))
      docs.select("doc_id", "source").join(perDoc, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_sh").as("n_sh"),
          sum("n_novel").as("n_novel"))
        .withColumn("novelty_ppm",
          expr("n_novel * 1000000 div n_sh"))
        .orderBy("source")
    },
    s"""WITH w AS (
       |  SELECT doc_id, source, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, source,
       |    unnest(${TextFunctions.shinglesSql("arr")}) AS s
       |  FROM w),
       |f AS (
       |  SELECT doc_id, source,
       |    min(doc_id) OVER (PARTITION BY s) AS first_doc
       |  FROM sh),
       |d AS (
       |  SELECT doc_id, source, count(*)::BIGINT AS n_sh,
       |    sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
       |      AS n_novel
       |  FROM f GROUP BY 1, 2)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(n_sh)::BIGINT AS n_sh, sum(n_novel)::BIGINT AS n_novel,
       |  (sum(n_novel) * 1000000 // sum(n_sh))::BIGINT AS novelty_ppm
       |FROM d GROUP BY source ORDER BY source""".stripMargin)

  /** Temperature-scaled mixture weights (q265) — the multilingual
    * low-resource upsampling rule (the mT5/XLM-R α-sampling family at
    * α = ½): a source's mixture weight is √tokens instead of tokens,
    * compressing the head and lifting the tail, then the doc budget
    * apportions by q253's exact largest-remainder rule. The point of
    * engineering interest is √ itself: float `sqrt`+`floor` is an
    * off-by-one minefield for a hash gate (a correctly-rounded double
    * lands ON the root for n one below a perfect square), so the
    * weight is [[graft.functions.IntMath]]'s EXACT integer Newton
    * isqrt — unrolled, integer-only arithmetic both engines evaluate
    * identically, proving α-temperature mixing can be engine-exact.
    * Judged per source: natural vs sampled share (ppm) and the exact
    * allocation; Σalloc = budget by construction. Scale: one corpus
    * scan into a taxonomy-sized aggregate; everything after is
    * window work over ≤ |sources| rows.
    */
  val temperatureMix: Q = {
    val BUDGET = 10000L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stats = t(s, d, "documents")
          .select(col("source"),
            size(TextFunctions.words(col("text"))).cast("long").as("n_tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
        val weighted = IntMath.withIsqrt(stats, "tokens", "w")
        val wAll = Window.partitionBy()
        weighted
          .withColumn("tot_tokens", sum("tokens").over(wAll))
          .withColumn("tot_w", sum("w").over(wAll))
          .withColumn("base", expr(s"$BUDGET * w div tot_w"))
          .withColumn("rem", expr(s"($BUDGET * w) % tot_w"))
          .withColumn("leftover", lit(BUDGET) - sum("base").over(wAll))
          .withColumn("rnk", row_number().over(
            Window.partitionBy().orderBy(desc("rem"), asc("source"))))
          .withColumn("alloc",
            col("base") + when(col("rnk") <= col("leftover"), 1L)
              .otherwise(0L))
          .selectExpr("source", "n_docs", "tokens", "w", "alloc",
            "tokens * 1000000 div tot_tokens AS nat_ppm",
            s"alloc * 1000000 div $BUDGET AS mix_ppm")
          .orderBy("source")
      },
      s"""WITH w0 AS (
         |  SELECT source,
         |    len(${TextFunctions.wordsSql("text")})::BIGINT AS n_tok
         |  FROM documents),
         |st AS (
         |  SELECT source, count(*)::BIGINT AS n_docs,
         |    sum(n_tok)::BIGINT AS tokens
         |  FROM w0 GROUP BY source),
         |${IntMath.isqrtSqlCtes("st", "source, n_docs", "tokens", "w")},
         |ax AS (
         |  SELECT source, n_docs, tokens, w,
         |    sum(tokens) OVER () AS tot_tokens, sum(w) OVER () AS tot_w,
         |    ($BUDGET * w) // sum(w) OVER () AS base,
         |    ($BUDGET * w) % sum(w) OVER () AS rem
         |  FROM isqf),
         |ay AS (
         |  SELECT *, $BUDGET - sum(base) OVER () AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, source) AS rnk
         |  FROM ax)
         |SELECT source, n_docs, tokens, w,
         |  (base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END)::BIGINT
         |    AS alloc,
         |  (tokens * 1000000 // tot_tokens)::BIGINT AS nat_ppm,
         |  ((base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END)
         |    * 1000000 // $BUDGET)::BIGINT AS mix_ppm
         |FROM ay ORDER BY source""".stripMargin)
  }

  /** Two-stage retrieve-and-rerank (q267) — the standard serving
    * pipeline over the persisted PQ index: stage 1 recalls a WIDE
    * candidate set by compressed ADC score (top-[[50]] from
    * [[PqIndex.probeTopK]] against q260's committed artifact — SAME
    * fingerprint root, published once, consumed by both queries),
    * stage 2 fetches ONLY those candidates' float vectors by key and
    * reranks them with exact cosine. Compression error is confined
    * to recall (a true neighbor outside the ADC top-C is lost);
    * precision within the candidate set is exact — which is why
    * every production ANN stack ends in this shape. Judged output
    * carries each survivor's ADC rank next to its exact rank, so the
    * result IS the rank-agreement audit. Scale: stage 1 is the
    * code-table scan, stage 2 is candidate-bounded (nq·C rows
    * through one keyed vector fetch + a 20-row broadcast query
    * side).
    */
  val pqRerank: Q = {
    val C = 50; val INDEX_MAX = 400L; val Q_MAX = 420L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-pq-index", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, root)
        val cands = PqIndex.probeTopK(s, queries, "vec_id", "embedding",
            C, root)
          .select(col("query_id"), col("index_id"),
            col("rnk").as("adc_rnk"))
        val exact = cands
          .join(index.select(col("vec_id").as("index_id"),
            col("embedding").as("iv")), Seq("index_id"))
          .join(broadcast(queries.select(col("vec_id").as("query_id"),
            col("embedding").as("qv"))), Seq("query_id"))
          .select(col("query_id"), col("index_id"), col("adc_rnk"),
            round(VectorFunctions.cosineNative(col("qv"), col("iv")), 6)
              .as("cos_sim"))
        val w = Window.partitionBy("query_id")
          .orderBy(desc("cos_sim"), asc("index_id"))
        exact.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= PQ_K)
          .select("query_id", "index_id", "cos_sim", "adc_rnk", "rnk")
          .orderBy("query_id", "rnk")
      },
      s"""WITH $pqEpCtes,
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |${pqRankCtes("ix",
             s"q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX")},
         |cands AS (
         |  SELECT query_id, index_id, rnk AS adc_rnk FROM ranked
         |  WHERE rnk <= $C),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |rr AS (
         |  SELECT c.query_id, c.index_id, c.adc_rnk,
         |    round(${VectorFunctions.cosineSql("qv.v", "cv.v")}, 6)
         |      AS cos_sim
         |  FROM cands c
         |  JOIN v cv ON cv.vec_id = c.index_id
         |  JOIN v qv ON qv.vec_id = c.query_id),
         |rr2 AS (
         |  SELECT query_id, index_id, cos_sim, adc_rnk,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM rr)
         |SELECT query_id, index_id, cos_sim, CAST(adc_rnk AS BIGINT) AS adc_rnk,
         |  CAST(rnk AS BIGINT) AS rnk
         |FROM rr2 WHERE rnk <= $PQ_K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Shared batch-novelty scoring of q266/q269 (ONE definition so the
    * two lifecycle queries cannot drift): `probed` is the batch's
    * shingle set annotated with the committed first-seen map's
    * `seen_doc`; a shingle is novel iff the index never saw it AND no
    * earlier batch doc introduced it (one window-min); rolled up per
    * source in integer ppm.
    */
  private def noveltyReport(probed: DataFrame,
                            batch: DataFrame): DataFrame =
    noveltyRollup(FirstSeenIndex.scoreBatch(probed), batch)

  /** Per-source rollup of a per-doc novelty census — the judged shape
    * shared by the one-shot reports and the streaming twin (q272,
    * whose per-doc rows come from committed batch dirs).
    */
  private def noveltyRollup(perDoc: DataFrame,
                            batch: DataFrame): DataFrame =
    batch.select("doc_id", "source").join(perDoc, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_sh").as("n_sh"),
        sum("n_novel").as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_sh"))
      .orderBy("source")

  /** Oracle twin of [[noveltyReport]] for a batch of docs with
    * `doc_id >= lowerBound` scored against everything before them:
    * global first-occurrence restricted to the batch (base ids all
    * precede batch ids, so index-unseen ∧ batch-first ≡ global-first).
    * `srcPred` excludes docs from the corpus entirely — the
    * NEVER-INGESTED replay the purge query's hash match is judged
    * against (q271).
    */
  private def noveltySql(lowerBound: Long,
                         srcPred: String = "TRUE"): String =
    s"""WITH w AS (
       |  SELECT doc_id, source, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents WHERE $srcPred),
       |sh AS (
       |  SELECT DISTINCT doc_id, source,
       |    unnest(${TextFunctions.shinglesSql("arr")}) AS s
       |  FROM w),
       |f AS (
       |  SELECT doc_id, source,
       |    min(doc_id) OVER (PARTITION BY s) AS first_doc
       |  FROM sh),
       |d AS (
       |  SELECT doc_id, source, count(*)::BIGINT AS n_sh,
       |    sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
       |      AS n_novel
       |  FROM f WHERE doc_id >= $lowerBound GROUP BY 1, 2)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(n_sh)::BIGINT AS n_sh, sum(n_novel)::BIGINT AS n_novel,
       |  (sum(n_novel) * 1000000 // sum(n_sh))::BIGINT AS novelty_ppm
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Folded first-seen map judged end-to-end (q269) — the maintenance
    * half of q266: day 1's shingles publish the base map, day 2's
    * batch FOLDS in ([[FirstSeenIndex.fold]]: one min-union keyed
    * aggregate, no rescan of anything already indexed), and day 3's
    * batch is scored against the FOLDED generation. The oracle
    * computes global first-occurrence over all three days and
    * restricts to day-3 docs — so the hash match proves the folded
    * state holds exactly the base ∪ day-2 map with correct minima,
    * which no single-publish test can show. Since r11 the fold is
    * O(batch) — day 2 commits as a DELTA (tagged, so the
    * publish-if-absent guard extends to it) and the probe resolves
    * the min-union; the committed base is never read or rewritten by
    * the fold (FirstSeenIndexSpec proves the write is batch-sized).
    */
  val foldedNovelty: Q = {
    val S1 = 150L; val S2 = 250L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          col("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-novelty-fold", d, Seq("documents.parquet"))
        if (FirstSeenIndex.resolve(root).isEmpty)
          FirstSeenIndex.publish(
            Dedup.shingleSet(
              docs.filter(col("doc_id") < S1), "doc_id", "text", 3),
            root)
        if (!FirstSeenIndex.folded(root, "day2"))
          FirstSeenIndex.fold(s,
            Dedup.shingleSet(
              docs.filter(col("doc_id") >= S1 && col("doc_id") < S2),
              "doc_id", "text", 3),
            root, tag = "day2")
        val batch = docs.filter(col("doc_id") >= S2)
        val probed = FirstSeenIndex.probe(s,
          Dedup.shingleSet(batch, "doc_id", "text", 3), root)
        noveltyReport(probed, batch)
      },
      noveltySql(S2))
  }

  /** First-seen purge with REASSIGNMENT (q271) — the GDPR chain on
    * the FOURTH index family, and the one with a subtlety none of
    * its siblings have: the tombstoned ids are DOC ids while the map
    * is keyed by SHINGLE with the doc as a value, so purging a doc
    * that introduced a shingle must REASSIGN first occurrence to the
    * next-earliest surviving holder — merely hiding the doc would
    * over-report novelty for matter that still exists in the corpus.
    * Cold path: publish day 1, fold day 2 (O(batch) delta),
    * tombstone every 10th day-1 doc, merge-compact with the
    * surviving corpus's shingles as the repair source
    * ([[FirstSeenIndex.mergeCompact]] — the repair join touches only
    * AFFECTED shingles), vacuum the pre-purge generation. The probe
    * then scores day 3 against physically purged state, and the
    * oracle replays first-occurrence over a corpus where the purged
    * docs were NEVER INGESTED — the hash match proves exact
    * reassignment, not just hiding.
    */
  val noveltyPurge: Q = {
    val S1 = 150L; val S2 = 250L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          col("text"))
        val purged = col("doc_id") < S1 && col("doc_id") % 10 === 0
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-novelty-purge", d, Seq("documents.parquet"))
        if (FirstSeenIndex.resolve(root).isEmpty) {
          FirstSeenIndex.publish(
            Dedup.shingleSet(
              docs.filter(col("doc_id") < S1), "doc_id", "text", 3),
            root)
          FirstSeenIndex.fold(s,
            Dedup.shingleSet(
              docs.filter(col("doc_id") >= S1 && col("doc_id") < S2),
              "doc_id", "text", 3),
            root, tag = "day2")
          FirstSeenIndex.addTombstones(s,
            docs.filter(purged).select("doc_id"), "doc_id", root)
          FirstSeenIndex.mergeCompact(s, root,
            reassignSrc = Some(Dedup.shingleSet(
              docs.filter(col("doc_id") < S2 && !purged),
              "doc_id", "text", 3)))
          FirstSeenIndex.vacuumOld(root)
        }
        val batch = docs.filter(col("doc_id") >= S2)
        noveltyReport(
          FirstSeenIndex.probe(s,
            Dedup.shingleSet(batch, "doc_id", "text", 3), root),
          batch)
      },
      noveltySql(S2, srcPred = s"NOT (doc_id < $S1 AND doc_id % 10 = 0)"))
  }

  /** Streaming novelty gate judged end-to-end (q272) — the r10
    * verdict's empty streaming × novelty cell: the ingestion-gate use
    * case [[graft.operators.FirstSeenIndex]] was built for is
    * continuous by nature, and this is its judged batch twin (the
    * q170/q259/q268 pattern on the fourth family). Batch 0 scores
    * against the committed base and FOLDS IN (tagged delta — the
    * exactly-once boundary), is REDELIVERED and absorbed
    * byte-for-byte, then batch 1 scores against base ∪ batch 0's
    * fold. First-occurrence semantics COMPOSE across the fold
    * boundary, so the oracle is one global first-occurrence pass
    * restricted to the streamed docs — a hash match proves each
    * batch was scored against exactly the pre-batch committed state
    * (a stream that skipped the fold would over-report batch-1
    * novelty; one that re-scored the redelivery after folding would
    * zero batch-0 novelty).
    */
  val noveltyStreamTwin: Q = {
    val S2 = 250L; val B0_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-novelty-stream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-novelty-stream-out", d, Seq("documents.parquet"))
        if (FirstSeenIndex.resolve(idxRoot).isEmpty)
          FirstSeenIndex.publish(
            Dedup.shingleSet(
              docs.filter(col("doc_id") < S2), "doc_id", "text", 3),
            idxRoot)
        val ns = new graft.streaming.NoveltyStream(s, idxRoot, outRoot)
        val b0 = Dedup.shingleSet(
          docs.filter(col("doc_id") >= S2 && col("doc_id") < B0_MAX),
          "doc_id", "text", 3)
        ns.processBatch(b0, 0)
        ns.processBatch(b0, 0) // at-least-once redelivery: absorbed
        ns.processBatch(Dedup.shingleSet(
          docs.filter(col("doc_id") >= B0_MAX), "doc_id", "text", 3), 1)
        noveltyRollup(ns.results(), docs.filter(col("doc_id") >= S2))
      },
      noveltySql(S2))
  }

  /** Judged batch twin of the streaming PQ probe (q268) — q259's
    * snapshot-isolation proof on the SECOND index family the
    * [[graft.streaming.AnnStream]] probe seam serves: batch 0 probes
    * the base PQ generation by ADC, is REDELIVERED (absorbed
    * byte-for-byte from the committed batch dir), a code delta lands
    * ([[PqIndex.appendDelta]] — the re-publish boundary, encoded
    * with the base's frozen codebooks), and batch 1 probes base ∪
    * delta. The oracle's pair predicate IS the isolation contract:
    * batch-0 queries score only base code rows, batch-1 queries
    * score base + delta — a hash match proves each batch was scored
    * against exactly one committed index state, with the delta
    * encoded under frozen (not re-trained) codebooks.
    */
  val pqStreamTwin: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L
    val B0_MAX = 450L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val b0 = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < B0_MAX)
        val b1 = emb.filter(
          col("vec_id") >= B0_MAX && col("vec_id") < Q_MAX)
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-pq-stream-idx", d, Seq("embeddings.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-pq-stream-out", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(idxRoot).isEmpty)
          PqIndex.publish(base, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, idxRoot)
        val ann = new graft.streaming.AnnStream(
          s, idxRoot, outRoot, "vec_id", "embedding", K,
          probeFn = PqIndex.probeTopK)
        ann.processBatch(b0, 0)
        ann.processBatch(b0, 0) // at-least-once redelivery: absorbed
        if (PqIndex.deltas(idxRoot).isEmpty)
          PqIndex.appendDelta(delta, "vec_id", "embedding", idxRoot)
        ann.processBatch(b1, 1)
        ann.results().orderBy("query_id", "rnk")
      },
      s"""WITH $pqEpCtes,
         |ix AS (SELECT * FROM ep WHERE vec_id < $BASE_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |enc AS (SELECT * FROM ep WHERE vec_id < $DELTA_MAX),
         |${pqRankCtes("enc",
             s"q.vec_id >= $DELTA_MAX AND q.vec_id < $Q_MAX",
             s"cd.vec_id < $BASE_MAX OR dt.query_id >= $B0_MAX")}
         |SELECT query_id, index_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Streaming PQ retrieval across a PURGE boundary (q309) — the
    * streaming × delete cell for the quantized ANN family: the
    * serving stream probes committed code tables, a GDPR purge
    * tombstones every 10th indexed vector and merge-compacts between
    * batches, and the family invariant under test is that the purge
    * drops CODE ROWS ONLY — codebooks stay frozen ([[PqIndex
    * .mergeCompact]] carries them forward; re-fitting on the shrunken
    * corpus would move every surviving ADC distance). Batch 0 probes
    * the full index and is REDELIVERED after the purge (absorbed by
    * its committed dir — the pre-purge audit record); batch 1 probes
    * the survivors. The oracle fits codebooks ONCE on the full
    * pre-purge corpus and scores both arms from those codes with a
    * per-arm pair predicate — so a purge that re-trained, a stale
    * probe that kept serving purged codes, or a rewritten batch-0 dir
    * each hash-mismatch.
    */
  val pqPurgeStream: Q = {
    val INDEX_MAX = 400L; val B0_MAX = 450L; val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val b0 = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < B0_MAX)
        val b1 = emb.filter(
          col("vec_id") >= B0_MAX && col("vec_id") < Q_MAX)
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-pq-pstream-idx", d, Seq("embeddings.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-pq-pstream-out", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(idxRoot).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, idxRoot)
        val ann = new graft.streaming.AnnStream(
          s, idxRoot, outRoot, "vec_id", "embedding", K,
          probeFn = PqIndex.probeTopK)
        ann.processBatch(b0, 0) // probes the full pre-purge index
        // the purge: code rows drop, codebooks carry forward frozen
        if (VersionedDirs.versionsOf(idxRoot).size < 2) {
          PqIndex.addTombstones(s,
            index.filter(col("vec_id") % 10 === 0).select("vec_id"),
            "vec_id", idxRoot)
          PqIndex.mergeCompact(s, idxRoot)
        }
        ann.processBatch(b0, 0) // redelivery after the purge: absorbed
        ann.processBatch(b1, 1) // probes the survivors
        ann.results().orderBy("query_id", "rnk")
      },
      s"""WITH $pqEpCtes,
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |enc AS (SELECT * FROM ix),
         |${pqRankCtes("enc",
             s"q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX",
             s"dt.query_id < $B0_MAX OR cd.vec_id % 10 <> 0")}
         |SELECT query_id, index_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Streaming novelty gate across a PURGE boundary (q276) — the last
    * empty lifecycle cell: every stream twin so far crosses an APPEND
    * boundary (q259/q268/q272/q273); this one crosses a DELETE. Batch
    * 0 scores against the PRE-purge committed map and folds in; a
    * GDPR purge then tombstones every 10th base doc and merge-
    * compacts WITH the surviving ingested corpus as the repair
    * source ([[FirstSeenIndex.mergeCompact]] — first occurrence
    * REASSIGNS to the next-earliest surviving holder, and the
    * compaction also folds batch 0's delta); batch 1 scores against
    * the purged-and-repaired generation. The oracle is TWO
    * first-occurrence worlds unioned — batch 0's over the full
    * pre-purge corpus, batch 1's over the never-ingested survivor
    * corpus — so the hash match proves per-batch snapshot isolation
    * across the delete: scoring batch 0 after the purge, skipping
    * the repair, or leaking purged holders into batch 1 each break a
    * different arm.
    */
  val noveltyPurgeStream: Q = {
    val S2 = 250L; val B0_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          col("text"))
        val purged = col("doc_id") < S2 && col("doc_id") % 10 === 0
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-novelty-pstream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-novelty-pstream-out", d, Seq("documents.parquet"))
        if (FirstSeenIndex.resolve(idxRoot).isEmpty)
          FirstSeenIndex.publish(
            Dedup.shingleSet(
              docs.filter(col("doc_id") < S2), "doc_id", "text", 3),
            idxRoot)
        val ns = new graft.streaming.NoveltyStream(s, idxRoot, outRoot)
        ns.processBatch(Dedup.shingleSet(
          docs.filter(col("doc_id") >= S2 && col("doc_id") < B0_MAX),
          "doc_id", "text", 3), 0)
        // the purge: runs exactly once (the compacted generation is
        // the second committed version; vacuum is q271's concern)
        if (VersionedDirs.versionsOf(idxRoot).size < 2) {
          FirstSeenIndex.addTombstones(s,
            docs.filter(purged).select("doc_id"), "doc_id", idxRoot)
          FirstSeenIndex.mergeCompact(s, idxRoot,
            reassignSrc = Some(Dedup.shingleSet(
              docs.filter(col("doc_id") < B0_MAX && !purged),
              "doc_id", "text", 3)))
        }
        ns.processBatch(Dedup.shingleSet(
          docs.filter(col("doc_id") >= B0_MAX), "doc_id", "text", 3), 1)
        noveltyRollup(ns.results(), docs.filter(col("doc_id") >= S2))
      },
      s"""WITH w AS (
         |  SELECT doc_id, source, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, source,
         |    unnest(${TextFunctions.shinglesSql("arr")}) AS s
         |  FROM w),
         |f0 AS (
         |  SELECT doc_id, source,
         |    min(doc_id) OVER (PARTITION BY s) AS first_doc
         |  FROM sh WHERE doc_id < $B0_MAX),
         |d0 AS (
         |  SELECT doc_id, source, count(*)::BIGINT AS n_sh,
         |    sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
         |      AS n_novel
         |  FROM f0 WHERE doc_id >= $S2 GROUP BY 1, 2),
         |f1 AS (
         |  SELECT doc_id, source,
         |    min(doc_id) OVER (PARTITION BY s) AS first_doc
         |  FROM sh WHERE NOT (doc_id < $S2 AND doc_id % 10 = 0)),
         |d1 AS (
         |  SELECT doc_id, source, count(*)::BIGINT AS n_sh,
         |    sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
         |      AS n_novel
         |  FROM f1 WHERE doc_id >= $B0_MAX GROUP BY 1, 2),
         |d AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_sh)::BIGINT AS n_sh, sum(n_novel)::BIGINT AS n_novel,
         |  (sum(n_novel) * 1000000 // sum(n_sh))::BIGINT AS novelty_ppm
         |FROM d GROUP BY source ORDER BY source""".stripMargin)
  }

  /** DSIR-style importance resampling (q277) — targeted data
    * selection (Xie et al. '23, "Data Selection for Language Models
    * via Importance Resampling"): pick from a raw crawl the documents
    * that look most like a target domain, scored entirely through
    * hashed n-gram bucket statistics so neither distribution needs a
    * vocabulary table. Here the target is the `lang = 'en'` slice of
    * the pool (a domain proxy the synthetic corpus actually
    * stratifies on), features are hashed word bigrams in D=1024
    * buckets ([[Hashing.seeded]], q101's in-array bigram construction
    * — no posexplode self-join), and each bucket carries the
    * add-1-smoothed target/raw frequency ratio as an integer
    * per-million: r(b) = (10⁶·(tgt(b)+1)) div (raw(b)+1). Two
    * deliberate departures from the paper, both engine-parity
    * doctrine (q36's tf·N/df rationale): the global constant
    * (R+D)/(T+D) is dropped — it multiplies every bucket equally, so
    * document ranking is invariant — and the per-doc aggregate is the
    * count-weighted MEAN ratio (Σc·r div Σc, integer) rather than the
    * log-ratio sum: a rational surrogate with the same
    * "target-like up, raw-typical down" ordering signal and zero
    * cross-engine float risk (libm `ln` differs in the last ulp; an
    * order-dependent float Σ would break the hash oracle). The mean
    * (not the sum) is the length normalizer — the paper normalizes by
    * sequence slicing instead. Selection = top K docs by
    * (score, doc_id), reported as the per-language pool/selected
    * census: the judged row set proves the resample ENRICHES the
    * target language without zeroing the rest (smoothing keeps
    * unseen-bucket docs alive — classic DSIR behavior). K=100 of the
    * ~500-doc sf0.01 pool.
    *
    * Scale shape: the bucket table is D-bounded (1024 rows →
    * broadcast), the two corpus scans ((b) counts, (doc, b) counts)
    * are corpus-linear exchanges, and the global top-K is
    * TakeOrderedAndProject — per-partition heaps, never a full sort.
    * Int64 headroom: 10⁶·(tgt+1) overflows only past ~9·10¹² bucket
    * occurrences (~petabyte text per bucket at D=1024); past that,
    * widen D before widening the arithmetic.
    */
  val dsirSample: Q = {
    val DSIR_D = 1024; val DSIR_K = 100; val DSIR_SEED = 31
    Q(
      (s, d) => {
        val db = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            TextFunctions.words(col("text")).as("arr"))
          .filter(size(col("arr")) >= 2)
          .select(col("doc_id"), col("lang"),
            explode(transform(sequence(lit(2), size(col("arr"))),
              i => concat(element_at(col("arr"), i - 1), lit(" "),
                element_at(col("arr"), i)))).as("bg"))
          .select(col("doc_id"), col("lang"),
            (Hashing.seeded(DSIR_SEED, col("bg")) % DSIR_D).as("b"))
        val ratios = db.groupBy("b").agg(
            count(lit(1)).as("raw_n"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_n"))
          .selectExpr("b", "(1000000 * (tgt_n + 1)) div (raw_n + 1) AS r")
        val scored = db.groupBy("doc_id", "lang", "b")
          .agg(count(lit(1)).as("c"))
          .join(broadcast(ratios), Seq("b"))
          .groupBy("doc_id", "lang")
          .agg(sum(expr("c * r")).as("sc"), sum("c").as("nb"))
          .selectExpr("doc_id", "lang", "sc div nb AS score")
        val sel = scored.orderBy(desc("score"), asc("doc_id"))
          .limit(DSIR_K)
          .groupBy("lang").agg(count(lit(1)).as("n_sel"))
        scored.groupBy("lang").agg(count(lit(1)).as("n_pool"))
          .join(sel, Seq("lang"), "left")
          .select(col("lang"), col("n_pool"),
            coalesce(col("n_sel"), lit(0L)).as("n_sel"))
          .orderBy("lang")
      },
      s"""WITH w AS (
         |  SELECT doc_id, lang, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents WHERE len(${TextFunctions.wordsSql("text")}) >= 2),
         |i AS (SELECT doc_id, lang, arr, unnest(range(2, len(arr) + 1)) AS i
         |      FROM w),
         |bg AS (
         |  SELECT doc_id, lang,
         |    (${Hashing.seededSql(DSIR_SEED, "arr[i - 1] || ' ' || arr[i]")})
         |      % $DSIR_D AS b
         |  FROM i),
         |rt AS (
         |  SELECT b, count(*)::BIGINT AS raw_n,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS tgt_n
         |  FROM bg GROUP BY b),
         |rs AS (SELECT b, (1000000 * (tgt_n + 1)) // (raw_n + 1) AS r FROM rt),
         |c AS (SELECT doc_id, lang, b, count(*)::BIGINT AS c
         |      FROM bg GROUP BY 1, 2, 3),
         |ds AS (
         |  SELECT doc_id, lang, (sum(c * r) // sum(c))::BIGINT AS score
         |  FROM c JOIN rs USING (b) GROUP BY doc_id, lang),
         |sel AS (
         |  SELECT lang, count(*)::BIGINT AS n_sel FROM (
         |    SELECT * FROM ds ORDER BY score DESC, doc_id LIMIT $DSIR_K)
         |  GROUP BY lang),
         |pool AS (SELECT lang, count(*)::BIGINT AS n_pool FROM ds GROUP BY lang)
         |SELECT p.lang, p.n_pool, coalesce(s.n_sel, 0)::BIGINT AS n_sel
         |FROM pool p LEFT JOIN sel s USING (lang)
         |ORDER BY p.lang""".stripMargin)
  }

  /** Integer BM25 retrieval (q278) — the lexical ranking half the
    * retrieval family lacked: q64 builds the inverted index, q36
    * scores tf·idf, q199 fuses ranked lists, but none implements the
    * BM25 scoring function (Robertson & Zaragoza '09) that production
    * lexical search actually runs. k1 = 1.2 and b = 0.75 (the
    * textbook defaults) are carried as ×10⁴-scaled integers; the
    * term-frequency saturation tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    * becomes one integer division per (doc, term) with dl/avgdl as
    * (dl·N) div Σdl, and idf is the Robertson–Sparck Jones odds
    * (N−df+½)/(df+½) as (2(N−df)+1)·1000 div (2df+1) — the rational
    * surrogate WITHOUT the log (q36's doctrine: rank-monotone in df,
    * zero libm risk; the log only compresses the tail). All sums are
    * integer sums, so the oracle hash-matches bit-for-bit. The query
    * is self-derived so it exists at every scale factor: the five
    * vocabulary terms ranked 20–24 by (df DESC, term) — mid-head
    * terms common enough to match many docs, rare enough that tf
    * saturation and length normalization decide the ranking. Output:
    * top 20 docs by score with the matched-term count.
    *
    * Scale shape: the qt derivation is orderBy+limit —
    * TakeOrderedAndProject, a per-partition top-24 + driver merge,
    * never a global sort of the vocabulary — and the row_number that
    * picks ranks 20–24 runs over the ≤24-row result, not the vocab;
    * the 5-row query set and the 1-row (N, Σdl) aggregate broadcast;
    * tf→score is one doc-keyed join + groupBy; top-20 is
    * TakeOrderedAndProject.
    */
  val bm25: Q = {
    val K = 20
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = t(s, d, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.words(col("text"))).as("term"))
          .filter(length(col("term")) > 0)
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val df = tok.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        val st = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sumdl"))
        // top-24 via orderBy+limit (TakeOrderedAndProject) FIRST, so
        // the ranking window below sees ≤ 24 rows — never a
        // single-partition sort of the whole vocabulary
        val qt = df
          .orderBy(desc("df"), asc("term")).limit(24)
          .withColumn("rnk", row_number().over(
            Window.orderBy(desc("df"), asc("term"))))
          .filter(col("rnk") >= 20 && col("rnk") <= 24)
          .select("term", "df")
        tf.join(broadcast(qt), Seq("term"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(st))
          // the ONE shared definition of the BM25 contribution
          // (LexIndex.contribSql) — q279-q284 and the persisted
          // index's probe all score with this exact expression
          .selectExpr("doc_id",
            s"${graft.operators.LexIndex.contribSql("tf", "df", "dl",
              "n_docs", "sumdl", "div")} AS contrib")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hit"), sum("contrib").as("score"))
          .orderBy(desc("score"), asc("doc_id"))
          .limit(K)
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM w)
         |  WHERE length(t) > 0),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |       FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
         |df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
         |       FROM tok GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sumdl
         |       FROM dl),
         |qt AS (
         |  SELECT term, df FROM (
         |    SELECT term, df,
         |      row_number() OVER (ORDER BY df DESC, term) AS rnk FROM df)
         |  WHERE rnk BETWEEN 20 AND 24),
         |sc AS (
         |  SELECT f.doc_id,
         |    ${graft.operators.LexIndex.contribSql(
               "f.tf", "q.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
         |  FROM tf f JOIN qt q USING (term) JOIN dl l USING (doc_id)
         |  CROSS JOIN st)
         |SELECT doc_id, count(*)::BIGINT AS n_hit, sum(contrib)::BIGINT AS score
         |FROM sc GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT $K""".stripMargin)
  }

  // ---- persisted lexical index (LexIndex, the fifth family) --------

  private val LEX_K = 10

  /** Three 5-term queries self-derived from `base`'s df ranking
    * (ranks 20–34 → query_id 0/1/2) — q278's existence-at-every-sf
    * trick, batched. Shared by q279–q281.
    */
  private def lexQueryTerms(base: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // top-34 via orderBy+limit (TakeOrderedAndProject) FIRST; the
    // ranking window then runs over ≤ 34 rows — never a
    // single-partition sort of the whole vocabulary (q278's rule)
    base.select(col("doc_id"),
        explode(TextFunctions.words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("term")).limit(34)
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("df"), asc("term"))))
      .filter(col("rnk") >= 20 && col("rnk") <= 34)
      .selectExpr("(rnk - 20) div 5 AS query_id", "term")
  }

  /** The DuckDB replay of a [[graft.operators.LexIndex.bm25TopK]]
    * probe: query terms derived from the `qtPred` corpus slice,
    * scoring (tf/dl/df and the collection stats) over the
    * `corpusPred` slice — the split is what lets one builder express
    * the base (q279: same slice), append (q280: stats over the grown
    * corpus) and purge (q281: stats over the survivors) semantics.
    * The contribution arithmetic is the operator's OWN
    * [[graft.operators.LexIndex.contribSql]] with `//`, so the two
    * engines cannot drift.
    */
  private def lexOracleSql(corpusPred: String, qtPred: String): String =
    s"""WITH wq AS (
       |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents WHERE $qtPred),
       |tokq AS (
       |  SELECT DISTINCT doc_id, t AS term FROM (
       |    SELECT doc_id, unnest(arr) AS t FROM wq)
       |  WHERE length(t) > 0),
       |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tokq GROUP BY 1),
       |qt AS (
       |  SELECT (rnk - 20) // 5 AS query_id, term FROM (
       |    SELECT term,
       |      row_number() OVER (ORDER BY df DESC, term) AS rnk FROM dfq)
       |  WHERE rnk BETWEEN 20 AND 34),
       |w AS (
       |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents WHERE $corpusPred),
       |tok AS (
       |  SELECT doc_id, t AS term FROM (
       |    SELECT doc_id, unnest(arr) AS t FROM w)
       |  WHERE length(t) > 0),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       |       FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
       |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sumdl
       |       FROM dl),
       |sc AS (
       |  SELECT q.query_id, f.doc_id AS index_id,
       |    ${graft.operators.LexIndex.contribSql(
             "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
       |  FROM tf f JOIN qt q USING (term) JOIN df d USING (term)
       |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN st),
       |ag AS (
       |  SELECT query_id, index_id, count(*)::BIGINT AS n_hit,
       |    sum(contrib)::BIGINT AS score
       |  FROM sc GROUP BY 1, 2),
       |rk AS (
       |  SELECT ag.*, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, index_id) AS rnk FROM ag)
       |SELECT query_id, index_id, n_hit, score, CAST(rnk AS BIGINT) AS rnk
       |FROM rk WHERE rnk <= $LEX_K
       |ORDER BY query_id, rnk""".stripMargin

  /** Persisted lexical index probe (q279) — q278's BM25 served from
    * the [[graft.operators.LexIndex]] artifact instead of an in-plan
    * recompute: postings published once per data version
    * (term-bucket-partitioned, tf and dl denormalized per row,
    * collection stats frozen in the `_stats.json` sidecar), probed by
    * three self-derived 5-term queries at batch cost — the scan pays
    * only the partition dirs the query terms touch. The oracle
    * replays BM25 from the raw corpus with the operator's own
    * contribution SQL, so the hash match proves the artifact's
    * postings, df derivation and frozen stats all equal the
    * from-scratch computation.
    */
  val lexIndexProbe: Q = {
    val INDEX_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") < INDEX_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-lex-index", d, Seq("documents.parquet"))
        if (LexIndex.resolve(root).isEmpty)
          LexIndex.publish(base, "doc_id", "text", root)
        LexIndex.bm25TopK(s, lexQueryTerms(base), "query_id", "term",
            LEX_K, root)
          .orderBy("query_id", "rnk")
      },
      lexOracleSql(s"doc_id < 400", s"doc_id < 400"))
  }

  /** Lexical index delta append (q280) — the growth half: a new doc
    * batch lands as a postings delta with its OWN stats sidecar, and
    * the probe serves base ∪ delta with N' = N + ΔN, Σdl' = Σdl +
    * ΔΣdl — so df, idf and the length normalizer all shift exactly
    * as a from-scratch index over the grown corpus would. That shift
    * is the whole proof burden: the oracle derives its queries from
    * the BASE slice but scores over the grown corpus, so a probe
    * serving stale collection stats (the easy bug: freezing N at
    * publish) hash-mismatches every score.
    */
  val lexIndexAppend: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") < BASE_MAX)
        val delta = docs.filter(
          col("doc_id") >= BASE_MAX && col("doc_id") < DELTA_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-lex-append", d, Seq("documents.parquet"))
        if (LexIndex.resolve(root).isEmpty)
          LexIndex.publish(base, "doc_id", "text", root)
        if (LexIndex.deltas(root).isEmpty)
          LexIndex.appendDelta(delta, "doc_id", "text", root)
        LexIndex.bm25TopK(s, lexQueryTerms(base), "query_id", "term",
            LEX_K, root)
          .orderBy("query_id", "rnk")
      },
      lexOracleSql(s"doc_id < 400", s"doc_id < 300"))
  }

  /** Lexical index purge (q281) — the GDPR chain on the fifth
    * family, with a proof burden the vector families don't have:
    * deleting documents changes the COLLECTION STATISTICS (N, Σdl,
    * df), not just the row set, so a compaction that drops rows but
    * carries the old sidecar forward still ranks wrong. Tombstone →
    * mergeCompact (exact stats recompute from the surviving
    * postings) → probe; the oracle is a never-ingested index over
    * the survivors, so the hash match proves rows AND statistics
    * both equal a fresh publish of the post-purge corpus.
    */
  val lexIndexPurge: Q = {
    val INDEX_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") < INDEX_MAX)
        val purged = col("doc_id") % 10 === 0
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-lex-purge", d, Seq("documents.parquet"))
        if (LexIndex.resolve(root).isEmpty)
          LexIndex.publish(base, "doc_id", "text", root)
        if (VersionedDirs.versionsOf(root).size < 2) {
          LexIndex.addTombstones(s,
            base.filter(purged).select("doc_id"), "doc_id", root)
          LexIndex.mergeCompact(s, root)
        }
        LexIndex.bm25TopK(s,
            lexQueryTerms(base.filter(!purged)), "query_id", "term",
            LEX_K, root)
          .orderBy("query_id", "rnk")
      },
      lexOracleSql(s"doc_id < 400 AND NOT (doc_id % 10 = 0)",
        s"doc_id < 400 AND NOT (doc_id % 10 = 0)"))
  }

  /** Judged batch twin of the streaming lexical gate (q283) — the
    * streaming × lexical cell: [[graft.streaming.LexStream]] probes
    * each arriving doc batch against the PRE-BATCH committed
    * [[graft.operators.LexIndex]] state, then ingests it as a tagged
    * postings delta. Batch 0 (docs 300–349) scores against the base
    * index (docs < 300) and is REDELIVERED — absorbed through the
    * committed topk dir and the tagged delta; batch 1 (docs 350–399)
    * scores against base ∪ batch 0, whose append shifted N, Σdl and
    * df. The oracle unions two BM25 worlds — batch-0 queries over the
    * <300 corpus with its stats, batch-1 queries over the <350 corpus
    * with the GROWN stats — so the hash match proves per-batch
    * snapshot isolation AND that the collection-statistics shift
    * landed at exactly the batch boundary (the burden no vector
    * stream has: their scores don't depend on corpus-level stats).
    */
  val lexStreamTwin: Q = {
    val BASE_MAX = 300L; val B0_MAX = 350L; val Q_MAX = 400L; val K = 3
    def world(i: Int, corpusHi: Long, qLo: Long, qHi: Long): String =
      s"""tf$i AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |         FROM tok WHERE doc_id < $corpusHi GROUP BY 1, 2),
         |dl$i AS (SELECT doc_id, count(*)::BIGINT AS dl
         |         FROM tok WHERE doc_id < $corpusHi GROUP BY 1),
         |df$i AS (SELECT term, count(*)::BIGINT AS df FROM tf$i GROUP BY 1),
         |st$i AS (SELECT count(*)::BIGINT AS n_docs,
         |           sum(dl)::BIGINT AS sumdl FROM dl$i),
         |qt$i AS (
         |  SELECT DISTINCT doc_id AS query_id, term FROM tok
         |  WHERE doc_id >= $qLo AND doc_id < $qHi),
         |sc$i AS (
         |  SELECT q.query_id, f.doc_id AS index_id,
         |    ${graft.operators.LexIndex.contribSql(
               "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
         |  FROM tf$i f JOIN qt$i q USING (term) JOIN df$i d USING (term)
         |  JOIN dl$i l ON l.doc_id = f.doc_id CROSS JOIN st$i),
         |ag$i AS (
         |  SELECT query_id, index_id, count(*)::BIGINT AS n_hit,
         |    sum(contrib)::BIGINT AS score
         |  FROM sc$i GROUP BY 1, 2),
         |rk$i AS (
         |  SELECT ag$i.*, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, index_id) AS rnk FROM ag$i)"""
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-stream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-stream-out", d, Seq("documents.parquet"))
        if (LexIndex.resolve(idxRoot).isEmpty)
          LexIndex.publish(docs.filter(col("doc_id") < BASE_MAX),
            "doc_id", "text", idxRoot)
        val ls = new graft.streaming.LexStream(
          s, idxRoot, outRoot, "doc_id", "text", K)
        val b0 = docs.filter(
          col("doc_id") >= BASE_MAX && col("doc_id") < B0_MAX)
        ls.processBatch(b0, 0)
        ls.processBatch(b0, 0) // at-least-once redelivery: absorbed
        ls.processBatch(docs.filter(
          col("doc_id") >= B0_MAX && col("doc_id") < Q_MAX), 1)
        ls.results().orderBy("query_id", "rnk")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents WHERE doc_id < $Q_MAX),
         |tok AS (
         |  SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM w)
         |  WHERE length(t) > 0),
         |${world(0, BASE_MAX, BASE_MAX, B0_MAX)},
         |${world(1, B0_MAX, B0_MAX, Q_MAX)}
         |SELECT query_id, index_id, n_hit, score, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT * FROM rk0 WHERE rnk <= $K
         |      UNION ALL SELECT * FROM rk1 WHERE rnk <= $K)
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Streaming lexical gate across a PURGE boundary (q307) — the
    * streaming × delete cell for the lexical family, whose burden is
    * again the one no vector family has: the purge shifts the
    * COLLECTION STATISTICS (N, Σdl, df), so batch 1 must score with
    * stats recomputed from the survivors, not just a smaller row set.
    * Batch 0 probes the base and ingests (tag b0, with
    * [[graft.streaming.LexStream]]'s durable `ingested.bN` marker);
    * the purge tombstones every 10th doc of the grown corpus —
    * including batch-0 docs — and merge-compacts (folding the delta,
    * dropping the purged rows, recomputing stats exactly); batch 0
    * REDELIVERS (probe absorbed by its committed dir, ingest by the
    * marker — the durable closure that outlives `_folded.json`'s
    * pruning horizon); batch 1 probes the survivor world. The oracle
    * unions two BM25 worlds — batch-0 queries over the full pre-purge
    * base, batch-1 queries over the never-ingested survivor corpus
    * with its own stats — so stale stats, a lost purge, or a
    * double-ingested redelivery each hash-mismatch a different arm.
    */
  val lexPurgeStream: Q = {
    val BASE_MAX = 300L; val B0_MAX = 350L; val Q_MAX = 400L; val K = 3
    def world(i: Int, corpusPred: String, qLo: Long, qHi: Long): String =
      s"""tf$i AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |         FROM tok WHERE $corpusPred GROUP BY 1, 2),
         |dl$i AS (SELECT doc_id, count(*)::BIGINT AS dl
         |         FROM tok WHERE $corpusPred GROUP BY 1),
         |df$i AS (SELECT term, count(*)::BIGINT AS df FROM tf$i GROUP BY 1),
         |st$i AS (SELECT count(*)::BIGINT AS n_docs,
         |           sum(dl)::BIGINT AS sumdl FROM dl$i),
         |qt$i AS (
         |  SELECT DISTINCT doc_id AS query_id, term FROM tok
         |  WHERE doc_id >= $qLo AND doc_id < $qHi),
         |sc$i AS (
         |  SELECT q.query_id, f.doc_id AS index_id,
         |    ${graft.operators.LexIndex.contribSql(
               "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
         |  FROM tf$i f JOIN qt$i q USING (term) JOIN df$i d USING (term)
         |  JOIN dl$i l ON l.doc_id = f.doc_id CROSS JOIN st$i),
         |ag$i AS (
         |  SELECT query_id, index_id, count(*)::BIGINT AS n_hit,
         |    sum(contrib)::BIGINT AS score
         |  FROM sc$i GROUP BY 1, 2),
         |rk$i AS (
         |  SELECT ag$i.*, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, index_id) AS rnk FROM ag$i)"""
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-pstream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-pstream-out", d, Seq("documents.parquet"))
        if (LexIndex.resolve(idxRoot).isEmpty)
          LexIndex.publish(docs.filter(col("doc_id") < BASE_MAX),
            "doc_id", "text", idxRoot)
        val ls = new graft.streaming.LexStream(
          s, idxRoot, outRoot, "doc_id", "text", K)
        val b0 = docs.filter(
          col("doc_id") >= BASE_MAX && col("doc_id") < B0_MAX)
        ls.processBatch(b0, 0)
        // the purge: every 10th doc of the GROWN corpus (batch-0 docs
        // included), stats recomputed exactly from the survivors
        if (VersionedDirs.versionsOf(idxRoot).size < 2) {
          LexIndex.addTombstones(s,
            docs.filter(col("doc_id") < B0_MAX &&
              col("doc_id") % 10 === 0).select("doc_id"),
            "doc_id", idxRoot)
          LexIndex.mergeCompact(s, idxRoot)
        }
        // at-least-once redelivery AFTER the purge consumed the
        // delta — probe and ingest both absorbed, on every run
        ls.processBatch(b0, 0)
        ls.processBatch(docs.filter(
          col("doc_id") >= B0_MAX && col("doc_id") < Q_MAX), 1)
        ls.results().orderBy("query_id", "rnk")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents WHERE doc_id < $Q_MAX),
         |tok AS (
         |  SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM w)
         |  WHERE length(t) > 0),
         |${world(0, s"doc_id < $BASE_MAX", BASE_MAX, B0_MAX)},
         |${world(1, s"doc_id < $B0_MAX AND doc_id % 10 <> 0",
             B0_MAX, Q_MAX)}
         |SELECT query_id, index_id, n_hit, score, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT * FROM rk0 WHERE rnk <= $K
         |      UNION ALL SELECT * FROM rk1 WHERE rnk <= $K)
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** nDCG@10 of the persisted ANN probe (q284) — the graded member
    * that completes the retrieval-eval family: q96/q243 measure
    * recall@K (set overlap, position-blind), q256 MRR (first hit
    * only); nDCG weights EVERY position by a graded gain, which is
    * what ranking regressions that keep the set but scramble the
    * order actually move. Truth grades derive from the exact-cosine
    * rank (top-2 → gain 7, top-5 → 3, top-10 → 1, else 0 — the
    * 2^g − 1 gains of standard nDCG); the probe arm is the SHARED
    * [[graft.operators.SimIndex]] artifact (q243's root). Position
    * discount is the FLOOR-log₂ surrogate: gain·10⁶ div ⌊log₂(i+1)⌋
    * via `length(bin(i+1)) − 1`, an exact integer on both engines
    * (the proven q157 digit trick) — positions 2–3 share a discount,
    * the price of a libm-free hash-exact metric (the q36 doctrine;
    * the continuous-log refinement changes no ordering of whole
    * queries, only compresses within bands). IDCG replays the same
    * discount over the truth ranking itself, so ndcg_ppm = 10⁶ ·
    * DCG/IDCG is 10⁶ exactly when the probe reproduces the exact
    * order, and degrades per displaced position.
    */
  val annNdcg: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 500L; val K = 10
    val SCALE = 1000000L
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-sim-index", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(root).isEmpty) {
          val r = VectorFunctions.mtBits(index.count())
          SimIndex.publish(index, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), root)
        }
        val exact = Similarity.bruteForceTopK(
            index, queries, "vec_id", "embedding", K)
          .select(col("query_id"), col("vec_id").as("index_id"),
            col("rnk"))
          .withColumn("gain", when(col("rnk") <= 2, 7L)
            .when(col("rnk") <= 5, 3L).otherwise(1L))
        val probe = SimIndex.probeTopK(s, queries, "vec_id",
            "embedding", K, root)
          .select(col("query_id"), col("index_id"),
            col("rnk").as("prnk"))
        val dcg = probe
          .join(exact.select("query_id", "index_id", "gain"),
            Seq("query_id", "index_id"), "left")
          .na.fill(0L, Seq("gain"))
          .selectExpr("query_id",
            s"(gain * $SCALE) div (length(bin(prnk + 1)) - 1) AS c")
          .groupBy("query_id").agg(sum("c").as("dcg"))
        val idcg = exact
          .selectExpr("query_id",
            s"(gain * $SCALE) div (length(bin(rnk + 1)) - 1) AS c")
          .groupBy("query_id").agg(sum("c").as("idcg"))
        queries.select(col("vec_id").as("query_id"))
          .join(dcg, Seq("query_id"), "left")
          .na.fill(0L, Seq("dcg"))
          .join(idcg, Seq("query_id"))
          .selectExpr("query_id", "dcg", "idcg",
            s"(dcg * $SCALE) div idcg AS ndcg_ppm")
          .orderBy("query_id")
      },
      s"""WITH idx AS (SELECT vec_id, embedding FROM embeddings
         |             WHERE vec_id < $INDEX_MAX),
         |${mtCtes("idx")},
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |ascore AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  GROUP BY 1, 2),
         |ar AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM ascore),
         |ap AS (SELECT query_id, index_id, rnk AS prnk FROM ar
         |       WHERE rnk <= $K),
         |qx AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |       FROM embeddings
         |       WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
         |cx AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM idx),
         |bs AS (
         |  SELECT query_id, vec_id AS index_id,
         |    round(list_dot_product(qv, v) /
         |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
         |      AS cos_sim
         |  FROM qx JOIN cx ON vec_id <> query_id),
         |br AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM bs),
         |ex AS (
         |  SELECT query_id, index_id, rnk,
         |    CASE WHEN rnk <= 2 THEN 7 WHEN rnk <= 5 THEN 3 ELSE 1 END
         |      AS gain
         |  FROM br WHERE rnk <= $K),
         |dcg AS (
         |  SELECT p.query_id,
         |    sum((coalesce(e.gain, 0) * $SCALE) //
         |        (length(bin(p.prnk + 1)) - 1))::BIGINT AS dcg
         |  FROM ap p LEFT JOIN ex e
         |    ON e.query_id = p.query_id AND e.index_id = p.index_id
         |  GROUP BY 1),
         |idcg AS (
         |  SELECT query_id,
         |    sum((gain * $SCALE) // (length(bin(rnk + 1)) - 1))::BIGINT
         |      AS idcg
         |  FROM ex GROUP BY 1),
         |qs AS (SELECT vec_id AS query_id FROM embeddings
         |       WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX)
         |SELECT q.query_id, coalesce(d.dcg, 0)::BIGINT AS dcg, i.idcg,
         |  ((coalesce(d.dcg, 0) * $SCALE) // i.idcg)::BIGINT AS ndcg_ppm
         |FROM qs q LEFT JOIN dcg d USING (query_id)
         |JOIN idcg i USING (query_id)
         |ORDER BY query_id""".stripMargin)
  }

  /** Artifact-served hybrid retrieval (q282) — q199's RAG-serving
    * fusion moved onto COMMITTED indexes: the lexical arm is a
    * [[graft.operators.LexIndex.bm25TopK]] probe of q279's shared
    * lex artifact (the incoming query docs' own term bags as the
    * query), the vector arm is a [[graft.operators.SimIndex]] probe
    * of q243's shared LSH artifact (the same docs' embeddings — the
    * corpus aligns doc_id ≡ vec_id), and the arms fuse by integer
    * Borda points (q199's exact-int64 doctrine; RRF's 1/(60+r)
    * doubles are non-associative). Three committed artifacts-worth of
    * serving state, zero corpus scans at query time: both probes are
    * bucket/term-partition-pruned batch-cost reads — the
    * derive-once/consume-many doctrine composing across MODALITIES.
    * The oracle replays full BM25 + the multi-table LSH probe + the
    * fusion from the raw tables, so the hash match proves both
    * artifacts served exactly the from-scratch rankings.
    */
  val hybridIndexServe: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 410L; val K = 10; val F = 5
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") < INDEX_MAX)
        val lexRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-index", d, Seq("documents.parquet"))
        if (LexIndex.resolve(lexRoot).isEmpty)
          LexIndex.publish(base, "doc_id", "text", lexRoot)
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val simRoot = graft.sources.Artifacts.versionedRoot(
          "graft-sim-index", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(simRoot).isEmpty) {
          val r = VectorFunctions.mtBits(index.count())
          SimIndex.publish(index, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), simRoot)
        }
        val qdocs = docs.filter(
          col("doc_id") >= INDEX_MAX && col("doc_id") < Q_MAX)
        val qterms = qdocs.select(col("doc_id").as("query_id"),
            explode(TextFunctions.words(col("text"))).as("term"))
          .filter(length(col("term")) > 0).distinct()
        val lexTop = LexIndex.bm25TopK(s, qterms, "query_id", "term",
            K, lexRoot)
          .select(col("query_id"), col("index_id").as("doc_id"),
            (lit(K + 1) - col("rnk")).cast("long").as("lex_pts"))
        val qvec = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val vecTop = SimIndex.probeTopK(s, qvec, "vec_id", "embedding",
            K, simRoot)
          .select(col("query_id"), col("index_id").as("doc_id"),
            (lit(K + 1) - col("rnk")).cast("long").as("vec_pts"))
        val fused = lexTop
          .join(vecTop, Seq("query_id", "doc_id"), "full_outer")
          .na.fill(0L, Seq("lex_pts", "vec_pts"))
          .withColumn("borda", col("lex_pts") + col("vec_pts"))
        val wf = Window.partitionBy("query_id")
          .orderBy(desc("borda"), asc("doc_id"))
        fused.withColumn("rnk", row_number().over(wf).cast("long"))
          .filter(col("rnk") <= F)
          .select("query_id", "doc_id", "lex_pts", "vec_pts", "borda",
            "rnk")
          .orderBy("query_id", "rnk")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents WHERE doc_id < $INDEX_MAX),
         |tok AS (
         |  SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM w)
         |  WHERE length(t) > 0),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |       FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
         |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sumdl
         |       FROM dl),
         |wq AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents WHERE doc_id >= $INDEX_MAX AND doc_id < $Q_MAX),
         |qt AS (
         |  SELECT DISTINCT doc_id AS query_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM wq)
         |  WHERE length(t) > 0),
         |sc AS (
         |  SELECT q.query_id, f.doc_id AS index_id,
         |    ${graft.operators.LexIndex.contribSql(
               "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
         |  FROM tf f JOIN qt q USING (term) JOIN df d USING (term)
         |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN st),
         |ag AS (
         |  SELECT query_id, index_id, sum(contrib)::BIGINT AS score
         |  FROM sc GROUP BY 1, 2),
         |lexr AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, index_id) AS r
         |  FROM ag),
         |lextop AS (
         |  SELECT query_id, index_id AS doc_id,
         |    (${K + 1} - r)::BIGINT AS lex_pts
         |  FROM lexr WHERE r <= $K),
         |idx AS (SELECT vec_id, embedding FROM embeddings
         |        WHERE vec_id < $INDEX_MAX),
         |${mtCtes("idx")},
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |ascore AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  GROUP BY 1, 2),
         |ar AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM ascore),
         |vectop AS (
         |  SELECT query_id, index_id AS doc_id,
         |    (${K + 1} - rnk)::BIGINT AS vec_pts
         |  FROM ar WHERE rnk <= $K),
         |fused AS (
         |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         |    coalesce(l.doc_id, v.doc_id) AS doc_id,
         |    coalesce(l.lex_pts, 0)::BIGINT AS lex_pts,
         |    coalesce(v.vec_pts, 0)::BIGINT AS vec_pts
         |  FROM lextop l FULL OUTER JOIN vectop v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
         |fr AS (
         |  SELECT query_id, doc_id, lex_pts, vec_pts,
         |    (lex_pts + vec_pts)::BIGINT AS borda,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY lex_pts + vec_pts DESC, doc_id)
         |      AS r
         |  FROM fused)
         |SELECT query_id, doc_id, lex_pts, vec_pts, borda, r::BIGINT AS rnk
         |FROM fr WHERE r <= $F ORDER BY query_id, rnk""".stripMargin)
  }

  /** Judged batch twin of the streaming IVFPQ probe (q273) — the
    * q268 snapshot-isolation proof with the PRUNED serving path on
    * the seam: the [[graft.streaming.AnnStream]] probe seam takes a
    * partially-applied [[PqIndex.probeTopK]] with nprobe (any
    * committed-index top-k of the shared shape — the r11
    * empty-schema fix makes lambdas first-class here), so every
    * micro-batch pays coarse-cell partition pruning before ADC.
    * Batch 0 probes the base IVFPQ generation, is REDELIVERED
    * (absorbed from the committed batch dir), a code delta lands —
    * encoded with the frozen PQ codebooks AND assigned ccells by the
    * frozen coarse centroids, so base and delta dirs stay prunable
    * by one probed-cell set — and batch 1 probes base ∪ delta. The
    * oracle replays coarse fit → cell assign → probe cells →
    * candidate pruning → PQ fit → encode → ADC with the isolation
    * predicate (batch-0 queries score only base vectors), so the
    * hash match proves per-batch snapshot isolation AND that the
    * pruning algebra held across the append boundary.
    */
  val ivfPqStreamTwin: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L
    val B0_MAX = 450L; val Q_MAX = 500L; val K = 3; val NPROBE = 2
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val b0 = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < B0_MAX)
        val b1 = emb.filter(
          col("vec_id") >= B0_MAX && col("vec_id") < Q_MAX)
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-stream-idx", d, Seq("embeddings.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-stream-out", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(idxRoot).isEmpty)
          PqIndex.publish(base, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, idxRoot,
            coarseC = KM_C, coarseIters = KM_ITERS)
        val ann = new graft.streaming.AnnStream(
          s, idxRoot, outRoot, "vec_id", "embedding", K,
          probeFn = (sp, b, id, vec, k, root) =>
            PqIndex.probeTopK(sp, b, id, vec, k, root, NPROBE))
        ann.processBatch(b0, 0)
        ann.processBatch(b0, 0) // at-least-once redelivery: absorbed
        if (PqIndex.deltas(idxRoot).isEmpty)
          PqIndex.appendDelta(delta, "vec_id", "embedding", idxRoot)
        ann.processBatch(b1, 1)
        ann.results().orderBy("query_id", "rnk")
      },
      s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $BASE_MAX")},
         |fa AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
         |  FROM e JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY e.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id < $DELTA_MAX) WHERE rnk = 1),
         |qa AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id >= $DELTA_MAX AND vec_id < $Q_MAX)
         |  WHERE rnk <= $NPROBE),
         |cand AS (
         |  SELECT qa.query_id, ca.vec_id
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.query_id
         |  WHERE ca.vec_id < $BASE_MAX OR qa.query_id >= $B0_MAX),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM e),
         |ix AS (SELECT * FROM ep WHERE vec_id < $BASE_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ib.vec_id, c.sub, c.cell,
         |    sum((ib.xs - c.cs) * (ib.xs - c.cs)) AS d2
         |  FROM ep ib JOIN pc$PQ_ITERS c
         |    ON ib.sub = c.sub AND ib.sdim = c.sdim
         |  WHERE ib.vec_id < $DELTA_MAX
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |dtab AS (
         |  SELECT q.vec_id AS query_id, c.sub, c.cell,
         |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
         |  FROM ep q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
         |  WHERE q.vec_id >= $DELTA_MAX AND q.vec_id < $Q_MAX
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT cand.query_id, cd.vec_id AS index_id,
         |    sum(dt.d2)::BIGINT AS adc_d2
         |  FROM cand
         |  JOIN codes cd ON cd.vec_id = cand.vec_id
         |  JOIN dtab dt ON dt.query_id = cand.query_id
         |    AND dt.sub = cd.sub AND dt.cell = cd.cell
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, adc_d2,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc_d2, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Incremental novelty with a PERSISTED first-seen map (q266) —
    * q264 at the ingestion gate: once the corpus's (shingle → first
    * introducing doc) map lives as a committed artifact
    * ([[graft.operators.FirstSeenIndex]], the fourth persisted-index
    * family), scoring a daily batch for repeated sub-document matter
    * costs the BATCH, not the corpus — probe the committed map
    * (bucket-pruned keyed join, index side read pre-partitioned),
    * take within-batch firsts from one window-min, and a batch
    * shingle is novel iff the index never saw it AND no earlier
    * batch doc introduced it. The oracle computes global
    * first-occurrence over base ∪ batch and restricts the report to
    * batch docs — base ids all precede batch ids, so the two rules
    * coincide exactly and the hash match proves the artifact holds
    * precisely the base map ([[FirstSeenIndex.fold]], the
    * post-score maintenance min-union, is spec-tested).
    */
  val incrementalNovelty: Q = {
    val SPLIT = 250L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          col("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-novelty-index", d, Seq("documents.parquet"))
        if (FirstSeenIndex.resolve(root).isEmpty)
          FirstSeenIndex.publish(
            Dedup.shingleSet(
              docs.filter(col("doc_id") < SPLIT), "doc_id", "text", 3),
            root)
        val batch = docs.filter(col("doc_id") >= SPLIT)
        val probed = FirstSeenIndex.probe(s,
          Dedup.shingleSet(batch, "doc_id", "text", 3), root)
        noveltyReport(probed, batch)
      },
      noveltySql(SPLIT))
  }

  /** Real binary decode at the multimodal seam (q244) — the round-8
    * gap closer: every document is rendered as a COMPLETE RIFF/WAVE
    * file (canonical 44-byte little-endian header + 16-bit PCM
    * payload, playable bytes — [[Multimodal.wavBytes]]), and the
    * judged pipeline then reads the container back from the BYTES
    * ALONE: magic-tag validation, LE32 sample-rate and data-size
    * fields, two's-complement s16le samples ([[Multimodal.leRead]]),
    * composed into 16-sample frame energies and a per-source audio
    * report. The oracle recomputes every expected value from the
    * source data without ever seeing the bytes, so one wrong byte
    * anywhere — endianness, header offset, complement math — breaks
    * the hash. Sample rate varies per doc (parsed, not assumed) and
    * n_valid counts header validations, so the decode can't be
    * bypassed. The per-sample `transform` at the ENCODE seam is
    * bounded (≤ [[48]] elements/doc) and sits exactly where a codec
    * call would; decode is flat codegen substr/hex/conv. Scale: one
    * scan, per-doc-bounded explode, two map-side-combinable
    * aggregations — the q93 media family's cost envelope.
    */
  val wavDecode: Q = {
    val MAX_S = 48
    Q(
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"))
          .filter(length(col("text")) >= 1)
        val n = least(length(col("text")), lit(MAX_S))
        val rate = (lit(8000L) + (col("doc_id") % 3) * 4000L)
        def sample(i: Column): Column =
          ((ascii(col("text").substr(i, lit(1))) % 64) - 32) * 500
        val enc = base.select(col("doc_id"), col("source"),
          Multimodal.wavBytes(rate, n, sample).as("wav"))
        def tag(pos: Int, want: String): Column =
          decode(col("wav").substr(lit(pos), lit(4)), "UTF-8") === want
        val meta = enc.select(col("doc_id"), col("source"), col("wav"),
            (tag(1, "RIFF") && tag(9, "WAVE") && tag(37, "data") &&
              Multimodal.leRead(col("wav"), lit(21), 2) === 1 &&
              Multimodal.leRead(col("wav"), lit(23), 2) === 1 &&
              Multimodal.leRead(col("wav"), lit(35), 2) === 16)
              .cast("long").as("ok"),
            Multimodal.leRead(col("wav"), lit(25), 4).as("rate_p"),
            (Multimodal.leRead(col("wav"), lit(41), 4) / lit(2L))
              .cast("long").as("n_samp"))
          // the wav build feeds both the sample explode and the
          // doc-level join below — one encode pass, not two
          .persist()
        val docAgg = meta
          .select(col("doc_id"),
            explode(sequence(lit(0L), col("n_samp") - 1)).as("i"),
            col("wav"))
          .select(col("doc_id"), col("i"),
            Multimodal.leRead(col("wav"), lit(45) + col("i") * 2, 2)
              .as("raw"))
          .withColumn("smp",
            col("raw") - lit(65536L) * (col("raw") >= 32768L).cast("long"))
          .groupBy(col("doc_id"), expr("i div 16").as("f"))
          .agg(sum(abs(col("smp"))).as("fr_abs"))
          .groupBy("doc_id")
          .agg(sum("fr_abs").as("total_abs"), max("fr_abs").as("peak"))
        meta.drop("wav").join(docAgg, Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_media"), sum("ok").as("n_valid"),
            sum("n_samp").as("total_samples"),
            sum("total_abs").as("energy_sum"),
            max("peak").as("peak_frame"), sum("rate_p").as("rate_sum"))
          .orderBy("source")
      },
      s"""WITH d0 AS (SELECT doc_id, source, text FROM documents
         |            WHERE length(text) >= 1),
         |p AS (
         |  SELECT doc_id, source, least(length(text), $MAX_S) AS n,
         |    (8000 + (doc_id % 3) * 4000)::BIGINT AS rate, text
         |  FROM d0),
         |sm AS (SELECT doc_id, source, n, rate, text,
         |         unnest(range(1, n + 1)) AS i FROM p),
         |sv AS (
         |  SELECT doc_id, source, n, rate, i,
         |    ((ascii(substring(text, i, 1)) % 64) - 32) * 500 AS smp
         |  FROM sm),
         |fr AS (
         |  SELECT doc_id, source, n, rate, (i - 1) // 16 AS f,
         |    sum(abs(smp))::BIGINT AS fr_abs
         |  FROM sv GROUP BY 1, 2, 3, 4, 5),
         |dd AS (
         |  SELECT doc_id, source, n, rate,
         |    sum(fr_abs)::BIGINT AS total_abs, max(fr_abs)::BIGINT AS peak
         |  FROM fr GROUP BY 1, 2, 3, 4)
         |SELECT source, count(*)::BIGINT AS n_media,
         |  count(*)::BIGINT AS n_valid,
         |  sum(n)::BIGINT AS total_samples,
         |  sum(total_abs)::BIGINT AS energy_sum,
         |  max(peak)::BIGINT AS peak_frame,
         |  sum(rate)::BIGINT AS rate_sum
         |FROM dd GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Real BMP decode (q248) — q244's image twin, and the harder half
    * of the real-binary-decode pair: 24-bit BMP stores pixel rows
    * BOTTOM-UP with each row zero-padded to a 4-byte stride, so
    * correct pixel ADDRESSING (not just field parsing) is what's
    * under test. Every document renders as a complete BMP
    * ([[Multimodal.bmpBytes]] — valid "BM" header, BITMAPINFOHEADER,
    * padded bottom-up rows; widths vary per doc so the stride math
    * can't be constant-folded away), and the judged pipeline reads
    * width/height/bpp/offset back from the bytes, re-derives the
    * stride, walks the grid through the bottom-up mapping, and folds
    * two per-image features: an integer luma sum and a
    * POSITION-WEIGHTED checksum — the weight makes any
    * row-order/stride/byte-order mistake change the value, where an
    * unweighted sum would forgive misaddressing that permutes pixels.
    * Oracle recomputes everything from source data without seeing
    * bytes. Same cost envelope as q244.
    */
  val bmpDecode: Q = {
    val H = 4
    Q(
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"))
          .filter(length(col("text")) >= 1)
        val w = (lit(3L) + col("doc_id") % 5)
        def pixel(r: Column, c: Column): (Column, Column, Column) = {
          val cp = ascii(col("text").substr(
            (pmod(r * w + c, length(col("text")).cast("long")) + 1).cast("int"),
            lit(1)))
          (cp % 64 + 10, cp % 32 + 20, cp % 16 + 30)
        }
        val enc = base.select(col("doc_id"), col("source"),
          Multimodal.bmpBytes(w, lit(H.toLong), pixel).as("bmp"))
        val meta = enc.select(col("doc_id"), col("source"), col("bmp"),
            (decode(col("bmp").substr(lit(1), lit(2)), "UTF-8") === "BM" &&
              Multimodal.leRead(col("bmp"), lit(11), 4) === 54 &&
              Multimodal.leRead(col("bmp"), lit(15), 4) === 40 &&
              Multimodal.leRead(col("bmp"), lit(27), 2) === 1 &&
              Multimodal.leRead(col("bmp"), lit(29), 2) === 24)
              .cast("long").as("ok"),
            Multimodal.leRead(col("bmp"), lit(19), 4).as("wp"),
            Multimodal.leRead(col("bmp"), lit(23), 4).as("hp"))
          .withColumn("row_size",
            shiftright(col("wp") * 3 + 3, 2) * 4)
          // the bmp build feeds the pixel-grid explode and the final
          // doc-level join — one encode pass
          .persist()
        val grid = meta
          .select(col("doc_id"), col("bmp"), col("wp"), col("hp"),
            col("row_size"),
            explode(sequence(lit(0L), col("hp") - 1)).as("r"))
          .select(col("doc_id"), col("bmp"), col("wp"), col("r"),
            (lit(54L) + (col("hp") - 1 - col("r")) * col("row_size"))
              .as("row_base"),
            explode(sequence(lit(0L), col("wp") - 1)).as("c"))
          .select(col("doc_id"), col("r"), col("c"),
            Multimodal.leRead(col("bmp"),
              col("row_base") + col("c") * 3 + 1, 1).as("b"),
            Multimodal.leRead(col("bmp"),
              col("row_base") + col("c") * 3 + 2, 1).as("g"),
            Multimodal.leRead(col("bmp"),
              col("row_base") + col("c") * 3 + 3, 1).as("rr"))
        val docAgg = grid.groupBy("doc_id").agg(
          sum(col("rr") * 2 + col("g") * 5 + col("b")).as("luma"),
          sum((col("r") * 31 + col("c") * 7 + 1) *
            (col("b") + col("g") * 256 + col("rr") * 65536)).as("addr_ck"))
        meta.drop("bmp").join(docAgg, Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_images"), sum("ok").as("n_valid"),
            sum("wp").as("w_sum"), sum("hp").as("h_sum"),
            sum("luma").as("luma_sum"), sum("addr_ck").as("addr_checksum"))
          .orderBy("source")
      },
      s"""WITH d0 AS (SELECT doc_id, source, text FROM documents
         |            WHERE length(text) >= 1),
         |p AS (
         |  SELECT doc_id, source, text,
         |    (3 + doc_id % 5)::BIGINT AS w, $H::BIGINT AS h
         |  FROM d0),
         |g AS (SELECT doc_id, source, text, w, h,
         |        unnest(range(0, h)) AS r FROM p),
         |gc AS (SELECT doc_id, source, text, w, h, r,
         |         unnest(range(0, w)) AS c FROM g),
         |px AS (
         |  SELECT doc_id, source, w, h, r, c,
         |    ascii(substring(text,
         |      ((r * w + c) % length(text) + 1)::INT, 1)) AS cp
         |  FROM gc),
         |pv AS (
         |  SELECT doc_id, source, w, h, r, c,
         |    cp % 64 + 10 AS b, cp % 32 + 20 AS gg, cp % 16 + 30 AS rr
         |  FROM px),
         |dd AS (
         |  SELECT doc_id, source, w, h,
         |    sum(rr * 2 + gg * 5 + b)::BIGINT AS luma,
         |    sum((r * 31 + c * 7 + 1) *
         |        (b + gg * 256 + rr * 65536))::BIGINT AS addr_ck
         |  FROM pv GROUP BY 1, 2, 3, 4)
         |SELECT source, count(*)::BIGINT AS n_images,
         |  count(*)::BIGINT AS n_valid,
         |  sum(w)::BIGINT AS w_sum, sum(h)::BIGINT AS h_sum,
         |  sum(luma)::BIGINT AS luma_sum,
         |  sum(addr_ck)::BIGINT AS addr_checksum
         |FROM dd GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Product-quantization ANN (q247) — the memory-compression scale
    * path the IVF/LSH family doesn't cover (Jégou et al., TPAMI
    * 2011): each vector splits into [[8]] subspaces of 8 dims,
    * each subspace gets its own 16-centroid Lloyd codebook
    * ([[VectorQuantizer.fitPQ]] — q53's exact-integer fit with the
    * subspace as an extra key), and every vector is stored as 8
    * sub-codes — 64 floats become 8 nibble-codes, the ~30×
    * compression that puts a billion-vector index in memory. Queries
    * never decompress: the ADC table (exact integer d² from the query
    * to every subspace centroid — m·ks = 128 entries, broadcast) turns
    * scoring into m lookups + a sum per candidate, so the scan
    * touches ONLY the code table. Every quantity (codes, tables, ADC
    * sums) lives in [[VectorQuantizer.scaled]]'s integer domain, so
    * the oracle replays fit → encode → ADC bit-for-bit. Top-10 by
    * exact integer ADC distance per query; at 100 TB the code table
    * is the only corpus-sized scan and it is m bytes per vector.
    */
  val pqAnn: Q = {
    val M = 8; val DSUB = 8; val KS = 16; val ITERS = 2
    val NQ = 5; val K = 10
    def iterCte(i: Int): String =
      s"""pd$i AS (
         |  SELECT ep.vec_id, c.sub, c.cell,
         |    sum((ep.xs - c.cs) * (ep.xs - c.cs)) AS d2
         |  FROM ep JOIN pc${i - 1} c ON ep.sub = c.sub AND ep.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |pa$i AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM pd$i) WHERE rnk = 1),
         |pc$i AS (
         |  SELECT a.sub, a.cell, ep.sdim,
         |    round(sum(ep.xs) / count(*))::BIGINT AS cs
         |  FROM ep JOIN pa$i a
         |    ON ep.vec_id = a.vec_id AND ep.sub = a.sub
         |  GROUP BY 1, 2, 3)"""
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = VectorQuantizer.scaled(
          t(s, d, "embeddings"), "vec_id", "embedding").persist()
        val cent = VectorQuantizer.fitPQ(e, "vec_id", M, DSUB, KS, ITERS)
        val epq = VectorQuantizer.subVectors(e, "vec_id", M, DSUB)
        val codes = VectorQuantizer.assignSubCells(epq, cent, "vec_id")
        val dtab = epq.filter(col("vec_id") < NQ)
          .withColumnRenamed("vec_id", "query_id")
          .join(broadcast(cent), Seq("sub"))
          .select(col("query_id"), col("sub"), col("cell"),
            VectorQuantizer.l2DistSq(col("xs"), col("cs")).as("d2"))
        val scored = codes.join(broadcast(dtab), Seq("sub", "cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .groupBy("query_id", "vec_id").agg(sum("d2").as("adc_d2"))
        val w = Window.partitionBy("query_id")
          .orderBy(asc("adc_d2"), asc("vec_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= K)
          .orderBy("query_id", "rnk")
      },
      s"""WITH e AS (
         |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
         |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs
         |  FROM embeddings),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $DSUB AS sub,
         |    (dim - 1) % $DSUB + 1 AS sdim, xs
         |  FROM e),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ep
         |        WHERE vec_id < $KS),
         |${(1 to ITERS).map(iterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ep.vec_id, c.sub, c.cell,
         |    sum((ep.xs - c.cs) * (ep.xs - c.cs)) AS d2
         |  FROM ep JOIN pc$ITERS c ON ep.sub = c.sub AND ep.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |dtab AS (
         |  SELECT q.vec_id AS query_id, c.sub, c.cell,
         |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
         |  FROM ep q JOIN pc$ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
         |  WHERE q.vec_id < $NQ GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT dt.query_id, cd.vec_id, sum(dt.d2)::BIGINT AS adc_d2
         |  FROM codes cd JOIN dtab dt
         |    ON cd.sub = dt.sub AND cd.cell = dt.cell
         |  WHERE cd.vec_id <> dt.query_id GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, vec_id, adc_d2,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc_d2, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, vec_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Span-level holdout contamination (q257) — q245's exact-substring
    * machinery pointed at the leak that matters: verbatim ranges
    * SHARED ACROSS the train/eval split (the GPT-3-style n-gram
    * contamination scan, upgraded from "a shingle matched" (q50/q99's
    * set-overlap screens) to "this exact ≥32-char range appears in
    * both sides, here's the longest one"). Eval docs are the 5%
    * hash-like slice (doc_id % 20 = 0); gram hashing is O(len)/doc,
    * the df-cap kills boilerplate grams, the hash join is restricted
    * to train × eval pairs only, and the diagonal trick reassembles
    * maximal spans. Per eval doc: how many train docs share a span,
    * the longest shared span, and the span count — the report a
    * benchmark owner actually actions (drop the eval doc or purge
    * the train side). Since r11 the gram postings come from the
    * COMMITTED [[gramPostings]] artifact shared with q245 (the
    * corpus-scale hash + df-cap paid once per data version,
    * `art:warm` thereafter); cross-side restriction only shrinks the
    * candidate set.
    */
  val spanContamination: Q = {
    val K = GRAM_K; val MIN_SPAN = GRAM_MIN_SPAN
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val grams = gramPostings(s, d)._1
          .withColumn("is_eval", (col("doc_id") % 20 === 0).cast("int"))
        val hits = grams.filter(col("is_eval") === 0)
          .select(col("doc_id").as("train_id"), col("pos").as("pa"),
            col("h"))
          .join(grams.filter(col("is_eval") === 1)
            .select(col("doc_id").as("eval_id"), col("pos").as("pb"),
              col("h")), Seq("h"))
          .select(col("train_id"), col("eval_id"), col("pa"), col("pb"),
            (col("pa") - col("pb")).as("diag"))
        val byDiag = Window.partitionBy("train_id", "eval_id", "diag")
          .orderBy("pa")
        hits
          .withColumn("grp", col("pa") - row_number().over(byDiag))
          .groupBy("train_id", "eval_id", "diag", "grp")
          .agg((count(lit(1)) + (K - 1)).as("span_len"))
          .filter(col("span_len") >= MIN_SPAN)
          .groupBy("eval_id")
          .agg(countDistinct("train_id").as("n_train_docs"),
            max("span_len").as("max_span"),
            count(lit(1)).as("n_spans"))
          .orderBy("eval_id")
      },
      s"""WITH g AS (
         |  SELECT doc_id, text,
         |    unnest(range(1, greatest(length(text) - ${K - 1}, 0) + 1)) AS pos
         |  FROM documents),
         |gr AS (SELECT doc_id, pos, substr(text, pos::INT, $K) AS gram
         |       FROM g),
         |hh AS (SELECT doc_id, pos, ${Hashing.charHashSql("gram", K)} AS h
         |       FROM gr),
         |capped AS (
         |  SELECT doc_id, pos, h, doc_id % 20 = 0 AS is_eval FROM (
         |    SELECT doc_id, pos, h, count(*) OVER (PARTITION BY h) AS df
         |    FROM hh) WHERE df <= $GRAM_MAX_DF),
         |hits AS (
         |  SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
         |    a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
         |  FROM capped a JOIN capped b ON a.h = b.h
         |  WHERE NOT a.is_eval AND b.is_eval),
         |runs AS (
         |  SELECT train_id, eval_id, diag, pa,
         |    pa - row_number() OVER (PARTITION BY train_id, eval_id, diag
         |                            ORDER BY pa) AS grp
         |  FROM hits),
         |spans AS (
         |  SELECT train_id, eval_id,
         |    (count(*) + ${K - 1})::BIGINT AS span_len
         |  FROM runs GROUP BY train_id, eval_id, diag, grp
         |  HAVING count(*) + ${K - 1} >= $MIN_SPAN)
         |SELECT eval_id, count(DISTINCT train_id)::BIGINT AS n_train_docs,
         |  max(span_len)::BIGINT AS max_span, count(*)::BIGINT AS n_spans
         |FROM spans GROUP BY eval_id ORDER BY eval_id""".stripMargin)
  }

  /** ANN mean-reciprocal-rank audit (q256) — the second IR metric
    * next to q96's recall@K: recall says whether the true neighbor
    * appears anywhere in the approximate top-K, MRR says WHERE — the
    * metric that notices a degrading index long before recall@10
    * moves (the true top-1 sliding from rank 1 to rank 7 is invisible
    * to recall, a 7× drop in reciprocal rank). Per query: the exact
    * top-1 neighbor (brute-force truth over a fixed query set) looked
    * up in the multi-table LSH top-10; reciprocal rank in exact
    * integer micro-units (10⁶ div rank, 0 on a miss) — deterministic
    * on both engines, no float division. Same cost envelope as q96:
    * the quadratic truth arm is the fixed query set × corpus, the
    * approximate arm reuses the production bucket join.
    */
  val annMrr: Q = {
    val NQ = 20; val K = 10
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < NQ)
        val truth = Similarity.bruteForceTopK(
            emb, queries, "vec_id", "embedding", 1)
          .select(col("query_id"), col("vec_id").as("truth_id"))
        val r = VectorFunctions.mtBits(corpusStats(s, d)._1)
        val approx = Similarity.multiTableTopK(
            emb, queries, "vec_id", "embedding", K,
            r, VectorFunctions.mtTables(r))
          .select(col("query_id"), col("vec_id").as("truth_id"),
            col("rnk"))
        truth.join(approx, Seq("query_id", "truth_id"), "left")
          .select(col("query_id"), col("truth_id"),
            coalesce(col("rnk"), lit(0L)).as("rnk_approx"),
            coalesce(expr("1000000L div rnk"), lit(0L)).as("rr_micro"))
          .orderBy("query_id")
      },
      s"""WITH ${mtCtes("embeddings")},
         |qx AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < $NQ),
         |cx AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bs AS (
         |  SELECT query_id, vec_id,
         |    round(list_dot_product(qv, v) /
         |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
         |      AS cos_sim
         |  FROM qx JOIN cx ON vec_id <> query_id),
         |truth AS (
         |  SELECT query_id, vec_id AS truth_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY cos_sim DESC, vec_id) AS rn
         |    FROM bs) WHERE rn = 1),
         |aq AS (SELECT vec_id, embedding, tbl, bucket FROM kb
         |       WHERE vec_id < $NQ),
         |ascore AS (
         |  SELECT aq.vec_id AS query_id, kb.vec_id,
         |    max(round(${VectorFunctions.cosineSql("aq.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM aq JOIN kb ON aq.tbl = kb.tbl AND aq.bucket = kb.bucket
         |    AND kb.vec_id <> aq.vec_id
         |  GROUP BY 1, 2),
         |ar AS (
         |  SELECT query_id, vec_id AS truth_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM ascore),
         |ax AS (SELECT query_id, truth_id, rnk FROM ar WHERE rnk <= $K)
         |SELECT t.query_id, t.truth_id,
         |  coalesce(a.rnk, 0)::BIGINT AS rnk_approx,
         |  coalesce(1000000 // a.rnk, 0)::BIGINT AS rr_micro
         |FROM truth t LEFT JOIN ax a
         |  ON t.query_id = a.query_id AND t.truth_id = a.truth_id
         |ORDER BY t.query_id""".stripMargin)
  }

  /** Stratified sample allocation with exact apportionment (q253) —
    * the survey-sampling design step upstream of every eval/audit
    * sample: a fixed label budget is split across sources
    * Neyman-style (proportional to stratum size × within-stratum
    * spread — the integer length RANGE stands in for the classic SD
    * so both engines share exact arithmetic), and the fractional
    * quotas become integer seats via LARGEST-REMAINDER apportionment
    * (Hamilton's method): floor everyone, then hand the leftover
    * seats to the largest remainders with a total tie order — the
    * budget is hit EXACTLY, deterministically, no float rounding
    * drift. Selection within a stratum is the usual hash-rank rule,
    * and the judged output carries an id-hash sum of each stratum's
    * selected set, so the oracle match proves the identical
    * documents were chosen, not just identical counts. One grouped
    * aggregate + one taxonomy-sized window + one per-source ranking
    * window — corpus-linear, state bounded by the source taxonomy.
    */
  val sampleAlloc: Q = {
    val BUDGET = 100
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val stats = docs.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          (max("n_chars") - min("n_chars") + 1).as("spread"))
          .withColumn("w", col("n_docs") * col("spread"))
        val wAll = Window.partitionBy()
        val alloc = stats
          .withColumn("tot", sum("w").over(wAll))
          .withColumn("base", expr(s"$BUDGET * w div tot"))
          .withColumn("rem", expr(s"($BUDGET * w) % tot"))
          .withColumn("leftover", lit(BUDGET) - sum("base").over(wAll))
          .withColumn("rnk", row_number().over(
            Window.partitionBy().orderBy(desc("rem"), asc("source"))))
          .withColumn("alloc",
            col("base") + when(col("rnk") <= col("leftover"), 1L)
              .otherwise(0L))
        val sel = docs
          .withColumn("hrnk", row_number().over(
            Window.partitionBy("source")
              .orderBy(Hashing.h32(col("doc_id").cast("string")),
                col("doc_id"))))
          .join(alloc.select(col("source"), col("alloc")), Seq("source"))
          .filter(col("hrnk") <= col("alloc"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_sel"),
            sum(Hashing.h32(col("doc_id").cast("string"))).as("sel_h32_sum"))
        alloc.select(col("source"), col("n_docs"), col("w"), col("alloc"))
          .join(sel, Seq("source"), "left")
          .na.fill(0L, Seq("n_sel", "sel_h32_sum"))
          .orderBy("source")
      },
      s"""WITH docs AS (SELECT doc_id, source, n_chars FROM documents),
         |stats AS (
         |  SELECT source, count(*)::BIGINT AS n_docs,
         |    (max(n_chars) - min(n_chars) + 1)::BIGINT AS spread
         |  FROM docs GROUP BY source),
         |aw AS (SELECT source, n_docs, n_docs * spread AS w FROM stats),
         |ax AS (
         |  SELECT source, n_docs, w,
         |    sum(w) OVER () AS tot,
         |    ($BUDGET * w) // sum(w) OVER () AS base,
         |    ($BUDGET * w) % sum(w) OVER () AS rem
         |  FROM aw),
         |ay AS (
         |  SELECT *, $BUDGET - sum(base) OVER () AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, source) AS rnk
         |  FROM ax),
         |alloc AS (
         |  SELECT source, n_docs, w,
         |    (base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END)::BIGINT
         |      AS alloc
         |  FROM ay),
         |ranked AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${Hashing.h32Sql("doc_id::VARCHAR")}, doc_id)
         |      AS hrnk
         |  FROM docs),
         |sel AS (
         |  SELECT r.source, count(*)::BIGINT AS n_sel,
         |    sum(${Hashing.h32Sql("r.doc_id::VARCHAR")})::BIGINT
         |      AS sel_h32_sum
         |  FROM ranked r JOIN alloc a ON r.source = a.source
         |  WHERE r.hrnk <= a.alloc GROUP BY r.source)
         |SELECT a.source, a.n_docs, a.w::BIGINT AS w, a.alloc,
         |  coalesce(s.n_sel, 0)::BIGINT AS n_sel,
         |  coalesce(s.sel_h32_sum, 0)::BIGINT AS sel_h32_sum
         |FROM alloc a LEFT JOIN sel s ON a.source = s.source
         |ORDER BY a.source""".stripMargin)
  }

  /** Max-min fair token allocation — water-filling (q254): the
    * FAIRNESS counterpart of q221's quality knapsack (which starves
    * low-quality sources by design) and q253's variance-weighted
    * sampler: cap every source at a common water level λ chosen so
    * the budget is exactly spent — sources whose whole demand fits
    * under λ are fully satisfied (saturated), everyone else gets the
    * level. The classic bandwidth-allocation algebra, done exactly in
    * integers: sort demands, find the saturation prefix via the
    * monotone feasibility test prefix(i) + (n−i)·dᵢ ≤ B (monotone
    * because f(i)−f(i−1) = (n−i+1)(dᵢ−dᵢ₋₁) ≥ 0 on sorted demands),
    * then split the residue by floor + largest-remainder (smallest
    * unsaturated demand first — a total order). No floats, no
    * iteration; one corpus aggregate + taxonomy-sized windows. The
    * over-allocation guard is structural: the first unsaturated
    * demand strictly exceeds the residue mean, so base+1 ≤ every
    * unsaturated demand.
    */
  val waterFill: Q = {
    val BUDGET_PCT = 30
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dem = t(s, d, "documents")
          .select(col("source"),
            size(TextFunctions.words(col("text"))).cast("long").as("toks"))
          .groupBy("source").agg(sum("toks").as("demand"))
        val wAll = Window.partitionBy()
        val byDem = Window.partitionBy().orderBy(asc("demand"), asc("source"))
        val wPfx = byDem.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        dem
          .withColumn("budget",
            expr(s"sum(demand) over () * $BUDGET_PCT div 100"))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("idx", row_number().over(byDem).cast("long"))
          .withColumn("pfx", sum("demand").over(wPfx))
          .withColumn("sat",
            (col("pfx") + (col("n") - col("idx")) * col("demand") <=
              col("budget")).cast("long"))
          .withColumn("m", sum("sat").over(wAll))
          .withColumn("pm", sum(when(col("sat") === 1, col("demand"))
            .otherwise(0L)).over(wAll))
          .withColumn("alloc",
            when(col("sat") === 1 || col("n") === col("m"), col("demand"))
              .otherwise(
                expr("(budget - pm) div (n - m)") +
                  when(col("idx") - col("m") <=
                    expr("(budget - pm) % (n - m)"), 1L).otherwise(0L)))
          .select(col("source"), col("demand"), col("alloc"),
            col("sat").as("saturated"))
          .orderBy("source")
      },
      s"""WITH wd AS (
         |  SELECT source, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents),
         |dem AS (
         |  SELECT source, sum(len(arr))::BIGINT AS demand
         |  FROM wd GROUP BY source),
         |x AS (
         |  SELECT source, demand,
         |    sum(demand) OVER () * $BUDGET_PCT // 100 AS budget,
         |    count(*) OVER () AS n,
         |    row_number() OVER (ORDER BY demand, source) AS idx,
         |    sum(demand) OVER (ORDER BY demand, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
         |  FROM dem),
         |y AS (
         |  SELECT *, CASE WHEN pfx + (n - idx) * demand <= budget
         |    THEN 1 ELSE 0 END AS sat FROM x),
         |z AS (
         |  SELECT *, sum(sat) OVER () AS m,
         |    sum(CASE WHEN sat = 1 THEN demand ELSE 0 END) OVER () AS pm
         |  FROM y)
         |SELECT source, demand,
         |  (CASE WHEN sat = 1 OR n = m THEN demand
         |        ELSE (budget - pm) // (n - m) +
         |          (CASE WHEN idx - m <= (budget - pm) % (n - m)
         |           THEN 1 ELSE 0 END) END)::BIGINT AS alloc,
         |  sat::BIGINT AS saturated
         |FROM z ORDER BY source""".stripMargin)
  }

  /** Incremental connected components (q252) — cluster maintenance
    * at DELTA cost: once dedup groups / entity clusters live as a
    * persisted assignment, a daily batch of new pair evidence must
    * fold in without re-clustering the corpus. The base assignment is
    * exactly that PERSISTED artifact (the r9 gap closer): clustered
    * once and committed via [[VersionedDirs]]' versioned protocol
    * under a fingerprint-keyed root, so the timed path READS the
    * committed generation and pays only the fold — publish-if-absent
    * guard like q246, `art:warm` in the bench once the artifact
    * exists. Delta edges map through the committed assignment to
    * component roots; edges landing inside one root are already
    * absorbed, and the survivors form the CONTRACTED graph — sized by
    * the delta's merge activity, never the corpus — which is
    * re-clustered and used to relabel exactly the absorbed components
    * ([[ConnectedComponents.incremental]]). The oracle runs the FULL
    * transitive closure over base ∪ delta, so the hash match IS the
    * correctness proof: incremental maintenance against the committed
    * generation ≡ recompute, including canonical min-id labels
    * (min-of-mins argument in the operator doc). Judged output is the
    * component-size census.
    */
  val incrementalCc: Q = {
    val SPLIT = 250L
    Q(
      (s, d) => {
        val pairs = minhashPairs(s, d)
          .select(col("id_a").as("u"), col("id_b").as("v")).persist()
        val delta = pairs.filter(col("u") >= SPLIT || col("v") >= SPLIT)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-cc-base", d, Seq("documents.parquet"))
        if (VersionedDirs.resolve(root).isEmpty)
          VersionedDirs.commit(root) { st =>
            ConnectedComponents.assign(
                pairs.filter(col("u") < SPLIT && col("v") < SPLIT))
              .distinct()
              .write.parquet(st)
          }
        val baseComp = s.read.parquet(VersionedDirs.resolve(root).get)
        ConnectedComponents.incremental(baseComp, delta)
          .groupBy("component").agg(count(lit(1)).as("n_nodes"))
          .orderBy("component")
      },
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk(n, m) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, walk.m FROM walk JOIN edges e ON e.u = walk.n),
         |comp AS (SELECT n AS node, min(m) AS component FROM walk GROUP BY n)
         |SELECT component, count(*)::BIGINT AS n_nodes
         |FROM comp GROUP BY component ORDER BY component""".stripMargin)
  }

  /** Purge-aware incremental dedup (q246) — q172's GDPR sweep meets
    * q91's derived state: deleting documents from the corpus must
    * also make them unfindable through the PERSISTED index, or a
    * redelivered copy of a purged document resurfaces a link to data
    * the pipeline promised to forget. The cold path exercises the
    * full lifecycle — publish the index, file a delete request for
    * every 10th indexed doc ([[DedupIndex.addTombstones]]: O(deletes),
    * no rewrite), compact ([[DedupIndex.compact]]: pure row filter,
    * no re-signing), hard-vacuum the pre-purge generation
    * ([[DedupIndex.vacuumOld]]) — and the probe then runs against
    * physically purged state: redelivered copies of purged docs MUST
    * find no candidate to their original (rows where they would have
    * are simply absent), while everything else matches exactly as
    * q91. The oracle is q91's band-join recurrence with the purged
    * ids removed from the index side — so the hash match proves the
    * tombstone/compact/vacuum chain dropped exactly the right rows
    * and nothing else.
    */
  val indexPurge: Q = {
    val INDEX_MAX = 400L; val REDELIVER = 50L; val MIN_J = 0.5
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i").mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}").mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val index = docs.filter(col("doc_id") < INDEX_MAX)
        val live = index.filter(col("doc_id") % 10 =!= 0)
        val fresh = docs.filter(col("doc_id") >= INDEX_MAX).unionByName(
          docs.filter(col("doc_id") < REDELIVER)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-dedup-purge", d, Seq("documents.parquet"))
        if (DedupIndex.resolve(root).isEmpty) {
          DedupIndex.publish(
            Dedup.minhashSignatures(index, "doc_id", "text", MH_K),
            "doc_id", MH_BANDS, MH_R, root)
          DedupIndex.addTombstones(s,
            index.filter(col("doc_id") % 10 === 0).select("doc_id"),
            "doc_id", root)
          DedupIndex.compact(s, root)
          DedupIndex.vacuumOld(root)
        }
        val sigN = Dedup.minhashSignatures(fresh, "doc_id", "text", MH_K)
        val cands = DedupIndex.probe(s, sigN, "doc_id", MH_BANDS, MH_R, root)
        Dedup.jaccardFor(
            cands.select(col("new_id").as("id_a"), col("index_id").as("id_b")),
            live.unionByName(fresh), "doc_id", "text", 3, MIN_J)
          .select(col("id_a").as("new_id"), col("id_b").as("index_id"),
            col("jaccard"))
          .orderBy("new_id", "index_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id, text, 0 AS is_new FROM docs
         |  WHERE doc_id < $INDEX_MAX AND doc_id % 10 <> 0
         |  UNION ALL SELECT doc_id, text, 1 FROM docs WHERE doc_id >= $INDEX_MAX
         |  UNION ALL SELECT doc_id + 1000000, text, 1 FROM docs
         |    WHERE doc_id < $REDELIVER),
         |w AS (SELECT doc_id, is_new,
         |        ${TextFunctions.wordsSql("text")} AS arr FROM corpus),
         |sh AS (SELECT DISTINCT doc_id, is_new,
         |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
         |sig AS (
         |  SELECT doc_id, is_new,
         |    $sigCols
         |  FROM sh GROUP BY doc_id, is_new),
         |bands AS (
         |  $bandRowsSql),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS index_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |  WHERE a.is_new = 1 AND b.is_new = 0),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.new_id, c.index_id, count(*) AS n_inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.new_id
         |  JOIN sh b ON b.doc_id = c.index_id AND b.s = a.s
         |  GROUP BY 1, 2)
         |SELECT new_id, index_id,
         |  n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE AS jaccard
         |FROM inter
         |JOIN sizes sa ON new_id = sa.doc_id
         |JOIN sizes sb ON index_id = sb.doc_id
         |WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE >= $MIN_J
         |ORDER BY new_id, index_id""".stripMargin)
  }

  /** COMMITTED df-capped gram postings over the documents table — the
    * shared corpus-scale half of the substring-span family (q245 and
    * q257 were the two slowest judged queries, each re-paying the
    * O(len)/doc gram hashing + the df-cap window per run; the
    * [[graft.sources.Artifacts.publishOnce]] graph-pair discipline
    * amortizes it to once per data version). Two tables under one
    * root: `postings/` — (doc_id, pos, h) for every gram whose
    * document-frequency ≤ [[GRAM_MAX_DF]]; `hot/` — the capped-out
    * gram hashes (a compact boilerplate blocklist, so a consumer
    * hashing EXTRA synthetic docs can apply the same cap to them
    * without touching the corpus).
    */
  private def gramPostings(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val root = graft.sources.Artifacts.publishOnce(
      "graft-gram-postings", d, Seq("documents.parquet")) { st =>
      import org.apache.spark.sql.expressions.Window
      val grams = Dedup.gramHashes(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", GRAM_K)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
        .persist()
      grams.filter(col("df") <= GRAM_MAX_DF).drop("df")
        .write.parquet(new java.io.File(st, "postings").toString)
      grams.filter(col("df") > GRAM_MAX_DF).select("h").distinct()
        .write.parquet(new java.io.File(st, "hot").toString)
      grams.unpersist()
      java.nio.file.Files.createFile(
        new java.io.File(st, "_SUCCESS").toPath)
      ()
    }
    (s.read.parquet(new java.io.File(root, "postings").toString),
      s.read.parquet(new java.io.File(root, "hot").toString))
  }

  /** Exact shared-substring spans (q245) — the dedup family's missing
    * EXACT-substring member (the Lee et al. "Deduplicating Training
    * Data Makes Language Models Better" primitive: near-dup finds
    * similar documents, this finds verbatim COPIED RANGES — quoted
    * boilerplate, licence blocks, redelivered prefixes — at character
    * precision). Every K-char gram is hashed in O(len)/doc
    * ([[Dedup.gramHashes]]' lead-window Horner — never per-gram
    * substr), hot grams are df-capped (q23's discipline: a ubiquitous
    * gram carries no copy signal and would pair quadratically), and
    * matching positions meet through the hash join. Since r11 the
    * corpus-scale half reads the COMMITTED posting artifact
    * ([[gramPostings]], `art:warm` after first publish) — the cap is
    * therefore a property of the BASE corpus (the artifact-able
    * form): injected redelivered copies hash only themselves (25
    * docs) and inherit the blocklist via the `hot/` anti-join. The
    * span assembly is the classic diagonal trick: a shared substring
    * of length L contributes L−K+1 gram matches on ONE diagonal
    * (pos_a − pos_b constant) at CONSECUTIVE pos_a, so grouping by
    * (pair, diagonal, pos_a − row_number) reconstructs maximal runs
    * — pure windows, no per-char joins. The reported best span per
    * pair is then VERIFIED by comparing the actual substrings
    * (verification linear in reported pairs, q59's rule — this also
    * screens the ~d²/2³¹ polynomial-hash collisions). Redelivered
    * copies with appended tails are injected so prefix spans of known
    * length must surface.
    */
  val substringSpans: Q = {
    val K = GRAM_K; val MIN_SPAN = GRAM_MIN_SPAN
    val MAX_DF = GRAM_MAX_DF; val REDELIVER = 25L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val rede = docs.filter(col("doc_id") < REDELIVER)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" tail"), col("doc_id")).as("text"))
        val corpus = docs.unionByName(rede)
        val (post, hot) = gramPostings(s, d)
        val redeGrams = Dedup.gramHashes(rede, "doc_id", "text", K)
          .join(hot, Seq("h"), "left_anti")
        val grams = post.unionByName(redeGrams)
        val hits = grams.select(col("doc_id").as("id_a"),
            col("pos").as("pa"), col("h"))
          .join(grams.select(col("doc_id").as("id_b"),
            col("pos").as("pb"), col("h")), Seq("h"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("pa"), col("pb"),
            (col("pa") - col("pb")).as("diag"))
        val byDiag = Window.partitionBy("id_a", "id_b", "diag")
          .orderBy("pa")
        val spans = hits
          .withColumn("grp", col("pa") - row_number().over(byDiag))
          .groupBy("id_a", "id_b", "diag", "grp")
          .agg(min("pa").as("start_a"), min("pb").as("start_b"),
            (count(lit(1)) + (K - 1)).as("span_len"))
          .filter(col("span_len") >= MIN_SPAN)
          // feeds the per-pair stats AND the best-span pick below —
          // span count is copy-bounded, so the cache is small
          .persist()
        val stats = spans.groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("n_spans"), max("span_len").as("max_span"))
        val byBest = Window.partitionBy("id_a", "id_b")
          .orderBy(desc("span_len"), asc("start_a"), asc("start_b"))
        val best = spans.withColumn("rn", row_number().over(byBest))
          .filter(col("rn") === 1)
          .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
            col("span_len"))
        val ta = corpus.select(col("doc_id").as("id_a"), col("text").as("t_a"))
        val tb = corpus.select(col("doc_id").as("id_b"), col("text").as("t_b"))
        stats.join(best, Seq("id_a", "id_b"))
          .join(ta, Seq("id_a")).join(tb, Seq("id_b"))
          .select(col("id_a"), col("id_b"), col("n_spans"), col("max_span"),
            col("start_a").cast("long").as("start_a"),
            col("start_b").cast("long").as("start_b"),
            (col("t_a").substr(col("start_a"), col("span_len")) ===
              col("t_b").substr(col("start_b"), col("span_len")))
              .cast("long").as("verified"))
          .orderBy("id_a", "id_b")
      },
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' tail' || doc_id
         |  FROM documents WHERE doc_id < $REDELIVER),
         |g AS (
         |  SELECT doc_id, text,
         |    unnest(range(1, greatest(length(text) - ${K - 1}, 0) + 1)) AS pos
         |  FROM corpus),
         |gr AS (SELECT doc_id, pos, substr(text, pos::INT, $K) AS gram
         |       FROM g),
         |hh AS (SELECT doc_id, pos, ${Hashing.charHashSql("gram", K)} AS h
         |       FROM gr),
         |capped AS (
         |  SELECT doc_id, pos, h FROM (
         |    SELECT doc_id, pos, h,
         |      sum(CASE WHEN doc_id < 1000000 THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY h) AS df
         |    FROM hh) WHERE df <= $MAX_DF),
         |hits AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
         |  FROM capped a JOIN capped b
         |    ON a.h = b.h AND a.doc_id < b.doc_id),
         |runs AS (
         |  SELECT id_a, id_b, diag, pa, pb,
         |    pa - row_number() OVER (PARTITION BY id_a, id_b, diag
         |                            ORDER BY pa) AS grp
         |  FROM hits),
         |spans AS (
         |  SELECT id_a, id_b, diag, grp,
         |    min(pa) AS start_a, min(pb) AS start_b,
         |    (count(*) + ${K - 1})::BIGINT AS span_len
         |  FROM runs GROUP BY 1, 2, 3, 4
         |  HAVING count(*) + ${K - 1} >= $MIN_SPAN),
         |stats AS (
         |  SELECT id_a, id_b, count(*)::BIGINT AS n_spans,
         |    max(span_len)::BIGINT AS max_span
         |  FROM spans GROUP BY 1, 2),
         |best AS (
         |  SELECT id_a, id_b, start_a, start_b, span_len FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id_a, id_b
         |      ORDER BY span_len DESC, start_a, start_b) AS rn
         |    FROM spans) WHERE rn = 1)
         |SELECT s.id_a, s.id_b, s.n_spans, s.max_span,
         |  b.start_a::BIGINT AS start_a, b.start_b::BIGINT AS start_b,
         |  (substr(ta.text, b.start_a::INT, b.span_len::INT) =
         |   substr(tb.text, b.start_b::INT, b.span_len::INT))::BIGINT
         |    AS verified
         |FROM stats s
         |JOIN best b ON s.id_a = b.id_a AND s.id_b = b.id_b
         |JOIN corpus ta ON s.id_a = ta.doc_id
         |JOIN corpus tb ON s.id_b = tb.doc_id
         |ORDER BY s.id_a, s.id_b""".stripMargin)
  }

  /** Artifact-served substring probe (q285) — the SEARCH interface
    * over the committed [[gramPostings]] artifact q245/q257 already
    * share: given a batch of eval snippets (the contamination
    * point-probe shape — "does the training corpus contain this
    * benchmark string verbatim, and where?"), hash ONLY the query
    * grams (O(len)/snippet, [[Dedup.gramHashes]]' Horner), anti-join
    * the artifact's `hot/` blocklist so the df-cap applies to the
    * query side exactly as it did to the corpus, and meet the
    * committed postings through one h-keyed equi-join — the tiny
    * query side broadcasts by statistics, the corpus is never
    * re-hashed. A full occurrence = every surviving query gram
    * matching on ONE alignment (doc position − query position
    * constant), so candidates are a (query, doc, alignment) count
    * reaching the query's own surviving-gram count; every reported
    * hit is then VERIFIED by actual substring comparison (q59's
    * rule: verification linear in reported matches — this also
    * screens polynomial-hash collisions and any count inflation from
    * periodic text). Snippets with fewer than [[GRAM_MIN_SPAN]]−K+1
    * surviving grams are dropped: too boilerplate-covered to assert
    * anything. Output: every verified (query, doc, position)
    * occurrence — each snippet finds at least its own source doc.
    */
  /** Every verified occurrence of each snippet in the committed
    * gram-posting artifact: (query_id, doc_id, pos) — q285's matcher,
    * shared with q288's exact arm. `snips` carries (query_id,
    * snippet).
    */
  private def substringOccurrences(s: SparkSession, d: String,
                                   snips: DataFrame): DataFrame = {
    val K = GRAM_K
    val MIN_GRAMS = GRAM_MIN_SPAN - GRAM_K + 1
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val (post, hot) = gramPostings(s, d)
    val sf = snips.filter(length(col("snippet")) >= K)
    val qg = Dedup.gramHashes(sf, "query_id", "snippet", K)
      .join(hot, Seq("h"), "left_anti")
    val expected = qg.groupBy("query_id")
      .agg(count(lit(1)).as("n_expect"))
      .filter(col("n_expect") >= MIN_GRAMS)
    val hits = qg.select(col("query_id"), col("pos").as("qp"), col("h"))
      .join(post.select(col("doc_id"), col("pos").as("dp"), col("h")),
        Seq("h"))
      .select(col("query_id"), col("doc_id"),
        (col("dp") - col("qp")).as("start0"))
      .groupBy("query_id", "doc_id", "start0")
      .agg(count(lit(1)).as("n_hit"))
    hits.join(expected, Seq("query_id"))
      .filter(col("n_hit") >= col("n_expect"))
      .select(col("query_id"), col("doc_id"),
        (col("start0") + 1).cast("long").as("pos"))
      .join(sf, Seq("query_id"))
      .join(docs, Seq("doc_id"))
      .filter(col("text").substr(col("pos").cast("int"),
        length(col("snippet"))) === col("snippet"))
      .select("query_id", "doc_id", "pos")
  }

  val substringProbe: Q = {
    val K = GRAM_K; val MAX_DF = GRAM_MAX_DF
    val SNIP_START = 8; val SNIP_LEN = 48
    val MIN_GRAMS = GRAM_MIN_SPAN - GRAM_K + 1
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val snips = docs
          .filter(col("doc_id") % 10 === 5 && col("doc_id") < 100)
          .select(col("doc_id").as("query_id"),
            col("text").substr(SNIP_START, SNIP_LEN).as("snippet"))
        substringOccurrences(s, d, snips)
          .orderBy("query_id", "doc_id", "pos")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |g AS (
         |  SELECT doc_id, text,
         |    unnest(range(1, greatest(length(text) - ${K - 1}, 0) + 1)) AS pos
         |  FROM docs),
         |hh AS (
         |  SELECT doc_id, pos,
         |    ${Hashing.charHashSql(s"substr(text, pos::INT, $K)", K)} AS h
         |  FROM g),
         |hd AS (SELECT doc_id, pos, h,
         |         count(*) OVER (PARTITION BY h) AS df FROM hh),
         |post AS (SELECT doc_id, pos, h FROM hd WHERE df <= $MAX_DF),
         |hot AS (SELECT DISTINCT h FROM hd WHERE df > $MAX_DF),
         |snips AS (
         |  SELECT doc_id AS query_id,
         |    substr(text, $SNIP_START, $SNIP_LEN) AS snippet
         |  FROM docs
         |  WHERE doc_id % 10 = 5 AND doc_id < 100
         |    AND length(substr(text, $SNIP_START, $SNIP_LEN)) >= $K),
         |qg0 AS (
         |  SELECT query_id, snippet,
         |    unnest(range(1, greatest(length(snippet) - ${K - 1}, 0) + 1))
         |      AS pos
         |  FROM snips),
         |qh AS (
         |  SELECT query_id, pos,
         |    ${Hashing.charHashSql(s"substr(snippet, pos::INT, $K)", K)} AS h
         |  FROM qg0),
         |qg AS (SELECT * FROM qh WHERE h NOT IN (SELECT h FROM hot)),
         |expected AS (
         |  SELECT query_id, count(*)::BIGINT AS n_expect FROM qg
         |  GROUP BY 1 HAVING count(*) >= $MIN_GRAMS),
         |hits AS (
         |  SELECT q.query_id, p.doc_id, p.pos - q.pos AS start0,
         |    count(*)::BIGINT AS n_hit
         |  FROM qg q JOIN post p USING (h)
         |  GROUP BY 1, 2, 3),
         |cand AS (
         |  SELECT h.query_id, h.doc_id, (h.start0 + 1)::BIGINT AS pos
         |  FROM hits h JOIN expected e USING (query_id)
         |  WHERE h.n_hit >= e.n_expect)
         |SELECT c.query_id, c.doc_id, c.pos
         |FROM cand c
         |JOIN snips s ON s.query_id = c.query_id
         |JOIN docs t ON t.doc_id = c.doc_id
         |WHERE substr(t.text, c.pos::INT, length(s.snippet)) = s.snippet
         |ORDER BY c.query_id, c.doc_id, c.pos""".stripMargin)
  }

  /** Paraphrase-robust contamination detection (q288) — the capstone
    * over the two committed retrieval artifacts: exact-substring
    * matching (q285's gram probe) is precise but brittle — corrupt
    * one word in five of a leaked benchmark snippet and every K-char
    * gram spanning a corruption dies, alignments fragment, and the
    * full-occurrence count drops to zero — while the BM25 probe of
    * the lexical artifact still surfaces the source document from
    * the ~80% of terms that survive. Each query doc contributes a
    * 24-token snippet judged three ways: verified exact occurrences
    * of the CLEAN snippet (≥ 1 — its own source), of the PERTURBED
    * snippet (every 5th token replaced by an out-of-vocabulary
    * marker — 0), and the BM25 top-1 over the perturbed TERMS with a
    * self-hit flag measuring how often the surviving ~80% of terms
    * suffice to rank the source first (a real, partial number — the
    * synthetic corpus's repetitive vocabulary caps it, which is
    * itself the honest shape of lexical recall under noise). The row
    * set is the contamination-pipeline lesson in data: run both
    * probes, because exact-match recall under
    * contamination-with-noise is the one that silently fails.
    * Both arms are batch-cost artifact reads (q285's matcher, the
    * lex index's pruned probe); the oracle replays gram hashing for
    * both snippet variants AND the full BM25 chain.
    */
  val robustContamination: Q = {
    val T0 = 3; val NT = 24; val LEX_MAX = 400L
    val MIN_GRAMS = GRAM_MIN_SPAN - GRAM_K + 1
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val lexRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-index", d, Seq("documents.parquet"))
        if (LexIndex.resolve(lexRoot).isEmpty)
          LexIndex.publish(docs.filter(col("doc_id") < LEX_MAX),
            "doc_id", "text", lexRoot)
        val q0 = docs
          .filter(col("doc_id") % 10 === 5 && col("doc_id") < 100)
          .select(col("doc_id").as("query_id"),
            TextFunctions.words(col("text")).as("arr"))
          .filter(size(col("arr")) >= T0 + NT - 1)
          .select(col("query_id"),
            expr(s"slice(arr, $T0, $NT)").as("w"))
        val pw = expr("transform(w, (x, i) -> IF(i % 5 = 0, 'zzqx', x))")
        val clean = q0.select(col("query_id"),
          concat_ws(" ", col("w")).as("snippet"))
        val pert = q0.select(col("query_id"),
          concat_ws(" ", pw).as("snippet"))
        // ONE postings probe for both snippet sets (guide §2.4): the
        // clean and perturbed sides each paid a full postings-artifact
        // scan + join; tag them into one probe via an encoded query
        // key (qid·2 + side — the per-key pipeline is key-independent,
        // so the rows are identical), materialize the occurrence set
        // once (it is occurrence-sized, tiny), and split the counts
        // lazily. The BM25 probe is independent — built concurrently
        // (guide §2.6).
        val qterms = q0.select(col("query_id"), explode(pw).as("term"))
          .filter(length(col("term")) > 0).distinct()
        val Seq(occ, top1) = concurrently(Seq(
          () => graft.operators.ProbeCache.materialize(
            substringOccurrences(s, d,
              clean.select((col("query_id") * 2).as("query_id"),
                  col("snippet"))
                .unionByName(pert.select(
                  (col("query_id") * 2 + 1).as("query_id"),
                  col("snippet"))))
              .select((col("query_id") % 2).as("side"),
                expr("query_id div 2").as("query_id"))),
          () => LexIndex.bm25TopK(s, qterms, "query_id", "term",
              1, lexRoot)
            .select(col("query_id"), col("index_id").as("top_doc"))))
        val nc = occ.filter(col("side") === 0)
          .groupBy("query_id").agg(count(lit(1)).as("n_exact_clean"))
        val np = occ.filter(col("side") === 1)
          .groupBy("query_id").agg(count(lit(1)).as("n_exact_pert"))
        q0.select("query_id")
          .join(nc, Seq("query_id"), "left")
          .join(np, Seq("query_id"), "left")
          .join(top1, Seq("query_id"), "left")
          .na.fill(0L, Seq("n_exact_clean", "n_exact_pert"))
          .withColumn("top_doc", coalesce(col("top_doc"), lit(-1L)))
          .withColumn("self_hit",
            (col("top_doc") === col("query_id")).cast("long"))
          .select("query_id", "n_exact_clean", "n_exact_pert",
            "top_doc", "self_hit")
          .orderBy("query_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |g AS (
         |  SELECT doc_id, text,
         |    unnest(range(1,
         |      greatest(length(text) - ${GRAM_K - 1}, 0) + 1)) AS pos
         |  FROM docs),
         |hh AS (
         |  SELECT doc_id, pos,
         |    ${Hashing.charHashSql(s"substr(text, pos::INT, $GRAM_K)",
             GRAM_K)} AS h
         |  FROM g),
         |hd AS (SELECT doc_id, pos, h,
         |         count(*) OVER (PARTITION BY h) AS df FROM hh),
         |post AS (SELECT doc_id, pos, h FROM hd WHERE df <= $GRAM_MAX_DF),
         |hot AS (SELECT DISTINCT h FROM hd WHERE df > $GRAM_MAX_DF),
         |qd AS (
         |  SELECT doc_id AS query_id,
         |    ${TextFunctions.wordsSql("text")} AS arr
         |  FROM docs
         |  WHERE doc_id % 10 = 5 AND doc_id < 100
         |    AND len(${TextFunctions.wordsSql("text")}) >= ${T0 + NT - 1}),
         |wi AS (SELECT query_id, arr, unnest(range(1, ${NT + 1})) AS i
         |       FROM qd),
         |tok2 AS (
         |  SELECT query_id, i, arr[i + ${T0 - 1}] AS wc,
         |    CASE WHEN (i - 1) % 5 = 0 THEN 'zzqx'
         |         ELSE arr[i + ${T0 - 1}] END AS wp
         |  FROM wi),
         |snc AS (SELECT query_id, string_agg(wc, ' ' ORDER BY i) AS snippet
         |        FROM tok2 GROUP BY 1),
         |snp AS (SELECT query_id, string_agg(wp, ' ' ORDER BY i) AS snippet
         |        FROM tok2 GROUP BY 1),
         |${Seq(("c", "snc"), ("p", "snp")).map { case (v, sn) =>
           s"""qg0$v AS (
              |  SELECT query_id, snippet, unnest(range(1,
              |    greatest(length(snippet) - ${GRAM_K - 1}, 0) + 1)) AS pos
              |  FROM $sn),
              |qh$v AS (
              |  SELECT query_id, pos,
              |    ${Hashing.charHashSql(s"substr(snippet, pos::INT, $GRAM_K)",
                  GRAM_K)} AS h
              |  FROM qg0$v),
              |qg$v AS (SELECT * FROM qh$v
              |         WHERE h NOT IN (SELECT h FROM hot)),
              |exp$v AS (
              |  SELECT query_id, count(*)::BIGINT AS n_expect FROM qg$v
              |  GROUP BY 1 HAVING count(*) >= $MIN_GRAMS),
              |hit$v AS (
              |  SELECT q.query_id, p.doc_id, p.pos - q.pos AS start0,
              |    count(*)::BIGINT AS n_hit
              |  FROM qg$v q JOIN post p USING (h)
              |  GROUP BY 1, 2, 3),
              |occ$v AS (
              |  SELECT c.query_id, count(*)::BIGINT AS n FROM (
              |    SELECT h.query_id, h.doc_id, (h.start0 + 1)::BIGINT AS pos
              |    FROM hit$v h JOIN exp$v e USING (query_id)
              |    WHERE h.n_hit >= e.n_expect) c
              |  JOIN $sn s ON s.query_id = c.query_id
              |  JOIN docs t ON t.doc_id = c.doc_id
              |  WHERE substr(t.text, c.pos::INT, length(s.snippet))
              |    = s.snippet
              |  GROUP BY 1)""".stripMargin
         }.mkString(",\n")},
         |w4 AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM docs WHERE doc_id < $LEX_MAX),
         |tk AS (
         |  SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM w4)
         |  WHERE length(t) > 0),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |       FROM tk GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY 1),
         |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sumdl
         |       FROM dl),
         |qt AS (SELECT DISTINCT query_id, wp AS term FROM tok2
         |       WHERE length(wp) > 0),
         |bm AS (
         |  SELECT q.query_id, f.doc_id AS index_id,
         |    ${graft.operators.LexIndex.contribSql(
               "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
         |  FROM tf f JOIN qt q USING (term) JOIN df d USING (term)
         |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN st),
         |ag AS (
         |  SELECT query_id, index_id, sum(contrib)::BIGINT AS score
         |  FROM bm GROUP BY 1, 2),
         |t1 AS (
         |  SELECT query_id, index_id AS top_doc FROM (
         |    SELECT query_id, index_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, index_id) AS r
         |    FROM ag) WHERE r = 1)
         |SELECT q.query_id,
         |  coalesce(oc.n, 0)::BIGINT AS n_exact_clean,
         |  coalesce(op.n, 0)::BIGINT AS n_exact_pert,
         |  coalesce(t1.top_doc, -1)::BIGINT AS top_doc,
         |  (CASE WHEN coalesce(t1.top_doc, -1) = q.query_id THEN 1
         |   ELSE 0 END)::BIGINT AS self_hit
         |FROM (SELECT query_id FROM qd) q
         |LEFT JOIN occc oc USING (query_id)
         |LEFT JOIN occp op USING (query_id)
         |LEFT JOIN t1 USING (query_id)
         |ORDER BY query_id""".stripMargin)
  }

  /** Lexical-retrieval corruption-robustness curve (q289) — q288's
    * two-point contrast swept into the curve a retrieval owner
    * actually tunes against: the same 24-token snippets probed at
    * three corruption levels (clean; every 5th token replaced; every
    * 2nd token replaced) through ONE [[graft.operators.LexIndex]]
    * probe call — levels ride a composite query id (lvl·1000 + doc),
    * so the batch stays a single bucket-pruned artifact read. The
    * judged rows are the per-level self-hit census: clean recall is
    * the ceiling (itself below 1 on this corpus — a 24-token bag
    * over highly repetitive synthetic vocabulary can rank a longer
    * doc sharing the same head terms first, q288's documented cap),
    * the 20%-corruption point is q288's, and the 50%-corruption
    * point shows where BM25's term-survival margin collapses — the
    * curve that decides whether a contamination pipeline can rely on
    * lexical recall alone at a given noise level. Measured at
    * sf0.01: 5/9 → 5/9 → 2/9 — stable through 20% corruption,
    * collapsed at 50%. The oracle replays all three perturbations
    * and the full BM25 chain.
    */
  val lexRobustnessCurve: Q = {
    val T0 = 3; val NT = 24; val LEX_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val lexRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-index", d, Seq("documents.parquet"))
        if (LexIndex.resolve(lexRoot).isEmpty)
          LexIndex.publish(docs.filter(col("doc_id") < LEX_MAX),
            "doc_id", "text", lexRoot)
        val q0 = docs
          .filter(col("doc_id") % 10 === 5 && col("doc_id") < 100)
          .select(col("doc_id").as("qid"),
            TextFunctions.words(col("text")).as("arr"))
          .filter(size(col("arr")) >= T0 + NT - 1)
          .select(col("qid"), expr(s"slice(arr, $T0, $NT)").as("w"))
        def level(l: Int, every: Int): DataFrame = {
          val pw = if (every == 0) col("w")
            else expr(s"transform(w, (x, i) -> " +
              s"IF(i % $every = 0, 'zzqx', x))")
          q0.select((lit(l.toLong * 1000L) + col("qid")).as("query_id"),
            explode(pw).as("term"))
        }
        val qterms = level(0, 0)
          .unionByName(level(1, 5))
          .unionByName(level(2, 2))
          .filter(length(col("term")) > 0).distinct()
        LexIndex.bm25TopK(s, qterms, "query_id", "term", 1, lexRoot)
          .selectExpr("query_id div 1000 AS lvl", "query_id % 1000 AS qid",
            "index_id")
          .groupBy("lvl")
          .agg(count(lit(1)).as("n_q"),
            sum(when(col("index_id") === col("qid"), 1L).otherwise(0L))
              .as("n_self_hit"))
          .orderBy("lvl")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |qd AS (
         |  SELECT doc_id AS qid, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM docs
         |  WHERE doc_id % 10 = 5 AND doc_id < 100
         |    AND len(${TextFunctions.wordsSql("text")}) >= ${T0 + NT - 1}),
         |wi AS (SELECT qid, arr, unnest(range(1, ${NT + 1})) AS i FROM qd),
         |tok3 AS (
         |  SELECT qid, i, arr[i + ${T0 - 1}] AS w0,
         |    CASE WHEN (i - 1) % 5 = 0 THEN 'zzqx'
         |         ELSE arr[i + ${T0 - 1}] END AS w1,
         |    CASE WHEN (i - 1) % 2 = 0 THEN 'zzqx'
         |         ELSE arr[i + ${T0 - 1}] END AS w2
         |  FROM wi),
         |qt AS (
         |  SELECT DISTINCT query_id, term FROM (
         |    SELECT qid AS query_id, w0 AS term FROM tok3
         |    UNION ALL SELECT 1000 + qid, w1 FROM tok3
         |    UNION ALL SELECT 2000 + qid, w2 FROM tok3)
         |  WHERE length(term) > 0),
         |w4 AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM docs WHERE doc_id < $LEX_MAX),
         |tk AS (
         |  SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM w4)
         |  WHERE length(t) > 0),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |       FROM tk GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY 1),
         |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sumdl
         |       FROM dl),
         |bm AS (
         |  SELECT q.query_id, f.doc_id AS index_id,
         |    ${graft.operators.LexIndex.contribSql(
               "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
         |  FROM tf f JOIN qt q USING (term) JOIN df d USING (term)
         |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN st),
         |ag AS (
         |  SELECT query_id, index_id, sum(contrib)::BIGINT AS score
         |  FROM bm GROUP BY 1, 2),
         |t1 AS (
         |  SELECT query_id, index_id FROM (
         |    SELECT query_id, index_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, index_id) AS r
         |    FROM ag) WHERE r = 1)
         |SELECT (query_id // 1000)::BIGINT AS lvl,
         |  count(*)::BIGINT AS n_q,
         |  sum(CASE WHEN index_id = query_id % 1000 THEN 1 ELSE 0 END)
         |    ::BIGINT AS n_self_hit
         |FROM t1 GROUP BY 1 ORDER BY lvl""".stripMargin)
  }

  /** Media near-dup via shared sampled-frame fingerprints — the
    * perceptual-dedup shape for binary media: sample fixed-stride
    * frames from the opaque content column (q33's codegen sampler),
    * fingerprint each frame (the q47 polynomial char hash at the
    * decode seam), and pair media sharing ≥ 4 frame fingerprints.
    * An injected exact copy shares all its frames with its original;
    * with a real codec the hash input becomes decoded pixel blocks
    * and NOTHING else changes — the plumbing (sampler, fingerprint
    * join, pair threshold) is the judged artifact. Work is
    * bucket-keyed on the frame hash: no media×media comparison, and a
    * degenerate frame shared by k media items (black frame, silence,
    * boilerplate header bytes) cannot blow up to k²/2 pairs — hashes
    * seen in more than MAX_DF media are dropped before the self-join,
    * the same hot-bucket discipline as q23's shingle cap. The cap
    * rides the fh-keyed exchange as a window count, not an extra join.
    */
  /** q93's pairing core, shared with its spec: sample → fingerprint →
    * df-cap → bucket self-join → shared-frame threshold. `corpus` is
    * any (doc_id, text) frame; the spec drives it with a constant-
    * frame corpus to prove the cap bounds pair count.
    */
  def frameDupePairs(corpus: DataFrame, frame: Int, stride: Int,
                     maxFrames: Int, minShared: Long,
                     maxDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val media = Multimodal.mediaTable(corpus, "doc_id", "text")
    val frames = Multimodal.sampleFrames(
      media, "doc_id", frame, stride, maxFrames)
    val fh0 = frames.filter(octet_length(col("frame")) === frame)
      .select(col("doc_id"),
        Hashing.charHash(decode(col("frame"), "UTF-8"), frame).as("fh"))
      .distinct()
    val fh = fh0
      .withColumn("df", count(lit(1)).over(Window.partitionBy("fh")))
      .filter(col("df") <= maxDf).drop("df")
    fh.as("a").join(fh.as("b"),
        col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The media item's sampled-frame fingerprint set ((doc_id, s) —
    * q93's codegen sampler at the decode seam), the element universe
    * the media arms of the dedup family minhash over.
    */
  private def mediaFrameSets(corpus: DataFrame, frame: Int, stride: Int,
                             maxF: Int): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.mediaTable(corpus, "doc_id", "text"),
        "doc_id", frame, stride, maxF)
      .filter(octet_length(col("frame")) === frame)
      .select(col("doc_id"), decode(col("frame"), "UTF-8").as("s"))
      .distinct()

  /** Persisted media near-dup index (q287) — ONE index family, TWO
    * modalities: [[graft.operators.DedupIndex]] (the banded MinHash
    * artifact q91/q246 run on text shingles) serving perceptual media
    * dedup with zero new index machinery. The element set is the
    * media item's sampled-frame fingerprints (q93's codegen sampler
    * at the decode seam) instead of word shingles — minhash is
    * modality-free over any string set
    * ([[graft.operators.Dedup.minhashSignaturesOfSets]]), so the
    * SAME publish/probe/tombstone/compact lifecycle, bucket pruning
    * and crash story carry over verbatim. The index corpus publishes
    * once per data version; the probe batch (new arrivals + exact
    * redeliveries of indexed media) pays banding + the bucket-pruned
    * candidate join, and candidates are VERIFIED by the true
    * shared-frame count (pair-bounded join, q59's rule). The oracle
    * replays frames → signatures → bands → NEW × INDEX collisions →
    * shared-count verification from the raw table.
    */
  val mediaIndex: Q = {
    val FRAME = 32; val STRIDE = 16; val MAX_F = 8
    val MIN_SHARED = 4L; val INDEX_MAX = 400L; val REDELIVER = 20L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    def frameSets(corpus: DataFrame): DataFrame =
      mediaFrameSets(corpus, FRAME, STRIDE, MAX_F)
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idx = docs.filter(col("doc_id") < INDEX_MAX)
        val probeM = docs.filter(col("doc_id") >= INDEX_MAX)
          .unionByName(docs.filter(col("doc_id") < REDELIVER)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-media-index", d, Seq("documents.parquet"))
        if (DedupIndex.resolve(root).isEmpty)
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(frameSets(idx), "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, root)
        // probe output is already distinct (new_id, index_id) pairs
        val cand = DedupIndex.probe(s,
            Dedup.minhashSignaturesOfSets(frameSets(probeM), "doc_id",
              "s", MH_K),
            "doc_id", MH_BANDS, MH_R, root)
        cand
          .join(frameSets(probeM).withColumnRenamed("doc_id", "new_id"),
            Seq("new_id"))
          .join(frameSets(idx).withColumnRenamed("doc_id", "index_id"),
            Seq("index_id", "s"))
          .groupBy("new_id", "index_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MIN_SHARED)
          .orderBy("new_id", "index_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id, text, 0 AS is_new FROM docs
         |  WHERE doc_id < $INDEX_MAX
         |  UNION ALL SELECT doc_id, text, 1 FROM docs
         |    WHERE doc_id >= $INDEX_MAX
         |  UNION ALL SELECT doc_id + 1000000, text, 1 FROM docs
         |    WHERE doc_id < $REDELIVER),
         |fr AS (
         |  SELECT doc_id, is_new, text, unnest(range(0,
         |    least(${MAX_F - 1},
         |          greatest(length(text) - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM corpus),
         |f32 AS (
         |  SELECT DISTINCT doc_id, is_new,
         |    substr(text, (f * $STRIDE + 1)::INT, $FRAME) AS s
         |  FROM fr
         |  WHERE length(substr(text, (f * $STRIDE + 1)::INT, $FRAME))
         |    = $FRAME),
         |sig AS (
         |  SELECT doc_id, is_new,
         |    $sigCols
         |  FROM f32 GROUP BY doc_id, is_new),
         |bands AS (
         |  $bandRowsSql),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |  FROM bands a JOIN bands x
         |    ON a.band = x.band AND a.band_key = x.band_key
         |  WHERE a.is_new = 1 AND x.is_new = 0)
         |SELECT c.new_id, c.index_id, count(*)::BIGINT AS n_shared
         |FROM cand c
         |JOIN f32 fa ON fa.doc_id = c.new_id
         |JOIN f32 fb ON fb.doc_id = c.index_id AND fb.s = fa.s
         |GROUP BY 1, 2 HAVING count(*) >= $MIN_SHARED
         |ORDER BY new_id, index_id""".stripMargin)
  }

  val mediaDupes: Q = {
    val FRAME = 32; val STRIDE = 16; val MAX_F = 8
    val MIN_SHARED = 4L; val REDELIVER = 50L; val MAX_DF = 100L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val corpus = docs.unionByName(docs.filter(col("doc_id") < REDELIVER)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        frameDupePairs(corpus, FRAME, STRIDE, MAX_F, MIN_SHARED, MAX_DF)
          .orderBy("id_a", "id_b")
      },
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents
         |    WHERE doc_id < $REDELIVER),
         |fr AS (
         |  SELECT doc_id, text, unnest(range(0,
         |    least(${MAX_F - 1},
         |          greatest(length(text) - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM corpus),
         |fx AS (SELECT doc_id,
         |         substr(text, (f * $STRIDE + 1)::INT, $FRAME) AS frame
         |       FROM fr),
         |f32 AS (SELECT DISTINCT doc_id, frame FROM fx
         |        WHERE length(frame) = $FRAME),
         |fh0 AS (SELECT DISTINCT doc_id,
         |         ${Hashing.charHashSql("frame", FRAME)} AS fh
         |       FROM f32),
         |hot AS (SELECT fh FROM fh0 GROUP BY fh HAVING count(*) > $MAX_DF),
         |fh AS (SELECT doc_id, fh FROM fh0
         |       WHERE fh NOT IN (SELECT fh FROM hot)),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    count(*)::BIGINT AS n_shared
         |  FROM fh a JOIN fh b ON a.fh = b.fh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $MIN_SHARED)
         |SELECT id_a, id_b, n_shared FROM p ORDER BY id_a, id_b""".stripMargin)
  }

  /** Media purge through the compliance cascade (q303) — the GDPR
    * case the text/vector arms of q290 don't cover: a deletion
    * request naming MEDIA items (a face in a video, a voice in a
    * clip) must make them unfindable through the perceptual near-dup
    * probe. q287's frame-fingerprint artifact is a [[DedupIndex]]
    * instance, so the media modality registers as one more
    * [[graft.operators.PurgeCascade.dedup]] arm — the same
    * tombstone → compact → vacuum chain, fanned by the same `purge`
    * call. The judged chain: publish the media index, cascade-purge
    * every 10th media id, then probe with new arrivals + exact
    * redeliveries of INDEXED media (purged ones among them — the
    * redelivered copy of a forgotten video must surface no link to
    * it). Candidates verify by true shared-frame count against the
    * SURVIVING index corpus; the oracle replays frames → signatures →
    * bands → collisions → verification over a corpus where the purged
    * media was never ingested, so a hash match proves the purge
    * dropped exactly the deletion set and kept every surviving link.
    */
  val mediaPurgeCascade: Q = {
    val FRAME = 32; val STRIDE = 16; val MAX_F = 8
    val MIN_SHARED = 4L; val INDEX_MAX = 400L; val REDELIVER = 60L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        import graft.operators.PurgeCascade
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idx = docs.filter(col("doc_id") < INDEX_MAX)
        val idxLive = idx.filter(col("doc_id") % 10 =!= 0)
        val probeM = docs.filter(col("doc_id") >= INDEX_MAX)
          .unionByName(docs.filter(col("doc_id") < REDELIVER)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-media-purge", d, Seq("documents.parquet"))
        if (DedupIndex.resolve(root).isEmpty) {
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(
              mediaFrameSets(idx, FRAME, STRIDE, MAX_F), "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, root)
          // the media root as a cascade arm — same call shape as
          // q290's seven; a production cascade passes all eight
          PurgeCascade.purge(s,
            idx.filter(col("doc_id") % 10 === 0).select("doc_id"),
            Seq(PurgeCascade.dedup(root)), vacuum = true)
        }
        val cand = DedupIndex.probe(s,
            Dedup.minhashSignaturesOfSets(
              mediaFrameSets(probeM, FRAME, STRIDE, MAX_F), "doc_id",
              "s", MH_K),
            "doc_id", MH_BANDS, MH_R, root)
        cand
          .join(mediaFrameSets(probeM, FRAME, STRIDE, MAX_F)
            .withColumnRenamed("doc_id", "new_id"), Seq("new_id"))
          .join(mediaFrameSets(idxLive, FRAME, STRIDE, MAX_F)
            .withColumnRenamed("doc_id", "index_id"), Seq("index_id", "s"))
          .groupBy("new_id", "index_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MIN_SHARED)
          .orderBy("new_id", "index_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id, text, 0 AS is_new FROM docs
         |  WHERE doc_id < $INDEX_MAX AND doc_id % 10 <> 0
         |  UNION ALL SELECT doc_id, text, 1 FROM docs
         |    WHERE doc_id >= $INDEX_MAX
         |  UNION ALL SELECT doc_id + 1000000, text, 1 FROM docs
         |    WHERE doc_id < $REDELIVER),
         |fr AS (
         |  SELECT doc_id, is_new, text, unnest(range(0,
         |    least(${MAX_F - 1},
         |          greatest(length(text) - $FRAME, 0) // $STRIDE) + 1)) AS f
         |  FROM corpus),
         |f32 AS (
         |  SELECT DISTINCT doc_id, is_new,
         |    substr(text, (f * $STRIDE + 1)::INT, $FRAME) AS s
         |  FROM fr
         |  WHERE length(substr(text, (f * $STRIDE + 1)::INT, $FRAME))
         |    = $FRAME),
         |sig AS (
         |  SELECT doc_id, is_new,
         |    $sigCols
         |  FROM f32 GROUP BY doc_id, is_new),
         |bands AS (
         |  $bandRowsSql),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |  FROM bands a JOIN bands x
         |    ON a.band = x.band AND a.band_key = x.band_key
         |  WHERE a.is_new = 1 AND x.is_new = 0)
         |SELECT c.new_id, c.index_id, count(*)::BIGINT AS n_shared
         |FROM cand c
         |JOIN f32 fa ON fa.doc_id = c.new_id
         |JOIN f32 fb ON fb.doc_id = c.index_id AND fb.s = fa.s
         |GROUP BY 1, 2 HAVING count(*) >= $MIN_SHARED
         |ORDER BY new_id, index_id""".stripMargin)
  }

  /** Lexical rarity score — the integer analog of CCNet's LM-driven
    * quality signal: rare tokens carry information, so a document's
    * mean token-frequency magnitude separates natural text from
    * keyword stuffing and boilerplate. The magnitude proxy is the
    * DIGIT COUNT of each token's corpus frequency (an exact integer
    * log₁₀ bucket — no float log to diverge on); per-doc score =
    * mean digits ×1000, truncating div (all positive, so Spark `div`
    * == DuckDB `//`). Shapes: one token groupBy (vocab-sized), one
    * corpus join back, one per-doc agg.
    */
  val rarityScore: Q = Q(
    (s, d) => {
      val tok = t(s, d, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val tf = tok.groupBy("w").agg(count(lit(1)).as("freq"))
      tok.join(tf, Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(length(col("freq").cast("string")).cast("long"))
            .as("digit_sum"))
        .select(col("doc_id"), col("n_tok"),
          expr("digit_sum * 1000 div n_tok").as("rarity_scaled"))
        .orderBy("doc_id")
    },
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS w
       |  FROM documents),
       |tf AS (SELECT w, count(*)::BIGINT AS freq FROM tok
       |       WHERE length(w) > 0 GROUP BY w),
       |j AS (SELECT doc_id, length(freq::VARCHAR)::BIGINT AS dg
       |      FROM tok JOIN tf USING (w))
       |SELECT doc_id, count(*)::BIGINT AS n_tok,
       |  (sum(dg) * 1000 // count(*))::BIGINT AS rarity_scaled
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** Pinned training-mixture snapshot (q95) — cross-run data
    * versioning, the reproducibility capstone over q77 + q43: publish
    * a [[MixManifest]] (amortized — once per mixture decision, not per
    * run) pinning the per-source keep thresholds, the split bounds,
    * and the source table's fingerprint, then read the corpus THROUGH
    * the pinned manifest and report per-(source, split) kept counts.
    * Membership is a pure function of (doc_id, manifest version):
    * rerunning — on this engine or any other — reselects the identical
    * documents, which is what makes a training run auditable end to
    * end. The oracle derives the same thresholds and split from the
    * same data, mirroring a manifest pinned at head.
    */
  val mixManifestSnapshot: Q = {
    val SCALE = 1000000L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
        // root keyed by the source table's fingerprint (q91's
        // amortization rule): pin once per table version, reruns read
        // the existing manifest; a data change re-pins under a new key
        val fp = graft.sources.TableStats.fingerprint(s"$d/documents.parquet")
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-mix-manifest", d, Seq("documents.parquet"))
        if (MixManifest.resolve(root).isEmpty)
          MixManifest.publish(docs, "doc_id", "source", SCALE, 80, 90, root,
            provenance = fp)
        val pinned = MixManifest.load(s, root)
        MixManifest.applyMix(docs, pinned, "doc_id", "source")
          .groupBy("source", "split").agg(count(lit(1)).as("n_kept"))
          .orderBy("source", "split")
      },
      s"""WITH counts AS (
         |  SELECT source, count(*)::BIGINT AS n_docs FROM documents
         |  GROUP BY source),
         |nmin AS (SELECT min(n_docs) AS n_min FROM counts),
         |thr AS (
         |  SELECT source,
         |    round(sqrt(n_min::DOUBLE / n_docs::DOUBLE) * $SCALE)::BIGINT AS thr
         |  FROM counts, nmin),
         |kept AS (
         |  SELECT d.source,
         |    CASE WHEN (${Hashing.h32Sql("doc_id::VARCHAR")}) % 100 < 80 THEN 'train'
         |         WHEN (${Hashing.h32Sql("doc_id::VARCHAR")}) % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents d JOIN thr USING (source)
         |  WHERE (${Hashing.h32Sql("doc_id::VARCHAR")}) % $SCALE < thr)
         |SELECT source, split, count(*)::BIGINT AS n_kept
         |FROM kept GROUP BY source, split ORDER BY source, split""".stripMargin)
  }

  /** ANN recall evaluation (q96) — the measurement harness every
    * production ANN deployment needs: recall@K of the multi-table LSH
    * path (q74's at-scale form) against exact brute-force ground
    * truth, per query. At 100 TB this runs on a SAMPLED query set —
    * the quadratic brute-force cost is paid on the sample only while
    * the approximate side reuses the production bucket join — making
    * recall a monitored number instead of a hoped-for property. Both
    * rankings break cos_sim ties by vec_id, so the hit set is
    * deterministic on both engines; recall_pct uses integer div
    * (all-positive — Spark `div` and DuckDB `//` agree).
    */
  val annRecall: Q = {
    val K = 10; val NQ = 20
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < NQ)
        val exact = Similarity.bruteForceTopK(
            emb, queries, "vec_id", "embedding", K)
          .select(col("query_id"), col("vec_id"))
        val r = VectorFunctions.mtBits(corpusStats(s, d)._1)
        val approx = Similarity.multiTableTopK(
            emb, queries, "vec_id", "embedding", K,
            r, VectorFunctions.mtTables(r))
          .select(col("query_id"), col("vec_id"))
        val hits = exact.join(approx, Seq("query_id", "vec_id"), "leftsemi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        queries.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
          .selectExpr("query_id", "n_hit",
            s"n_hit * 100 div $K AS recall_pct")
          .orderBy("query_id")
      },
      s"""WITH ${mtCtes("embeddings")},
         |qx AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < $NQ),
         |cx AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bs AS (
         |  SELECT query_id, vec_id,
         |    round(list_dot_product(qv, v) /
         |          (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
         |      AS cos_sim
         |  FROM qx JOIN cx ON vec_id <> query_id),
         |br AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM bs),
         |ex AS (SELECT query_id, vec_id FROM br WHERE rnk <= $K),
         |aq AS (SELECT vec_id, embedding, tbl, bucket FROM kb
         |       WHERE vec_id < $NQ),
         |ascore AS (
         |  SELECT aq.vec_id AS query_id, kb.vec_id,
         |    max(round(${VectorFunctions.cosineSql("aq.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM aq JOIN kb ON aq.tbl = kb.tbl AND aq.bucket = kb.bucket
         |    AND kb.vec_id <> aq.vec_id
         |  GROUP BY aq.vec_id, kb.vec_id),
         |ar AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rnk
         |  FROM ascore),
         |ax AS (SELECT query_id, vec_id FROM ar WHERE rnk <= $K),
         |hit AS (
         |  SELECT e.query_id, count(*)::BIGINT AS n_hit
         |  FROM ex e JOIN ax a
         |    ON e.query_id = a.query_id AND e.vec_id = a.vec_id
         |  GROUP BY e.query_id)
         |SELECT q.query_id, coalesce(h.n_hit, 0)::BIGINT AS n_hit,
         |  (coalesce(h.n_hit, 0) * 100 // $K)::BIGINT AS recall_pct
         |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < $NQ) q
         |LEFT JOIN hit h USING (query_id)
         |ORDER BY query_id""".stripMargin)
  }

  /** Rowwise int8 affine quantization of the embedding column (q97) —
    * the vector-COMPRESSION step of an embedding pipeline (4× smaller
    * than float32 at serving/storage time): per vector, map each
    * component to a 0..255 code against the vector's own [min, max]
    * range, and report code diversity plus exact reconstruction error.
    * Everything runs in the shared micro-unit INTEGER domain
    * ([[VectorFunctions.scaledMicro]]) with floor division on
    * non-negative operands (Spark `div` = DuckDB `//`), so codes and
    * error sums are hash-exact across engines — no float rounding to
    * diverge. One scan, all per-row codegen lambdas, zero shuffles
    * before the final sort: embarrassingly parallel at any corpus
    * size.
    */
  val int8Quant: Q = Q(
    (s, d) => {
      t(s, d, "embeddings").select(col("vec_id"),
          VectorFunctions.scaledMicro(col("embedding")).as("xs"))
        .selectExpr("vec_id", "xs",
          "array_min(xs) AS mn", "array_max(xs) AS mx")
        .selectExpr("vec_id", "mn", "mx", "xs",
          "greatest(mx - mn, 1L) AS rng")
        .selectExpr("vec_id", "mn", "mx",
          "transform(xs, x -> (x - mn) * 255 div rng) AS codes",
          "transform(xs, x -> abs((x - mn) - ((x - mn) * 255 div rng) * rng div 255)) AS errs")
        .selectExpr("vec_id", "mn", "mx",
          "cast(size(array_distinct(codes)) AS bigint) AS n_codes",
          "aggregate(errs, 0L, (a, e) -> a + e) AS err_total",
          "array_max(errs) AS err_max")
        .orderBy("vec_id")
    },
    s"""WITH xs AS (
       |  SELECT vec_id, ${VectorFunctions.scaledMicroSql("embedding")} AS xs
       |  FROM embeddings),
       |mm AS (
       |  SELECT vec_id, xs, list_min(xs) AS mn, list_max(xs) AS mx,
       |    greatest(list_max(xs) - list_min(xs), 1) AS rng
       |  FROM xs),
       |qc AS (
       |  SELECT vec_id, mn, mx,
       |    list_transform(xs, x -> (x - mn) * 255 // rng) AS codes,
       |    list_transform(xs,
       |      x -> abs((x - mn) - ((x - mn) * 255 // rng) * rng // 255)) AS errs
       |  FROM mm)
       |SELECT vec_id, mn, mx,
       |  len(list_distinct(codes))::BIGINT AS n_codes,
       |  list_sum(errs)::BIGINT AS err_total,
       |  list_max(errs)::BIGINT AS err_max
       |FROM qc ORDER BY vec_id""".stripMargin)

  /** Document-length histogram in power-of-two buckets per source
    * (q98) — the packing planner's input: q62's sequence packing needs
    * the length DISTRIBUTION (how much of the corpus is short-tail vs
    * max-length) to pick sequence length and predict padding waste.
    * The bucket is `length(bin(n))` = ⌊log₂ n⌋ + 1 — an exact integer
    * on both engines, no float log. One scan, one (source, bucket)
    * groupBy with taxonomy-bounded state.
    */
  val lengthHistogram: Q = Q(
    (s, d) =>
      t(s, d, "documents")
        .selectExpr("source",
          "cast(length(bin(greatest(length(text), 1))) AS bigint) AS len_bucket",
          "cast(length(text) AS bigint) AS n_chars")
        .groupBy("source", "len_bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("source", "len_bucket"),
    """SELECT source,
      |  length(bin(greatest(length(text), 1)))::BIGINT AS len_bucket,
      |  count(*)::BIGINT AS n_docs,
      |  sum(length(text))::BIGINT AS total_chars
      |FROM documents
      |GROUP BY source, len_bucket
      |ORDER BY source, len_bucket""".stripMargin)

  /** Benchmark-contamination FRACTION report (q99) — the standard
    * decontamination metric (n-gram overlap fraction, the GPT-3/PaLM
    * datasheet number): per corpus doc, the share of its distinct
    * 3-gram shingles that appear anywhere in the benchmark set,
    * reported for docs at ≥ 50%. q50 gives the absolute-count filter;
    * this is the normalized readout an audit wants (a long doc can
    * share 5 shingles innocently — 50% of its shingles is a different
    * story). Injected exact copies of benchmark docs must surface at
    * 1000/1000. Same scale shape as q50: shingle semi-join against
    * the benchmark set (bounded — benchmark suites are fixed-size,
    * not corpus-scaled), one doc-keyed groupBy; fraction in integer
    * thousandths (all-positive floor div — engine-exact).
    */
  val contaminationFrac: Q = {
    val BENCH_MAX = 25L; val REDELIVER = 10L
    val SCALE = 1000L; val MIN_FRAC = 500L
    Q(
      (s, d) => {
        val base = t(s, d, "documents").select(col("doc_id"), col("text"))
        val docs = base.unionByName(base.filter(col("doc_id") < REDELIVER)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        val sh = Dedup.shingleKeys(docs, "doc_id", "text", 3)
        val bench = sh.filter(col("doc_id") < BENCH_MAX).select("s").distinct()
        val corpus = sh.filter(col("doc_id") >= BENCH_MAX)
        val sizes = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val shared = corpus.join(bench, Seq("s"), "leftsemi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        sizes.join(shared, Seq("doc_id"))
          .selectExpr("doc_id", "n_sh", "n_shared",
            s"n_shared * $SCALE div n_sh AS frac_scaled")
          .filter(col("frac_scaled") >= MIN_FRAC)
          .orderBy("doc_id")
      },
      s"""WITH corpus0 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents
         |    WHERE doc_id < $REDELIVER),
         |w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM corpus0),
         |sh AS (
         |  SELECT DISTINCT doc_id, unnest(${TextFunctions.shinglesSql("arr")}) AS s
         |  FROM w),
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < $BENCH_MAX),
         |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= $BENCH_MAX),
         |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM corpus
         |          GROUP BY doc_id),
         |shared AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_shared FROM corpus
         |  WHERE s IN (SELECT s FROM bench) GROUP BY doc_id)
         |SELECT doc_id, n_sh, n_shared,
         |  (n_shared * $SCALE // n_sh)::BIGINT AS frac_scaled
         |FROM sizes JOIN shared USING (doc_id)
         |WHERE n_shared * $SCALE // n_sh >= $MIN_FRAC
         |ORDER BY doc_id""".stripMargin)
  }

  /** Dataset card (q100) — the datasheet numbers a corpus release
    * ships with, from ONE scan: doc count, language/source taxonomy
    * sizes, total and mean chars (integer div), and distinct-content
    * count (the exact-dup-rate readout). Exact distincts are the
    * oracle-checkable form; at 100 TB the content-hash distinct swaps
    * for q83's HLL registers (2^P state) and lang/source distincts
    * stay exact (taxonomy-bounded). Spark plans the multi-distinct as
    * one scan + expand — still a single pass over the data.
    */
  val datasetCard: Q = Q(
    (s, d) =>
      t(s, d, "documents")
        .selectExpr("lang", "source",
          "cast(length(text) AS bigint) AS n_chars", "md5(text) AS h")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum("n_chars").as("total_chars"),
          expr("sum(n_chars) div count(1)").as("mean_chars"),
          countDistinct(col("h")).as("n_unique_texts")),
    """SELECT count(*)::BIGINT AS n_docs,
      |  count(DISTINCT lang)::BIGINT AS n_langs,
      |  count(DISTINCT source)::BIGINT AS n_sources,
      |  sum(length(text))::BIGINT AS total_chars,
      |  (sum(length(text)) // count(*))::BIGINT AS mean_chars,
      |  count(DISTINCT md5(text))::BIGINT AS n_unique_texts
      |FROM documents""".stripMargin)

  /** Bigram surprisal score (q101) — the sequence-level fluency
    * signal q94's unigram rarity can't see: keyword stuffing scores
    * fluent unigram-wise but its bigrams are improbable. The corpus is
    * its own language model (the self-perplexity curation trick; CCNet
    * uses an external LM, the plumbing is identical): per bigram,
    * surprisal = digits(n_x) − digits(n_xy) — an exact integer log₁₀
    * bucket of 1/P(y|x), q94's digit trick applied to a ratio, never
    * a float log — and per doc the mean surprisal ×1000 (all
    * non-negative, so truncating and floor division agree across
    * engines). Scale shape: bigram LM counts are corpus-DISTINCT-
    * bounded (two grouped counts), the scoring join is
    * (x, y)-keyed, and the per-doc mean is one doc-keyed groupBy —
    * no per-doc LM state, no cross-doc work.
    */
  val bigramSurprisal: Q = Q(
    (s, d) => {
      val db = t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.words(col("text")).as("arr"))
        .filter(size(col("arr")) >= 2) // sequence(2,1) would descend
        .select(col("doc_id"),
          explode(transform(sequence(lit(2), size(col("arr"))),
            i => struct(element_at(col("arr"), i - 1).as("x"),
              element_at(col("arr"), i).as("y")))).as("b"))
        .select(col("doc_id"), col("b.x").as("x"), col("b.y").as("y"))
      val c = db.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      val cx = c.groupBy("x").agg(sum("n_xy").as("n_x"))
      val lm = c.join(cx, Seq("x"))
        .select(col("x"), col("y"),
          (length(col("n_x").cast("string")) -
            length(col("n_xy").cast("string"))).as("lp"))
      db.join(lm, Seq("x", "y"))
        .groupBy("doc_id")
        .agg(sum("lp").as("sl"), count(lit(1)).as("nb"))
        .selectExpr("doc_id", "(sl * 1000) div nb AS surprisal_scaled")
        .orderBy("doc_id")
    },
    s"""WITH w AS (
       |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents WHERE len(${TextFunctions.wordsSql("text")}) >= 2),
       |i AS (SELECT doc_id, arr, unnest(range(2, len(arr) + 1)) AS i FROM w),
       |b AS (SELECT doc_id, arr[i - 1] AS x, arr[i] AS y FROM i),
       |c AS (SELECT x, y, count(*)::BIGINT AS n_xy FROM b GROUP BY x, y),
       |cx AS (SELECT x, sum(n_xy)::BIGINT AS n_x FROM c GROUP BY x),
       |lm AS (
       |  SELECT x, y, length(n_x::VARCHAR) - length(n_xy::VARCHAR) AS lp
       |  FROM c JOIN cx USING (x))
       |SELECT doc_id,
       |  ((sum(lp) * 1000) // count(*))::BIGINT AS surprisal_scaled
       |FROM b JOIN lm USING (x, y)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin)

  /** TextRank keyword extraction (q201) — Mihalcea & Tarau's
    * unsupervised keyworder: PageRank over the word co-occurrence
    * graph. Content words (length ≥ 4 — the stopword screen) are
    * bigrammed IN filtered-sequence order per doc (q101's array
    * transform, no posexplode self-join), distinct undirected edges
    * hash to int64 node ids via the shared seeded family, and the
    * SAME [[graft.operators.PageRank.ranks]] integer recurrence q70
    * runs on the trade graph runs here on the vocabulary graph — one
    * operator, two domains. The oracle unrolls the identical 3
    * damped rounds, so bit-exact rank units double as a proof the
    * graph build (filter → bigram → hash → symmetrize) matched.
    * Graph size is vocabulary-bounded, never corpus-bounded; ranks
    * join back to `min(word)` per node for the human-readable top-15.
    */
  val textRank: Q = {
    val ITERS = 3; val K = 15; val MINLEN = 4; val SEED = 77
    def iterCte(i: Int): String =
      s"""s$i AS (
         |  SELECT r${i - 1}.node AS src, (r // outdeg)::BIGINT AS share
         |  FROM r${i - 1} JOIN od ON r${i - 1}.node = od.src),
         |f$i AS (
         |  SELECT e.dst AS node, sum(share) AS inflow
         |  FROM e JOIN s$i ON e.src = s$i.src GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.node,
         |    ((15 * (${graft.operators.PageRank.SCALE} // nn.n_nodes)) // 100
         |     + (85 * coalesce(f.inflow, 0)) // 100)::BIGINT AS r
         |  FROM nodes n CROSS JOIN nn
         |  LEFT JOIN f$i f ON n.node = f.node)"""
    Q(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"),
            filter(TextFunctions.words(col("text")),
              w => length(w) >= MINLEN).as("arr"))
        val bi = toks.filter(size(col("arr")) >= 2)
          .select(explode(transform(sequence(lit(2), size(col("arr"))),
            i => struct(element_at(col("arr"), i - 1).as("wa"),
              element_at(col("arr"), i).as("wb")))).as("b"))
          .select(col("b.wa").as("wa"), col("b.wb").as("wb"))
          .filter(col("wa") =!= col("wb"))
        val e0 = bi
          .select(Hashing.seeded(SEED, col("wa")).as("src"),
            Hashing.seeded(SEED, col("wb")).as("dst"))
          .distinct()
        val edges = e0.unionByName(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        val names = toks.select(explode(col("arr")).as("w"))
          .groupBy(Hashing.seeded(SEED, col("w")).as("node"))
          .agg(min("w").as("word"))
        graft.operators.PageRank.ranks(edges, "src", "dst", ITERS)
          .join(names, Seq("node"))
          .select(col("word"), col("r").as("rank_units"))
          .orderBy(desc("rank_units"), asc("word")).limit(K)
      },
      s"""WITH w AS (
         |  SELECT doc_id,
         |    list_filter(${TextFunctions.wordsSql("text")},
         |      x -> length(x) >= $MINLEN) AS arr
         |  FROM documents),
         |w2 AS (SELECT doc_id, arr FROM w WHERE len(arr) >= 2),
         |i AS (SELECT doc_id, arr, unnest(range(2, len(arr) + 1)) AS i
         |      FROM w2),
         |b AS (SELECT arr[i - 1] AS wa, arr[i] AS wb FROM i
         |      WHERE arr[i - 1] <> arr[i]),
         |e0 AS (SELECT DISTINCT ${Hashing.seededSql(SEED, "wa")} AS src,
         |         ${Hashing.seededSql(SEED, "wb")} AS dst FROM b),
         |e AS (SELECT src, dst FROM e0
         |      UNION SELECT dst AS src, src AS dst FROM e0),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes),
         |od AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
         |r0 AS (SELECT node,
         |         (${graft.operators.PageRank.SCALE} // n_nodes)::BIGINT AS r
         |       FROM nodes, nn),
         |${(1 to ITERS).map(iterCte).mkString(",\n")},
         |names AS (
         |  SELECT ${Hashing.seededSql(SEED, "x")} AS node, min(x) AS word
         |  FROM (SELECT unnest(arr) AS x FROM w) GROUP BY 1)
         |SELECT word, r AS rank_units
         |FROM r$ITERS JOIN names ON r$ITERS.node = names.node
         |ORDER BY rank_units DESC, word LIMIT $K""".stripMargin)
  }

  /** Synthetic range-source parity (q212) — the zero-I/O table
    * generator a 100 TB test/benchmark harness needs: `spark.range`
    * splits the index space evenly across executors (embarrassingly
    * parallel, no input files, no shuffle until the final bounded
    * aggregate), and every column derives from the row index through
    * the SAME seeded hash family the dedup/sketch operators use — so
    * the data is reproducible on any cluster topology, any executor
    * count, any retry. The judged output is the generated table's
    * per-bucket fingerprint (count, value sum, id range); the oracle
    * regenerates the identical table from DuckDB's `range()` — pure
    * compute parity, proving the generator is engine-portable and
    * deterministic, the property that makes generated corpora
    * legitimate test fixtures.
    */
  val rangeSource: Q = {
    val N = 100000L; val SEED = 31; val BUCKETS = 20L; val VMOD = 100000L
    Q(
      (s, _) => {
        val g = s.range(N).toDF("id")
          .withColumn("h",
            Hashing.seeded(SEED, col("id").cast("string")))
          .select(col("id"), pmod(col("h"), lit(BUCKETS)).as("bucket"),
            pmod(col("h"), lit(VMOD)).as("value_cents"))
        g.groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            sum("value_cents").as("sum_cents"),
            min("id").as("min_id"), max("id").as("max_id"))
          .orderBy("bucket")
      },
      s"""WITH g AS (
         |  SELECT id, ${Hashing.seededSql(SEED, "id::VARCHAR")} AS h
         |  FROM range($N) t(id)),
         |c AS (SELECT id, h % $BUCKETS AS bucket, h % $VMOD AS value_cents
         |      FROM g)
         |SELECT bucket, count(*)::BIGINT AS n,
         |  sum(value_cents)::BIGINT AS sum_cents,
         |  min(id)::BIGINT AS min_id, max(id)::BIGINT AS max_id
         |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** Readability audit (q211) — the Flesch-style structural read on
    * each source: average words per sentence and characters per word,
    * both in exact milli units (the two drivers every readability
    * formula reduces to — the syllable estimate is a lookup swapped
    * in at the same seam). Sentences are non-empty '.'-segments
    * (`greatest(…,1)` so headline-only docs count as one); word
    * characters are `length(replace(text,' ',''))` — no explode
    * needed, the whole doc profile is row-local expressions feeding
    * one per-source aggregate. A source whose wps/cpw drifts from
    * the corpus band is template spam, OCR noise, or genuinely
    * different register — all reviewable facts.
    */
  val readability: Q = Q(
    (s, d) => {
      t(s, d, "documents")
        .select(col("source"),
          size(TextFunctions.words(col("text"))).cast("long")
            .as("n_words"),
          greatest(size(filter(split(col("text"), "\\."),
            x => length(trim(x)) > 0)), lit(1)).cast("long")
            .as("n_sent"),
          length(regexp_replace(col("text"), " ", "")).cast("long")
            .as("n_wchars"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("n_words"), sum("n_sent").as("n_sents"),
          sum("n_wchars").as("n_wchars"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_sents"),
          expr("n_words * 1000L div n_sents").as("wps_milli"),
          expr("n_wchars * 1000L div n_words").as("cpw_milli"))
        .orderBy("source")
    },
    s"""WITH pd AS (
       |  SELECT source,
       |    len(${TextFunctions.wordsSql("text")})::BIGINT AS n_words,
       |    greatest(len(list_filter(regexp_split_to_array(text, '\\.'),
       |      x -> length(trim(x)) > 0)), 1)::BIGINT AS n_sent,
       |    length(replace(text, ' ', ''))::BIGINT AS n_wchars
       |  FROM documents)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(n_words)::BIGINT AS n_words,
       |  sum(n_sent)::BIGINT AS n_sents,
       |  (sum(n_words) * 1000 // sum(n_sent))::BIGINT AS wps_milli,
       |  (sum(n_wchars) * 1000 // sum(n_words))::BIGINT AS cpw_milli
       |FROM pd GROUP BY source ORDER BY source""".stripMargin)

  /** Cross-source duplication matrix (q208) — WHO syndicates WHOM:
    * for every ordered source pair (a, b), how many distinct content
    * hashes occur in both (and how many docs of `a` that duplication
    * covers). q22 collapses duplicates; this localizes them across
    * the source taxonomy — the feed-overlap view a curator reads
    * before double-counting "independent" sources in a mixture.
    * Same inversion as q198: ONE hash-keyed shuffle collects each
    * content hash's source set (plus per-source doc counts inside
    * the set), the ≤|sources| set expands to ordered pairs, and
    * everything after is taxonomy-bounded. The oracle self-joins on
    * the hash, so parity again proves inversion ≡ join. The natural
    * corpus has no cross-source exact dups, so every 7th doc is
    * re-emitted under a `_mirror` source (q22's injection
    * discipline) — the matrix must recover exactly that syndication
    * pattern.
    */
  val sourceDupMatrix: Q = Q(
    (s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("source"), lit("_mirror")).as("source"),
            col("text")))
      val h = corpus.select(col("source"), md5(col("text")).as("h"))
      val perHash = h.groupBy("h", "source")
        .agg(count(lit(1)).as("n_docs"))
        .groupBy("h")
        .agg(collect_list(struct(col("source"), col("n_docs")))
          .as("ss"))
        .filter(size(col("ss")) >= 2)
      val pairs = perHash
        .select(explode(col("ss")).as("a"), col("ss"))
        .select(col("a.source").as("src_a"),
          col("a.n_docs").as("na"), explode(col("ss")).as("b"))
        .filter(col("src_a") =!= col("b.source"))
        .select(col("src_a"), col("b.source").as("src_b"), col("na"))
      pairs.groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_shared_hashes"),
          sum("na").as("n_docs_a"))
        .orderBy("src_a", "src_b")
    },
    """WITH corpus AS (
      |  SELECT source, text FROM documents
      |  UNION ALL
      |  SELECT source || '_mirror' AS source, text FROM documents
      |  WHERE doc_id % 7 = 0),
      |h AS (SELECT source, md5(text) AS h FROM corpus),
      |cs AS (SELECT h, source, count(*)::BIGINT AS n_docs
      |       FROM h GROUP BY 1, 2)
      |SELECT a.source AS src_a, b.source AS src_b,
      |  count(*)::BIGINT AS n_shared_hashes,
      |  sum(a.n_docs)::BIGINT AS n_docs_a
      |FROM cs a JOIN cs b ON a.h = b.h AND a.source <> b.source
      |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin)

  /** Source-exclusive phrasing mass (q203) — q195's divergence sees
    * WHICH words a source over-uses; this sees how much of a source's
    * PHRASING exists nowhere else: the fraction of its word-bigram
    * occurrences whose bigram type appears in no other source
    * (global count = the source's own count). High exclusive mass
    * flags templated/boilerplate-heavy or genuinely novel sources —
    * both worth a curator's look before mixing; near-zero means the
    * source phrases like the rest of the corpus. All map-side
    * aggregation plus one bigram-type-keyed join (vocabulary-of-
    * bigrams-sized state, never corpus-sized); exact integer ppm.
    */
  val exclusivePhrasing: Q = Q(
    (s, d) => {
      val bi = t(s, d, "documents")
        .select(col("source"), TextFunctions.words(col("text")).as("arr"))
        .filter(size(col("arr")) >= 2)
        .select(col("source"),
          explode(transform(sequence(lit(2), size(col("arr"))),
            i => struct(element_at(col("arr"), i - 1).as("x"),
              element_at(col("arr"), i).as("y")))).as("b"))
        .select(col("source"), col("b.x").as("x"), col("b.y").as("y"))
      val cs = bi.groupBy("source", "x", "y").agg(count(lit(1)).as("c"))
      val g = cs.groupBy("x", "y").agg(sum("c").as("g"))
      cs.join(g, Seq("x", "y"))
        .groupBy("source")
        .agg(sum("c").as("n_bigrams"),
          sum(when(col("g") === col("c"), col("c")).otherwise(0L))
            .as("n_exclusive"),
          count(when(col("g") === col("c"), 1)).as("n_excl_types"))
        .withColumn("excl_ppm",
          expr("n_exclusive * 1000000L div n_bigrams"))
        .orderBy("source")
    },
    s"""WITH w AS (
       |  SELECT source, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents WHERE len(${TextFunctions.wordsSql("text")}) >= 2),
       |i AS (SELECT source, arr, unnest(range(2, len(arr) + 1)) AS i
       |      FROM w),
       |b AS (SELECT source, arr[i - 1] AS x, arr[i] AS y FROM i),
       |cs AS (SELECT source, x, y, count(*)::BIGINT AS c
       |       FROM b GROUP BY 1, 2, 3),
       |g AS (SELECT x, y, sum(c)::BIGINT AS g FROM cs GROUP BY 1, 2)
       |SELECT source, sum(c)::BIGINT AS n_bigrams,
       |  sum(CASE WHEN g = c THEN c ELSE 0 END)::BIGINT AS n_exclusive,
       |  count(CASE WHEN g = c THEN 1 END)::BIGINT AS n_excl_types,
       |  (sum(CASE WHEN g = c THEN c ELSE 0 END) * 1000000
       |     // sum(c))::BIGINT AS excl_ppm
       |FROM cs JOIN g USING (x, y)
       |GROUP BY source ORDER BY source""".stripMargin)

  /** Containment detection (q102) — Broder's asymmetric near-dup
    * relation symmetric Jaccard MISSES: a short document wrapped
    * inside a longer one (boilerplate headers, quoted reposts,
    * concatenated shards) scores low Jaccard (the union is large) but
    * containment ≈ 1. Over winnow fingerprints (q47): any shared
    * k+w−1-char run yields a shared fp, so containment_milli =
    * shared fps ×1000 / contained side's fps — normalized by ONE side,
    * which is what makes it directional. Injected wrappers (doc A's
    * text + doc (A+100)'s text) must surface as A ⊂ wrapper at ≥ 800‰
    * while wrapper ⊄ A stays below. Hot fingerprints are df-capped
    * before the self-join (q23/q93's discipline); work is
    * fp-bucket-keyed, never doc×doc.
    */
  val containmentPairs: Q = {
    val K = 8; val W = 16; val MAX_DF = 100L
    val WRAP = 15L; val MIN_MILLI = 800L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = t(s, d, "documents").select(col("doc_id"), col("text"))
        val partner = base
          .filter(col("doc_id") >= 100 && col("doc_id") < 100 + WRAP)
          .select((col("doc_id") - 100).as("doc_id"), col("text").as("t2"))
        val wrappers = base.filter(col("doc_id") < WRAP)
          .join(partner, Seq("doc_id"))
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" "), col("t2")).as("text"))
        val corpus = base.unionByName(wrappers)
        // persisted once: three consumers (sizes + both self-join
        // sides) would otherwise re-run the winnowing subtree 3x
        val fps = Dedup.winnowFingerprints(corpus, "doc_id", "text", K, W)
          .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
          .filter(col("df") <= MAX_DF).drop("df")
          .persist()
        val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
        val shared = fps.as("a").join(fps.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") =!= col("b.doc_id"))
          .groupBy(col("a.doc_id").as("contained_id"),
            col("b.doc_id").as("container_id"))
          .agg(count(lit(1)).as("n_shared"))
        shared
          .join(sizes.withColumnRenamed("doc_id", "contained_id"),
            Seq("contained_id"))
          .selectExpr("contained_id", "container_id", "n_shared",
            "(n_shared * 1000) div n_fp AS containment_milli")
          .filter(col("containment_milli") >= MIN_MILLI)
          .orderBy("contained_id", "container_id")
      },
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT a.doc_id + 1000000, a.text || ' ' || b.text
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 100
         |  WHERE a.doc_id < $WRAP),
         |g AS (
         |  SELECT doc_id, text,
         |    greatest(length(text) - ${K - 1} - ${W - 1}, 1) AS max_start,
         |    unnest(range(1, greatest(length(text) - ${K - 1}, 0) + 1)) AS pos
         |  FROM corpus),
         |gr AS (
         |  SELECT doc_id, max_start, pos,
         |    substr(text, pos::INT, $K) AS gram
         |  FROM g),
         |h AS (
         |  SELECT doc_id, max_start, pos,
         |    ${Hashing.charHashSql("gram", K)} AS h
         |  FROM gr),
         |f AS (
         |  SELECT doc_id, pos, max_start,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp
         |  FROM h),
         |fp0 AS (SELECT DISTINCT doc_id, fp FROM f WHERE pos <= max_start),
         |hot AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(*) > $MAX_DF),
         |fps AS (SELECT doc_id, fp FROM fp0
         |        WHERE fp NOT IN (SELECT fp FROM hot)),
         |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_fp FROM fps
         |          GROUP BY doc_id),
         |shared AS (
         |  SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
         |    count(*)::BIGINT AS n_shared
         |  FROM fps a JOIN fps b
         |    ON a.fp = b.fp AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT contained_id, container_id, n_shared,
         |  ((n_shared * 1000) // n_fp)::BIGINT AS containment_milli
         |FROM shared JOIN sizes ON contained_id = sizes.doc_id
         |WHERE (n_shared * 1000) // n_fp >= $MIN_MILLI
         |ORDER BY contained_id, container_id""".stripMargin)
  }

  /** LSH candidate-precision report (q103) — the dedup analog of
    * q96's recall monitor: of the pairs the band join surfaces, what
    * fraction survives exact-Jaccard verification? This is THE number
    * that tunes (bands, rows) — precision too low wastes verify work,
    * too high (bands too selective) silently loses recall — and at
    * 100 TB it's computed from counts the pipeline already produces
    * (candidates + q59's verified pairs), so monitoring it is free.
    * One row: candidates, verified, precision in integer thousandths
    * (candidate count floored at 1 — DuckDB `//` by zero errors where
    * Spark's `div` nulls; both sides guard identically).
    */
  val lshPrecision: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", MH_K).persist()
      val cands = Dedup.lshCandidates(sig, "doc_id", MH_BANDS, MH_R).persist()
      val verified = Dedup.jaccardFor(cands, docs, "doc_id", "text", 3, 0.5)
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(verified.agg(count(lit(1)).as("n_verified"))))
        .selectExpr("n_candidates", "n_verified",
          "(n_verified * 1000) div greatest(n_candidates, 1) AS precision_milli")
    },
    s"""WITH $minhashPairsCtes,
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.id_a
       |  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
       |  GROUP BY c.id_a, c.id_b),
       |ver AS (
       |  SELECT id_a FROM inter
       |  JOIN sizes sa ON id_a = sa.doc_id
       |  JOIN sizes sb ON id_b = sb.doc_id
       |  WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE >= 0.5)
       |SELECT (SELECT count(*)::BIGINT FROM cand) AS n_candidates,
       |  (SELECT count(*)::BIGINT FROM ver) AS n_verified,
       |  ((SELECT count(*)::BIGINT FROM ver) * 1000 //
       |   greatest((SELECT count(*)::BIGINT FROM cand), 1))::BIGINT
       |    AS precision_milli""".stripMargin)

  /** Normalization-aware exact dedup (q104) — the cheap middle tier
    * between q22's byte-exact hash and the MinHash family: casefold +
    * whitespace-collapse + trim BEFORE hashing, catching the
    * trivially-reformatted copies (case flips, doubled spaces,
    * padding) that break a byte hash yet need no shingling — the
    * first dedup pass production pipelines run because it removes the
    * bulk of duplicates at exact-dedup cost. Injected perturbed
    * copies (+2·10⁶ ids: uppercased, doubly-spaced, padded) must
    * collapse onto their originals. Same 100 TB shape as q22: the
    * normalization chain is per-row codegen'd string work, then ONE
    * md5-keyed groupBy — no pairs, no second shuffle.
    */
  val normalizedDedup: Q = {
    val PERTURB = 40L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val mangled = docs.filter(col("doc_id") < PERTURB)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(lit("  "),
              upper(regexp_replace(col("text"), " ", "  ")),
              lit(" ")).as("text"))
        docs.unionByName(mangled)
          .select(col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), "  +", " ")))
              .as("norm_hash"))
          .groupBy("norm_hash")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .filter(col("n_copies") > 1)
          .orderBy("keep_id")
      },
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000, '  ' || upper(replace(text, ' ', '  ')) || ' '
         |  FROM documents WHERE doc_id < $PERTURB),
         |n AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(lower(text), '  +', ' ', 'g'))) AS norm_hash
         |  FROM corpus)
         |SELECT norm_hash, min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
         |FROM n GROUP BY norm_hash HAVING count(*) > 1
         |ORDER BY keep_id""".stripMargin)
  }

  /** ONE definition of the quality-filter battery shared by q105
    * (failure-signature attribution) and q114 (per-source rollup /
    * blocklist) — the thresholds and the bitmask encoding live here
    * so the two readouts cannot drift. Every ratio threshold is an
    * integer cross-multiplication (stop_cnt·10 < n_words, never a
    * float division), so both engines make the identical keep/drop
    * call on every row.
    */
  private object FilterBattery {
    val MIN_WORDS = 20
    val ALLOW: Seq[String] = Seq("en", "es", "fr", "de")

    /** Bitmask of failed filters: 1 = length floor, 2 = stopword
      * ratio, 4 = type-token ratio, 8 = language allowlist. */
    def mask(text: Column, lang: Column): Column = {
      val w = TextFunctions.words(text)
      val nW = size(w)
      val nStop = size(filter(w, x => x.isin(TextFunctions.stopwordsEn: _*)))
      val nDist = size(array_distinct(w))
      (when(nW < MIN_WORDS, 1).otherwise(0) +
        when(nStop * 10 < nW, 2).otherwise(0) +
        when(nDist * 10 < nW * 8, 4).otherwise(0) +
        when(!lang.isin(ALLOW: _*), 8).otherwise(0)).cast("long")
    }

    /** DuckDB twin over a words-array expression `arr` and a lang
      * column (single line — safe to embed in any outer CTE). */
    def maskSql(arr: String, lang: String): String = {
      val stopList = TextFunctions.stopwordsEn.map(x => s"'$x'").mkString(", ")
      val allowList = ALLOW.map(x => s"'$x'").mkString(", ")
      s"(CASE WHEN len($arr) < $MIN_WORDS THEN 1 ELSE 0 END" +
        s" + CASE WHEN len(list_filter($arr, x -> x IN ($stopList))) * 10 < len($arr) THEN 2 ELSE 0 END" +
        s" + CASE WHEN len(list_distinct($arr)) * 10 < len($arr) * 8 THEN 4 ELSE 0 END" +
        s" + CASE WHEN $lang NOT IN ($allowList) THEN 8 ELSE 0 END)::BIGINT"
    }
  }

  /** Filter-battery attribution (q105) — "why was my data dropped":
    * for the standard quality-filter battery (length floor,
    * stopword-ratio floor, type-token floor, language allowlist),
    * count documents per failure SIGNATURE — the bitmask of failed
    * filters — with the earliest example doc for each. The readout
    * every filter change needs before shipping: which rule pays its
    * way, which rules fire only together (redundant), what a
    * threshold move would re-admit. Ratio thresholds are evaluated as
    * integer cross-multiplications (stop_cnt·10 < n_words, never a
    * float division), so both engines make the identical keep/drop
    * call on every row — no epsilon anywhere. One scan into a
    * 2⁴-group aggregate: constant state at any corpus size.
    */
  val filterAttribution: Q = Q(
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          FilterBattery.mask(col("text"), col("lang")).as("fail_mask"))
        .groupBy("fail_mask")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("example_id"))
        .orderBy("fail_mask"),
    s"""WITH w AS (
       |  SELECT doc_id, lang, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, ${FilterBattery.maskSql("arr", "lang")} AS fail_mask
       |  FROM w)
       |SELECT fail_mask, count(*)::BIGINT AS n_docs,
       |  min(doc_id) AS example_id
       |FROM m GROUP BY fail_mask ORDER BY fail_mask""".stripMargin)

  /** Near-dup cluster-size distribution (q107) — the dedup REPORT
    * over q46's component assignment: how many duplicate clusters of
    * each size the corpus holds, and how many documents dedup-apply
    * will therefore drop (Σ size−1). The shape of this histogram is
    * what picks the dedup strategy — a long tail of giant clusters
    * means boilerplate/template content that wants q102's containment
    * treatment, an all-pairs head means true reposts. Two
    * cluster-keyed aggregates on top of the COMMITTED component
    * assignment ([[ccAssignment]] — published once per data version,
    * `art:warm` thereafter); state is bounded by the number of
    * DISTINCT sizes (≤ largest cluster).
    * Documents with no LSH pair never enter the component graph, so
    * the histogram covers clusters of size ≥ 2 on both engines by
    * construction.
    */
  val clusterSizes: Q = Q(
    (s, d) => {
      ccAssignment(s, d)
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size") - 1).as("n_dropped"))
        .orderBy("cluster_size")
    },
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |walk(n, m) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.v, walk.m FROM walk JOIN edges e ON e.u = walk.n),
       |comp AS (SELECT n AS node, min(m) AS component FROM walk GROUP BY n),
       |cs AS (
       |  SELECT component, count(*)::BIGINT AS cluster_size
       |  FROM comp GROUP BY component)
       |SELECT cluster_size, count(*)::BIGINT AS n_clusters,
       |  sum(cluster_size - 1)::BIGINT AS n_dropped
       |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin)

  /** Tokenizer fertility by language (q106) — the multilingual-bias
    * audit number: subword tokens emitted per whitespace word, per
    * language, under the q72-trained merge table. A language the
    * tokenizer under-serves shows fertility well above the corpus
    * mean — its documents cost proportionally more sequence length
    * per unit text, which skews both training mix (q77's weights
    * count documents, not tokens) and serving cost. Reuses q76's
    * segmentation exactly: the per-WORD subword count is computed on
    * the vocab (vocab-sized iterative work), joined back to corpus
    * occurrences once, then aggregated to a language-count-bounded
    * group state. Fertility in integer thousandths (all-positive
    * floor div — engine-exact).
    */
  val bpeFertility: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("lang"), explode(TextFunctions.words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
      val seg = Bpe.train(bpeVocab(s, d), BPE_ROUNDS)._2
        .select(col("word"), size(col("syms")).cast("long").as("n_sub"))
      docs.join(seg, Seq("word"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
        .selectExpr("lang", "n_words", "n_subwords",
          "(n_subwords * 1000) div n_words AS fertility_milli")
        .orderBy("lang")
    },
    s"""WITH ${BpeOracle.chain},
       |segn AS (
       |  SELECT word, count(*)::BIGINT AS n_sub FROM s$BPE_ROUNDS
       |  GROUP BY word),
       |dw AS (
       |  SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS word
       |  FROM documents),
       |dwf AS (SELECT lang, word FROM dw WHERE length(word) > 0)
       |SELECT d.lang, count(*)::BIGINT AS n_words,
       |  sum(s.n_sub)::BIGINT AS n_subwords,
       |  ((sum(s.n_sub) * 1000) // count(*))::BIGINT AS fertility_milli
       |FROM dwf d JOIN segn s USING (word)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin)

  /** Label-centroid outliers (q108) — mislabel/contamination
    * detection over the embedding table: the top-k vectors FARTHEST
    * from their own label's centroid, per label. The vectors this
    * surfaces are the ones a curation pass reviews first (wrong
    * label, corrupted embedding, or genuine boundary case). Shares
    * q89's exact-integer centroid table (micro-unit truncated means
    * with the div-parity sign guard); distances are integer Σδ²
    * (bounded 2⁴⁶ at d=64 — no overflow), so ranks are decided by
    * exact comparisons on both engines, ties broken by vec_id.
    * Shapes: (label, dim) centroid groupBy, one centroid join back
    * (label-count-bounded build side), one per-label top-k window —
    * never vector×vector.
    */
  val centroidOutliers: Q = {
    val TOPK = 3
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ex = t(s, d, "embeddings").select(col("vec_id"), col("label"),
            posexplode(VectorFunctions.scaledMicro(col("embedding"))))
          .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
          .persist()
        val cent = ex.groupBy("label", "dim")
          .agg(expr("sum(x) div count(1)").as("c"))
        val d2 = ex.join(cent, Seq("label", "dim"))
          .groupBy("vec_id", "label")
          .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d2"))
        d2.withColumn("rnk", row_number().over(
            Window.partitionBy("label").orderBy(col("d2").desc, col("vec_id"))))
          .filter(col("rnk") <= TOPK)
          .select(col("label"), col("rnk").cast("long").as("rnk"),
            col("vec_id"), col("d2"))
          .orderBy("label", "rnk")
      },
      s"""WITH ex AS (
         |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
         |  FROM embeddings),
         |cent AS (
         |  SELECT label, dim,
         |    (CASE WHEN sum(x) >= 0 THEN sum(x)::BIGINT // count(*)
         |          ELSE -((-(sum(x)::BIGINT)) // count(*)) END)::BIGINT AS c
         |  FROM ex GROUP BY 1, 2),
         |d2 AS (
         |  SELECT e.vec_id, e.label,
         |    sum((e.x - c.c) * (e.x - c.c))::BIGINT AS d2
         |  FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT label, vec_id, d2,
         |    row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id)
         |      AS rnk
         |  FROM d2)
         |SELECT label, rnk::BIGINT AS rnk, vec_id, d2
         |FROM r WHERE rnk <= $TOPK
         |ORDER BY label, rnk""".stripMargin)
  }

  /** Embedding norm audit (q109) — the vector-column health check a
    * pipeline runs before any cosine-based stage: per (label,
    * log₂-bucket of ‖v‖²) counts with the bucket's exact min/max.
    * Degenerate vectors (zero or near-zero norm) make cosine
    * undefined and silently poison ANN and SemDeDup — they land in
    * the lowest buckets here, where an audit catches them before the
    * similarity stages run. Everything stays in the micro-unit
    * integer domain: ‖v‖² is an exact Σx² (< 2⁴⁶ at d=64), the
    * bucket is `length(bin(n))` = ⌊log₂⌋+1 (q98's trick), so the
    * histogram is hash-exact. One scan, per-row codegen lambdas,
    * (label × ~46 buckets)-bounded state.
    */
  val normAudit: Q = Q(
    (s, d) =>
      t(s, d, "embeddings")
        .select(col("label"), VectorFunctions.scaledMicro(col("embedding")).as("xs"))
        .selectExpr("label", "aggregate(xs, 0L, (a, x) -> a + x * x) AS n2")
        .selectExpr("label",
          "cast(length(bin(greatest(n2, 1L))) AS bigint) AS norm_bucket", "n2")
        .groupBy("label", "norm_bucket")
        .agg(count(lit(1)).as("n_vecs"),
          min("n2").as("min_n2"), max("n2").as("max_n2"))
        .orderBy("label", "norm_bucket"),
    s"""WITH xs AS (
       |  SELECT label, ${VectorFunctions.scaledMicroSql("embedding")} AS xs
       |  FROM embeddings),
       |n AS (
       |  SELECT label,
       |    list_sum(list_transform(xs, x -> x * x))::BIGINT AS n2
       |  FROM xs)
       |SELECT label, length(bin(greatest(n2, 1)))::BIGINT AS norm_bucket,
       |  count(*)::BIGINT AS n_vecs,
       |  min(n2)::BIGINT AS min_n2, max(n2)::BIGINT AS max_n2
       |FROM n GROUP BY 1, 2 ORDER BY label, norm_bucket""".stripMargin)

  /** Boilerplate template detection (q110) — the inverse of the df
    * cap every dedup query applies: the spans the cap DROPS are
    * exactly the content a curation pass wants to SEE. Surfaces the
    * highest-document-frequency word-8-gram windows (site chrome,
    * license headers, navigation text) with their doc and occurrence
    * counts — the removal list for a template-stripping pass, and the
    * explanation for q107's giant clusters. Injected headers (every
    * 7th doc gets one template, every 11th another, window-aligned by
    * construction) must top the report. One explode + one span-keyed
    * groupBy + top-k (TakeOrderedAndProject): the same shape and cost
    * as q55's vocabulary, over spans instead of words.
    */
  val templates: Q = {
    val W = 8; val TOPK = 10; val MIN_DF = 5L
    val TPL_A = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val TPL_B = "all rights reserved terms of service apply here"
    Q(
      (s, d) => {
        val injected = concat(
          when(col("doc_id") % 7 === 0, lit(TPL_A + " ")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(TPL_B + " ")).otherwise(lit("")),
          col("text"))
        t(s, d, "documents")
          .select(col("doc_id"), TextFunctions.words(injected).as("arr"))
          .select(col("doc_id"), explode(
            transform(sequence(lit(0),
                expr(s"greatest(size(arr) - 1, 0) div $W")),
              i => array_join(slice(col("arr"), i * W + 1, lit(W)), " ")))
            .as("span"))
          .groupBy("span")
          .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
          .filter(col("n_docs") >= MIN_DF)
          .orderBy(col("n_docs").desc, col("span"))
          .limit(TOPK)
      },
      s"""WITH c AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN '$TPL_A ' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN '$TPL_B ' ELSE '' END || text AS text
         |  FROM documents),
         |w AS (SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr FROM c),
         |e AS (SELECT doc_id, arr,
         |  unnest(range(0, greatest(len(arr) - 1, 0) // $W + 1)) AS idx FROM w),
         |sp AS (SELECT doc_id,
         |  array_to_string(arr[(idx * $W + 1):(idx * $W + $W)], ' ') AS span
         |  FROM e)
         |SELECT span, count(DISTINCT doc_id)::BIGINT AS n_docs,
         |  count(*)::BIGINT AS n_occ
         |FROM sp GROUP BY span
         |HAVING count(DISTINCT doc_id) >= $MIN_DF
         |ORDER BY n_docs DESC, span LIMIT $TOPK""".stripMargin)
  }

  /** Inter-source duplication matrix (q111) — which crawls/dumps
    * duplicate each other: q24's LSH near-dup pairs rolled up to an
    * unordered (source, source) matrix. Off-diagonal mass means two
    * acquisition channels ship the same content (pay for one);
    * diagonal mass is within-source duplication the per-source dedup
    * budget should reflect. The matrix is the mix-planning input q77
    * and q95 consume upstream. Pair volume is already sub-quadratic
    * (band-join output), the source lookup is a doc-keyed equi-join
    * (strategy left to AQE — the id→source side scales with the
    * corpus), and the final state is source²-bounded. least/greatest
    * canonicalize the pair — plain ASCII compares, identical on both
    * engines.
    */
  val sourceOverlap: Q = Q(
    (s, d) => {
      val src = t(s, d, "documents").select(col("doc_id"), col("source"))
      minhashPairs(s, d)
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          Seq("id_b"))
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    },
    s"""WITH $minhashPairsCtes
       |SELECT least(da.source, db.source) AS source_a,
       |  greatest(da.source, db.source) AS source_b,
       |  count(*)::BIGINT AS n_pairs
       |FROM pairs p
       |JOIN documents da ON p.id_a = da.doc_id
       |JOIN documents db ON p.id_b = db.doc_id
       |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin)

  /** Exact-quota stratified sampling (q112) — q49 takes a FIXED N
    * per stratum; this takes an exact PROPORTION: ⌈n·p⌉ documents of
    * each language, the form an eval-set or ablation draw actually
    * specifies ("10% of each language, exactly"). A stateless hash
    * threshold (q43) only approximates quotas; hitting them exactly
    * requires the stratum count — one window — then a deterministic
    * hash-ordered take. The quota ⌈n·100/1000⌉ is an all-positive
    * integer ceil-div, exact on both engines. Cost: one per-stratum
    * window sort — the price of exactness over q43's approximation,
    * parallel across strata (the partition key) at any corpus size.
    */
  val quotaSample: Q = {
    val P_MILLI = 100L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val win = Window.partitionBy("lang")
          .orderBy(Hashing.h32(col("doc_id").cast("string")), col("doc_id"))
        t(s, d, "documents").select(col("lang"), col("doc_id"))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("lang")).cast("long"))
          .withColumn("rnk", row_number().over(win).cast("long"))
          .withColumn("quota", expr(s"(n * $P_MILLI + 999) div 1000"))
          .filter(col("rnk") <= col("quota"))
          .select(col("lang"), col("doc_id"), col("rnk"), col("quota"))
          .orderBy("lang", "rnk")
      },
      s"""WITH r AS (
         |  SELECT lang, doc_id,
         |    count(*) OVER (PARTITION BY lang) AS n,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${Hashing.h32Sql("doc_id::VARCHAR")}, doc_id) AS rnk
         |  FROM documents)
         |SELECT lang, doc_id, rnk::BIGINT AS rnk,
         |  ((n * $P_MILLI + 999) // 1000)::BIGINT AS quota
         |FROM r WHERE rnk <= (n * $P_MILLI + 999) // 1000
         |ORDER BY lang, rnk""".stripMargin)
  }

  /** Weighted priority sample (q158) — Duffield/Lund/Thorup's
    * priority sampling (JACM 2007), the size-K weighted sample with
    * near-optimal subset-sum variance: each doc gets priority
    * q = w / u for a uniform u, the K highest priorities win, and
    * heavy docs are proportionally likelier to make the cut. Here
    * u is hash-derandomized (u ≈ (h32+1)/2^32) and the priority is
    * computed in EXACT integer arithmetic — w·2^32 div (h+1), always
    * below 2^53 for corpus doc lengths — so both engines rank
    * identically with zero float drift. Scale shape: this is q13's
    * top-k pattern on a computed key — per-partition top-K heaps into
    * one K-row driver merge (TakeOrderedAndProject), never a global
    * sort, nothing shuffled but K rows per partition; contrast with
    * q49/q112, whose hash-threshold samples are Bernoulli/quota per
    * stratum but weight-blind.
    */
  val prioritySample: Q = {
    val K = 100
    Q(
      (s, d) => {
        t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            Hashing.h32(col("doc_id").cast("string")).as("h"))
          .select(col("doc_id"), col("n_chars"),
            expr("(n_chars * 4294967296) div (h + 1)").as("priority"))
          .orderBy(desc("priority"), asc("doc_id")).limit(K)
      },
      s"""SELECT doc_id, n_chars,
         |  (n_chars * 4294967296) // (h + 1) AS priority
         |FROM (SELECT doc_id, n_chars,
         |        ${Hashing.h32Sql("doc_id::VARCHAR")} AS h
         |      FROM documents) x
         |ORDER BY priority DESC, doc_id LIMIT $K""".stripMargin)
  }

  /** JSONL source roundtrip with corrupt-record quarantine (q164) —
    * the third source format beside the CSV facade and parquet, and
    * the JSON analog of the reference's strict-parse row handling
    * (buzzdb_lab1.cpp:144-154 silently DROPS malformed rows; a 100 TB
    * ingest can't afford silent): documents are published once as
    * JSON Lines under the shared [[graft.sources.Artifacts]]
    * discipline (tmp root keyed by sf-dir + table fingerprint,
    * publish-if-absent via atomic stage+rename, stale fingerprints
    * pruned), with N deterministic corrupt lines injected the way
    * q22 injects duplicates. The read is schema-first PERMISSIVE with
    * `columnNameOfCorruptRecord`: bad lines land in a quarantine
    * column instead of killing the job or vanishing, and the judged
    * report counts them beside the per-lang totals — which must equal
    * the parquet truth exactly, proving the roundtrip lossless
    * (JSON escaping survives embedded newlines/quotes). One scan, one
    * aggregate; format parsing is per-row codegen at any scale.
    */
  val jsonlSource: Q = {
    val N_CORRUPT = 7
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val root = graft.sources.Artifacts.publishOnce(
          "graft-jsonl", d, Seq("documents.parquet")) { stage =>
          val corrupt = s.createDataset(
            (1 to N_CORRUPT).map(i => s"{corrupt $i"))(
            org.apache.spark.sql.Encoders.STRING)
          docs.toJSON.union(corrupt).coalesce(4)
            .write.mode("overwrite").text(stage)
        }
        val parsed = s.read
          .schema(docs.schema.add("_corrupt_record", "string"))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(root)
        parsed
          // quarantine keys on the PARSER's own signal, not lang
          // nullability — a legitimate null-lang document stays in
          // its own lang group instead of folding into "(corrupt)"
          .groupBy(when(col("_corrupt_record").isNotNull, lit("(corrupt)"))
            .otherwise(col("lang")).as("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("n_chars"), lit(0L))).as("chars"))
          .orderBy("lang")
      },
      s"""SELECT lang, count(*)::BIGINT AS n_docs,
         |  sum(n_chars)::BIGINT AS chars
         |FROM documents GROUP BY lang
         |UNION ALL SELECT '(corrupt)', $N_CORRUPT, 0
         |ORDER BY lang""".stripMargin)
  }

  /** ORC source roundtrip with predicate pushdown (q165) — the fourth
    * format, written and re-read through the same
    * [[graft.sources.Artifacts.publishOnce]] as q164. The judged aggregate
    * reads the ORC copy through a source filter that must reach the
    * ORC reader as a pushed predicate + min/max stripe pruning
    * (PlanAuditSpec asserts the pushdown, the same audit parquet
    * scans get) — the point being that the engine's scan discipline
    * is format-independent: swap the container, keep the plan.
    */
  val orcSource: Q = {
    val SRC = "src3"
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val root = graft.sources.Artifacts.publishOnce(
          "graft-orc", d, Seq("documents.parquet")) { stage =>
          docs.write.mode("overwrite").orc(stage)
        }
        s.read.orc(root)
          .filter(col("source") === SRC)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
            sum("doc_id").as("id_sum"))
          .orderBy("lang")
      },
      s"""SELECT lang, count(*)::BIGINT AS n_docs,
         |  sum(n_chars)::BIGINT AS chars, sum(doc_id)::BIGINT AS id_sum
         |FROM documents WHERE source = '$SRC'
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** Quoted-CSV roundtrip (q213) — the format matrix's last cell
    * (q164 JSONL, q165 ORC, q168 Avro): RFC-4180 quoting, which the
    * reference's no-quote tokenizer (S4) explicitly does not do. The
    * corpus plus injected HOSTILE rows (embedded commas and
    * double-quotes, the cases quoting exists for) is written with
    * `escape='"'` (RFC double-quote doubling, not the backslash
    * default), re-read with the same dialect, and fingerprinted per
    * source with a content hash SUM — so a single corrupted byte in
    * any text field breaks the judged hash, proving byte fidelity,
    * not just row counts. No embedded newlines by design: quoted
    * newlines force `multiLine` reads, and a multiLine CSV file is
    * NOT splittable — at 100 TB that's the difference between 1000
    * parallel readers and one; the dialect choice is the scale
    * decision this query documents.
    */
  val csvSource: Q = {
    val N_HOSTILE = 9
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val root = graft.sources.Artifacts.publishOnce(
          "graft-csvq", d, Seq("documents.parquet")) { stage =>
          val hostile = s.range(1, N_HOSTILE + 1).toDF("i")
            .select((col("i") + 9000000L).as("doc_id"),
              concat(lit("hostile,\"quoted\" field "), col("i"))
                .as("text"),
              lit("xx").as("lang"), lit("srcq").as("source"))
            .withColumn("n_chars", length(col("text")).cast("long"))
          docs.select(col("doc_id"), col("text"), col("lang"),
              col("source"), col("n_chars").cast("long").as("n_chars"))
            .unionByName(hostile)
            .coalesce(4)
            .write.mode("overwrite")
            .option("header", "true").option("escape", "\"")
            .csv(stage)
        }
        // emptyValue + a never-occurring nullValue sentinel: the
        // writer distinguishes empty text (`""`) from null (bare
        // field), but the DEFAULT reader collapses both to null — a
        // zero-length text would silently drop out of text_h32_sum
        // while the oracle hashes ''. These two options make the read
        // side honor the distinction the write side already encodes.
        s.read
          .option("header", "true").option("escape", "\"")
          .option("emptyValue", "").option("nullValue", "\\u0000")
          .schema("doc_id BIGINT, text STRING, lang STRING, " +
            "source STRING, n_chars BIGINT")
          .csv(root)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
            sum(Hashing.h32(col("text"))).as("text_h32_sum"))
          .orderBy("source")
      },
      s"""WITH corpus AS (
         |  SELECT source, text, n_chars FROM documents
         |  UNION ALL
         |  SELECT 'srcq', 'hostile,"quoted" field ' || i,
         |    length('hostile,"quoted" field ' || i)
         |  FROM range(1, ${N_HOSTILE + 1}) t(i))
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_chars)::BIGINT AS chars,
         |  sum(${Hashing.h32Sql("text")})::BIGINT AS text_h32_sum
         |FROM corpus GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Pareto skyline of (length, quality) (q162) — the docs no other
    * doc beats on BOTH axes (≥ on each, > on one): the dominance
    * frontier a curation review reads when length and quality trade
    * off. Distributed the standard two-pass way: each of 32 hash
    * shards computes its LOCAL frontier (dominance is transitive, so
    * a local dominator proves global dominance — the local pass is a
    * sound filter at any sharding), then one global pass over the
    * surviving sliver. A pass is sort-free of self-joins: rows
    * ordered by −length, "dominated by a strictly longer doc" is a
    * range-frame running max of quality, "dominated at equal length"
    * a per-length group max — two window reads, O(n log n), vs the
    * oracle's quadratic NOT EXISTS (their equality is the proof).
    * Quality is q56's micro-unit integer, so dominance compares
    * identically on both engines.
    */
  val skyline: Q = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pts = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          round(TextFunctions.qualityScore(TextFunctions.words(col("text")))
            * 1e6).cast("long").as("quality_micro"),
          (-col("n_chars")).as("negx"))
      def frontier(df: DataFrame, parts: Seq[String]): DataFrame = {
        val gtW = Window.partitionBy(parts.map(col): _*)
          .orderBy(col("negx"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val eqW = Window.partitionBy((parts :+ "n_chars").map(col): _*)
        df.withColumn("ygt", max("quality_micro").over(gtW))
          .withColumn("yeq", max("quality_micro").over(eqW))
          .filter((col("ygt").isNull || col("ygt") < col("quality_micro")) &&
            col("yeq") <= col("quality_micro"))
          .drop("ygt", "yeq")
      }
      val local = frontier(
        pts.withColumn("shard", pmod(col("doc_id"), lit(32L))), Seq("shard"))
      frontier(local.drop("shard"), Nil).drop("negx")
        .orderBy(desc("n_chars"), desc("quality_micro"), asc("doc_id"))
    },
    s"""WITH w AS (
       |  SELECT doc_id, n_chars, ${TextFunctions.wordsSql("text")} AS arr
       |  FROM documents),
       |pts AS (
       |  SELECT doc_id, n_chars,
       |    round((${TextFunctions.qualityScoreSql("arr")}) * 1000000)::BIGINT
       |      AS quality_micro
       |  FROM w)
       |SELECT doc_id, n_chars, quality_micro FROM pts a
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM pts b
       |  WHERE b.n_chars >= a.n_chars AND b.quality_micro >= a.quality_micro
       |    AND (b.n_chars > a.n_chars OR b.quality_micro > a.quality_micro))
       |ORDER BY n_chars DESC, quality_micro DESC, doc_id""".stripMargin)

  /** Exact dedup in QUANTIZED embedding space (q113) — the cheap
    * pre-pass before SemDeDup (q66/q71): two vectors identical after
    * int8 quantization (same codes AND same (mn, rng) reconstruction
    * params — affine-equivalent ranges are NOT merged) are duplicates
    * no cosine stage needs to re-examine, and finding them costs one
    * hash groupBy instead of any in-cell pair work. Reuses q97's code
    * formula verbatim in the shared micro-unit integer domain, so the
    * code string — and therefore the md5 group key — is byte-exact on
    * both engines. Injected +1-micro-unit perturbations (below any
    * int8 step, and range-shift-invariant: mn and x shift together)
    * must collapse onto their originals, every group exactly size 2.
    * 100 TB shape = q22 exact dedup: per-row codegen lambdas, ONE
    * md5-keyed groupBy, no pairs.
    */
  val quantizedDedup: Q = Q(
    (s, d) => {
      val xs = t(s, d, "embeddings")
        .select(col("vec_id"), VectorFunctions.scaledMicro(col("embedding")).as("xs"))
      val shifted = xs.select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(xs, x -> x + 1L)").as("xs"))
      xs.unionByName(shifted)
        .selectExpr("vec_id", "xs", "array_min(xs) AS mn",
          "greatest(array_max(xs) - array_min(xs), 1L) AS rng")
        .selectExpr("vec_id",
          """md5(concat(cast(rng AS string), ':',
            |  array_join(transform(xs, x -> cast((x - mn) * 255 div rng AS string)), ',')))
            |  AS code_hash""".stripMargin)
        .groupBy("code_hash")
        .agg(min("vec_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    },
    s"""WITH x0 AS (
       |  SELECT vec_id, ${VectorFunctions.scaledMicroSql("embedding")} AS xs
       |  FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, xs FROM x0
       |  UNION ALL
       |  SELECT vec_id + 1000000, list_transform(xs, x -> x + 1) FROM x0),
       |mm AS (
       |  SELECT vec_id, xs, list_min(xs) AS mn,
       |    greatest(list_max(xs) - list_min(xs), 1) AS rng
       |  FROM corpus),
       |h AS (
       |  SELECT vec_id,
       |    md5(rng::VARCHAR || ':' || array_to_string(
       |      list_transform(xs, x -> ((x - mn) * 255 // rng)::VARCHAR), ','))
       |      AS code_hash
       |  FROM mm)
       |SELECT code_hash, min(vec_id) AS keep_id, count(*)::BIGINT AS n_copies
       |FROM h GROUP BY code_hash ORDER BY keep_id""".stripMargin)

  /** Per-source quality rollup + blocklist ranking (q114) — the
    * acquisition-channel readout over the SAME battery as q105 (one
    * [[FilterBattery]] definition, two reports): per source, document
    * count, battery-failure count, failure rate in integer
    * thousandths, and a `blocked` flag on the TOPK worst sources (the
    * crawl-blocklist candidates a curation pass reviews first). The
    * rank is a single global window over PER-SOURCE AGGREGATES —
    * state is taxonomy-bounded (sources are acquisition channels,
    * dozens to thousands, never corpus-scaled), so the one-partition
    * sort is over a tiny set no matter the corpus size; the corpus
    * itself is touched once by the groupBy. Ties break on source name
    * — deterministic on both engines.
    */
  val sourceBlocklist: Q = {
    val TOPK = 3
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        t(s, d, "documents")
          .select(col("source"),
            FilterBattery.mask(col("text"), col("lang")).as("fail_mask"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("fail_mask") =!= 0L, 1L).otherwise(0L)).as("n_fail"))
          .selectExpr("source", "n_docs", "n_fail",
            "n_fail * 1000 div n_docs AS fail_milli")
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("fail_milli").desc, col("source"))))
          .select(col("source"), col("n_docs"), col("n_fail"), col("fail_milli"),
            when(col("rnk") <= TOPK, 1L).otherwise(0L).as("blocked"))
          .orderBy("source")
      },
      s"""WITH w AS (
         |  SELECT source, lang, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents),
         |m AS (
         |  SELECT source, ${FilterBattery.maskSql("arr", "lang")} AS fail_mask
         |  FROM w),
         |agg AS (
         |  SELECT source, count(*)::BIGINT AS n_docs,
         |    sum(CASE WHEN fail_mask <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_fail
         |  FROM m GROUP BY source),
         |r AS (
         |  SELECT source, n_docs, n_fail,
         |    (n_fail * 1000 // n_docs)::BIGINT AS fail_milli,
         |    row_number() OVER (ORDER BY n_fail * 1000 // n_docs DESC, source)
         |      AS rnk
         |  FROM agg)
         |SELECT source, n_docs, n_fail, fail_milli,
         |  (CASE WHEN rnk <= $TOPK THEN 1 ELSE 0 END)::BIGINT AS blocked
         |FROM r ORDER BY source""".stripMargin)
  }

  /** Token-budget epoch planning (q115) — given a training-token
    * target (OVERSAMPLE× the current corpus, split uniformly across
    * sources — the "how many epochs of each source do I need" sizing
    * question every mixture spec answers before q77 picks weights):
    * per source, its token count, its budget share, and the epoch
    * count ⌈budget/tokens⌉ required to fill that share. The budget is
    * derived IN-PLAN from a broadcast 1-row total (q77's idiom, never
    * collected), and every step is all-positive integer arithmetic —
    * token sums, floor-div share, ceil-div epochs — so the plan is
    * hash-exact on both engines and independent of partitioning. One
    * corpus scan into source-bounded state plus a 1-row aggregate.
    */
  val tokenBudget: Q = {
    val OVERSAMPLE = 3L
    Q(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("source"),
            size(TextFunctions.words(col("text"))).cast("long").as("n_tok"))
          .groupBy("source").agg(sum("n_tok").as("toks"))
        val tot = toks.agg(sum("toks").as("total"), count(lit(1)).as("n_src"))
        toks.crossJoin(broadcast(tot))
          .selectExpr("source", "toks",
            s"(total * $OVERSAMPLE) div n_src AS budget")
          .selectExpr("source", "toks", "budget",
            "(budget + toks - 1) div greatest(toks, 1L) AS epochs")
          .orderBy("source")
      },
      s"""WITH toks AS (
         |  SELECT source,
         |    sum(len(${TextFunctions.wordsSql("text")}))::BIGINT AS toks
         |  FROM documents GROUP BY source),
         |tot AS (
         |  SELECT sum(toks)::BIGINT AS total, count(*)::BIGINT AS n_src
         |  FROM toks)
         |SELECT source, toks,
         |  ((total * $OVERSAMPLE) // n_src)::BIGINT AS budget,
         |  (((total * $OVERSAMPLE) // n_src + toks - 1)
         |    // greatest(toks, 1))::BIGINT AS epochs
         |FROM toks, tot ORDER BY source""".stripMargin)
  }

  /** Embedding-space decontamination (q116) — the SEMANTIC
    * complement to q50/q99's n-gram overlap: flag training vectors
    * whose nearest benchmark embedding sits within an exact integer
    * distance² threshold, catching paraphrased eval leakage that
    * shares no shingle. Injected exact copies of benchmark vectors
    * (+10⁶ ids) must surface at min_d2 = 0; TAU2 sits at the ~5th
    * percentile of organic nearest-bench distances, so genuine
    * near-bench outliers surface too. All distances are exact integer
    * Σδ² in the shared micro-unit domain (δ ≤ 2·10⁶, Σ over d=64 <
    * 2⁴⁸ — no overflow, no float epsilon). 100 TB shape: the bench
    * side is a FIXED-SIZE suite (never corpus-scaled) broadcast once;
    * the corpus is scanned once with a constant |bench| work factor
    * per row and zip_with/aggregate staying codegen — for a
    * corpus-scaled reference set, q27's bucket prefilter is the
    * escalation path. Tie-break on bench id via one lexicographic
    * min(struct) — no second shuffle.
    */
  val embedDecontaminate: Q = {
    val BENCH_MAX = 25L
    val TAU2 = 1300000000000L
    Q(
      (s, d) => {
        val xs = t(s, d, "embeddings")
          .select(col("vec_id"), VectorFunctions.scaledMicro(col("embedding")).as("xs"))
        val bench = xs.filter(col("vec_id") < BENCH_MAX)
          .select(col("vec_id").as("bvec"), col("xs").as("ys"))
        val train = xs.filter(col("vec_id") >= BENCH_MAX)
          .unionByName(bench.select((col("bvec") + 1000000L).as("vec_id"),
            col("ys").as("xs")))
        train.crossJoin(broadcast(bench))
          .selectExpr("vec_id", "bvec",
            "aggregate(zip_with(xs, ys, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v) AS d2")
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("bvec"))).as("m"))
          .select(col("vec_id"), col("m.d2").as("min_d2"),
            col("m.bvec").as("near_bench"))
          .filter(col("min_d2") <= TAU2)
          .orderBy("vec_id")
      },
      s"""WITH x0 AS (
         |  SELECT vec_id, ${VectorFunctions.scaledMicroSql("embedding")} AS xs
         |  FROM embeddings),
         |bench AS (
         |  SELECT vec_id AS bvec, xs AS ys FROM x0 WHERE vec_id < $BENCH_MAX),
         |train AS (
         |  SELECT vec_id, xs FROM x0 WHERE vec_id >= $BENCH_MAX
         |  UNION ALL SELECT bvec + 1000000, ys FROM bench),
         |te AS (
         |  SELECT vec_id, generate_subscripts(xs, 1) AS dim, unnest(xs) AS x
         |  FROM train),
         |be AS (
         |  SELECT bvec, generate_subscripts(ys, 1) AS dim, unnest(ys) AS y
         |  FROM bench),
         |d2 AS (
         |  SELECT te.vec_id, be.bvec,
         |    sum((te.x - be.y) * (te.x - be.y))::BIGINT AS d2
         |  FROM te JOIN be USING (dim) GROUP BY 1, 2),
         |m AS (SELECT vec_id, min(d2) AS min_d2 FROM d2 GROUP BY 1)
         |SELECT d.vec_id, m.min_d2, min(d.bvec) AS near_bench
         |FROM d2 d JOIN m ON d.vec_id = m.vec_id AND d.d2 = m.min_d2
         |WHERE m.min_d2 <= $TAU2
         |GROUP BY 1, 2 ORDER BY d.vec_id""".stripMargin)
  }

  /** Cluster-quality audit (q117) — the silhouette-style readout over
    * the label assignment: per label, mean intra-cluster distance² to
    * its own centroid vs the distance² to the NEAREST other centroid.
    * A label whose nearest-centroid gap is small relative to its
    * intra spread is a merge/mislabel candidate — the triage signal
    * read before trusting labels for q89 centroids or q112-style
    * stratified draws. Scale shape: never vector×vector — vectors
    * meet only their OWN centroid (q108's (label, dim) join), and the
    * centroid×centroid stage is label²-bounded (labels are a
    * taxonomy, not corpus-scaled). All distances exact integer Σδ² in
    * the micro-unit domain; centroid = sum div count with Spark's
    * truncating div mirrored by a sign CASE in the oracle (q108's
    * rule); nearest-centroid argmin via one lexicographic min(struct).
    */
  val clusterQuality: Q = Q(
    (s, d) => {
      val ex = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          posexplode(VectorFunctions.scaledMicro(col("embedding"))))
        .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
      val cent = ex.groupBy("label", "dim")
        .agg(expr("sum(x) div count(1)").as("c")).persist()
      val intra = ex.join(cent, Seq("label", "dim"))
        .groupBy("vec_id", "label")
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d2"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), sum("d2").as("sum_d2"))
        .selectExpr("label", "n_vecs", "sum_d2 div n_vecs AS mean_intra_d2")
      val cpairs = cent.toDF("label", "dim", "ca")
        .join(cent.toDF("lb", "dim", "cb"), Seq("dim"))
        .filter(col("label") =!= col("lb"))
        .groupBy("label", "lb")
        .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb"))).as("cd2"))
      val nearest = cpairs.groupBy("label")
        .agg(min(struct(col("cd2"), col("lb"))).as("m"))
        .select(col("label"), col("m.lb").as("near_label"),
          col("m.cd2").as("near_d2"))
      intra.join(nearest, Seq("label"))
        .select("label", "n_vecs", "mean_intra_d2", "near_label", "near_d2")
        .orderBy("label")
    },
    """WITH ex AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
      |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, dim,
      |    (CASE WHEN sum(x) >= 0 THEN sum(x)::BIGINT // count(*)
      |          ELSE -((-(sum(x)::BIGINT)) // count(*)) END)::BIGINT AS c
      |  FROM ex GROUP BY 1, 2),
      |d2 AS (
      |  SELECT e.vec_id, e.label,
      |    sum((e.x - c.c) * (e.x - c.c))::BIGINT AS d2
      |  FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
      |  GROUP BY 1, 2),
      |intra AS (
      |  SELECT label, count(*)::BIGINT AS n_vecs,
      |    (sum(d2) // count(*))::BIGINT AS mean_intra_d2
      |  FROM d2 GROUP BY label),
      |cp AS (
      |  SELECT a.label AS label, b.label AS lb,
      |    sum((a.c - b.c) * (a.c - b.c))::BIGINT AS cd2
      |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
      |  GROUP BY 1, 2),
      |mn AS (SELECT label, min(cd2) AS near_d2 FROM cp GROUP BY 1)
      |SELECT i.label, i.n_vecs, i.mean_intra_d2,
      |  min(c.lb) AS near_label, m.near_d2
      |FROM intra i JOIN mn m ON i.label = m.label
      |JOIN cp c ON c.label = i.label AND c.cd2 = m.near_d2
      |GROUP BY 1, 2, 3, 5
      |ORDER BY i.label""".stripMargin)

  /** MinHash estimator-error audit (q118) — q103 reports whether the
    * BAND layout surfaces good candidates; this audits the SIGNATURE
    * itself: per LSH candidate pair, the matching-row estimate
    * (matches·1000/k) against the exact Jaccard (thousandths), and
    * the absolute error. The k that balances signature cost against
    * estimator noise is read off this table — E[err] ~ 1/(2√k) —
    * making it the second half of the (bands, rows, k) tuning loop.
    * Same constants and CTEs as q24/q59 (one definition, zero drift).
    * Scale shape: candidate generation sub-quadratic (band join),
    * estimate is a signature self-join ON THE CANDIDATES (k columns
    * wide, candidate-linear), exact Jaccard shingles only the
    * candidate-touched docs (q59's discipline) — never corpus pairs.
    * All-positive integer floor-div on both engines; pairs with no
    * shared shingle (possible under band collisions) coalesce to
    * exact 0, never drop.
    */
  val minhashError: Q = {
    val matchSumSql = (0 until MH_K)
      .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sig = Dedup.minhashSignatures(docs, "doc_id", "text", MH_K).persist()
        val cands = Dedup.lshCandidates(sig, "doc_id", MH_BANDS, MH_R)
        val sa = sig.toDF(sig.columns.toIndexedSeq
          .map(c => if (c == "doc_id") "id_a" else s"a_$c"): _*)
        val sb = sig.toDF(sig.columns.toIndexedSeq
          .map(c => if (c == "doc_id") "id_b" else s"b_$c"): _*)
        val matches = (0 until MH_K)
          .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
          .reduce(_ + _)
        val est = cands.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
          .select(col("id_a"), col("id_b"), matches.cast("long").as("n_match"))
          .selectExpr("id_a", "id_b", s"n_match * 1000 div $MH_K AS est_milli")
        val candIds = cands.select(col("id_a").as("doc_id"))
          .union(cands.select(col("id_b").as("doc_id"))).distinct()
        val sh = Dedup.shingleKeys(
          docs.join(candIds, Seq("doc_id"), "leftsemi"), "doc_id", "text", 3)
          .persist()
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val inter = cands.join(sh.toDF("id_a", "s"), Seq("id_a"))
          .join(sh.toDF("id_b", "s"), Seq("id_b", "s"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
        est.join(inter, Seq("id_a", "id_b"), "left")
          .join(sizes.toDF("id_a", "na"), Seq("id_a"))
          .join(sizes.toDF("id_b", "nb"), Seq("id_b"))
          .selectExpr("id_a", "id_b", "est_milli",
            "coalesce(n_inter, 0L) * 1000 div (na + nb - coalesce(n_inter, 0L)) AS exact_milli")
          .selectExpr("id_a", "id_b", "est_milli", "exact_milli",
            "abs(est_milli - exact_milli) AS err_milli")
          .orderBy("id_a", "id_b")
      },
      s"""WITH $minhashPairsCtes,
         |estm AS (
         |  SELECT id_a, id_b,
         |    (($matchSumSql) * 1000 // $MH_K)::BIGINT AS est_milli
         |  FROM cand
         |  JOIN sig sa ON id_a = sa.doc_id
         |  JOIN sig sb ON id_b = sb.doc_id),
         |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*)::BIGINT AS n_inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.id_a
         |  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT e.id_a, e.id_b, e.est_milli,
         |    (coalesce(i.n_inter, 0) * 1000
         |      // (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)))::BIGINT
         |      AS exact_milli
         |  FROM estm e
         |  LEFT JOIN inter i ON e.id_a = i.id_a AND e.id_b = i.id_b
         |  JOIN sizes sa ON e.id_a = sa.doc_id
         |  JOIN sizes sb ON e.id_b = sb.doc_id)
         |SELECT id_a, id_b, est_milli, exact_milli,
         |  abs(est_milli - exact_milli)::BIGINT AS err_milli
         |FROM ex ORDER BY id_a, id_b""".stripMargin)
  }

  /** Leakage-safe train/test split (q119) — q43's hash split keyed by
    * the near-dup COMPONENT instead of the document: two near-dup
    * docs split independently put one "test" document's twin in
    * train, and the eval silently measures memorization. Assign q46's
    * component label (singletons = own id), hash-split ON THE LABEL,
    * and every cluster lands whole. Output per split: docs, distinct
    * components, and the split-spanning component count — which the
    * construction forces to 0 (the column is computed from data, not
    * a constant: it re-counts components with >1 distinct split).
    * Scale shape: the component labels come from the COMMITTED
    * assignment ([[ccAssignment]], `art:warm` after first publish),
    * the split decision is one hash on a per-doc column, the leak
    * check one component-keyed aggregate; nothing shuffles the corpus
    * beyond the one doc↔component join.
    */
  val leakSafeSplit: Q = {
    val TRAIN_MILLI = 800L
    Q(
      (s, d) => {
        val comp = ccAssignment(s, d)
          .withColumnRenamed("node", "doc_id")
        val assigned = t(s, d, "documents").select(col("doc_id"))
          .join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
          .withColumn("split",
            when(Hashing.h32(col("component").cast("string")) % 1000 < TRAIN_MILLI,
              "train").otherwise("test"))
          .persist()
        val leaky = assigned.groupBy("component")
          .agg(countDistinct("split").as("n_splits"))
          .agg(sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("n_leaky"))
        assigned.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("component").as("n_components"))
          .crossJoin(broadcast(leaky))
          .select("split", "n_docs", "n_components", "n_leaky")
          .orderBy("split")
      },
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk(n, m) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, walk.m FROM walk JOIN edges e ON e.u = walk.n),
         |comp AS (SELECT n AS node, min(m) AS component FROM walk GROUP BY n),
         |asg AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
         |    CASE WHEN (${Hashing.h32Sql("coalesce(c.component, d.doc_id)::VARCHAR")}) % 1000
         |              < $TRAIN_MILLI
         |         THEN 'train' ELSE 'test' END AS split
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         |leaky AS (
         |  SELECT count(*)::BIGINT AS n_leaky FROM (
         |    SELECT component FROM asg
         |    GROUP BY component HAVING count(DISTINCT split) > 1))
         |SELECT split, count(*)::BIGINT AS n_docs,
         |  count(DISTINCT component)::BIGINT AS n_components,
         |  (SELECT n_leaky FROM leaky) AS n_leaky
         |FROM asg GROUP BY split ORDER BY split""".stripMargin)
  }

  /** Crawl-over-crawl snapshot diff (q124) — the CDC readout of a
    * refresh: given corpus v1 and v2, classify every doc as added /
    * removed / changed / unchanged by content hash and report counts
    * with the earliest example id per class. v2 is synthesized
    * deterministically from v1 by doc-id hash (1/10 dropped, 1/10
    * text-perturbed, 1/10 re-added under new ids), so both engines
    * derive the identical pair of snapshots and the classes have
    * known, non-trivial populations. Scale shape: one full-outer
    * equi-join on the id (the only shuffle), per-row md5, class state
    * is 4 groups — at 100 TB this is the nightly "what changed"
    * report priced at one join, and the changed/added ids are exactly
    * the docs the incremental dedup (q91) and index maintenance need
    * to touch.
    */
  val snapshotDiff: Q = Q(
    (s, d) => {
      val base = t(s, d, "documents").select(col("doc_id"), col("text"))
      val h = Hashing.h32(col("doc_id").cast("string")) % 10
      val v2 = base.filter(h =!= 0)
        .select(col("doc_id"),
          when(h === 1, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(base.filter(h === 2)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" new")).as("text")))
      base.select(col("doc_id"), md5(col("text")).as("h1"))
        .join(v2.select(col("doc_id"), md5(col("text")).as("h2")),
          Seq("doc_id"), "fullouter")
        .select(col("doc_id"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") === col("h2"), "unchanged")
            .otherwise("changed").as("change_type"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("example_id"))
        .orderBy("change_type")
    },
    s"""WITH h AS (
       |  SELECT doc_id, text,
       |    (${Hashing.h32Sql("doc_id::VARCHAR")}) % 10 AS sel
       |  FROM documents),
       |v2 AS (
       |  SELECT doc_id,
       |    CASE WHEN sel = 1 THEN text || ' v2' ELSE text END AS text
       |  FROM h WHERE sel <> 0
       |  UNION ALL
       |  SELECT doc_id + 3000000, text || ' new' FROM h WHERE sel = 2),
       |d AS (
       |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |    CASE WHEN a.doc_id IS NULL THEN 'added'
       |         WHEN b.doc_id IS NULL THEN 'removed'
       |         WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
       |         ELSE 'changed' END AS change_type
       |  FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
       |SELECT change_type, count(*)::BIGINT AS n_docs,
       |  min(doc_id) AS example_id
       |FROM d GROUP BY change_type ORDER BY change_type""".stripMargin)

  /** Johnson–Lindenstrauss random projection (q125) — the
    * dimensionality squeeze run BEFORE LSH/clustering at scale: d=64
    * micro-unit components down to r=8 via a seedless ±1 sign matrix
    * (sign(i,j) = parity of h32("i:j") — no materialized matrix, no
    * broadcast, reproducible on any engine). Work is one posexplode +
    * one vec-keyed groupBy with r conditional integer sums: a single
    * exchange carrying (vec_id, dim, x) rows, embarrassingly parallel
    * at any corpus size, and every output an exact integer (|p_j| ≤
    * 64·10⁶ — no float, no epsilon). Distances are preserved to
    * O(1/√r) in expectation, which is what makes the projected space
    * a valid LSH/k-means prefilter; the exact audits (q96 recall,
    * q118 estimator error) are how a deployment would tune r.
    */
  val randomProjection: Q = {
    val R = 8
    Q(
      (s, d) => {
        val ex = t(s, d, "embeddings").select(col("vec_id"),
            posexplode(VectorFunctions.scaledMicro(col("embedding"))))
          .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
        val sums = (0 until R).map { j =>
          sum(when(Hashing.h32(
              concat(col("dim").cast("string"), lit(":"), lit(j.toString))) % 2 === 0,
            col("x")).otherwise(-col("x"))).as(s"p$j")
        }
        ex.groupBy("vec_id").agg(sums.head, sums.tail: _*)
          .orderBy("vec_id")
      },
      {
        val cols = (0 until R).map { j =>
          s"""sum(CASE WHEN (${Hashing.h32Sql(s"(dim - 1)::VARCHAR || ':' || '$j'")}) % 2 = 0
             |      THEN x ELSE -x END)::BIGINT AS p$j""".stripMargin
        }.mkString(",\n  ")
        s"""WITH ex AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
           |  FROM embeddings)
           |SELECT vec_id,
           |  $cols
           |FROM ex GROUP BY vec_id ORDER BY vec_id""".stripMargin
      })
  }

  /** Per-source boilerplate fraction (q127) — q110 finds the template
    * spans; this prices what they COST each acquisition channel: the
    * share (integer thousandths) of a doc's word-8-gram spans whose
    * corpus document frequency is ≥ MIN_DF, rolled up per source. The
    * number that decides whether a source needs template stripping
    * before its tokens count toward q115's budget. Same injected
    * templates as q110 (docs ≡ 0 mod 7 / mod 11), so populations are
    * non-trivial and known. Scale shape: one span explode, one
    * span-keyed df groupBy (vocabulary-bounded), one span-keyed
    * equi-join back, then doc- and source-keyed aggregates — the df
    * side is the same artifact q110 builds, shared at 100 TB.
    */
  val boilerplateFrac: Q = {
    val W = 8; val MIN_DF = 5L
    val TPL_A = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val TPL_B = "all rights reserved terms of service apply here"
    Q(
      (s, d) => {
        val injected = concat(
          when(col("doc_id") % 7 === 0, lit(TPL_A + " ")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(TPL_B + " ")).otherwise(lit("")),
          col("text"))
        val spans = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            TextFunctions.words(injected).as("arr"))
          .select(col("doc_id"), col("source"), explode(
            transform(sequence(lit(0),
                expr(s"greatest(size(arr) - 1, 0) div $W")),
              i => array_join(slice(col("arr"), i * W + 1, lit(W)), " ")))
            .as("span"))
        val df = spans.groupBy("span")
          .agg(countDistinct("doc_id").as("df"))
        spans.join(df, "span")
          .groupBy("doc_id", "source")
          .agg(expr(s"sum(CASE WHEN df >= $MIN_DF THEN 1 ELSE 0 END)" +
            " * 1000 div count(1)").as("bp_th"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            expr("sum(bp_th) div count(1)").as("mean_bp_th"),
            max("bp_th").as("max_bp_th"))
          .orderBy("source")
      },
      s"""WITH c AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 7 = 0 THEN '$TPL_A ' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN '$TPL_B ' ELSE '' END || text AS text
         |  FROM documents),
         |w AS (SELECT doc_id, source, ${TextFunctions.wordsSql("text")} AS arr FROM c),
         |e AS (SELECT doc_id, source, arr,
         |  unnest(range(0, greatest(len(arr) - 1, 0) // $W + 1)) AS idx FROM w),
         |sp AS (SELECT doc_id, source,
         |  array_to_string(arr[(idx * $W + 1):(idx * $W + $W)], ' ') AS span
         |  FROM e),
         |df AS (SELECT span, count(DISTINCT doc_id) AS df FROM sp GROUP BY span),
         |bp AS (
         |  SELECT sp.doc_id, sp.source,
         |    (sum(CASE WHEN df.df >= $MIN_DF THEN 1 ELSE 0 END) * 1000
         |      // count(*))::BIGINT AS bp_th
         |  FROM sp JOIN df ON sp.span = df.span
         |  GROUP BY sp.doc_id, sp.source)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  (sum(bp_th) // count(*))::BIGINT AS mean_bp_th,
         |  max(bp_th)::BIGINT AS max_bp_th
         |FROM bp GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Embedding coverage audit (q128) — the referential-integrity
    * check a multimodal corpus runs before any ANN/SemDeDup stage:
    * which docs have no embedding row, per source, with the first
    * missing id as the triage example. Gaps are injected
    * deterministically (1/8 of embeddings dropped by id hash) so the
    * report has known non-trivial populations. Scale shape: one
    * id-keyed left join (strategy left to AQE — both sides scale with
    * the corpus) into a taxonomy-bounded source aggregate; the
    * missing-id example is a conditional min, not a collect.
    */
  val embedCoverage: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
      val have = t(s, d, "embeddings")
        .select(col("vec_id").as("doc_id"))
        .filter(Hashing.h32(concat(lit("cov:"),
          col("doc_id").cast("string"))) % 8 =!= 0)
        .withColumn("c", lit(1L))
      docs.join(have, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_covered"),
          coalesce(min(when(col("c").isNull, col("doc_id"))), lit(-1L))
            .as("first_missing"))
        .withColumn("coverage_th", expr("n_covered * 1000 div n_docs"))
        .select("source", "n_docs", "n_covered", "coverage_th", "first_missing")
        .orderBy("source")
    },
    s"""WITH have AS (
       |  SELECT vec_id AS doc_id FROM embeddings
       |  WHERE (${Hashing.h32Sql("'cov:' || vec_id::VARCHAR")}) % 8 <> 0),
       |j AS (
       |  SELECT d.source, d.doc_id, h.doc_id AS c
       |  FROM documents d LEFT JOIN have h ON d.doc_id = h.doc_id)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_covered,
       |  (sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) * 1000
       |    // count(*))::BIGINT AS coverage_th,
       |  coalesce(min(CASE WHEN c IS NULL THEN doc_id END), -1)::BIGINT
       |    AS first_missing
       |FROM j GROUP BY source ORDER BY source""".stripMargin)

  /** Output shard balance audit (q129) — after a hash-sharded write
    * (the layout every training-data export uses), per-shard doc and
    * char volume plus each shard's share of the corpus in integer
    * thousandths. A shard with share ≫ 1000/S means the id hash is
    * skewed and downstream data loaders stall on the straggler file.
    * Scale shape: one map-side-combinable S-group aggregate; the
    * share normalization is a window over the S aggregated rows —
    * state bounded by the shard count, never the corpus.
    */
  val shardBalance: Q = {
    val S = 64
    Q(
      (s, d) =>
        t(s, d, "documents")
          .select((Hashing.h32(col("doc_id").cast("string")) % S).as("shard"),
            col("n_chars"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .withColumn("share_th",
            expr("sum_chars * 1000 div (sum(sum_chars) OVER ())"))
          .orderBy("shard"),
      s"""WITH sh AS (
         |  SELECT (${Hashing.h32Sql("doc_id::VARCHAR")}) % $S AS shard, n_chars
         |  FROM documents),
         |agg AS (
         |  SELECT shard, count(*)::BIGINT AS n_docs,
         |    sum(n_chars)::BIGINT AS sum_chars
         |  FROM sh GROUP BY shard)
         |SELECT shard, n_docs, sum_chars,
         |  (sum_chars * 1000 // sum(sum_chars) OVER ())::BIGINT AS share_th
         |FROM agg ORDER BY shard""".stripMargin)
  }

  /** Deterministic epoch shuffle order (q130) — the training-order
    * question: every epoch needs a different but REPRODUCIBLE
    * permutation of the corpus. A global row_number is a single-
    * partition sort at 100 TB, so the order is hierarchical instead:
    * shard = id hash mod S picks the output file, pos = rank of the
    * epoch-salted hash within the shard — the (shard, pos) pair is a
    * total order, every shard's window sorts in parallel, and any
    * engine reproduces it from (epoch, doc_id) alone. Changing the
    * epoch salt re-deals both shard membership and within-shard
    * order with no state carried between epochs.
    */
  val epochOrder: Q = {
    val SH = 16
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val keyed = t(s, d, "documents")
          .select(col("doc_id"), Hashing.h32(concat(lit("ep1:"),
            col("doc_id").cast("string"))).as("k"))
          .withColumn("shard", col("k") % SH)
        keyed
          .withColumn("pos", row_number().over(
            Window.partitionBy("shard").orderBy(col("k"), col("doc_id")))
            .cast("long"))
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos")
      },
      s"""WITH keyed AS (
         |  SELECT doc_id,
         |    (${Hashing.h32Sql("'ep1:' || doc_id::VARCHAR")}) AS k
         |  FROM documents),
         |sh AS (SELECT doc_id, k, k % $SH AS shard FROM keyed)
         |SELECT doc_id, shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)::BIGINT AS pos
         |FROM sh ORDER BY shard, pos""".stripMargin)
  }

  /** Format-matrix consistency sweep (q223) — the capstone on the
    * source/sink family (q164 JSONL, q165 ORC, q168 Avro, q213 CSV):
    * ONE projection of the corpus is published once per data version
    * in three containers (parquet, ORC, quoted CSV) side by side, and
    * the judged output is each copy's content fingerprint (count,
    * chars, content-hash sum) — three rows that must be IDENTICAL to
    * each other and to the oracle's single fingerprint of the base
    * table. A format whose reader or writer drops, reorders bytes in,
    * or re-encodes any value breaks its row. This is the cheap
    * continuous check a multi-format lakehouse runs so "same data in
    * every container" is a tested invariant, not an assumption.
    */
  val formatMatrix: Q = Q(
    (s, d) => {
      val root = graft.sources.Artifacts.publishOnce(
        "graft-fmtmatrix", d, Seq("documents.parquet")) { stage =>
        val p = t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"),
            col("n_chars").cast("long").as("n_chars"))
        p.write.mode("overwrite").parquet(s"$stage/parquet")
        p.write.mode("overwrite").orc(s"$stage/orc")
        p.write.mode("overwrite")
          .option("header", "true").option("escape", "\"")
          .csv(s"$stage/csv")
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(stage, "_SUCCESS"))
        ()
      }
      val schema = "doc_id BIGINT, text STRING, source STRING, " +
        "n_chars BIGINT"
      def fp(df: DataFrame, fmt: String): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"),
          sum(Hashing.h32(col("text"))).as("text_h32_sum"))
          .select(lit(fmt).as("fmt"), col("n_docs"), col("chars"),
            col("text_h32_sum"))
      fp(s.read.parquet(s"$root/parquet"), "parquet")
        .unionByName(fp(s.read.orc(s"$root/orc"), "orc"))
        // empty-string fidelity on the read side — see q213's note
        .unionByName(fp(s.read.option("header", "true")
          .option("escape", "\"")
          .option("emptyValue", "").option("nullValue", "\\u0000")
          .schema(schema).csv(s"$root/csv"),
          "csv"))
        .orderBy("fmt")
    },
    s"""WITH fp AS (
       |  SELECT count(*)::BIGINT AS n_docs,
       |    sum(n_chars)::BIGINT AS chars,
       |    sum(${Hashing.h32Sql("text")})::BIGINT AS text_h32_sum
       |  FROM documents)
       |SELECT fmt, n_docs, chars, text_h32_sum
       |FROM (VALUES ('csv'), ('orc'), ('parquet')) v(fmt), fp
       |ORDER BY fmt""".stripMargin)

  /** Mixture knapsack (q221) — turn per-source quality into an
    * ALLOCATION: given a token budget (30% of the corpus), fill it
    * greedily from the highest-quality source down, splitting the one
    * boundary source fractionally — the fractional-knapsack optimum
    * for a linear quality objective, i.e. the first-order answer to
    * "which sources do we train on, and how much of each". Source
    * stats are one corpus aggregate (tokens = word counts, quality =
    * mean per-doc ppm — floored per doc BEFORE averaging so both
    * engines share the integer); the allocation itself is a
    * cumulative window over the ≤20-row source taxonomy. Ties on
    * quality break by source name — a total order, so the greedy
    * line is deterministic.
    */
  val mixtureKnapsack: Q = {
    val BUDGET_PCT = 30L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val per = t(s, d, "documents")
          .select(col("source"),
            size(TextFunctions.words(col("text"))).cast("long")
              .as("toks"),
            floor(TextFunctions.qualityScore(
              TextFunctions.words(col("text"))) * 1000000)
              .cast("long").as("q_ppm"))
          .groupBy("source")
          .agg(sum("toks").as("tokens"),
            expr("sum(q_ppm) div count(1)").as("quality_ppm"))
        val wAll = Window.partitionBy()
        val wg = Window.partitionBy()
          .orderBy(desc("quality_ppm"), asc("source"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        per
          .withColumn("budget",
            expr(s"sum(tokens) over () * $BUDGET_PCT div 100"))
          .withColumn("cum", sum("tokens").over(wg))
          .withColumn("alloc",
            greatest(lit(0L), least(col("tokens"),
              col("budget") - (col("cum") - col("tokens")))))
          .select(col("source"), col("tokens"), col("quality_ppm"),
            col("alloc"),
            expr("alloc * 1000000L div greatest(tokens, 1L)")
              .as("take_ppm"))
          .orderBy(desc("quality_ppm"), asc("source"))
      },
      s"""WITH per AS (
         |  SELECT source,
         |    sum(len(${TextFunctions.wordsSql("text")}))::BIGINT AS tokens,
         |    (sum(floor((${TextFunctions.qualityScoreSql(
              TextFunctions.wordsSql("text"))}) * 1000000)::BIGINT)
         |       // count(*))::BIGINT AS quality_ppm
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, tokens, quality_ppm,
         |    sum(tokens) OVER ()::BIGINT * $BUDGET_PCT // 100 AS budget,
         |    sum(tokens) OVER (ORDER BY quality_ppm DESC, source
         |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
         |  FROM per)
         |SELECT source, tokens, quality_ppm,
         |  greatest(0, least(tokens, budget - (cum - tokens)))::BIGINT
         |    AS alloc,
         |  (greatest(0, least(tokens, budget - (cum - tokens)))
         |     * 1000000 // greatest(tokens, 1))::BIGINT AS take_ppm
         |FROM w ORDER BY quality_ppm DESC, source""".stripMargin)
  }

  /** Epoch decorrelation audit (q218) — are two epochs' shuffles
    * actually independent? Per shard (same data-keyed shard
    * assignment both epochs, so the comparison is within identical
    * populations), the exact integer Spearman rank correlation
    * between epoch-1 and epoch-2 in-shard positions:
    * ρ_ppm = 10⁶ − 6·Σd²·10⁶ div (n(n²−1)). A near-zero value says
    * the reshuffle destroyed epoch-1's order (what SGD wants); a
    * high value means the "new" epoch replays the old curriculum.
    * 6·Σd²·10⁶ stays exact int64 for shards up to ~1.6·10⁴ rows
    * (worst case Σd² = n(n²−1)/3); past that you raise SH so
    * per-shard n stays bounded — the SAME knob q130's layout
    * argument already scales with the corpus. Two per-shard windows,
    * one map-side moment aggregate — no pair joins, no global sort.
    */
  val epochDecorrelation: Q = {
    val SH = 16
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val keyed = t(s, d, "documents")
          .select(col("doc_id"),
            Hashing.h32(col("doc_id").cast("string")).as("sk"),
            Hashing.h32(concat(lit("ep1:"),
              col("doc_id").cast("string"))).as("k1"),
            Hashing.h32(concat(lit("ep2:"),
              col("doc_id").cast("string"))).as("k2"))
          .withColumn("shard", col("sk") % SH)
        val pos = keyed
          .withColumn("p1", row_number().over(
            Window.partitionBy("shard").orderBy(col("k1"), col("doc_id")))
            .cast("long"))
          .withColumn("p2", row_number().over(
            Window.partitionBy("shard").orderBy(col("k2"), col("doc_id")))
            .cast("long"))
        pos.groupBy("shard")
          .agg(count(lit(1)).as("n"),
            sum(expr("(p1 - p2) * (p1 - p2)")).as("sd2"))
          .filter(col("n") >= 2)
          .select(col("shard"), col("n"),
            expr("1000000L - 6L * sd2 * 1000000L div (n * (n * n - 1L))")
              .as("spearman_ppm"))
          .orderBy("shard")
      },
      s"""WITH keyed AS (
         |  SELECT doc_id,
         |    (${Hashing.h32Sql("doc_id::VARCHAR")}) % $SH AS shard,
         |    (${Hashing.h32Sql("'ep1:' || doc_id::VARCHAR")}) AS k1,
         |    (${Hashing.h32Sql("'ep2:' || doc_id::VARCHAR")}) AS k2
         |  FROM documents),
         |po AS (
         |  SELECT shard,
         |    row_number() OVER (PARTITION BY shard
         |      ORDER BY k1, doc_id)::BIGINT AS p1,
         |    row_number() OVER (PARTITION BY shard
         |      ORDER BY k2, doc_id)::BIGINT AS p2
         |  FROM keyed),
         |ag AS (
         |  SELECT shard, count(*)::BIGINT AS n,
         |    sum((p1 - p2) * (p1 - p2))::BIGINT AS sd2
         |  FROM po GROUP BY shard)
         |SELECT shard, n,
         |  (1000000 - 6 * sd2 * 1000000 // (n * (n * n - 1)))::BIGINT
         |    AS spearman_ppm
         |FROM ag WHERE n >= 2 ORDER BY shard""".stripMargin)
  }

  /** In-batch negative collision audit (q217) — contrastive training
    * (CLIP/DPR-style) takes its negatives from the OTHER examples in
    * the batch, which silently breaks when a batch contains two
    * docs from the same source that are near-paraphrases: those are
    * false negatives. Over q130's deterministic epoch order (seeded
    * shard + in-shard position), batches are consecutive 32-blocks,
    * and the audit counts same-source pairs per batch in closed form
    * (Σ c·(c−1)/2 over the batch's source histogram — never a pair
    * join) against the total pair budget n·(n−1)/2. Per shard:
    * batch count, pair budget, collisions, worst batch, collision
    * ppm. The window is per-shard (q130's scale argument: shards
    * bound the sort); everything after is map-side histogram
    * algebra. High ppm ⇒ re-shuffle with source-aware interleaving
    * before training.
    */
  val inBatchNegatives: Q = {
    val SH = 16; val B = 32
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val keyed = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            Hashing.h32(concat(lit("ep1:"),
              col("doc_id").cast("string"))).as("k"))
          .withColumn("shard", col("k") % SH)
        val batched = keyed
          .withColumn("pos", row_number().over(
            Window.partitionBy("shard")
              .orderBy(col("k"), col("doc_id"))).cast("long"))
          .withColumn("batch", expr(s"(pos - 1) div $B"))
        val perBatch = batched
          .groupBy("shard", "batch", "source")
          .agg(count(lit(1)).as("c"))
          .groupBy("shard", "batch")
          .agg(sum("c").as("n"),
            sum(expr("c * (c - 1) div 2")).as("coll"))
          .withColumn("pairs", expr("n * (n - 1) div 2"))
        perBatch.groupBy("shard")
          .agg(count(lit(1)).as("n_batches"), sum("pairs").as("n_pairs"),
            sum("coll").as("n_collisions"),
            max("coll").as("max_batch_collisions"))
          .withColumn("coll_ppm",
            expr("n_collisions * 1000000L div greatest(n_pairs, 1L)"))
          .orderBy("shard")
      },
      s"""WITH keyed AS (
         |  SELECT doc_id, source,
         |    (${Hashing.h32Sql("'ep1:' || doc_id::VARCHAR")}) AS k
         |  FROM documents),
         |sh AS (SELECT doc_id, source, k, k % $SH AS shard FROM keyed),
         |po AS (
         |  SELECT shard, source,
         |    (row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
         |      - 1) // $B AS batch
         |  FROM sh),
         |cell AS (SELECT shard, batch, source, count(*)::BIGINT AS c
         |         FROM po GROUP BY 1, 2, 3),
         |pb AS (
         |  SELECT shard, batch, sum(c)::BIGINT AS n,
         |    sum(c * (c - 1) // 2)::BIGINT AS coll
         |  FROM cell GROUP BY 1, 2)
         |SELECT shard, count(*)::BIGINT AS n_batches,
         |  sum(n * (n - 1) // 2)::BIGINT AS n_pairs,
         |  sum(coll)::BIGINT AS n_collisions,
         |  max(coll)::BIGINT AS max_batch_collisions,
         |  (sum(coll) * 1000000
         |     // greatest(sum(n * (n - 1) // 2), 1))::BIGINT AS coll_ppm
         |FROM pb GROUP BY shard ORDER BY shard""".stripMargin)
  }

  /** Quality × duplication calibration (q131) — does duplication
    * concentrate in low-quality docs? Per quality decile (floor of
    * the blended score × 10 — the same IEEE double both engines
    * compute, so the bucket is exact): doc count, mean exact-dup
    * cluster size and dup-rate in integer thousandths. The answer
    * decides whether dedup or quality filtering should run first in
    * q87's funnel (if dupes are mostly low-quality, the cheap filter
    * shrinks the expensive dedup's input). Dupes injected 2× for
    * docs ≡ 0 mod 5 give known populations. Scale shape: one
    * content-hash groupBy (q22's single exchange) + one hash-keyed
    * join back + a 10-group aggregate.
    */
  val qualityDupCalibration: Q = Q(
    (s, d) => {
      val base = t(s, d, "documents").select(col("doc_id"), col("text"))
      val injected = base.filter(col("doc_id") % 5 === 0)
      val corpus = base
        .unionByName(injected.select((col("doc_id") + 4000000L).as("doc_id"),
          col("text")))
        .unionByName(injected.select((col("doc_id") + 5000000L).as("doc_id"),
          col("text")))
      val scored = corpus.select(col("doc_id"), md5(col("text")).as("h"),
        floor(TextFunctions.qualityScore(TextFunctions.words(col("text"))) * 10)
          .cast("long").as("q_bucket"))
      val sizes = scored.groupBy("h").agg(count(lit(1)).as("csize"))
      scored.join(sizes, "h")
        .groupBy("q_bucket")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(csize) * 1000 div count(1)").as("mean_csize_th"),
          expr("sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) * 1000 div count(1)")
            .as("dup_rate_th"))
        .orderBy("q_bucket")
    },
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 4000000, text FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL SELECT doc_id + 5000000, text FROM documents WHERE doc_id % 5 = 0),
       |w AS (SELECT doc_id, md5(text) AS h,
       |    ${TextFunctions.wordsSql("text")} AS arr FROM corpus),
       |sc AS (SELECT doc_id, h,
       |    floor((${TextFunctions.qualityScoreSql("arr")}) * 10)::BIGINT AS q_bucket
       |  FROM w),
       |sz AS (SELECT h, count(*)::BIGINT AS csize FROM sc GROUP BY h)
       |SELECT q_bucket, count(*)::BIGINT AS n_docs,
       |  (sum(csize) * 1000 // count(*))::BIGINT AS mean_csize_th,
       |  (sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) * 1000
       |    // count(*))::BIGINT AS dup_rate_th
       |FROM sc JOIN sz USING (h)
       |GROUP BY q_bucket ORDER BY q_bucket""".stripMargin)

  /** Embedding version-drift audit (q132) — when the embedding model
    * is upgraded, which labels moved and by how much? v2 is derived
    * deterministically from v1 (dims selected by (vec_id, dim) hash
    * get |x| div 10 added — value-dependent, exact integer), and the
    * audit reports per label: vectors, mean/max drift² and how many
    * moved at all. In production v2 is a second table and the deltas
    * come from an id-keyed join; the aggregation shape is identical.
    * Scale shape: one posexplode + one (vec_id, label) groupBy (the
    * single exchange) + a label-bounded rollup — q125's cost model.
    * abs() before the div keeps truncating-div == floor-div on both
    * engines.
    */
  val embedDrift: Q = Q(
    (s, d) => {
      val ex = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(VectorFunctions.scaledMicro(col("embedding"))))
        .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
      val sel = Hashing.h32(concat(lit("drift:"),
        col("vec_id").cast("string"), lit(":"),
        col("dim").cast("string"))) % 16 === 0
      ex.select(col("vec_id"), col("label"),
          when(sel, expr("(abs(x) div 10) * (abs(x) div 10)"))
            .otherwise(lit(0L)).as("d2"))
        .groupBy("vec_id", "label").agg(sum("d2").as("d2"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          expr("sum(d2) div count(1)").as("mean_d2"),
          max("d2").as("max_d2"),
          sum(when(col("d2") > 0, 1L).otherwise(0L)).as("n_moved"))
        .orderBy("label")
    },
    s"""WITH ex AS (
       |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
       |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS x
       |  FROM embeddings),
       |dd AS (
       |  SELECT vec_id, label,
       |    CASE WHEN (${Hashing.h32Sql(
                "'drift:' || vec_id::VARCHAR || ':' || (dim - 1)::VARCHAR")}) % 16 = 0
       |      THEN (abs(x) // 10) * (abs(x) // 10) ELSE 0 END AS d2
       |  FROM ex),
       |pv AS (SELECT vec_id, label, sum(d2)::BIGINT AS d2
       |  FROM dd GROUP BY vec_id, label)
       |SELECT label, count(*)::BIGINT AS n_vecs,
       |  (sum(d2) // count(*))::BIGINT AS mean_d2,
       |  max(d2)::BIGINT AS max_d2,
       |  sum(CASE WHEN d2 > 0 THEN 1 ELSE 0 END)::BIGINT AS n_moved
       |FROM pv GROUP BY label ORDER BY label""".stripMargin)

  /** Shared-prefix groups (q133) — the truncated-crawl detector:
    * re-fetches cut short by timeouts/paywalls share their first
    * words with the full document but hash differently, so exact
    * dedup misses them and MinHash underweights them (the tail
    * dominates the shingle set). Groups docs by first-12-words
    * prefix key and surfaces groups with ≥2 docs AND ≥2 distinct
    * bodies — shared prefix, different tails. Truncated twins
    * (first 20 words of docs ≡ 0 mod 9) are injected so populations
    * are known. Scale shape: one prefix-keyed groupBy — q22's exact
    * dedup cost on a 12-word key; no pairs ever materialize.
    */
  val prefixGroups: Q = Q(
    (s, d) => {
      val base = t(s, d, "documents").select(col("doc_id"), col("text"))
      val trunc = base.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 6000000L).as("doc_id"),
          array_join(slice(TextFunctions.words(col("text")), 1, 20), " ")
            .as("text"))
      base.unionByName(trunc)
        .select(col("doc_id"),
          Hashing.h32(array_join(
            slice(TextFunctions.words(col("text")), 1, 12), " ")).as("prefix_key"),
          md5(col("text")).as("h"))
        .groupBy("prefix_key")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("h").as("n_bodies"),
          min("doc_id").as("first_doc"))
        .filter(col("n_docs") >= 2 && col("n_bodies") >= 2)
        .orderBy("prefix_key")
    },
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 6000000,
       |    array_to_string((${TextFunctions.wordsSql("text")})[1:20], ' ')
       |  FROM documents WHERE doc_id % 9 = 0),
       |pk AS (
       |  SELECT doc_id,
       |    (${Hashing.h32Sql(
              s"array_to_string((${TextFunctions.wordsSql("text")})[1:12], ' ')")})
       |      AS prefix_key,
       |    md5(text) AS h
       |  FROM corpus)
       |SELECT prefix_key, count(*)::BIGINT AS n_docs,
       |  count(DISTINCT h)::BIGINT AS n_bodies,
       |  min(doc_id)::BIGINT AS first_doc
       |FROM pk GROUP BY prefix_key
       |HAVING count(*) >= 2 AND count(DISTINCT h) >= 2
       |ORDER BY prefix_key""".stripMargin)

  /** Source vocabulary-signature overlap (q134) — are two acquisition
    * channels drawing from the same distribution? Each source is
    * signed by its top-K word bigrams (rank window, ties broken by
    * bigram string — deterministic on both engines); pair overlap is
    * Jaccard over the two K-sets in integer thousandths. The cheap
    * distribution-level complement to q111's instance-level LSH
    * matrix: q111 says sources share DOCUMENTS, this says they share
    * STYLE, which is what mix planning (q77) actually weighs. Scale
    * shape: one bigram count (map-side combinable), one per-source
    * top-K window (parallel across sources), then a bigram-keyed
    * join of K-bounded lists — pair state source²-bounded.
    */
  val vocabOverlap: Q = {
    val K = 50
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val arr = TextFunctions.words(col("text"))
        val bg = t(s, d, "documents")
          .select(col("source"), arr.as("arr"))
          .select(col("source"), explode(
            expr("transform(sequence(1, greatest(size(arr) - 1, 1))," +
              " i -> concat(arr[i - 1], ' ', arr[i]))")).as("bg"))
          // a 1-word doc emits one NULL bigram (arr[1] out of range on
          // both engines) — drop it before ranking: Spark and DuckDB
          // disagree on NULL placement under ORDER BY
          .filter(col("bg").isNotNull)
        val top = bg.groupBy("source", "bg").agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("source").orderBy(col("n").desc, col("bg"))))
          .filter(col("rnk") <= K).select("source", "bg")
        top.as("a").join(top.as("b"),
            col("a.bg") === col("b.bg") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared"))
          .withColumn("jaccard_th",
            expr(s"n_shared * 1000 div (${2 * K} - n_shared)"))
          .orderBy("source_a", "source_b")
      },
      s"""WITH w AS (
         |  SELECT source, ${TextFunctions.wordsSql("text")} AS arr FROM documents),
         |e AS (SELECT source, arr,
         |  unnest(range(1, greatest(len(arr) - 1, 1) + 1)) AS i FROM w),
         |bg AS (SELECT source, arr[i] || ' ' || arr[i + 1] AS bg FROM e
         |  WHERE arr[i + 1] IS NOT NULL),
         |cnt AS (SELECT source, bg, count(*) AS n FROM bg GROUP BY source, bg),
         |top AS (
         |  SELECT source, bg FROM (
         |    SELECT source, bg,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY n DESC, bg) AS rnk
         |    FROM cnt) r WHERE rnk <= $K)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  count(*)::BIGINT AS n_shared,
         |  (count(*) * 1000 // (${2 * K} - count(*)))::BIGINT AS jaccard_th
         |FROM top a JOIN top b ON a.bg = b.bg AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin)
  }

  /** Chunk round-trip integrity proof (q135) — q58 plans chunk
    * boundaries; this PROVES the chunking is lossless: every doc is
    * cut into 32-token chunk texts, the chunks are reassembled in
    * chunk order, and the reassembly must hash identically to the
    * original. The mismatch count is COMPUTED (and must be 0), not
    * asserted — the q119 discipline: the judged result carries the
    * proof. Scale shape: one chunk explode + one doc-keyed groupBy
    * whose state is the doc's own chunk list (bounded by doc length);
    * order inside the group via array_sort of (chunk, text) structs —
    * no window, no global sort.
    */
  val chunkRoundtrip: Q = {
    val CHUNK = 32
    Q(
      (s, d) => {
        val pieces = t(s, d, "documents")
          .select(col("doc_id"), col("source"), md5(col("text")).as("h0"),
            TextFunctions.words(col("text")).as("arr"))
          .select(col("doc_id"), col("source"), col("h0"),
            explode(expr(s"transform(sequence(0, greatest(size(arr) - 1, 0) div $CHUNK)," +
              s" c -> struct(c AS chunk, array_join(slice(arr, c * $CHUNK + 1, $CHUNK), ' ') AS txt))"))
              .as("p"))
        pieces
          .groupBy("doc_id", "source", "h0")
          .agg(expr("md5(array_join(transform(array_sort(collect_list(p))," +
            " x -> x.txt), ' '))").as("h1"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("h0") === col("h1"), 0L).otherwise(1L))
              .as("n_mismatch"))
          .orderBy("source")
      },
      s"""WITH w AS (
         |  SELECT doc_id, source, md5(text) AS h0,
         |    ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents),
         |e AS (SELECT doc_id, source, h0, arr,
         |  unnest(range(0, greatest(len(arr) - 1, 0) // $CHUNK + 1)) AS c FROM w),
         |p AS (SELECT doc_id, source, h0, c,
         |  array_to_string(arr[(c * $CHUNK + 1):(c * $CHUNK + $CHUNK)], ' ') AS txt
         |  FROM e),
         |r AS (
         |  SELECT doc_id, source, h0,
         |    md5(string_agg(txt, ' ' ORDER BY c)) AS h1
         |  FROM p GROUP BY doc_id, source, h0)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN h0 = h1 THEN 0 ELSE 1 END)::BIGINT AS n_mismatch
         |FROM r GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Dedup-method agreement matrix (q136) — do lexical and semantic
    * dedup agree? Per source, a 2×2 matrix over the doc⨝embedding
    * universe: lexical-dup flag from q104's normalized content hash,
    * semantic-dup flag from q113's int8-quantized code hash, plus
    * agreement Jaccard in thousandths. Disagreement is the
    * interesting diagonal: sem-only = paraphrases / re-encodes that
    * lexical dedup misses; lex-only = same template text embedded
    * differently (multimodal context). Twins injected in BOTH tables
    * with class ≡ doc_id mod 48: class 0 dupes both ways (casefold
    * copy + sub-step embedding nudge), class 16 semantic-only (text
    * gets a variant suffix), class 32 lexical-only (one coordinate
    * bumped past any quantization step) — all four cells provably
    * non-trivial. Scale shape: two content-key groupBys (exact-dedup
    * cost each) + two key-joins back + a source-bounded aggregate —
    * no pairs, no cosine stage.
    */
  val dupMethodAgreement: Q = Q(
    (s, d) => {
      // The id-join and the quantized-code projection each feed four
      // union branches and three consumers (two key-size groupBys +
      // the final join) — persist both once or the join subtree is
      // re-evaluated 12×, which is pure stage overhead (measured
      // 14.1 s → 2.5 s at sf0.1). Same stage-persist discipline as
      // q87's funnel.
      val base = t(s, d, "documents").select(col("doc_id"), col("source"), col("text"))
        .join(t(s, d, "embeddings")
          .select(col("vec_id").as("doc_id"),
            VectorFunctions.scaledMicro(col("embedding")).as("xs")),
          Seq("doc_id"))
        .persist()
      def shifted(mod: Long, text: Column, xs: Column): DataFrame =
        base.filter(col("doc_id") % 48 === mod)
          .select((col("doc_id") + 7000000L).as("doc_id"), col("source"),
            text.as("text"), xs.as("xs"))
      val nudge = expr("transform(xs, x -> x + 1L)")
      val bump = expr(
        "concat(array(element_at(xs, 1) + 10000000L), slice(xs, 2, size(xs) - 1))")
      val uni = base
        .unionByName(shifted(0L, upper(col("text")), nudge))
        .unionByName(shifted(16L,
          concat(col("text"), lit(" variant "), col("doc_id").cast("string")), nudge))
        .unionByName(shifted(32L, upper(col("text")), bump))
      val keyed = uni
        .select(col("doc_id"), col("source"),
          md5(trim(regexp_replace(lower(col("text")), "  +", " "))).as("lk"),
          col("xs"))
        .selectExpr("doc_id", "source", "lk", "xs",
          "array_min(xs) AS mn", "greatest(array_max(xs) - array_min(xs), 1L) AS rng")
        .selectExpr("doc_id", "source", "lk",
          """md5(concat(cast(rng AS string), ':',
            |  array_join(transform(xs, x -> cast((x - mn) * 255 div rng AS string)), ',')))
            |  AS sk""".stripMargin)
        .persist()
      val lsz = keyed.groupBy("lk").agg(count(lit(1)).as("ln"))
      val ssz = keyed.groupBy("sk").agg(count(lit(1)).as("sn"))
      keyed.join(lsz, "lk").join(ssz, "sk")
        .groupBy("source")
        .agg(
          sum(when(col("ln") > 1 && col("sn") > 1, 1L).otherwise(0L)).as("n_both"),
          sum(when(col("ln") > 1 && col("sn") === 1, 1L).otherwise(0L)).as("n_lex_only"),
          sum(when(col("ln") === 1 && col("sn") > 1, 1L).otherwise(0L)).as("n_sem_only"),
          sum(when(col("ln") === 1 && col("sn") === 1, 1L).otherwise(0L)).as("n_neither"))
        .withColumn("agree_th",
          expr("n_both * 1000 div greatest(n_both + n_lex_only + n_sem_only, 1L)"))
        .orderBy("source")
    },
    s"""WITH base AS (
       |  SELECT d.doc_id, d.source, d.text,
       |    ${VectorFunctions.scaledMicroSql("e.embedding")} AS xs
       |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
       |uni AS (
       |  SELECT doc_id, source, text, xs FROM base
       |  UNION ALL
       |  SELECT doc_id + 7000000, source, upper(text),
       |    list_transform(xs, x -> x + 1)
       |  FROM base WHERE doc_id % 48 = 0
       |  UNION ALL
       |  SELECT doc_id + 7000000, source,
       |    text || ' variant ' || doc_id::VARCHAR, list_transform(xs, x -> x + 1)
       |  FROM base WHERE doc_id % 48 = 16
       |  UNION ALL
       |  SELECT doc_id + 7000000, source, upper(text),
       |    list_concat([xs[1] + 10000000], xs[2:])
       |  FROM base WHERE doc_id % 48 = 32),
       |mm AS (
       |  SELECT doc_id, source,
       |    md5(trim(regexp_replace(lower(text), '  +', ' ', 'g'))) AS lk,
       |    xs, list_min(xs) AS mn,
       |    greatest(list_max(xs) - list_min(xs), 1) AS rng
       |  FROM uni),
       |keyed AS (
       |  SELECT doc_id, source, lk,
       |    md5(rng::VARCHAR || ':' || array_to_string(
       |      list_transform(xs, x -> ((x - mn) * 255 // rng)::VARCHAR), ',')) AS sk
       |  FROM mm),
       |lsz AS (SELECT lk, count(*) AS ln FROM keyed GROUP BY lk),
       |ssz AS (SELECT sk, count(*) AS sn FROM keyed GROUP BY sk)
       |SELECT source,
       |  sum(CASE WHEN ln > 1 AND sn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_both,
       |  sum(CASE WHEN ln > 1 AND sn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_lex_only,
       |  sum(CASE WHEN ln = 1 AND sn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_sem_only,
       |  sum(CASE WHEN ln = 1 AND sn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_neither,
       |  (sum(CASE WHEN ln > 1 AND sn > 1 THEN 1 ELSE 0 END) * 1000 //
       |   greatest(sum(CASE WHEN ln > 1 OR sn > 1 THEN 1 ELSE 0 END), 1))::BIGINT
       |    AS agree_th
       |FROM keyed JOIN lsz USING (lk) JOIN ssz USING (sk)
       |GROUP BY source ORDER BY source""".stripMargin)

  /** Blocked edit-distance near-dup (q137) — the character-level
    * dedup family the hash tiers can't cover: a single dropped /
    * fat-fingered character defeats q22/q104 (different hash) and
    * barely moves q24's shingle sets, yet levenshtein sees it
    * exactly. Unblocked ED is O(n²·L²) — the scale story is
    * BLOCKING: pairs are only attempted inside a 10-char-prefix
    * block, with q23's df-cap discipline (blocks over CAP rows are
    * dropped as boilerplate — a truncation the result can price
    * because dropped blocks are observable in the block index).
    * Mutated twins (char 15 deleted, ids ≡ 1 mod 16) land in the
    * same block as their base (block key is chars 1–10) at ED 1 and
    * must surface. Scale shape: one block-keyed groupBy + one
    * capped in-block self-join — pair work ≤ CAP²/2 per block,
    * never corpus-quadratic; levenshtein runs on 60-char prefixes
    * (bounded work per pair), not full docs.
    */
  val editDistanceDupes: Q = {
    val P = 60
    val CAP = 50L
    Q(
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("doc_id"), substring(col("text"), 1, P).as("pfx"))
          .filter(length(col("pfx")) >= 30)
        val mutated = base.filter(col("doc_id") % 16 === 1)
          .select((col("doc_id") + 8000000L).as("doc_id"),
            concat(substring(col("pfx"), 1, 14), substring(col("pfx"), 16, P))
              .as("pfx"))
        // q23's df-cap discipline: the cap is a windowed count on the
        // SAME bk exchange the self-join needs — not a groupBy +
        // semi-join, which would add a second bk shuffle.
        import org.apache.spark.sql.expressions.Window
        val uni = base.unionByName(mutated)
          .withColumn("bk", substring(col("pfx"), 1, 10))
        val blocked = uni
          .withColumn("bn", count(lit(1)).over(Window.partitionBy("bk")))
          .filter(col("bn") <= CAP)
          .select("doc_id", "pfx", "bk")
        blocked.as("a")
          .join(blocked.as("b"),
            col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            levenshtein(col("a.pfx"), col("b.pfx")).cast("long").as("dist"))
          .filter(col("dist") <= 2)
          .orderBy("id_a", "id_b")
      },
      s"""WITH base AS (
         |  SELECT doc_id, substr(text, 1, $P) AS pfx FROM documents
         |  WHERE length(substr(text, 1, $P)) >= 30),
         |uni AS (
         |  SELECT doc_id, pfx FROM base
         |  UNION ALL
         |  SELECT doc_id + 8000000, substr(pfx, 1, 14) || substr(pfx, 16)
         |  FROM base WHERE doc_id % 16 = 1),
         |bl AS (SELECT doc_id, pfx, substr(pfx, 1, 10) AS bk FROM uni),
         |c AS (SELECT doc_id, pfx, bk FROM (
         |  SELECT doc_id, pfx, bk, count(*) OVER (PARTITION BY bk) AS bn
         |  FROM bl) w WHERE bn <= $CAP)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  levenshtein(a.pfx, b.pfx)::BIGINT AS dist
         |FROM c a JOIN c b ON a.bk = b.bk AND a.doc_id < b.doc_id
         |WHERE levenshtein(a.pfx, b.pfx) <= 2
         |ORDER BY id_a, id_b""".stripMargin)
  }

  /** Dedup token-savings accounting (q138) — what exact dedup is
    * WORTH, per source, in the unit that prices training runs:
    * tokens. Per source: docs, total tokens, non-survivor docs
    * (survivor = min doc_id per content hash), tokens those
    * non-survivors carry, and the savings rate in thousandths — the
    * number that justifies (or kills) running the dedup stage for a
    * given acquisition channel. Copies injected for ids ≡ 3 mod 7
    * give a known population. Scale shape: q22's one md5 groupBy +
    * one hash-keyed join back + a source-bounded aggregate; token
    * counting is per-row codegen string work.
    */
  val dedupSavings: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"), col("text"))
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 9000000L).as("doc_id"), col("source"), col("text")))
      val keyed = corpus.select(col("doc_id"), col("source"),
        md5(col("text")).as("h"),
        size(TextFunctions.words(col("text"))).cast("long").as("n_tok"))
      val keep = keyed.groupBy("h").agg(min("doc_id").as("keep_id"))
      keyed.join(keep, "h")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tokens_total"),
          sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
            .as("n_removed"),
          sum(when(col("doc_id") =!= col("keep_id"), col("n_tok")).otherwise(0L))
            .as("tokens_removed"))
        .withColumn("savings_th",
          expr("tokens_removed * 1000 div greatest(tokens_total, 1L)"))
        .orderBy("source")
    },
    s"""WITH corpus AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 9000000, source, text FROM documents WHERE doc_id % 7 = 3),
       |keyed AS (
       |  SELECT doc_id, source, md5(text) AS h,
       |    len(${TextFunctions.wordsSql("text")})::BIGINT AS n_tok
       |  FROM corpus),
       |keep AS (SELECT h, min(doc_id) AS keep_id FROM keyed GROUP BY h)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(n_tok)::BIGINT AS tokens_total,
       |  sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       |  sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END)::BIGINT
       |    AS tokens_removed,
       |  (sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END) * 1000 //
       |   greatest(sum(n_tok), 1))::BIGINT AS savings_th
       |FROM keyed JOIN keep USING (h)
       |GROUP BY source ORDER BY source""".stripMargin)

  /** Tokenizer vocab-size planning curve (q139) — before training a
    * tokenizer you pick a vocab budget; this prices the candidates:
    * for each budget V in {16, 64, 256, 1k}, how many corpus token
    * occurrences the top-V entries cover (thousandths). The unit is
    * the word BIGRAM — the corpus's unigram vocabulary is tiny by
    * construction, bigrams carry the Zipf tail a budget decision
    * actually trades against. The Spark side ranks HIERARCHICALLY —
    * ⌊log₂ freq⌋+1 buckets are strictly ordered by construction
    * (every bucket-b+1 freq exceeds every bucket-b freq), so global
    * rank = higher-bucket offset (a ~64-row cumulative) +
    * within-bucket row_number (windows run parallel across buckets) —
    * and only buckets whose offset is below the largest budget are
    * ranked at all: the freq-1 long tail, which dominates any corpus
    * vocabulary, never enters a window. The oracle uses the plain
    * global row_number — identical ranks for every row that can reach
    * a budget, which is the equivalence the hash check proves. Scale
    * shape: one bigram count (map-side combinable), one ~64-row
    * bucket rollup, bounded-bucket windows, one broadcast-sized
    * offset join; the only full-vocab pass after the count is the
    * conditional-sum aggregate.
    */
  val vocabCoverageCurve: Q = {
    val Budgets = Seq(16, 64, 256, 1024)
    val RMax = Budgets.max
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val vocab = t(s, d, "documents")
          .select(TextFunctions.words(col("text")).as("arr"))
          .select(explode(
            expr("transform(sequence(1, greatest(size(arr) - 1, 1))," +
              " i -> concat(arr[i - 1], ' ', arr[i]))")).as("word"))
          .filter(col("word").isNotNull)
          .groupBy("word").agg(count(lit(1)).as("freq"))
        val boff = vocab
          .withColumn("bucket", length(bin(col("freq"))))
          .groupBy("bucket").agg(count(lit(1)).as("n_w"))
          .withColumn("off", coalesce(
            sum("n_w").over(Window.orderBy(col("bucket").desc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("bucket", "off")
        val ranked = vocab
          .withColumn("bucket", length(bin(col("freq"))))
          .join(boff, "bucket")
          .filter(col("off") < RMax)
          .withColumn("rnk", col("off") + row_number().over(
            Window.partitionBy("bucket").orderBy(col("freq").desc, col("word"))))
        val totals = vocab.agg(sum("freq").as("total_occ"))
        ranked
          .select(explode(lit(Budgets.toArray)).as("vocab_budget"),
            col("rnk"), col("freq"))
          .groupBy("vocab_budget")
          .agg(sum(when(col("rnk") <= col("vocab_budget"), 1L).otherwise(0L))
              .as("n_words"),
            sum(when(col("rnk") <= col("vocab_budget"), col("freq")).otherwise(0L))
              .as("covered_occ"))
          .crossJoin(totals)
          .selectExpr("cast(vocab_budget AS bigint) AS vocab_budget", "n_words",
            "covered_occ", "covered_occ * 1000 div total_occ AS coverage_th")
          .orderBy("vocab_budget")
      },
      s"""WITH d0 AS (
         |  SELECT ${TextFunctions.wordsSql("text")} AS arr FROM documents),
         |e AS (SELECT arr,
         |  unnest(range(1, greatest(len(arr) - 1, 1) + 1)) AS i FROM d0),
         |w AS (SELECT arr[i] || ' ' || arr[i + 1] AS word FROM e
         |  WHERE arr[i + 1] IS NOT NULL),
         |v AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
         |r AS (SELECT word, freq,
         |    row_number() OVER (ORDER BY freq DESC, word) AS rnk FROM v),
         |t AS (SELECT sum(freq) AS total_occ FROM v),
         |b AS (SELECT unnest([${Budgets.mkString(", ")}]) AS vocab_budget)
         |SELECT vocab_budget::BIGINT AS vocab_budget,
         |  sum(CASE WHEN rnk <= vocab_budget THEN 1 ELSE 0 END)::BIGINT AS n_words,
         |  sum(CASE WHEN rnk <= vocab_budget THEN freq ELSE 0 END)::BIGINT
         |    AS covered_occ,
         |  (sum(CASE WHEN rnk <= vocab_budget THEN freq ELSE 0 END) * 1000
         |    // max(total_occ))::BIGINT AS coverage_th
         |FROM r, b, t GROUP BY vocab_budget ORDER BY vocab_budget""".stripMargin)
  }

  /** Dedup survivor-policy comparison (q140) — exact dedup keeps the
    * min-id copy by convention (q22), but production pipelines keep
    * the BEST copy. Over normalized-dup groups (q104's key): per
    * source, how often min-id and max-quality pick different
    * survivors, and the quality each policy retains (floor(score ×
    * 1000) — the same IEEE double both engines compute). Injected
    * classes make both outcomes observable: ids ≡ 4 mod 10 get an
    * uppercased copy ABOVE the base id (policies agree — the copy's
    * casefold kills its stopword hits, so it loses on both axes);
    * ids ≡ 9 mod 10 get the uppercased copy BELOW the base id
    * (policies disagree: min-id keeps the degraded copy, max-quality
    * keeps the original — exactly the argument for quality-aware
    * survivors). Scale shape: one norm-hash groupBy whose survivors
    * are struct-min/max aggregates (no window, no pair join) + a
    * source-bounded rollup.
    */
  val survivorPolicy: Q = Q(
    (s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"), col("text"))
      def shifted(mod: Long, off: Long): DataFrame =
        docs.filter(col("doc_id") % 10 === mod)
          .select((col("doc_id") + off).as("doc_id"), col("source"),
            upper(col("text")).as("text"))
      val corpus = docs
        .unionByName(shifted(4L, 10000000L))
        .unionByName(shifted(9L, -1000000000L))
      val scored = corpus.select(col("doc_id"), col("source"),
        md5(trim(regexp_replace(lower(col("text")), "  +", " "))).as("h"),
        floor(TextFunctions.qualityScore(TextFunctions.words(col("text"))) * 1000)
          .cast("long").as("q_th"))
      scored.groupBy("h")
        .agg(count(lit(1)).as("gsize"),
          min(struct(col("doc_id"), col("source"), col("q_th"))).as("a"),
          max(struct(col("q_th"), (-col("doc_id")).as("nid"))).as("b"))
        .groupBy(col("a.source").as("source"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("gsize") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
          sum(when(col("gsize") > 1 && col("a.doc_id") =!= -col("b.nid"), 1L)
            .otherwise(0L)).as("n_disagree"),
          sum(col("a.q_th")).as("q_minid_sum"),
          sum(col("b.q_th")).as("q_maxq_sum"))
        .orderBy("source")
    },
    s"""WITH corpus AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000, source, upper(text) FROM documents
       |  WHERE doc_id % 10 = 4
       |  UNION ALL
       |  SELECT doc_id - 1000000000, source, upper(text) FROM documents
       |  WHERE doc_id % 10 = 9),
       |sc AS (
       |  SELECT doc_id, source,
       |    md5(trim(regexp_replace(lower(text), '  +', ' ', 'g'))) AS h,
       |    floor((${TextFunctions.qualityScoreSql(
            TextFunctions.wordsSql("text"))}) * 1000)::BIGINT AS q_th
       |  FROM corpus),
       |r AS (
       |  SELECT h, doc_id, source, q_th,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS r_id,
       |    row_number() OVER (PARTITION BY h ORDER BY q_th DESC, doc_id) AS r_q,
       |    count(*) OVER (PARTITION BY h) AS gsize
       |  FROM sc),
       |g AS (
       |  SELECT h, max(gsize) AS gsize,
       |    max(CASE WHEN r_id = 1 THEN doc_id END) AS id_a,
       |    max(CASE WHEN r_id = 1 THEN source END) AS src_a,
       |    max(CASE WHEN r_id = 1 THEN q_th END) AS q_a,
       |    max(CASE WHEN r_q = 1 THEN doc_id END) AS id_b,
       |    max(CASE WHEN r_q = 1 THEN q_th END) AS q_b
       |  FROM r GROUP BY h)
       |SELECT src_a AS source, count(*)::BIGINT AS n_groups,
       |  sum(CASE WHEN gsize > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
       |  sum(CASE WHEN gsize > 1 AND id_a <> id_b THEN 1 ELSE 0 END)::BIGINT
       |    AS n_disagree,
       |  sum(q_a)::BIGINT AS q_minid_sum,
       |  sum(q_b)::BIGINT AS q_maxq_sum
       |FROM g GROUP BY src_a ORDER BY source""".stripMargin)

  /** Source × language lift matrix (q142) — the contingency audit
    * behind "which acquisition channels skew which languages": per
    * (source, lang) cell, the observed count, P(lang | source) and
    * P(lang) in thousandths, and the lift P(lang|source)/P(lang) in
    * thousandths-of-thousandths (1000 = independent). The lift is
    * computed FROM the truncated integer thousandths — deterministic
    * on both engines by construction, and overflow-safe at any
    * corpus size (obs·1000 ≤ 10¹⁵ at 10¹² docs; a χ² statistic's
    * rowTot·colTot product would overflow int64 at that scale, which
    * is why the report is lift, not χ²). Scale shape: one
    * (source, lang) count — the only corpus pass — then marginal
    * rollups and joins entirely over taxonomy-bounded cell counts.
    */
  val sourceLangLift: Q = Q(
    (s, d) => {
      val cells = t(s, d, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy("source").agg(sum("obs").as("rtot"))
      val ct = cells.groupBy("lang").agg(sum("obs").as("ctot"))
      val tot = cells.agg(sum("obs").as("n"))
      cells.join(rt, "source").join(ct, "lang").crossJoin(tot)
        .selectExpr("source", "lang", "obs",
          "obs * 1000 div rtot AS p_cond_th",
          "ctot * 1000 div n AS p_marg_th",
          "(obs * 1000 div rtot) * 1000 div greatest(ctot * 1000 div n, 1L) AS lift_th")
        .orderBy("source", "lang")
    },
    """WITH cells AS (
      |  SELECT source, lang, count(*)::BIGINT AS obs
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT source, sum(obs)::BIGINT AS rtot FROM cells GROUP BY 1),
      |ct AS (SELECT lang, sum(obs)::BIGINT AS ctot FROM cells GROUP BY 1),
      |t AS (SELECT sum(obs)::BIGINT AS n FROM cells)
      |SELECT source, lang, obs,
      |  (obs * 1000 // rtot)::BIGINT AS p_cond_th,
      |  (ctot * 1000 // n)::BIGINT AS p_marg_th,
      |  ((obs * 1000 // rtot) * 1000 //
      |   greatest(ctot * 1000 // n, 1))::BIGINT AS lift_th
      |FROM cells JOIN rt USING (source) JOIN ct USING (lang), t
      |ORDER BY source, lang""".stripMargin)

  /** Sequence-bucketing padding-waste audit (q145) — the training
    * throughput question behind batch construction: if documents are
    * batched B at a time, how many pad tokens does each batching
    * policy burn? Docs land in a ⌊log₂ len⌋ length bucket (the
    * `length(bin(n))` integer-log parity trick), then batches form
    * within (bucket, shard) ordered by (len desc, doc_id) — the shard
    * axis is what makes this scale: window partitions are
    * (bucket, shard)-sized, shard count grows with the corpus exactly
    * like the inverted index's (q64), so no single sort ever sees a
    * corpus-scaled partition. A batch's padded cost is
    * rows × max(len) (dynamic batch, last batch partial); waste is
    * reported per bucket in thousandths of the padded cost. The
    * subtext is the measurement itself: bucketing by log-length keeps
    * waste near zero while naive global batching pays the spread.
    */
  val paddingWaste: Q = {
    val B = 16; val SHARDS = 8
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("bucket", "shard")
          .orderBy(col("n_chars").desc, col("doc_id"))
        val batches = t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            length(bin(greatest(col("n_chars"), lit(1)))).cast("long").as("bucket"),
            (col("doc_id") % SHARDS).as("shard"))
          .withColumn("batch", floor((row_number().over(w) - 1) / B).cast("long"))
          .groupBy("bucket", "shard", "batch")
          .agg(count(lit(1)).as("nrows"), max("n_chars").as("mx"),
            sum("n_chars").as("actual"))
          .withColumn("padded", col("nrows") * col("mx"))
        batches.groupBy("bucket")
          .agg(count(lit(1)).as("n_batches"),
            sum("padded").as("padded"), sum("actual").as("actual"))
          .selectExpr("bucket", "n_batches", "padded", "actual",
            "(padded - actual) * 1000 div padded AS waste_th")
          .orderBy("bucket")
      },
      s"""WITH docs AS (
         |  SELECT doc_id, n_chars,
         |    length(bin(greatest(n_chars, 1))) AS bucket,
         |    doc_id % $SHARDS AS shard
         |  FROM documents),
         |rn AS (
         |  SELECT *, (row_number() OVER (PARTITION BY bucket, shard
         |      ORDER BY n_chars DESC, doc_id) - 1) // $B AS batch
         |  FROM docs),
         |b AS (
         |  SELECT bucket, shard, batch, count(*)::BIGINT AS nrows,
         |    max(n_chars) AS mx, sum(n_chars)::BIGINT AS actual
         |  FROM rn GROUP BY 1, 2, 3)
         |SELECT bucket, count(*)::BIGINT AS n_batches,
         |  sum(nrows * mx)::BIGINT AS padded,
         |  sum(actual)::BIGINT AS actual,
         |  ((sum(nrows * mx) - sum(actual)) * 1000 // sum(nrows * mx))::BIGINT
         |    AS waste_th
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** Positional phrase search (q146) — the retrieval op the
    * document-sharded index (q64) cannot answer: "which documents
    * contain these two words ADJACENT, in order". Postings carry
    * token positions; a phrase hit is a (doc, pos) row for word x
    * whose (doc, pos+1) row is word y. The phrase workload is derived
    * from the corpus itself (top-K bigrams by collocation count, ties
    * broken lexically), so the query is closed over the data. Scale
    * shape: adjacency materializes with a per-doc lead() window —
    * partitions are document-sized, parallel across the corpus, one
    * exchange (the positional self-join alternative pays two) — and
    * the occurrence table is persisted once because both the phrase
    * derivation and the hit join consume it. The K-row phrase table
    * is a broadcast by size, never by hint; no posting list is ever
    * collected or windowed globally.
    */
  val phraseSearch: Q = {
    val K = 20
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(TextFunctions.words(col("text"))).as(Seq("pos", "w")))
        val bi = tok
          .withColumn("y", lead("w", 1).over(
            Window.partitionBy("doc_id").orderBy("pos")))
          .filter(col("y").isNotNull)
          .select(col("doc_id"), col("pos"), col("w").as("x"), col("y"))
          .persist()
        val phrases = bi.groupBy("x", "y").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("x"), col("y")).limit(K)
          .select(col("x"), col("y"))
        bi.join(phrases, Seq("x", "y"))
          .groupBy("x", "y")
          .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_hits"))
          .orderBy("x", "y")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents),
         |i AS (SELECT doc_id, arr, unnest(range(2, len(arr) + 1)) AS i
         |  FROM w WHERE len(arr) >= 2),
         |bi AS (SELECT doc_id, i - 2 AS pos, arr[i - 1] AS x, arr[i] AS y
         |  FROM i),
         |ph AS (
         |  SELECT x, y FROM bi GROUP BY x, y
         |  ORDER BY count(*) DESC, x, y LIMIT $K)
         |SELECT x, y, count(DISTINCT doc_id)::BIGINT AS n_docs,
         |  count(*)::BIGINT AS n_hits
         |FROM bi JOIN ph USING (x, y)
         |GROUP BY x, y ORDER BY x, y""".stripMargin)
  }

  /** Exact heavy hitters via Misra-Gries + recount (q147) — the
    * at-scale replacement for a full-vocabulary group-by when the
    * question is "which tokens exceed 1/K of the corpus". The
    * [[HeavyHitters.mgCandidates]] pass carries ≤ K·partitions
    * candidate rows across the exchange instead of the whole
    * vocabulary; the recount is restricted to candidates by a
    * semi-join, and the provable candidate-superset guarantee (see
    * the operator's Scaladoc) makes the judged output EXACT and
    * deterministic even though the intermediate sketch is
    * partition-order-dependent. The oracle is the naive full
    * group-by — equality is the guarantee, checked by the driver.
    */
  val heavyHitters: Q = {
    val K = 200
    Q(
      (s, d) => {
        val tok = t(s, d, "documents")
          .select(explode(TextFunctions.words(col("text"))).as("w"))
          .persist()
        val cand = HeavyHitters.mgCandidates(tok, "w", K)
        val n = tok.agg(count(lit(1)).as("n"))
        tok.join(cand, Seq("w"), "leftsemi")
          .groupBy("w").agg(count(lit(1)).as("n_w"))
          .crossJoin(n)
          .filter(col("n_w") * K > col("n"))
          .selectExpr("w", "n_w", "n_w * 1000000 div n AS share_ppm")
          .orderBy("w")
      },
      s"""WITH tok AS (
         |  SELECT unnest(${TextFunctions.wordsSql("text")}) AS w FROM documents),
         |n AS (SELECT count(*)::BIGINT AS n FROM tok)
         |SELECT w, count(*)::BIGINT AS n_w,
         |  (count(*) * 1000000 // n)::BIGINT AS share_ppm
         |FROM tok, n GROUP BY w, n HAVING count(*) * $K > n
         |ORDER BY w""".stripMargin)
  }

  /** Exact Jaccard similarity join via prefix filtering (q148) — the
    * Vernica/Carey-style set-similarity join: completeness WITHOUT
    * q23's df cap. Tokens are totally ordered by (df asc, token) —
    * the (df, w) pair IS the order, so no global rank window ever
    * runs — and each doc emits only its p = |s| − ⌈τ|s|⌉ + 1 rarest
    * tokens as its prefix. The lemma: J(a,b) ≥ τ forces
    * |a∩b| ≥ ⌈τ·|s|⌉ for each side (τ ≤ la/lb whenever J ≥ τ), and
    * two ordered sets overlapping that much must collide inside
    * these prefixes — so the prefix self-join loses no qualifying
    * pair; a length filter (DEN·min(la,lb) ≥ NUM·max(la,lb), also
    * implied by J ≥ τ) prunes incompatible candidates in the same
    * join. Verification is candidate-linear AND explode-free: each
    * candidate pair picks up its two docs' sorted token SETS through
    * keyed joins and intersects them with codegen `array_intersect`
    * — per-pair work is |set| element ops in place, not |set|
    * shuffled rows (the exploded-postings alternative shuffled
    * candidates × tokens rows and measured 65 s at sf0.1; this shape
    * measures ~8× faster on the same candidates). The brute-force
    * oracle's equality IS the completeness proof, machine-checked by
    * the driver. τ = 19/20; all arithmetic integer.
    *
    * The tokenize → distinct → df-count → per-doc rank window front
    * half is a pure function of the CORPUS, not of the run — so it is
    * published ONCE per documents fingerprint
    * ([[graft.sources.Artifacts.publishOnce]], the graph-pair
    * amortization): `pref/` holds each doc's prefix tokens with its
    * set length, `arrs/` the sorted token sets. A warm run pays only
    * the candidate self-join + candidate-linear verify — the honest
    * exact-join price — instead of re-deriving the prefix table every
    * execution (the r13 finding: the rebuild dominated the query's
    * 4 s and amplified under suite contention).
    */
  val prefixJaccard: Q = {
    val NUM = 19; val DEN = 20 // tau = 0.95
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val root = graft.sources.Artifacts.publishOnce(
          "graft-prefjacc", d, Seq("documents.parquet")) { stage =>
          val tok = t(s, d, "documents")
            .select(col("doc_id"),
              explode(TextFunctions.words(col("text"))).as("w"))
            .distinct().persist()
          try {
            val arrs = tok.groupBy("doc_id")
              .agg(array_sort(collect_set(col("w"))).as("arr"),
                count(lit(1)).as("len"))
              .persist()
            val dfreq = tok.groupBy("w").agg(count(lit(1)).as("dfw"))
            tok.join(dfreq, "w")
              .join(arrs.select(col("doc_id"), col("len")), "doc_id")
              .withColumn("rn", row_number().over(
                Window.partitionBy("doc_id").orderBy(col("dfw"), col("w"))))
              .filter(col("rn") <=
                expr(s"len - (($NUM * len + ${DEN - 1}) div $DEN) + 1"))
              .select(col("doc_id"), col("w"), col("len"))
              .write.mode("overwrite").parquet(s"$stage/pref")
            arrs.write.mode("overwrite").parquet(s"$stage/arrs")
            arrs.unpersist()
            // publishOnce's commit marker sits at the artifact root;
            // the two dataset writes left theirs one level down
            java.nio.file.Files.createFile(
              java.nio.file.Paths.get(stage, "_SUCCESS"))
          } finally tok.unpersist()
          ()
        }
        val arrs = s.read.parquet(s"$root/arrs")
        val pref = s.read.parquet(s"$root/pref")
        val cand = pref.as("pa").join(pref.as("pb"),
            col("pa.w") === col("pb.w") && col("pa.doc_id") < col("pb.doc_id") &&
              least(col("pa.len"), col("pb.len")) * DEN >=
                greatest(col("pa.len"), col("pb.len")) * NUM)
          .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
          .distinct()
        cand
          .join(arrs.select(col("doc_id").as("a"), col("arr").as("arr_a"),
            col("len").as("la")), "a")
          .join(arrs.select(col("doc_id").as("b"), col("arr").as("arr_b"),
            col("len").as("lb")), "b")
          .withColumn("n_shared",
            size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
          .filter(col("n_shared") * (NUM + DEN) >= (col("la") + col("lb")) * NUM)
          .selectExpr("a", "b", "n_shared", "la", "lb",
            "n_shared * 1000 div (la + lb - n_shared) AS j_th")
          .orderBy("a", "b")
      },
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS w
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*)::BIGINT AS len FROM tok GROUP BY 1),
         |p AS (
         |  SELECT ta.doc_id AS a, tb.doc_id AS b, count(*)::BIGINT AS n_shared
         |  FROM tok ta JOIN tok tb ON ta.w = tb.w AND ta.doc_id < tb.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, n_shared, sa.len AS la, sb.len AS lb,
         |  (n_shared * 1000 // (sa.len + sb.len - n_shared))::BIGINT AS j_th
         |FROM p JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
         |WHERE ${NUM + DEN} * n_shared >= $NUM * (sa.len + sb.len)
         |ORDER BY a, b""".stripMargin)
  }

  /** Entity resolution end-to-end (q153) — the second composition
    * proof after q87's filter funnel: two independent match signals
    * feeding one transitive-closure clustering, in one job.
    * Records = corpus ∪ injected case-variant copies (+4M ids) ∪
    * injected single-char-deleted copies (+8M ids). Signal 1
    * (normalization) links each record to its normalized-hash group
    * minimum — LINEAR edges off one window min, never pairwise.
    * Signal 2 (fuzzy) is q137's blocked edit-distance join with its
    * df-capped blocks. Connected components over the union merges
    * chains that cross signals (a case-copy and an edit-copy of the
    * same base unify through it); the per-source report counts
    * records, resolved entities, and merges. The oracle replays both
    * signals and walks the same pair graph with a recursive min-label
    * CTE — exact at gate scale, while the Spark side is the shape
    * that survives 10⁹ records.
    */
  val erPipeline: Q = {
    val P = 60; val CAP = 50L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = t(s, d, "documents").select(col("doc_id"), col("source"), col("text"))
        val caseCopies = base.filter(col("doc_id") % 16 === 2)
          .select((col("doc_id") + 4000000L).as("doc_id"), col("source"),
            upper(col("text")).as("text"))
        val editCopies = base.filter(col("doc_id") % 16 === 1)
          .select((col("doc_id") + 8000000L).as("doc_id"), col("source"),
            expr("substr(text, 1, 14) || substr(text, 16)").as("text"))
        val rec = base.unionByName(caseCopies).unionByName(editCopies)
          .select(col("doc_id"), col("source"),
            md5(lower(col("text"))).as("nk"),
            substring(col("text"), 1, P).as("pfx"))
          .persist()
        // signal 1: normalized exact — one edge per record to its
        // group min, carried on the nk exchange as a window min
        val en = rec
          .withColumn("mn", min("doc_id").over(Window.partitionBy("nk")))
          .filter(col("doc_id") =!= col("mn"))
          .select(col("doc_id").as("u"), col("mn").as("v"))
        // signal 2: q137's blocked, df-capped edit-distance pairs
        val blocked = rec
          .withColumn("bk", substring(col("pfx"), 1, 10))
          .withColumn("bn", count(lit(1)).over(Window.partitionBy("bk")))
          .filter(col("bn") <= CAP)
          .select("doc_id", "pfx", "bk")
        val ee = blocked.as("a")
          .join(blocked.as("b"),
            col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
          .filter(levenshtein(col("a.pfx"), col("b.pfx")) <= 2)
          .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
        val comp = ConnectedComponents.assign(en.unionByName(ee))
        rec.join(comp, col("doc_id") === col("node"), "left")
          .select(col("source"),
            coalesce(col("component"), col("doc_id")).as("ent"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_records"),
            countDistinct("ent").as("n_entities"))
          .selectExpr("source", "n_records", "n_entities",
            "n_records - n_entities AS n_merged")
          .orderBy("source")
      },
      s"""WITH RECURSIVE rec AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 4000000, source, upper(text) FROM documents
         |  WHERE doc_id % 16 = 2
         |  UNION ALL
         |  SELECT doc_id + 8000000, source, substr(text, 1, 14) || substr(text, 16)
         |  FROM documents WHERE doc_id % 16 = 1),
         |r2 AS (SELECT doc_id, source, md5(lower(text)) AS nk,
         |    substr(text, 1, $P) AS pfx FROM rec),
         |nmin AS (SELECT nk, min(doc_id) AS mn FROM r2 GROUP BY nk),
         |en AS (SELECT r.doc_id AS u, m.mn AS v FROM r2 r
         |  JOIN nmin m USING (nk) WHERE r.doc_id <> m.mn),
         |c AS (SELECT doc_id, pfx, bk FROM (
         |  SELECT doc_id, pfx, substr(pfx, 1, 10) AS bk,
         |    count(*) OVER (PARTITION BY substr(pfx, 1, 10)) AS bn
         |  FROM r2) w WHERE bn <= $CAP),
         |ee AS (SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM c a JOIN c b ON a.bk = b.bk AND a.doc_id < b.doc_id
         |  WHERE levenshtein(a.pfx, b.pfx) <= 2),
         |edges AS (
         |  SELECT u, v FROM en UNION SELECT v, u FROM en
         |  UNION SELECT u, v FROM ee UNION SELECT v, u FROM ee),
         |walk(n, m) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, walk.m FROM walk JOIN edges e ON e.u = walk.n),
         |comp AS (SELECT n AS node, min(m) AS component FROM walk GROUP BY n),
         |ent AS (SELECT r.source, coalesce(cp.component, r.doc_id) AS ent
         |  FROM r2 r LEFT JOIN comp cp ON r.doc_id = cp.node)
         |SELECT source, count(*)::BIGINT AS n_records,
         |  count(DISTINCT ent)::BIGINT AS n_entities,
         |  (count(*) - count(DISTINCT ent))::BIGINT AS n_merged
         |FROM ent GROUP BY source ORDER BY source""".stripMargin)
  }

  /** Cross-family purge cascade judged end-to-end (q290) — the
    * [[graft.operators.PurgeCascade]] composition the per-family
    * lifecycle queries (q246/q258/q262/q271/q281/q296/q299) leave
    * spec-only: ONE deletion set (every 10th indexed id — the id
    * space is shared, vector i embeds document i, so a forget-me
    * request is naturally one frame) fanned through ONE `purge` call
    * across NINE artifacts — all eight persisted index families,
    * with the dedup family carrying BOTH its modalities (text
    * shingles and q287's media frame fingerprints: a face in a video
    * is the canonical GDPR case, and it rides the same arm) and the
    * graph family carrying the docs' co-source succession chain
    * (whose deletion burden is TWO-SIDED: the purged docs' own
    * adjacency rows AND their appearances in survivors' neighbor
    * lists, scattered across other src-buckets) — then
    * ONE judged row set proving the purged ids unfindable through
    * every probe path at once. Each family's probe result is reduced to an order-free
    * integer fingerprint (count + sum of [[Hashing.seeded]] over the
    * comma-joined columns — q180's replica-diff trick), and the
    * oracle recomputes the same fingerprint from a from-scratch
    * replay of that family's semantics over a corpus where the
    * purged docs were NEVER INGESTED (frozen pre-purge params where
    * the family freezes them: the LSH (r, T) and the PQ codebooks
    * derive from the FULL pre-purge corpus). A hash match therefore
    * proves, per family in one plan: the cascade's tombstone →
    * compact → vacuum chain dropped exactly the deletion set, kept
    * every survivor, carried frozen params forward, and reassigned
    * first-occurrence ownership — the compliance story as one row
    * set instead of seven. The two non-tombstone arms prove their
    * own deletion semantics: the tokenizer arm's memo match over the
    * purged docs' words returns exactly the SHARED words (words
    * unique to the purged docs left the store; shared words rightly
    * survive — [[graft.operators.PurgeCascade.uniqueVocabulary]]),
    * and the sketch arm's estimates over the full vocabulary equal a
    * never-ingested survivor build (exact subtraction, sketch
    * linearity).
    *
    * Scale shape: pure composition — each arm is the corresponding
    * family's probe (bucket/cell-pruned artifact scans, candidate-
    * linear work), the fingerprint folds are map-side-combinable
    * aggregates over probe-sized frames, and the cascade itself is
    * O(deletes) tombstones + per-family compaction paid once at GDPR
    * cadence.
    */
  val purgeCascadeAudit: Q = {
    val INDEX_MAX = 400L; val RED_MAX = 100L
    val SIM_Q_MAX = 500L; val SIM_K = 3; val PQ_Q_MAX = 420L
    // the first-seen audit batch is a FIXED id slice (not "the rest
    // of the corpus") so the probe cost stays constant across scale
    // factors — an audit probes a sample, not the world
    val FS_MAX = 900L
    // the media arm's frame-sampling geometry (q287's)
    val FRAME = 32; val STRIDE = 16; val MAX_F = 8
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i").mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}").mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM csig"
    }.mkString("\n  UNION ALL ")
    def armSql(family: String, hashExpr: String, body: String): String =
      s"""SELECT '$family' AS family, count(*)::BIGINT AS n_rows,
         |  coalesce(sum(${Hashing.seededSql(0, hashExpr)}), 0)::BIGINT AS fp
         |FROM ($body)""".stripMargin
    Q(
      (s, d) => {
        import graft.operators.PurgeCascade
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val docIndex = docs.filter(col("doc_id") < INDEX_MAX)
        val docLive = docIndex.filter(col("doc_id") % 10 =!= 0)
        val vecIndex = emb.filter(col("vec_id") < INDEX_MAX)
        val simR = VectorFunctions.mtBits(vecIndex.count())
        // the tokenizer arm's corpus carries ONE novel word per doc
        // (`query<doc_id>` — the closed synthetic vocabulary has no
        // naturally-unique tokens), so each purged doc owns exactly
        // one word the cascade's uniqueVocabulary derivation must
        // find and purgeWords must drop — the arm's memo match then
        // returns exactly the SHARED vocabulary
        val bpeCorpus = docIndex.select(col("doc_id"),
          expr(s"replace(text, 'query', 'query' || " +
            "CAST(doc_id AS STRING))").as("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-purge-cascade", d,
          Seq("documents.parquet", "embeddings.parquet"),
          logicVersion = 6)
        val dedupRoot = s"$root/dedup"; val simRoot = s"$root/sim"
        val pqRoot = s"$root/pq"; val fsRoot = s"$root/fs"
        val lexRoot = s"$root/lex"; val bpeRoot = s"$root/bpe"
        val cmsRoot = s"$root/cms"; val mediaRoot = s"$root/media"
        val graphRoot = s"$root/graph"
        // the graph arm's nodes ARE doc ids: each doc chained to its
        // source's next doc (frozen-as-ingested edges — the family
        // stores interactions, a purge removes incident edges, it
        // never re-derives the chain)
        def chainEdges = {
          import org.apache.spark.sql.expressions.Window
          val ge = t(s, d, "documents")
            .filter(col("doc_id") < INDEX_MAX)
            .select(col("doc_id"), col("source"))
            .withColumn("nxt", lead("doc_id", 1)
              .over(Window.partitionBy("source").orderBy("doc_id")))
            .filter(col("nxt").isNotNull)
            .select(col("doc_id").as("u"), col("nxt").as("v"))
          ge.select(col("u").as("src"), col("v").as("dst"),
              lit(1L).as("w"))
            .unionByName(ge.select(col("v").as("src"), col("u").as("dst"),
              lit(1L).as("w")))
        }
        if (DedupIndex.resolve(dedupRoot).isEmpty) {
          DedupIndex.publish(
            Dedup.minhashSignatures(docIndex, "doc_id", "text", MH_K),
            "doc_id", MH_BANDS, MH_R, dedupRoot)
          SimIndex.publish(vecIndex, "vec_id", "embedding",
            simR, VectorFunctions.mtTables(simR), simRoot)
          PqIndex.publish(vecIndex, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, pqRoot)
          FirstSeenIndex.publish(
            Dedup.shingleSet(docIndex, "doc_id", "text", 3), fsRoot)
          LexIndex.publish(docIndex, "doc_id", "text", lexRoot)
          BpeIndex.publish(bpeCorpus, "doc_id", "text", BPE_ROUNDS, bpeRoot)
          SketchIndex.publish(termsOf(docIndex), "term", CMS_D, CMS_W,
            cmsRoot)
          // the media modality through the SAME dedup family (q287):
          // doc i's media item shares the deletion id space
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(
              mediaFrameSets(docIndex, FRAME, STRIDE, MAX_F),
              "doc_id", "s", MH_K),
            "doc_id", MH_BANDS, MH_R, mediaRoot)
          GraphIndex.publish(chainEdges, graphRoot)
          // ONE deletion set, ONE call, NINE artifacts (eight
          // families; the dedup family carries two modalities)
          val ids = docIndex.filter(col("doc_id") % 10 === 0)
            .select(col("doc_id"), col("doc_id").as("vec_id"))
          PurgeCascade.purge(s, ids, Seq(
            PurgeCascade.dedup(dedupRoot),
            PurgeCascade.sim(simRoot),
            PurgeCascade.pq(pqRoot),
            PurgeCascade.firstSeen(fsRoot, reassignSrc =
              Some(Dedup.shingleSet(docLive, "doc_id", "text", 3))),
            PurgeCascade.lex(lexRoot),
            PurgeCascade.bpe(bpeRoot, bpeCorpus),
            PurgeCascade.sketch(cmsRoot, docIndex),
            PurgeCascade.dedup(mediaRoot),
            PurgeCascade.graph(graphRoot, "doc_id")), vacuum = true)
        }
        // dedup probe: redeliveries of docs < RED_MAX — purged docs
        // among them MUST find nothing; survivors find their original
        val fresh = docs.filter(col("doc_id") < RED_MAX)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        // the seven probes are independent, and each one MATERIALIZES
        // its result inside the call (the ProbeCache contract) — so
        // build them from seven driver threads and let Spark overlap
        // the jobs: the composition costs ~max(probe), not Σ probe.
        // Writes (the cold publish + purge above) stay sequential.
        // The purged docs' distinct words (in the tokenizer arm's
        // novel-word corpus) — the deletion-request view
        val purgedW = bpeCorpus.filter(col("doc_id") % 10 === 0)
          .select(explode(TextFunctions.words(col("text"))).as("word"))
          .filter(length(col("word")) > 0).distinct()
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val Seq(dedupArm, simArm, pqArm, fsArm, lexArm, bpeArm, cmsArm,
            mediaArm, graphArm) =
          Await.result(Future.sequence(Seq(
            Future(DedupIndex.probe(s,
              Dedup.minhashSignatures(fresh, "doc_id", "text", MH_K),
              "doc_id", MH_BANDS, MH_R, dedupRoot)),
            Future(SimIndex.probeTopK(s,
              emb.filter(col("vec_id") >= INDEX_MAX &&
                col("vec_id") < SIM_Q_MAX),
              "vec_id", "embedding", SIM_K, simRoot)),
            Future(PqIndex.probeTopK(s,
              emb.filter(col("vec_id") >= INDEX_MAX &&
                col("vec_id") < PQ_Q_MAX),
              "vec_id", "embedding", PQ_K, pqRoot)),
            Future(FirstSeenIndex.scoreBatch(
              FirstSeenIndex.probe(s,
                Dedup.shingleSet(docs.filter(
                  col("doc_id") >= INDEX_MAX && col("doc_id") < FS_MAX),
                  "doc_id", "text", 3), fsRoot))),
            Future(LexIndex.bm25TopK(s, lexQueryTerms(docLive),
              "query_id", "term", LEX_K, lexRoot)),
            // post-purge memo ∩ purged docs' words = exactly their
            // SHARED words (unique ones provably left the store);
            // bucket-pruned membership probe — the audit reads only
            // the word buckets the deletion request touches, never
            // the train-vocabulary-sized memo
            Future(BpeIndex.memoLookup(s, purgedW, bpeRoot)
              .select("word")),
            Future(SketchIndex.estimate(s, termsOf(docIndex), "term",
              cmsRoot)),
            // redelivered MEDIA copies of purged docs must surface no
            // link either — the frame-bucket probe path
            Future(DedupIndex.probe(s,
              Dedup.minhashSignaturesOfSets(
                mediaFrameSets(fresh, FRAME, STRIDE, MAX_F),
                "doc_id", "s", MH_K),
              "doc_id", MH_BANDS, MH_R, mediaRoot)),
            // the graph arm: purged docs' neighborhoods empty AND
            // their ids gone from survivors' lists (two-sided mask)
            Future(GraphIndex.neighbors(s,
              docs.filter(col("doc_id") < RED_MAX)
                .select(col("doc_id").as("node")), graphRoot)))),
          Duration.Inf)
        def arm(df: DataFrame, family: String,
                cols: Seq[String]): DataFrame =
          df.select(Hashing.seeded(0, concat_ws(",",
              cols.map(c => col(c).cast("string")): _*)).as("h"))
            .agg(count(lit(1)).as("n_rows"),
              coalesce(sum("h"), lit(0L)).cast("long").as("fp"))
            .select(lit(family).as("family"), col("n_rows"), col("fp"))
        arm(dedupArm, "dedup", Seq("new_id", "index_id"))
          .unionByName(arm(simArm, "sim",
            Seq("query_id", "index_id", "rnk")))
          .unionByName(arm(pqArm, "pq",
            Seq("query_id", "index_id", "rnk")))
          .unionByName(arm(fsArm, "first_seen",
            Seq("doc_id", "n_sh", "n_novel")))
          .unionByName(arm(lexArm, "lex",
            Seq("query_id", "index_id", "n_hit", "score", "rnk")))
          .unionByName(arm(bpeArm, "bpe", Seq("word")))
          .unionByName(arm(cmsArm, "cms",
            Seq("term", "cms_est", "n_total")))
          .unionByName(arm(mediaArm, "media", Seq("new_id", "index_id")))
          .unionByName(arm(graphArm, "graph", Seq("node", "nbr", "w")))
          .orderBy("family")
      },
      s"""${armSql("dedup", "new_id || ',' || index_id",
        s"""WITH corpus AS (
           |  SELECT doc_id, text, 0 AS is_new FROM documents
           |  WHERE doc_id < $INDEX_MAX AND doc_id % 10 <> 0
           |  UNION ALL SELECT doc_id + 1000000, text, 1 FROM documents
           |    WHERE doc_id < $RED_MAX),
           |w AS (SELECT doc_id, is_new,
           |        ${TextFunctions.wordsSql("text")} AS arr FROM corpus),
           |sh AS (SELECT DISTINCT doc_id, is_new,
           |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
           |csig AS (
           |  SELECT doc_id, is_new,
           |    $sigCols
           |  FROM sh GROUP BY doc_id, is_new),
           |bands AS (
           |  $bandRowsSql),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS index_id
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.band_key = b.band_key
           |  WHERE a.is_new = 1 AND b.is_new = 0)
           |SELECT new_id, index_id FROM cand""".stripMargin)}
         |UNION ALL
         |${armSql("first_seen", "doc_id || ',' || n_sh || ',' || n_novel",
        s"""WITH w AS (
           |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
           |  FROM documents
           |  WHERE NOT (doc_id < $INDEX_MAX AND doc_id % 10 = 0)
           |    AND doc_id < $FS_MAX),
           |sh AS (
           |  SELECT DISTINCT doc_id,
           |    unnest(${TextFunctions.shinglesSql("arr")}) AS s
           |  FROM w),
           |f AS (
           |  SELECT doc_id, min(doc_id) OVER (PARTITION BY s) AS first_doc
           |  FROM sh)
           |SELECT doc_id, count(*)::BIGINT AS n_sh,
           |  sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
           |    AS n_novel
           |FROM f WHERE doc_id >= $INDEX_MAX GROUP BY 1""".stripMargin)}
         |UNION ALL
         |${armSql("lex",
        "query_id || ',' || index_id || ',' || n_hit || ',' || score " +
          "|| ',' || rnk",
        lexOracleSql(
          s"doc_id < $INDEX_MAX AND NOT (doc_id % 10 = 0)",
          s"doc_id < $INDEX_MAX AND NOT (doc_id % 10 = 0)"))}
         |UNION ALL
         |${armSql("pq", "query_id || ',' || index_id || ',' || rnk",
        s"""WITH $pqEpCtes,
           |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
           |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
           |        WHERE vec_id < $PQ_KS),
           |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
           |enc AS (SELECT * FROM ix WHERE vec_id % 10 <> 0),
           |${pqRankCtes("enc",
               s"q.vec_id >= $INDEX_MAX AND q.vec_id < $PQ_Q_MAX")}
           |SELECT query_id, index_id, CAST(rnk AS BIGINT) AS rnk
           |FROM ranked WHERE rnk <= $PQ_K""".stripMargin)}
         |UNION ALL
         |${armSql("sim", "query_id || ',' || index_id || ',' || rnk",
        s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
           |              WHERE vec_id < $INDEX_MAX),
           |params AS (
           |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
           |    ${VectorFunctions.mtTablesSql(
                 VectorFunctions.mtBitsSql("count(*)"))} AS nt
           |  FROM idx0),
           |ie AS (
           |  SELECT vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params
           |  WHERE vec_id < $INDEX_MAX AND vec_id % 10 <> 0),
           |iek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM ie),
           |ikb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM iek),
           |qe AS (
           |  SELECT vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params
           |  WHERE vec_id >= $INDEX_MAX AND vec_id < $SIM_Q_MAX),
           |qek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM qe),
           |qkb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM qek),
           |scored AS (
           |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
           |    max(round(${VectorFunctions.cosineSql(
                 "q.embedding", "kb.embedding")}, 6))
           |      AS cos_sim
           |  FROM qkb q JOIN ikb kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
           |  GROUP BY 1, 2),
           |ranked AS (
           |  SELECT query_id, index_id, cos_sim,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY cos_sim DESC, index_id) AS rnk
           |  FROM scored)
           |SELECT query_id, index_id, CAST(rnk AS BIGINT) AS rnk
           |FROM ranked WHERE rnk <= $SIM_K""".stripMargin)}
         |UNION ALL
         |${armSql("bpe", "word",
        s"""WITH pw AS (
           |  SELECT DISTINCT w AS word FROM (
           |    SELECT unnest(${TextFunctions.wordsSql(
               "replace(text, 'query', 'query' || CAST(doc_id AS STRING))")
             }) AS w
           |    FROM documents
           |    WHERE doc_id < $INDEX_MAX AND doc_id % 10 = 0)
           |  WHERE length(w) > 0),
           |sv AS (
           |  SELECT DISTINCT w AS word FROM (
           |    SELECT unnest(${TextFunctions.wordsSql(
               "replace(text, 'query', 'query' || CAST(doc_id AS STRING))")
             }) AS w
           |    FROM documents
           |    WHERE doc_id < $INDEX_MAX AND doc_id % 10 <> 0)
           |  WHERE length(w) > 0)
           |SELECT p.word FROM pw p JOIN sv s2 ON p.word = s2.word"""
          .stripMargin)}
         |UNION ALL
         |${armSql("cms", "term || ',' || cms_est || ',' || n_total",
        s"""WITH cmsp(r, a, b) AS (
           |  VALUES ${CountMin.paramsSqlValues(CMS_D)}),
           |qt AS (
           |  SELECT DISTINCT t AS term FROM (
           |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
           |    FROM documents WHERE doc_id < $INDEX_MAX)
           |  WHERE length(t) > 0),
           |${cmsWorldSql(0,
               s"doc_id < $INDEX_MAX AND doc_id % 10 <> 0", "qt")}
           |SELECT e.term, e.cms_est, nt0.n_total FROM est0 e, nt0"""
          .stripMargin)}
         |UNION ALL
         |${armSql("media", "new_id || ',' || index_id",
        s"""WITH corpus AS (
           |  SELECT doc_id, text, 0 AS is_new FROM documents
           |  WHERE doc_id < $INDEX_MAX AND doc_id % 10 <> 0
           |  UNION ALL SELECT doc_id + 1000000, text, 1 FROM documents
           |    WHERE doc_id < $RED_MAX),
           |fr AS (
           |  SELECT doc_id, is_new, text, unnest(range(0,
           |    least(${MAX_F - 1},
           |          greatest(length(text) - $FRAME, 0) // $STRIDE) + 1))
           |    AS f
           |  FROM corpus),
           |f32 AS (
           |  SELECT DISTINCT doc_id, is_new,
           |    substr(text, (f * $STRIDE + 1)::INT, $FRAME) AS s
           |  FROM fr
           |  WHERE length(substr(text, (f * $STRIDE + 1)::INT, $FRAME))
           |    = $FRAME),
           |csig AS (
           |  SELECT doc_id, is_new,
           |    $sigCols
           |  FROM f32 GROUP BY doc_id, is_new),
           |bands AS (
           |  $bandRowsSql),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS index_id
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.band_key = b.band_key
           |  WHERE a.is_new = 1 AND b.is_new = 0)
           |SELECT new_id, index_id FROM cand""".stripMargin)}
         |UNION ALL
         |${armSql("graph", "node || ',' || nbr || ',' || w",
        s"""WITH ch AS (
           |  SELECT doc_id, lead(doc_id) OVER (
           |    PARTITION BY source ORDER BY doc_id) AS nxt
           |  FROM documents WHERE doc_id < $INDEX_MAX),
           |ge0 AS (SELECT doc_id AS u, nxt AS v FROM ch
           |        WHERE nxt IS NOT NULL),
           |ga AS (SELECT u AS src, v AS dst FROM ge0
           |       UNION ALL SELECT v, u FROM ge0),
           |gl AS (SELECT src, dst FROM ga
           |       WHERE src % 10 <> 0 AND dst % 10 <> 0)
           |SELECT p.doc_id AS node, gl.dst AS nbr, 1::BIGINT AS w
           |FROM (SELECT doc_id FROM documents WHERE doc_id < $RED_MAX) p
           |JOIN gl ON gl.src = p.doc_id""".stripMargin)}
         |ORDER BY family""".stripMargin)
  }

  /** Residual IVFPQ vs flat-code IVFPQ at EQUAL code budget (q291) —
    * FAISS's `by_residual=true` default, the accuracy half the q263/
    * q270 artifacts left on the table: PQ codebooks train and encode
    * (x − coarse centroid) instead of x, so the same (m, ks) bytes
    * describe the departure from the cell mean rather than
    * re-describing the cell's position — at serving time the ADC
    * table is built PER (query, probed cell) from the query's
    * residual against that cell. Two committed artifacts share the
    * identical geometry (m, dsub, ks, coarse cells, nprobe); each is
    * probed from its artifact and scored against the EXACT integer-L2
    * top-K truth — recall at equal bytes is the judged number, and
    * the oracle replays coarse fit → residual computation → PQ fit →
    * encode → per-cell ADC from scratch for BOTH variants plus the
    * truth, so the hash match proves the served residual pipeline
    * bit-exactly. (On this synthetic near-uniform embedding family
    * the two variants land within noise of each other — weak cluster
    * structure gives residuals little to win; the judged claim is
    * pipeline exactness and the equal-budget comparison harness, the
    * documented FAISS gain appears on clustered real corpora.)
    *
    * Scale shape: both arms are [[PqIndex.probeTopK]] (cell-pruned
    * partition scans, broadcast nq·nprobe·m·ks ADC tables); the truth
    * arm broadcasts the FIXED 20-query batch against the index scan
    * (the q96/q243 audit-arm bound — production monitors recall on
    * samples).
    */
  /** The full IVFPQ oracle pipeline as one subquery — coarse fit,
    * (residual|flat) PQ fit, encode, per-(query, probed-cell) ADC,
    * top-[[PQ_K]] — shared by q291 (real embeddings) and q302 (the
    * constructed clustered world via `eSql`). Emits
    * (query_id, index_id).
    */
  private def ivfpqArmSql(residual: Boolean, indexMax: Long, qMax: Long,
                          nprobe: Int,
                          eSql: String = defaultESql,
                          candPred: String = "TRUE"): String = {
    val INDEX_MAX = indexMax; val Q_MAX = qMax; val NPROBE = nprobe;
    {
      val resid =
        s"""rr AS (
           |  SELECT e.vec_id, e.dim, e.xs - c.cs AS xs
           |  FROM e JOIN ca ON e.vec_id = ca.vec_id
           |  JOIN c$KM_ITERS c ON c.cell = ca.cell AND c.dim = e.dim),
           |ix AS (
           |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
           |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
           |  FROM rr),""".stripMargin
      val flat =
        s"""ix AS (
           |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
           |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
           |  FROM e WHERE vec_id < $INDEX_MAX),""".stripMargin
      val dtab = if (residual)
        s"""qr AS (
           |  SELECT qa.query_id, qa.cell AS ccell, e.dim, e.xs - c.cs AS xs
           |  FROM qa JOIN e ON e.vec_id = qa.query_id
           |  JOIN c$KM_ITERS c ON c.cell = qa.cell AND c.dim = e.dim),
           |qx AS (
           |  SELECT query_id, ccell, (dim - 1) // $PQ_DSUB AS sub,
           |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
           |  FROM qr),
           |dtab AS (
           |  SELECT q.query_id, q.ccell, c.sub, c.cell,
           |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
           |  FROM qx q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
           |  GROUP BY 1, 2, 3, 4),""".stripMargin
      else
        s"""dtab AS (
           |  SELECT q.vec_id AS query_id, c.sub, c.cell,
           |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
           |  FROM ep q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
           |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
           |  GROUP BY 1, 2, 3),""".stripMargin
      val scoreJoin = if (residual)
        s"""  JOIN dtab dt ON dt.query_id = cand.query_id
           |    AND dt.ccell = cand.ccell
           |    AND dt.sub = cd.sub AND dt.cell = cd.cell""".stripMargin
      else
        s"""  JOIN dtab dt ON dt.query_id = cand.query_id
           |    AND dt.sub = cd.sub AND dt.cell = cd.cell""".stripMargin
      s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $INDEX_MAX",
             eSql = eSql)},
         |fa AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
         |  FROM e JOIN c$KM_ITERS c USING (dim)
         |  GROUP BY e.vec_id, c.cell),
         |ca AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id < $INDEX_MAX) WHERE rnk = 1),
         |qa AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
         |    FROM fa WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX)
         |  WHERE rnk <= $NPROBE),
         |cand AS (
         |  SELECT qa.query_id, qa.cell AS ccell, ca.vec_id
         |  FROM qa JOIN ca ON qa.cell = ca.cell AND ca.vec_id <> qa.query_id
         |  WHERE $candPred),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM e),
         |${if (residual) resid else flat}
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ix.vec_id, c.sub, c.cell,
         |    sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |  FROM ix JOIN pc$PQ_ITERS c ON ix.sub = c.sub AND ix.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |$dtab
         |scored AS (
         |  SELECT cand.query_id, cd.vec_id AS index_id,
         |    sum(dt.d2)::BIGINT AS adc_d2
         |  FROM cand
         |  JOIN codes cd ON cd.vec_id = cand.vec_id
         |$scoreJoin
         |  GROUP BY 1, 2),
         |rked AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc_d2, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, CAST(rnk AS BIGINT) AS rnk
         |FROM rked WHERE rnk <= $PQ_K""".stripMargin
    }
  }

  val ivfPqResidual: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L; val NQ = Q_MAX - INDEX_MAX
    val NPROBE = 2
    def prunedArm(residual: Boolean): String =
      ivfpqArmSql(residual, INDEX_MAX, Q_MAX, NPROBE)
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val flatRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-index", d, Seq("embeddings.parquet"))
        val residRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-resid", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(flatRoot).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, flatRoot,
            coarseC = KM_C, coarseIters = KM_ITERS)
        if (PqIndex.resolve(residRoot).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, residRoot,
            coarseC = KM_C, coarseIters = KM_ITERS, byResidual = true)
        // exact integer-L2 truth over the FIXED 20-query batch
        val eI = VectorQuantizer.scaled(index, "vec_id", "embedding")
        val eQ = VectorQuantizer.scaled(queries, "vec_id", "embedding")
        val truth = eI.crossJoin(broadcast(eQ.select(
            col("vec_id").as("query_id"), col("xs").as("qxs"))))
          .select(col("query_id"), col("vec_id").as("index_id"),
            VectorQuantizer.l2DistSq(col("qxs"), col("xs")).as("d2"))
          .withColumn("rnk", row_number().over(Window
            .partitionBy("query_id").orderBy(asc("d2"), asc("index_id"))))
          .filter(col("rnk") <= PQ_K)
          .select(col("query_id"), col("index_id"), lit(1L).as("hit"))
        def armOf(root: String, name: String) =
          PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K,
              root, NPROBE)
            .select(lit(name).as("variant"), col("query_id"),
              col("index_id"))
        concurrently(Seq(() => armOf(flatRoot, "flat_code"),
            () => armOf(residRoot, "residual")))
          .reduce(_.unionByName(_))
          .join(truth, Seq("query_id", "index_id"), "left")
          .groupBy("variant")
          .agg(count(lit(1)).as("n_pairs"),
            coalesce(sum("hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * PQ_K})"))
          .orderBy("variant")
      },
      s"""WITH truth AS (
         |  SELECT query_id, index_id FROM (
         |    WITH e AS (
         |      SELECT vec_id,
         |        unnest(range(1, len(embedding) + 1)) AS dim,
         |        round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs
         |      FROM embeddings),
         |    td AS (
         |      SELECT q.vec_id AS query_id, x.vec_id AS index_id,
         |        sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
         |      FROM e q JOIN e x USING (dim)
         |      WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
         |        AND x.vec_id < $INDEX_MAX
         |      GROUP BY 1, 2)
         |    SELECT query_id, index_id FROM (
         |      SELECT query_id, index_id,
         |        row_number() OVER (PARTITION BY query_id
         |                           ORDER BY d2, index_id) AS rnk
         |      FROM td) WHERE rnk <= $PQ_K)),
         |flatp AS (SELECT query_id, index_id FROM (
         |${prunedArm(residual = false)})),
         |residp AS (SELECT query_id, index_id FROM (
         |${prunedArm(residual = true)}))
         |SELECT variant, count(*)::BIGINT AS n_pairs,
         |  coalesce(sum(hit), 0)::BIGINT AS n_hit,
         |  (coalesce(sum(hit), 0) * 1000000 // ${NQ * PQ_K})::BIGINT
         |    AS recall_ppm
         |FROM (
         |  SELECT p.variant,
         |    CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM (SELECT 'flat_code' AS variant, * FROM flatp
         |        UNION ALL SELECT 'residual', * FROM residp) p
         |  LEFT JOIN truth t ON t.query_id = p.query_id
         |    AND t.index_id = p.index_id)
         |GROUP BY variant ORDER BY variant""".stripMargin)
  }

  /** Residual IVFPQ's ACCURACY claim made real (q302) — q291 proved
    * the `by_residual=true` pipeline bit-exact but its synthetic
    * near-uniform embeddings gave residuals nothing to win (recall
    * within noise of flat codes). This query judges the FAISS-default
    * gain itself on a CONSTRUCTED clustered world — a deterministic
    * integer mixture around [[q302 CL]]=7 well-separated centroids
    * (the q292 rational-surrogate doctrine: per (vec_id, dim),
    * component = residual/16 + offset·3 with residual =
    * (id·37+dim·101) mod 17 − 8 and offset = (id·(dim+3)) mod 7 — all
    * terms exact in binary floating point and exact integers after
    * the ×10⁶ scaling, so BOTH engines see the identical world with
    * zero float risk; the oracle never touches a float at all). Same
    * geometry in both arms (m, dsub, ks, coarse cells, nprobe — equal
    * code bytes): flat codes spend their 16 cells per sub-quantizer
    * re-describing the 7 clusters' absolute positions, residual codes
    * spend them on the ±0.5-range departure from the coarse centroid
    * — so the residual arm's recall against the exact integer-L2
    * truth is STRICTLY higher (pinned by ResidualRecallSpec), the way
    * q274 made nprobe's cost a judged curve. Both pipelines replay
    * from scratch in the oracle, so the hash match proves the served
    * artifacts bit-exactly AND the recall gap.
    *
    * Scale shape: identical to q291 — cell-pruned artifact probes,
    * broadcast nq·nprobe·m·ks ADC tables, fixed-size truth batch.
    */
  val ivfPqClustered: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L; val NQ = Q_MAX - INDEX_MAX
    val NPROBE = 2; val CL = 7
    val DIMS = PQ_M * PQ_DSUB
    val eSql =
      s"""e AS (
         |  SELECT vec_id, dim,
         |    ((vec_id * 37 + dim * 101) % 17 - 8) * 62500
         |      + ((vec_id * (dim + 3)) % $CL) * 3000000 AS xs
         |  FROM (SELECT vec_id, unnest(range(1, ${DIMS + 1})) AS dim
         |        FROM embeddings WHERE vec_id < $Q_MAX))""".stripMargin
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ids = t(s, d, "embeddings").select(col("vec_id"))
        def world(df: DataFrame) = df.select(col("vec_id"), expr(
          s"transform(sequence(1, $DIMS), j -> " +
            "cast((vec_id * 37 + j * 101) % 17 - 8 as double) / 16.0d + " +
            s"cast((vec_id * (j + 3)) % $CL as double) * 3.0d)")
          .as("embedding"))
        val index = world(ids.filter(col("vec_id") < INDEX_MAX))
        val queries = world(ids.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX))
        val flatRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-cflat", d, Seq("embeddings.parquet"))
        val residRoot = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-cresid", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(flatRoot).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, flatRoot,
            coarseC = KM_C, coarseIters = KM_ITERS)
        if (PqIndex.resolve(residRoot).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, residRoot,
            coarseC = KM_C, coarseIters = KM_ITERS, byResidual = true)
        val eI = VectorQuantizer.scaled(index, "vec_id", "embedding")
        val eQ = VectorQuantizer.scaled(queries, "vec_id", "embedding")
        val truth = eI.crossJoin(broadcast(eQ.select(
            col("vec_id").as("query_id"), col("xs").as("qxs"))))
          .select(col("query_id"), col("vec_id").as("index_id"),
            VectorQuantizer.l2DistSq(col("qxs"), col("xs")).as("d2"))
          .withColumn("rnk", row_number().over(Window
            .partitionBy("query_id").orderBy(asc("d2"), asc("index_id"))))
          .filter(col("rnk") <= PQ_K)
          .select(col("query_id"), col("index_id"), lit(1L).as("hit"))
        def armOf(root: String, name: String) =
          PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K,
              root, NPROBE)
            .select(lit(name).as("variant"), col("query_id"),
              col("index_id"))
        concurrently(Seq(() => armOf(flatRoot, "flat_code"),
            () => armOf(residRoot, "residual")))
          .reduce(_.unionByName(_))
          .join(truth, Seq("query_id", "index_id"), "left")
          .groupBy("variant")
          .agg(count(lit(1)).as("n_pairs"),
            coalesce(sum("hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * PQ_K})"))
          .orderBy("variant")
      },
      s"""WITH truth AS (
         |  SELECT query_id, index_id FROM (
         |    WITH $eSql,
         |    td AS (
         |      SELECT q.vec_id AS query_id, x.vec_id AS index_id,
         |        sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
         |      FROM e q JOIN e x USING (dim)
         |      WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
         |        AND x.vec_id < $INDEX_MAX
         |      GROUP BY 1, 2)
         |    SELECT query_id, index_id FROM (
         |      SELECT query_id, index_id,
         |        row_number() OVER (PARTITION BY query_id
         |                           ORDER BY d2, index_id) AS rnk
         |      FROM td) WHERE rnk <= $PQ_K)),
         |flatp AS (SELECT query_id, index_id FROM (
         |${ivfpqArmSql(residual = false, INDEX_MAX, Q_MAX, NPROBE, eSql)})),
         |residp AS (SELECT query_id, index_id FROM (
         |${ivfpqArmSql(residual = true, INDEX_MAX, Q_MAX, NPROBE, eSql)}))
         |SELECT variant, count(*)::BIGINT AS n_pairs,
         |  coalesce(sum(hit), 0)::BIGINT AS n_hit,
         |  (coalesce(sum(hit), 0) * 1000000 // ${NQ * PQ_K})::BIGINT
         |    AS recall_ppm
         |FROM (
         |  SELECT p.variant,
         |    CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM (SELECT 'flat_code' AS variant, * FROM flatp
         |        UNION ALL SELECT 'residual', * FROM residp) p
         |  LEFT JOIN truth t ON t.query_id = p.query_id
         |    AND t.index_id = p.index_id)
         |GROUP BY variant ORDER BY variant""".stripMargin)
  }

  /** Residual-IVFPQ purge (q311) — the deletion cell the FAISS-default
    * coding variant was missing: q262 purges a FLAT-code artifact,
    * but a `by_residual=true` generation carries THREE frozen model
    * pieces (coarse centroids, residual codebooks, the qerr baseline)
    * plus per-vector (ccell, residual codes) rows — and a purge must
    * drop exactly the tombstoned rows while carrying all three
    * forward untouched: re-fitting the coarse quantizer would
    * reassign survivors' cells (breaking nprobe pruning), re-fitting
    * the PQ would move every surviving residual's ADC distance, and
    * dropping qerr would kill the q292 drift trigger after the first
    * GDPR compaction. The oracle replays coarse fit → residual PQ fit
    * on the FULL pre-purge corpus (the frozen-params rule), then
    * scores pruned probes against only the surviving candidates — so
    * a hash match proves rows dropped, cells kept, codebooks frozen.
    */
  val ivfPqResidualPurge: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L; val NPROBE = 2
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val queries = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-ivfpq-rpurge", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty) {
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, root,
            coarseC = KM_C, coarseIters = KM_ITERS, byResidual = true)
          PqIndex.addTombstones(s,
            index.filter(col("vec_id") % 10 === 0).select("vec_id"),
            "vec_id", root)
          PqIndex.mergeCompact(s, root)
          PqIndex.vacuumOld(root)
        }
        PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K,
            root, NPROBE)
          .select(col("query_id"), col("index_id"), col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""SELECT query_id, index_id, rnk FROM (
         |${ivfpqArmSql(residual = true, INDEX_MAX, Q_MAX, NPROBE,
             candPred = "ca.vec_id % 10 <> 0")})
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** Drift-triggered codebook re-train judged end-to-end (q292) —
    * the lifecycle wire q132's drift audit was missing: frozen PQ
    * codebooks have a shelf life, and when the embedding model is
    * retrained (here: "v2" re-embeds every document — simulated by a
    * deterministic +0.25 per-component shift, an exact L2 isometry
    * in the scaled integer domain (round((x+¼)·10⁶) ≡ round(x·10⁶) +
    * 250000, bit-exact) that relocates the whole cloud away from
    * every frozen sub-centroid while leaving all true distances
    * unchanged), an index serving the old generation ranks the new
    * world's queries from stale geometry. The judged loop:
    *
    *   1. the drift trigger ([[graft.operators.PqIndex
    *      .retrainOnDrift]]) measures the re-embedded corpus's
    *      quantization error under the frozen codebooks against the
    *      publish-time baseline recorded in the artifact — one
    *      encode pass — and MUST fire (the engine requires it);
    *   2. the STALE arm probes the un-retrained artifact with
    *      drifted queries and scores against the drifted truth —
    *      recall collapses;
    *   3. the RETRAINED arm probes the trigger-republished
    *      generation (same geometry, codebooks re-fit on v2) —
    *      recall is restored to the v1-on-v1 level.
    *
    * Both arms report (qerr_ratio_milli, n_pairs, n_hit, recall_ppm);
    * the oracle replays both fits, both encodes, both quantization
    * errors and the exact-L2 truth from scratch, so the hash match
    * proves the trigger arithmetic AND the restored ranking
    * bit-exactly. (Truth note: the shift is an isometry, so the
    * drifted truth equals the raw truth — the oracle computes it on
    * raw vectors.)
    *
    * Scale shape: the trigger is one encode pass (delta-append cost)
    * per audit; Lloyd rounds are paid only on fire; probes are the
    * standard artifact ADC with broadcast batch-bounded tables; the
    * truth arm broadcasts the fixed 20-query set (q96's bound).
    */
  val driftRetrain: Q = {
    val INDEX_MAX = 300L; val Q_MAX = 320L; val NQ = Q_MAX - INDEX_MAX
    val FACTOR_MILLI = 2000L
    def fitArm(drifted: Boolean): String = {
      // fit + encode + flat ADC of the drifted queries, all inside
      // one subquery WITH (names isolated); `drifted` decides the
      // corpus world the codebooks train and encode on
      val xsExpr =
        if (drifted) "round(unnest(list_transform(embedding, x -> x::DOUBLE + 0.25)) * 1000000)::BIGINT"
        else "round(unnest(embedding)::DOUBLE * 1000000)::BIGINT"
      s"""WITH e AS (
         |  SELECT vec_id,
         |    unnest(range(1, len(embedding) + 1)) AS dim,
         |    $xsExpr AS xs
         |  FROM embeddings),
         |qe AS (
         |  SELECT vec_id,
         |    unnest(range(1, len(embedding) + 1)) AS dim,
         |    round(unnest(list_transform(embedding, x -> x::DOUBLE + 0.25)) * 1000000)::BIGINT AS xs
         |  FROM embeddings WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM e),
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ix.vec_id, c.sub, c.cell,
         |    sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |  FROM ix JOIN pc$PQ_ITERS c ON ix.sub = c.sub AND ix.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |qp AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM qe),
         |dtab AS (
         |  SELECT q.vec_id AS query_id, c.sub, c.cell,
         |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
         |  FROM qp q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT dt.query_id, cd.vec_id AS index_id,
         |    sum(dt.d2)::BIGINT AS adc_d2
         |  FROM codes cd JOIN dtab dt
         |    ON cd.sub = dt.sub AND cd.cell = dt.cell
         |  GROUP BY 1, 2),
         |rked AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc_d2, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id FROM rked WHERE rnk <= $PQ_K""".stripMargin
    }
    // mean quantization error of the REVERSED (serving) corpus and of
    // the arm's own training corpus under the arm's codebooks —
    // integer (Σ min d²) // count, [[PqIndex.meanAssignD2]]'s formula
    def qerrArm(drifted: Boolean): String = {
      val xsExpr =
        if (drifted) "round(unnest(list_transform(embedding, x -> x::DOUBLE + 0.25)) * 1000000)::BIGINT"
        else "round(unnest(embedding)::DOUBLE * 1000000)::BIGINT"
      s"""WITH e AS (
         |  SELECT vec_id,
         |    unnest(range(1, len(embedding) + 1)) AS dim,
         |    $xsExpr AS xs
         |  FROM embeddings),
         |ve AS (
         |  SELECT vec_id,
         |    unnest(range(1, len(embedding) + 1)) AS dim,
         |    round(unnest(list_transform(embedding, x -> x::DOUBLE + 0.25)) * 1000000)::BIGINT AS xs
         |  FROM embeddings WHERE vec_id < $INDEX_MAX),
         |ep AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM e),
         |ix AS (SELECT * FROM ep WHERE vec_id < $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |vp AS (
         |  SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub,
         |    (dim - 1) % $PQ_DSUB + 1 AS sdim, xs
         |  FROM ve),
         |cur AS (
         |  SELECT sum(d2)::BIGINT AS s, count(*)::BIGINT AS n FROM (
         |    SELECT vec_id, sub, min(d2) AS d2 FROM (
         |      SELECT v.vec_id, c.sub, c.cell,
         |        sum((v.xs - c.cs) * (v.xs - c.cs)) AS d2
         |      FROM vp v JOIN pc$PQ_ITERS c
         |        ON v.sub = c.sub AND v.sdim = c.sdim
         |      GROUP BY 1, 2, 3)
         |    GROUP BY 1, 2)),
         |base AS (
         |  SELECT sum(d2)::BIGINT AS s, count(*)::BIGINT AS n FROM (
         |    SELECT vec_id, sub, min(d2) AS d2 FROM (
         |      SELECT ix.vec_id, c.sub, c.cell,
         |        sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |      FROM ix JOIN pc$PQ_ITERS c
         |        ON ix.sub = c.sub AND ix.sdim = c.sdim
         |      GROUP BY 1, 2, 3)
         |    GROUP BY 1, 2))
         |SELECT ((cur.s // cur.n) * 1000 // (base.s // base.n))::BIGINT
         |  AS ratio
         |FROM cur, base""".stripMargin
    }
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val v1 = emb.filter(col("vec_id") < INDEX_MAX)
        val shift = (v: Column) =>
          transform(v, x => x.cast("double") + lit(0.25))
        val v2 = v1.select(col("vec_id"),
          shift(col("embedding")).as("embedding"))
        val qDrift = emb.filter(
            col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
          .select(col("vec_id"), shift(col("embedding")).as("embedding"))
        val rootStale = graft.sources.Artifacts.versionedRoot(
          "graft-pq-drift-stale", d, Seq("embeddings.parquet"))
        val rootLive = graft.sources.Artifacts.versionedRoot(
          "graft-pq-drift-live", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(rootStale).isEmpty)
          PqIndex.publish(v1, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, rootStale)
        if (PqIndex.resolve(rootLive).isEmpty)
          PqIndex.publish(v1, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, rootLive)
        if (graft.operators.VersionedDirs.versionsOf(rootLive).size < 2) {
          val fired = PqIndex.retrainOnDrift(s, v2, "vec_id", "embedding",
            rootLive, FACTOR_MILLI)
          require(fired.isDefined,
            "drift trigger must fire on the re-embedded corpus")
        }
        val staleRatio = PqIndex.quantizationError(
          s, v2, "vec_id", "embedding", rootStale) * 1000L /
          PqIndex.publishQuantizationError(rootStale)
        val liveRatio = PqIndex.quantizationError(
          s, v2, "vec_id", "embedding", rootLive) * 1000L /
          PqIndex.publishQuantizationError(rootLive)
        // exact integer-L2 truth of the drifted queries vs the
        // re-embedded corpus (reversal is an isometry — identical to
        // the raw truth, which is what the oracle computes)
        val eI = VectorQuantizer.scaled(v2, "vec_id", "embedding")
        val eQ = VectorQuantizer.scaled(qDrift, "vec_id", "embedding")
        val truth = eI.crossJoin(broadcast(eQ.select(
            col("vec_id").as("query_id"), col("xs").as("qxs"))))
          .select(col("query_id"), col("vec_id").as("index_id"),
            VectorQuantizer.l2DistSq(col("qxs"), col("xs")).as("d2"))
          .withColumn("rnk", row_number().over(Window
            .partitionBy("query_id").orderBy(asc("d2"), asc("index_id"))))
          .filter(col("rnk") <= PQ_K)
          .select(col("query_id"), col("index_id"), lit(1L).as("hit"))
        def armOf(root: String, name: String, ratio: Long) =
          PqIndex.probeTopK(s, qDrift, "vec_id", "embedding", PQ_K, root)
            .select(lit(name).as("arm"),
              lit(ratio).as("qerr_ratio_milli"),
              col("query_id"), col("index_id"))
        concurrently(Seq(() => armOf(rootLive, "retrained", liveRatio),
            () => armOf(rootStale, "stale", staleRatio)))
          .reduce(_.unionByName(_))
          .join(truth, Seq("query_id", "index_id"), "left")
          .groupBy("arm", "qerr_ratio_milli")
          .agg(count(lit(1)).as("n_pairs"),
            coalesce(sum("hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * PQ_K})"))
          .orderBy("arm")
      },
      s"""WITH truth AS (
         |  SELECT query_id, index_id FROM (
         |    WITH e AS (
         |      SELECT vec_id,
         |        unnest(range(1, len(embedding) + 1)) AS dim,
         |        round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs
         |      FROM embeddings),
         |    td AS (
         |      SELECT q.vec_id AS query_id, x.vec_id AS index_id,
         |        sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
         |      FROM e q JOIN e x USING (dim)
         |      WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
         |        AND x.vec_id < $INDEX_MAX
         |      GROUP BY 1, 2)
         |    SELECT query_id, index_id FROM (
         |      SELECT query_id, index_id,
         |        row_number() OVER (PARTITION BY query_id
         |                           ORDER BY d2, index_id) AS rnk
         |      FROM td) WHERE rnk <= $PQ_K)),
         |stalep AS (SELECT query_id, index_id FROM (
         |${fitArm(drifted = false)})),
         |livep AS (SELECT query_id, index_id FROM (
         |${fitArm(drifted = true)})),
         |staler AS (SELECT ratio FROM (${qerrArm(drifted = false)})),
         |liver AS (SELECT ratio FROM (${qerrArm(drifted = true)}))
         |SELECT arm, qerr_ratio_milli, count(*)::BIGINT AS n_pairs,
         |  coalesce(sum(hit), 0)::BIGINT AS n_hit,
         |  (coalesce(sum(hit), 0) * 1000000 // ${NQ * PQ_K})::BIGINT
         |    AS recall_ppm
         |FROM (
         |  SELECT p.arm, p.qerr_ratio_milli,
         |    CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM (SELECT 'stale' AS arm,
         |          (SELECT ratio FROM staler)::BIGINT AS qerr_ratio_milli,
         |          query_id, index_id
         |        FROM stalep
         |        UNION ALL
         |        SELECT 'retrained',
         |          (SELECT ratio FROM liver)::BIGINT, query_id, index_id
         |        FROM livep) p
         |  LEFT JOIN truth t ON t.query_id = p.query_id
         |    AND t.index_id = p.index_id)
         |GROUP BY arm, qerr_ratio_milli ORDER BY arm""".stripMargin)
  }

  /** The tokenizer queries' novel-vocabulary world (q293/q295): the
    * synthetic corpus is a CLOSED ~31-word vocabulary — every batch
    * word would be a train-memo hit and the unseen-fold path would
    * never run in a judged row set. The mutation rewrites `query` to
    * `query<doc_id % 97>` in the RAW text ("the re-crawl carries new
    * jargon"), deterministically and identically on both engines:
    * ~97 novel words spread across doc ids, so a batch split sees
    * memo hits, fresh unseen words, AND words another batch
    * introduced. `query` is the only vocabulary word containing
    * `query` as a substring, so the whole-string replace is
    * word-exact.
    */
  private def mutBatch(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(mutBatchSql).as("text"))

  private val mutBatchSql: String =
    "replace(text, 'query', 'query' || CAST(doc_id % 97 AS STRING))"

  /** The persisted tokenizer served end-to-end (q293) — [[graft
    * .operators.BpeIndex]], the SIXTH persisted family: q72's BPE
    * train runs ONCE per data version and freezes into an artifact
    * (merge log + word-bucket-partitioned segmentation memo + frozen
    * params), and tokenizing an ingest batch costs one bucket-pruned
    * memo join for the Zipf-heavy known words plus the frozen-merge
    * greedy fold for the unseen tail — never a re-train, never a
    * corpus rescan. Token counts drive packing budgets and mixing
    * weights downstream, so this is load-bearing derived state
    * exactly like the ANN codebooks. The oracle replays train on the
    * train split and then APPLIES the learned pairs to every batch
    * word with the same run-parity machinery (the memo-hit and
    * fold-miss paths must be indistinguishable — both derive from
    * the frozen merges), so the hash match proves the artifact
    * serves exactly what a from-scratch train-plus-apply computes.
    *
    * Scale shape: the batch's distinct-word frame is batch-bounded;
    * the memo join prunes to touched word buckets; the unseen fold
    * is R map-only passes over the unseen tail; the R-row merge list
    * is a model constant (HLL-register-map class). Probe follows the
    * [[graft.operators.ProbeCache]] contract.
    *
    * The synthetic corpus is a CLOSED ~31-word vocabulary, which
    * would leave the unseen-fold half of the claim vacuous — so the
    * batch rides [[mutBatchSql]]'s deterministic novel-vocabulary
    * world (both engines apply it to the raw text), putting real
    * traffic on both the memo-hit AND the fold path in the judged
    * row set.
    */
  val bpeIndexServe: Q = {
    val TRAIN_MAX = 400L; val BATCH_MAX = 900L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-index", d, Seq("documents.parquet"))
        if (BpeIndex.resolve(root).isEmpty)
          BpeIndex.publish(docs.filter(col("doc_id") < TRAIN_MAX),
            "doc_id", "text", BPE_ROUNDS, root)
        BpeIndex.tokenize(s,
            mutBatch(docs.filter(col("doc_id") >= TRAIN_MAX &&
              col("doc_id") < BATCH_MAX)),
            "doc_id", "text", root)
          .orderBy("doc_id")
      },
      s"""WITH ${BpeOracle.chainFor(s"WHERE doc_id < $TRAIN_MAX")},
         |dw AS (
         |  SELECT doc_id,
         |    unnest(${TextFunctions.wordsSql(mutBatchSql)}) AS word
         |  FROM documents
         |  WHERE doc_id >= $TRAIN_MAX AND doc_id < $BATCH_MAX),
         |dwf AS (SELECT doc_id, word FROM dw WHERE length(word) > 0),
         |bw AS (SELECT DISTINCT word FROM dwf),
         |${BpeOracle.applyChain("bw", "a")}
         |SELECT d.doc_id, count(*)::BIGINT AS n_words,
         |  sum(an.n_sub)::BIGINT AS n_subwords
         |FROM dwf d JOIN an USING (word)
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)
  }

  /** Tokenizer fertility-drift re-train judged end-to-end (q294) —
    * q292's drift loop on the SIXTH family: a frozen BPE vocabulary
    * has a shelf life too, and its drift symptom is FERTILITY
    * (subwords per word) climbing toward characters-per-word as the
    * serving domain stops matching the learned merges. The drift
    * world is a deterministic full-string reversal ("the re-crawl
    * came back in a different orthography"): every word reverses, so
    * the learned left-to-right merges mostly stop firing. Judged
    * loop: [[graft.operators.BpeIndex.retrainOnFertility]] measures
    * the re-crawled corpus under the frozen merges against the
    * publish-time baseline (one tokenize pass) and MUST fire; the
    * STALE arm tokenizes the drifted batch with the old artifact
    * (fertility inflated), the RETRAINED arm with the re-published
    * one (fertility back at the baseline level). The oracle replays
    * both trains, both applies and the exact integer ratio
    * arithmetic. (The retrained arm's ratio is identically 1000: the
    * re-published generation's recorded baseline IS the drifted
    * corpus's own fertility — the engine computes it and the oracle
    * states it.)
    *
    * Scale shape: the trigger is one tokenize pass (bucket-pruned
    * memo + R map-only folds over the unseen tail); the R merge
    * rounds are paid only on fire; the drifted batch is a fixed id
    * slice (constant across sf).
    */
  val bpeDriftRetrain: Q = {
    val TRAIN_MAX = 400L; val BATCH_MAX = 900L; val FACTOR_MILLI = 1100L
    def armSql(drifted: Boolean): String = {
      val textExpr = if (drifted) "reverse(text)" else "text"
      s"""WITH ${BpeOracle.chainForText(
             s"WHERE doc_id < $TRAIN_MAX", textExpr)},
         |dw AS (
         |  SELECT doc_id,
         |    unnest(${TextFunctions.wordsSql("reverse(text)")}) AS word
         |  FROM documents
         |  WHERE doc_id >= $TRAIN_MAX AND doc_id < $BATCH_MAX),
         |dwf AS (SELECT doc_id, word FROM dw WHERE length(word) > 0),
         |bw AS (SELECT DISTINCT word FROM dwf),
         |${BpeOracle.applyChain("bw", "a")}
         |SELECT count(*)::BIGINT AS n_words,
         |  sum(an.n_sub)::BIGINT AS n_subwords
         |FROM dwf d JOIN an USING (word)""".stripMargin
    }
    // the stale arm's fertility ratio, replayed exactly: baseline =
    // train-corpus fertility under its own merges (from the chain's
    // final state), current = the REVERSED train corpus under the
    // SAME frozen merges (an apply chain over the reversed vocab);
    // both floors ×10³ before the ratio floor — the engine's integer
    // order of operations
    def staleRatioSql: String =
      s"""WITH ${BpeOracle.chainFor(s"WHERE doc_id < $TRAIN_MAX")},
         |segn AS (
         |  SELECT word, count(*)::BIGINT AS n_sub FROM s$BPE_ROUNDS
         |  GROUP BY word),
         |base AS (
         |  SELECT (sum(w.freq * segn.n_sub) * 1000
         |          // sum(w.freq))::BIGINT AS fert
         |  FROM w JOIN segn USING (word)),
         |rw AS (SELECT reverse(word) AS word, freq FROM w),
         |rwd AS (SELECT DISTINCT word FROM rw),
         |${BpeOracle.applyChain("rwd", "r")},
         |cur AS (
         |  SELECT (sum(rw.freq * rn.n_sub) * 1000
         |          // sum(rw.freq))::BIGINT AS fert
         |  FROM rw JOIN rn USING (word))
         |SELECT (cur.fert * 1000 // base.fert)::BIGINT AS ratio
         |FROM cur, base""".stripMargin
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val train = docs.filter(col("doc_id") < TRAIN_MAX)
        val trainDrift = train.select(col("doc_id"),
          reverse(col("text")).as("text"))
        val batchDrift = docs.filter(col("doc_id") >= TRAIN_MAX &&
            col("doc_id") < BATCH_MAX)
          .select(col("doc_id"), reverse(col("text")).as("text"))
        val rootStale = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-drift-stale", d, Seq("documents.parquet"))
        val rootLive = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-drift-live", d, Seq("documents.parquet"))
        if (BpeIndex.resolve(rootStale).isEmpty)
          BpeIndex.publish(train, "doc_id", "text", BPE_ROUNDS, rootStale)
        if (BpeIndex.resolve(rootLive).isEmpty)
          BpeIndex.publish(train, "doc_id", "text", BPE_ROUNDS, rootLive)
        if (VersionedDirs.versionsOf(rootLive).size < 2) {
          val fired = BpeIndex.retrainOnFertility(s, trainDrift,
            "doc_id", "text", rootLive, FACTOR_MILLI)
          require(fired.isDefined,
            "fertility trigger must fire on the re-crawled corpus")
        }
        // the four probe passes (two ratio measurements, two arm
        // tokenizes) are independent and each materializes inside its
        // call (ProbeCache) — overlap their jobs as q290 does
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        def ratioOf(root: String): Long =
          BpeIndex.fertility(s, trainDrift, "doc_id", "text", root) *
            1000L / BpeIndex.publishFertility(root)
        def armOf(root: String, name: String, ratio: Long) =
          BpeIndex.tokenize(s, batchDrift, "doc_id", "text", root)
            .agg(coalesce(sum("n_words"), lit(0L)).as("n_words"),
              coalesce(sum("n_subwords"), lit(0L)).as("n_subwords"))
            .select(lit(name).as("arm"),
              lit(ratio).as("fert_ratio_milli"),
              col("n_words"), col("n_subwords"),
              expr("n_subwords * 1000 div n_words").as("fertility_milli"))
        val Seq(liveArm, staleArm) = Await.result(Future.sequence(Seq(
          Future(armOf(rootLive, "retrained", ratioOf(rootLive))),
          Future(armOf(rootStale, "stale", ratioOf(rootStale))))),
          Duration.Inf)
        liveArm.unionByName(staleArm).orderBy("arm")
      },
      s"""WITH stalet AS (SELECT * FROM (${armSql(drifted = false)})),
         |livet AS (SELECT * FROM (${armSql(drifted = true)})),
         |staler AS (SELECT ratio FROM ($staleRatioSql))
         |SELECT 'retrained' AS arm, 1000::BIGINT AS fert_ratio_milli,
         |  n_words, n_subwords,
         |  (n_subwords * 1000 // n_words)::BIGINT AS fertility_milli
         |FROM livet
         |UNION ALL
         |SELECT 'stale', (SELECT ratio FROM staler)::BIGINT,
         |  n_words, n_subwords,
         |  (n_subwords * 1000 // n_words)::BIGINT
         |FROM stalet
         |ORDER BY arm""".stripMargin)
  }

  /** Judged batch twin of the streaming tokenizer (q295) — the
    * streaming × tokenizer cell: [[graft.streaming.BpeStream]]
    * censuses each arriving doc batch against the PRE-batch committed
    * [[graft.operators.BpeIndex]] memo state, then folds the batch's
    * unseen words in as a tagged memo delta. The memo is pure cache,
    * so n_words/n_subwords cannot move with delta timing — the judged
    * boundary evidence is `n_memo_hits`: batch 0 (docs 300–400,
    * riding [[mutBatchSql]]'s novel-vocabulary world) hits only the
    * train vocabulary (docs < 300), while batch 1 (docs 400–500)
    * also hits every word batch 0 introduced — exactly at the
    * boundary, the cost-plane twin of q283's collection-stats shift
    * (a hit is a cheap memo join, a miss pays the R-round fold).
    * Batch 0 is REDELIVERED and absorbed through the committed
    * census dir and the tagged delta. The oracle replays train,
    * applies the learned pairs to every batch word, and derives each
    * batch's hit set from the pre-batch vocabulary — so the hash
    * match proves the delta fold landed at exactly the batch boundary
    * AND that delta-served segmentations equal the from-scratch
    * apply.
    */
  val bpeStreamTwin: Q = {
    val TRAIN_MAX = 300L; val B0_MAX = 400L; val B1_MAX = 500L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-stream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-stream-out", d, Seq("documents.parquet"))
        if (BpeIndex.resolve(idxRoot).isEmpty)
          BpeIndex.publish(docs.filter(col("doc_id") < TRAIN_MAX),
            "doc_id", "text", BPE_ROUNDS, idxRoot)
        val bs = new graft.streaming.BpeStream(
          s, idxRoot, outRoot, "doc_id", "text")
        val b0 = mutBatch(docs.filter(
          col("doc_id") >= TRAIN_MAX && col("doc_id") < B0_MAX))
        bs.processBatch(b0, 0)
        bs.processBatch(b0, 0) // at-least-once redelivery: absorbed
        bs.processBatch(mutBatch(docs.filter(
          col("doc_id") >= B0_MAX && col("doc_id") < B1_MAX)), 1)
        bs.results().orderBy("doc_id")
      },
      s"""WITH ${BpeOracle.chainFor(s"WHERE doc_id < $TRAIN_MAX")},
         |dw AS (
         |  SELECT doc_id,
         |    unnest(${TextFunctions.wordsSql(mutBatchSql)}) AS word
         |  FROM documents
         |  WHERE doc_id >= $TRAIN_MAX AND doc_id < $B1_MAX),
         |dwf AS (SELECT doc_id, word FROM dw WHERE length(word) > 0),
         |bw AS (SELECT DISTINCT word FROM dwf),
         |${BpeOracle.applyChain("bw", "a")},
         |v0 AS (SELECT DISTINCT word FROM dwf WHERE doc_id < $B0_MAX),
         |m1 AS (SELECT word FROM w UNION SELECT word FROM v0),
         |cen0 AS (
         |  SELECT d.doc_id, count(*)::BIGINT AS n_words,
         |    sum(an.n_sub)::BIGINT AS n_subwords,
         |    sum(CASE WHEN m.word IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |      AS n_memo_hits
         |  FROM dwf d JOIN an USING (word)
         |  LEFT JOIN w m ON d.word = m.word
         |  WHERE d.doc_id < $B0_MAX GROUP BY d.doc_id),
         |cen1 AS (
         |  SELECT d.doc_id, count(*)::BIGINT AS n_words,
         |    sum(an.n_sub)::BIGINT AS n_subwords,
         |    sum(CASE WHEN m.word IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |      AS n_memo_hits
         |  FROM dwf d JOIN an USING (word)
         |  LEFT JOIN m1 m ON d.word = m.word
         |  WHERE d.doc_id >= $B0_MAX GROUP BY d.doc_id)
         |SELECT * FROM (SELECT * FROM cen0 UNION ALL SELECT * FROM cen1)
         |ORDER BY doc_id""".stripMargin)
  }

  /** Streaming tokenizer gate across a PURGE boundary (q310) — the
    * streaming × delete cell for the BPE family, and the matrix's odd
    * one out: because the memo is pure cache, the purge CANNOT change
    * results — `n_subwords` is identical on both sides of the
    * boundary (the oracle computes it once for all batches) — so the
    * judged signal lives entirely on the COST plane: `n_memo_hits`
    * for a purged word drops to zero from the purge boundary on (the
    * word re-derives through the frozen-merge fold until some later
    * fold re-memoizes it). The deletion set deliberately includes
    * batch-0 NOVEL words that live in batch 0's own fold delta — the
    * in-stream PII closure: [[graft.operators.BpeIndex.purgeWords]]
    * consumed that delta and recorded its name, so batch 0's
    * REDELIVERY after the purge must absorb via `_folded.json`
    * rather than re-commit the purged word strings into the store
    * (and re-inflate batch-1 hits, which would hash-mismatch cen1).
    */
  val bpePurgeStream: Q = {
    val TRAIN_MAX = 300L; val B0_MAX = 400L; val B1_MAX = 500L
    val PURGE_LO = 300L; val PURGE_HI = 308L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-pstream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-pstream-out", d, Seq("documents.parquet"))
        if (BpeIndex.resolve(idxRoot).isEmpty)
          BpeIndex.publish(docs.filter(col("doc_id") < TRAIN_MAX),
            "doc_id", "text", BPE_ROUNDS, idxRoot)
        val bs = new graft.streaming.BpeStream(
          s, idxRoot, outRoot, "doc_id", "text")
        val b0 = mutBatch(docs.filter(
          col("doc_id") >= TRAIN_MAX && col("doc_id") < B0_MAX))
        bs.processBatch(b0, 0)
        // the purge: words of a deletion-request doc slice — shared
        // train-vocab words AND batch-0 novel variants (the latter
        // live in batch 0's fold delta, which this purge consumes)
        if (VersionedDirs.versionsOf(idxRoot).size < 2)
          BpeIndex.purgeWords(s,
            mutBatch(docs.filter(
              col("doc_id") >= PURGE_LO && col("doc_id") < PURGE_HI))
              .select(explode(TextFunctions.words(col("text"))).as("word"))
              .filter(length(col("word")) > 0).distinct(),
            idxRoot)
        // redelivery AFTER the purge consumed batch 0's delta: census
        // absorbed by its committed dir, fold by _folded.json — a
        // re-commit would resurrect the purged strings AND re-inflate
        // batch 1's memo hits
        bs.processBatch(b0, 0)
        bs.processBatch(mutBatch(docs.filter(
          col("doc_id") >= B0_MAX && col("doc_id") < B1_MAX)), 1)
        bs.results().orderBy("doc_id")
      },
      s"""WITH ${BpeOracle.chainFor(s"WHERE doc_id < $TRAIN_MAX")},
         |dw AS (
         |  SELECT doc_id,
         |    unnest(${TextFunctions.wordsSql(mutBatchSql)}) AS word
         |  FROM documents
         |  WHERE doc_id >= $TRAIN_MAX AND doc_id < $B1_MAX),
         |dwf AS (SELECT doc_id, word FROM dw WHERE length(word) > 0),
         |bw AS (SELECT DISTINCT word FROM dwf),
         |${BpeOracle.applyChain("bw", "a")},
         |v0 AS (SELECT DISTINCT word FROM dwf WHERE doc_id < $B0_MAX),
         |purgew AS (
         |  SELECT DISTINCT word FROM dwf
         |  WHERE doc_id >= $PURGE_LO AND doc_id < $PURGE_HI),
         |m1 AS (
         |  SELECT word FROM (SELECT word FROM w UNION SELECT word FROM v0)
         |  EXCEPT SELECT word FROM purgew),
         |cen0 AS (
         |  SELECT d.doc_id, count(*)::BIGINT AS n_words,
         |    sum(an.n_sub)::BIGINT AS n_subwords,
         |    sum(CASE WHEN m.word IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |      AS n_memo_hits
         |  FROM dwf d JOIN an USING (word)
         |  LEFT JOIN w m ON d.word = m.word
         |  WHERE d.doc_id < $B0_MAX GROUP BY d.doc_id),
         |cen1 AS (
         |  SELECT d.doc_id, count(*)::BIGINT AS n_words,
         |    sum(an.n_sub)::BIGINT AS n_subwords,
         |    sum(CASE WHEN m.word IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |      AS n_memo_hits
         |  FROM dwf d JOIN an USING (word)
         |  LEFT JOIN m1 m ON d.word = m.word
         |  WHERE d.doc_id >= $B0_MAX GROUP BY d.doc_id)
         |SELECT * FROM (SELECT * FROM cen0 UNION ALL SELECT * FROM cen1)
         |ORDER BY doc_id""".stripMargin)
  }

  /** Tokenizer word-level purge judged end-to-end (q296) — the purge
    * cell of the SIXTH family, with a claim the doc/vector families
    * can't make: because the memo is pure cache, deletion provably
    * CANNOT change results — only remove the literal word strings
    * from the stored artifact (the PII surface: memo keys ARE corpus
    * words). Two arms from two committed lifecycles over the same
    * corpus (publish + delta fold; one then purged): the census
    * fingerprints over a probe batch must be IDENTICAL (the oracle
    * derives the fingerprint once and the judged rows carry it
    * twice), and the purge-word memo match must go from its exact
    * pre-purge census (replayed: the deletion request ∩ the ingested
    * vocabulary — including words never ingested, which a correct
    * purge need not find) to zero. Deletion-request words that made
    * it into `merges/` itself are out of scope here — that is
    * [[graft.operators.BpeIndex.retrainOnFertility]]'s re-publish
    * vehicle (q294).
    */
  val bpeIndexPurge: Q = {
    val TRAIN_MAX = 300L; val DELTA_MAX = 400L; val PROBE_MAX = 500L
    // the deletion request mixes ingested words (docs < 8 are in the
    // train split) with words of never-ingested docs (480–488 are in
    // the probe split) — a correct purge finds exactly the ingested
    // intersection, and the oracle derives it
    val piiPred = "doc_id < 8 OR (doc_id >= 480 AND doc_id < 488)"
    def censusSql: String =
      s"""WITH ${BpeOracle.chainFor(s"WHERE doc_id < $TRAIN_MAX")},
         |dw AS (
         |  SELECT doc_id, unnest(${TextFunctions.wordsSql("text")}) AS word
         |  FROM documents
         |  WHERE doc_id >= $DELTA_MAX AND doc_id < $PROBE_MAX),
         |dwf AS (SELECT doc_id, word FROM dw WHERE length(word) > 0),
         |bw AS (SELECT DISTINCT word FROM dwf),
         |${BpeOracle.applyChain("bw", "a")}
         |SELECT d.doc_id, count(*)::BIGINT AS n_words,
         |  sum(an.n_sub)::BIGINT AS n_subwords
         |FROM dwf d JOIN an USING (word)
         |GROUP BY d.doc_id""".stripMargin
    // the ingested vocabulary (memo after publish + the delta fold)
    // is exactly the distinct words of docs < DELTA_MAX
    def memoMatchSql(purged: Boolean): String = {
      val memoW =
        if (!purged) "SELECT word FROM memow"
        else "SELECT word FROM memow EXCEPT SELECT word FROM purgew"
      s"""WITH purgew AS (
         |  SELECT DISTINCT w AS word FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS w
         |    FROM documents WHERE $piiPred)
         |  WHERE length(w) > 0),
         |memow AS (
         |  SELECT DISTINCT w AS word FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS w
         |    FROM documents WHERE doc_id < $DELTA_MAX)
         |  WHERE length(w) > 0)
         |SELECT p.word FROM purgew p JOIN ($memoW) m ON p.word = m.word"""
        .stripMargin
    }
    def armSql(arm: String, hashExpr: String, body: String): String =
      s"""SELECT '$arm' AS arm, count(*)::BIGINT AS n_rows,
         |  coalesce(sum(${Hashing.seededSql(0, hashExpr)}), 0)::BIGINT AS fp
         |FROM ($body)""".stripMargin
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val train = docs.filter(col("doc_id") < TRAIN_MAX)
        val deltaBatch = docs.filter(
          col("doc_id") >= TRAIN_MAX && col("doc_id") < DELTA_MAX)
        val probeBatch = docs.filter(
          col("doc_id") >= DELTA_MAX && col("doc_id") < PROBE_MAX)
        val purgeW = docs.filter(expr(piiPred))
          .select(explode(TextFunctions.words(col("text"))).as("word"))
          .filter(length(col("word")) > 0).distinct()
        val rootC = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-purge-ctl", d, Seq("documents.parquet"))
        val rootP = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-purge", d, Seq("documents.parquet"))
        def lifecycle(root: String, purge: Boolean): Unit = {
          if (BpeIndex.resolve(root).isEmpty)
            BpeIndex.publish(train, "doc_id", "text", BPE_ROUNDS, root)
          if (purge) {
            if (VersionedDirs.versionsOf(root).size < 2) {
              if (!BpeIndex.folded(root, "b0"))
                BpeIndex.foldMemo(s, BpeIndex.censusAndUnseen(
                  s, deltaBatch, "doc_id", "text", root)._2, root, "b0")
              BpeIndex.purgeWords(s, purgeW, root)
            }
          } else if (!BpeIndex.folded(root, "b0"))
            BpeIndex.foldMemo(s, BpeIndex.censusAndUnseen(
              s, deltaBatch, "doc_id", "text", root)._2, root, "b0")
        }
        lifecycle(rootC, purge = false)
        lifecycle(rootP, purge = true)
        def arm(df: DataFrame, name: String,
                cols: Seq[String]): DataFrame =
          df.select(Hashing.seeded(0, concat_ws(",",
              cols.map(c => col(c).cast("string")): _*)).as("h"))
            .agg(count(lit(1)).as("n_rows"),
              coalesce(sum("h"), lit(0L)).cast("long").as("fp"))
            .select(lit(name).as("arm"), col("n_rows"), col("fp"))
        def memoMatch(root: String): DataFrame =
          BpeIndex.memoAll(s, root).select("word").distinct()
            .join(purgeW, Seq("word"), "leftsemi")
        val censusCols = Seq("doc_id", "n_words", "n_subwords")
        concurrently(Seq(
            () => arm(BpeIndex.tokenize(s, probeBatch, "doc_id", "text",
              rootC), "census_control", censusCols),
            () => arm(BpeIndex.tokenize(s, probeBatch, "doc_id", "text",
              rootP), "census_purged", censusCols),
            () => arm(memoMatch(rootC), "memo_match_control", Seq("word")),
            () => arm(memoMatch(rootP), "memo_match_purged", Seq("word"))))
          .reduce(_.unionByName(_))
          .orderBy("arm")
      },
      s"""${armSql("census_control",
             "doc_id || ',' || n_words || ',' || n_subwords", censusSql)}
         |UNION ALL
         |${armSql("census_purged",
             "doc_id || ',' || n_words || ',' || n_subwords", censusSql)}
         |UNION ALL
         |${armSql("memo_match_control", "word",
             memoMatchSql(purged = false))}
         |UNION ALL
         |${armSql("memo_match_purged", "word",
             memoMatchSql(purged = true))}
         |ORDER BY arm""".stripMargin)
  }

  /** Token-budget packing driven by the PERSISTED tokenizer (q297) —
    * the composition that makes the q293 scaladoc's "token counts are
    * load-bearing" claim literal: the serve batch is tokenized
    * against the committed [[graft.operators.BpeIndex]] artifact
    * (q293's root, read-only shared) and its per-doc `n_subwords` —
    * not the whitespace word count q62 packs by — drives
    * [[graft.operators.Packing.nextFitPack]]'s exact-integer bin
    * boundaries. A single off-by-one in any artifact-served
    * segmentation flips a bin-overflow decision and cascades through
    * the rest of the stratum's assignment, so the per-bin occupancy
    * hash is a much sharper probe of the artifact than the census
    * itself. The oracle replays train + run-parity apply + the q62
    * recursive next-fit fold end-to-end.
    *
    * Scale shape: q293's probe cost + q62's pack shape (one shuffle
    * to strata, in-partition sort, O(1)-state fold); the two stages
    * compose without a barrier — the pack's repartition consumes the
    * probe's materialized census directly.
    */
  val bpePackCompose: Q = {
    val TRAIN_MAX = 400L; val BATCH_MAX = 900L
    val STRATA = 16; val BUDGET = 256L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-bpe-index", d, Seq("documents.parquet"))
        if (BpeIndex.resolve(root).isEmpty)
          BpeIndex.publish(docs.filter(col("doc_id") < TRAIN_MAX),
            "doc_id", "text", BPE_ROUNDS, root)
        val census = BpeIndex.tokenize(s,
          mutBatch(docs.filter(col("doc_id") >= TRAIN_MAX &&
            col("doc_id") < BATCH_MAX)),
          "doc_id", "text", root)
        val n = census.select(
          (col("doc_id") % STRATA).as("stratum"), col("doc_id"),
          col("n_subwords").as("n_tok"))
        Packing.nextFitPack(n, "stratum", "doc_id", "n_tok", BUDGET)
          .groupBy("stratum", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
          .orderBy("stratum", "bin")
      },
      s"""WITH RECURSIVE ${BpeOracle.chainFor(s"WHERE doc_id < $TRAIN_MAX")},
         |dw AS (
         |  SELECT doc_id,
         |    unnest(${TextFunctions.wordsSql(mutBatchSql)}) AS word
         |  FROM documents
         |  WHERE doc_id >= $TRAIN_MAX AND doc_id < $BATCH_MAX),
         |dwf AS (SELECT doc_id, word FROM dw WHERE length(word) > 0),
         |bw AS (SELECT DISTINCT word FROM dwf),
         |${BpeOracle.applyChain("bw", "a")},
         |cen AS (
         |  SELECT d.doc_id, sum(an.n_sub)::BIGINT AS n_tok
         |  FROM dwf d JOIN an USING (word) GROUP BY d.doc_id),
         |pkn AS (
         |  SELECT doc_id % $STRATA AS stratum, doc_id, n_tok FROM cen),
         |pko AS (
         |  SELECT stratum, doc_id, n_tok,
         |    row_number() OVER (PARTITION BY stratum ORDER BY doc_id) AS rn
         |  FROM pkn),
         |pkp AS (
         |  SELECT stratum, rn, n_tok, 0::BIGINT AS bin, n_tok AS cum
         |  FROM pko WHERE rn = 1
         |  UNION ALL
         |  SELECT pko.stratum, pko.rn, pko.n_tok,
         |    CASE WHEN pkp.cum + pko.n_tok > $BUDGET THEN pkp.bin + 1
         |         ELSE pkp.bin END,
         |    CASE WHEN pkp.cum + pko.n_tok > $BUDGET THEN pko.n_tok
         |         ELSE pkp.cum + pko.n_tok END
         |  FROM pkp JOIN pko
         |    ON pko.stratum = pkp.stratum AND pko.rn = pkp.rn + 1)
         |SELECT stratum, bin, count(*)::BIGINT AS n_docs,
         |  sum(n_tok)::BIGINT AS sum_tokens
         |FROM pkp GROUP BY stratum, bin ORDER BY stratum, bin""".stripMargin)
  }

  // ---- the persisted count-min family (SketchIndex, q298–q300) ----

  // defs, not vals: purgeCascadeAudit's oracle (earlier in init
  // order) references them while the object is still initializing
  private def CMS_D = 4; private def CMS_W = 1024

  /** The shared CMS-world oracle CTEs: sketch cells over a corpus
    * predicate + min-estimates for a query-term CTE, both in
    * [[graft.operators.CountMin]]'s exact engine-identical
    * arithmetic. Yields `wf$i` (filtered term occurrences), `sk$i`
    * (cells), `nt$i` (1-row n_total) and `est$i` (term, cms_est).
    * `width` and the source table/CTE are parameters so q304 can
    * replay two widths over a mutated corpus.
    */
  private def cmsWorldSql(i: Int, corpusPred: String, qtCte: String,
                          width: Int = CMS_W,
                          src: String = "documents"): String =
    s"""wds$i AS (
       |  SELECT unnest(${TextFunctions.wordsSql("text")}) AS term
       |  FROM $src WHERE $corpusPred),
       |wf$i AS (SELECT term FROM wds$i WHERE length(term) > 0),
       |sk$i AS (
       |  SELECT r, ${CountMin.cellOfSql("term", "a", "b", width)} AS cell,
       |    count(*)::BIGINT AS cnt
       |  FROM wf$i, cmsp GROUP BY 1, 2),
       |nt$i AS (SELECT coalesce(sum(cnt), 0)::BIGINT AS n_total
       |         FROM sk$i WHERE r = 0),
       |est$i AS (
       |  SELECT q.term, min(coalesce(s.cnt, 0))::BIGINT AS cms_est
       |  FROM $qtCte q CROSS JOIN cmsp p
       |  LEFT JOIN sk$i s ON s.r = p.r
       |    AND s.cell = ${CountMin.cellOfSql("q.term", "p.a", "p.b", width)}
       |  GROUP BY q.term)""".stripMargin

  private def termsOf(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)

  /** Persisted count-min index served through a delta fold (q298) —
    * [[graft.operators.SketchIndex]], the SEVENTH family, and the
    * only one whose delta fold is ARITHMETIC: the base generation
    * holds the train corpus's d·w cells, a batch lands as its OWN
    * d·w-cell sketch, and the served state is the cell-SUM — O(d·w)
    * maintenance at any corpus size (sketch linearity). The oracle
    * builds the sketch over base ∪ batch in ONE shot, so the hash
    * match IS the linearity claim: base-cells + delta-cells ≡
    * one-shot cells, estimate by estimate, bit-for-bit (the affine
    * hash family is engine-identical — q83's determinism doctrine).
    * `n_total` is derived from the sketch itself (Σ row-0 cells), so
    * no stats sidecar can drift from the counters.
    */
  val cmsIndexServe: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-cms-index", d, Seq("documents.parquet"))
        if (SketchIndex.resolve(root).isEmpty)
          SketchIndex.publish(termsOf(docs.filter(col("doc_id") < BASE_MAX)),
            "term", CMS_D, CMS_W, root)
        if (!SketchIndex.folded(root, "b0"))
          SketchIndex.appendDelta(s,
            termsOf(docs.filter(col("doc_id") >= BASE_MAX &&
              col("doc_id") < DELTA_MAX)), "term", root, tag = "b0")
        SketchIndex.estimate(s, termsOf(docs), "term", root)
          .orderBy("term")
      },
      s"""WITH cmsp(r, a, b) AS (VALUES ${CountMin.paramsSqlValues(CMS_D)}),
         |qt AS (
         |  SELECT DISTINCT t AS term FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
         |    FROM documents)
         |  WHERE length(t) > 0),
         |${cmsWorldSql(0, s"doc_id < $DELTA_MAX", "qt")}
         |SELECT e.term, e.cms_est, nt0.n_total
         |FROM est0 e, nt0 ORDER BY e.term""".stripMargin)
  }

  /** Count-min purge by exact subtraction (q299) — the deletion
    * story no sibling family has: sketch linearity makes forgetting
    * a known row set one O(d·w) SUBTRACTION (served cells − the
    * deletion rows' own sketch), bit-identical to a fresh build over
    * the survivors — no rebuild, no corpus rescan, no tombstone
    * masking at probe time. The lifecycle runs THROUGH a pending
    * delta (publish < 300, delta 300–400, then purge doc_id % 10 = 0
    * rows), so the judged claim covers merge-then-subtract in one
    * committed generation; the oracle is a never-ingested build over
    * the survivors.
    */
  val cmsPurge: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-cms-purge", d, Seq("documents.parquet"))
        if (SketchIndex.resolve(root).isEmpty)
          SketchIndex.publish(termsOf(docs.filter(col("doc_id") < BASE_MAX)),
            "term", CMS_D, CMS_W, root)
        if (VersionedDirs.versionsOf(root).size < 2) {
          if (!SketchIndex.folded(root, "b0"))
            SketchIndex.appendDelta(s,
              termsOf(docs.filter(col("doc_id") >= BASE_MAX &&
                col("doc_id") < DELTA_MAX)), "term", root, tag = "b0")
          SketchIndex.purge(s,
            termsOf(docs.filter(col("doc_id") < DELTA_MAX &&
              col("doc_id") % 10 === 0)), "term", root)
        }
        SketchIndex.estimate(s, termsOf(docs), "term", root)
          .orderBy("term")
      },
      s"""WITH cmsp(r, a, b) AS (VALUES ${CountMin.paramsSqlValues(CMS_D)}),
         |qt AS (
         |  SELECT DISTINCT t AS term FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
         |    FROM documents)
         |  WHERE length(t) > 0),
         |${cmsWorldSql(0,
             s"doc_id < $DELTA_MAX AND NOT doc_id % 10 = 0", "qt")}
         |SELECT e.term, e.cms_est, nt0.n_total
         |FROM est0 e, nt0 ORDER BY e.term""".stripMargin)
  }

  /** Judged batch twin of the streaming frequency gate (q300) — the
    * streaming × sketch cell: [[graft.streaming.SketchStream]]
    * estimates each batch's keys against the PRE-batch committed
    * state, then folds the batch's own sketch as a tagged delta.
    * Estimates are monotone (cell sums only grow), and the judged
    * burden is the boundary: batch 0's estimates reflect ONLY the
    * base corpus while batch 1's reflect base ∪ batch 0 — the oracle
    * unions two sketch worlds, so a fold that lands early (batch
    * estimating against itself) or late (batch 1 missing batch 0's
    * mass) hash-mismatches. Batch 0 is REDELIVERED and absorbed
    * through the committed estimate dir and the tagged delta —
    * absorption matters doubly here because cell sums are NOT
    * idempotent (a double fold double-counts, unlike every min/union
    * sibling).
    */
  val cmsStreamTwin: Q = {
    val BASE_MAX = 300L; val B0_MAX = 400L; val B1_MAX = 500L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-cms-stream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-cms-stream-out", d, Seq("documents.parquet"))
        if (SketchIndex.resolve(idxRoot).isEmpty)
          SketchIndex.publish(termsOf(docs.filter(col("doc_id") < BASE_MAX)),
            "term", CMS_D, CMS_W, idxRoot)
        val ss = new graft.streaming.SketchStream(
          s, idxRoot, outRoot, "term")
        val b0 = termsOf(docs.filter(
          col("doc_id") >= BASE_MAX && col("doc_id") < B0_MAX))
        ss.processBatch(b0, 0)
        ss.processBatch(b0, 0) // at-least-once redelivery: absorbed
        ss.processBatch(termsOf(docs.filter(
          col("doc_id") >= B0_MAX && col("doc_id") < B1_MAX)), 1)
        ss.results().orderBy("batch_id", "term")
      },
      s"""WITH cmsp(r, a, b) AS (VALUES ${CountMin.paramsSqlValues(CMS_D)}),
         |qt0 AS (
         |  SELECT DISTINCT t AS term FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
         |    FROM documents
         |    WHERE doc_id >= $BASE_MAX AND doc_id < $B0_MAX)
         |  WHERE length(t) > 0),
         |qt1 AS (
         |  SELECT DISTINCT t AS term FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
         |    FROM documents
         |    WHERE doc_id >= $B0_MAX AND doc_id < $B1_MAX)
         |  WHERE length(t) > 0),
         |${cmsWorldSql(0, s"doc_id < $BASE_MAX", "qt0")},
         |${cmsWorldSql(1, s"doc_id < $B0_MAX", "qt1")}
         |SELECT term, cms_est, n_total, batch_id FROM (
         |  SELECT e.term, e.cms_est, nt0.n_total, 0::BIGINT AS batch_id
         |  FROM est0 e, nt0
         |  UNION ALL
         |  SELECT e.term, e.cms_est, nt1.n_total, 1::BIGINT
         |  FROM est1 e, nt1)
         |ORDER BY batch_id, term""".stripMargin)
  }

  /** Streaming frequency gate across a PURGE boundary (q306) — the
    * streaming × delete cell for the sketch family, where the hazard
    * is sharpest of any family: cell sums are not idempotent AND the
    * purge is a SUBTRACTION, so a batch-0 delta redelivered after the
    * purge consumed it would not just resurface deleted mass — it
    * would add batch 0's cells a second time on top of the
    * subtraction, corrupting every estimate (no min/union semantics
    * to hide behind). The judged chain: batch 0 estimates against the
    * base and folds in (tag b0); the purge subtracts every 10th
    * ingested doc's own term occurrences ([[SketchIndex.purge]] —
    * exact by linearity, folding b0's delta into the same
    * generation); batch 0 REDELIVERS (estimate absorbed by its
    * committed dir, fold absorbed via `_folded.json`); batch 1
    * estimates against the purged, folded state. The oracle unions
    * two sketch worlds — batch 0's over the base, batch 1's over the
    * never-ingested survivor corpus (subtraction ≡ survivor build,
    * the q299 claim riding under a stream) — so an early fold, a
    * lost subtraction, or a double-counted redelivery each
    * hash-mismatch a different arm.
    */
  val cmsPurgeStream: Q = {
    val BASE_MAX = 300L; val B0_MAX = 400L; val B1_MAX = 500L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-cms-pstream-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-cms-pstream-out", d, Seq("documents.parquet"))
        if (SketchIndex.resolve(idxRoot).isEmpty)
          SketchIndex.publish(termsOf(docs.filter(col("doc_id") < BASE_MAX)),
            "term", CMS_D, CMS_W, idxRoot)
        val ss = new graft.streaming.SketchStream(
          s, idxRoot, outRoot, "term")
        ss.processBatch(termsOf(docs.filter(
          col("doc_id") >= BASE_MAX && col("doc_id") < B0_MAX)), 0)
        // the purge: exact subtraction of ingested rows, folding b0's
        // delta into the same generation; a re-run absorbs through
        // the deletion frame's own fingerprint tag
        if (VersionedDirs.versionsOf(idxRoot).size < 2)
          SketchIndex.purge(s,
            termsOf(docs.filter(col("doc_id") < B0_MAX &&
              col("doc_id") % 10 === 0)), "term", idxRoot)
        // at-least-once redelivery AFTER the purge consumed the
        // delta — both halves absorbed, on every run (a re-commit
        // here would double-count batch 0 ON TOP of the subtraction)
        ss.processBatch(termsOf(docs.filter(
          col("doc_id") >= BASE_MAX && col("doc_id") < B0_MAX)), 0)
        ss.processBatch(termsOf(docs.filter(
          col("doc_id") >= B0_MAX && col("doc_id") < B1_MAX)), 1)
        ss.results().orderBy("batch_id", "term")
      },
      s"""WITH cmsp(r, a, b) AS (VALUES ${CountMin.paramsSqlValues(CMS_D)}),
         |qt0 AS (
         |  SELECT DISTINCT t AS term FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
         |    FROM documents
         |    WHERE doc_id >= $BASE_MAX AND doc_id < $B0_MAX)
         |  WHERE length(t) > 0),
         |qt1 AS (
         |  SELECT DISTINCT t AS term FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
         |    FROM documents
         |    WHERE doc_id >= $B0_MAX AND doc_id < $B1_MAX)
         |  WHERE length(t) > 0),
         |${cmsWorldSql(0, s"doc_id < $BASE_MAX", "qt0")},
         |${cmsWorldSql(1,
             s"doc_id < $B0_MAX AND doc_id % 10 <> 0", "qt1")}
         |SELECT term, cms_est, n_total, batch_id FROM (
         |  SELECT e.term, e.cms_est, nt0.n_total, 0::BIGINT AS batch_id
         |  FROM est0 e, nt0
         |  UNION ALL
         |  SELECT e.term, e.cms_est, nt1.n_total, 1::BIGINT
         |  FROM est1 e, nt1)
         |ORDER BY batch_id, term""".stripMargin)
  }

  /** Sketch saturation audit + width-regrow trigger (q304) — the
    * [[graft.operators.SketchIndex]] analog of q292's drift re-train,
    * the hazard the family's frozen geometry creates: (depth, width)
    * never change while N grows, estimate bias creeps up as ~N/w, and
    * no serving path notices. The judged loop, on [[mutBatchSql]]'s
    * novel-vocabulary corpus (~126 distinct terms, so width 16 is
    * genuinely saturated and width 64 is not):
    *
    *   1. two roots publish at width 16 (control + regrow — the
    *      two-root pattern every before/after lifecycle query uses);
    *   2. [[SketchIndex.regrowOnBias]] audits the regrow root (one
    *      exact-count pass vs the served estimates) and MUST fire at
    *      the 1%-of-N budget (measured max bias ≈ 9.8% of N),
    *      republishing at 4× width;
    *   3. the SAME trigger re-runs on every execution against the
    *      regrown artifact and MUST NOT fire (bias ≈ 0.11% of N) —
    *      both trigger arms judged, like q292's fire requirement;
    *   4. the judged rows are both arms' [[SketchIndex.biasAudit]]:
    *      (stage, width, n_terms, n_exact, max_err, sum_err, n_total,
    *      err_bound) with err_bound the count-min ε·N guarantee
    *      (ε = e/w) as the integer surrogate (2718·N) div (1000·w) —
    *      measured bias vs the paper bound, all integers.
    *
    * The oracle replays BOTH sketch worlds (width 16 and 64) and the
    * exact counts from scratch, so the hash match proves the audit
    * arithmetic, the bound, and that the regrown generation serves
    * the wide sketch bit-exactly.
    *
    * Scale shape: the audit's exact-count pass is one
    * vocabulary-sized exchange paid at audit cadence; everything else
    * is O(d·w) artifact arithmetic; the rebuild (one corpus scan) is
    * paid only on fire.
    */
  val cmsSaturation: Q = {
    val N_MAX = 400L; val W0 = 16; val FACTOR = 4
    val BUDGET_PPM = 10000L
    def auditSql(i: Int, stage: String, width: Int): String =
      s"""SELECT '$stage' AS stage, ${width}::BIGINT AS width,
         |  count(*)::BIGINT AS n_terms,
         |  sum(CASE WHEN e.cms_est - x.exact = 0 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_exact,
         |  max(e.cms_est - x.exact)::BIGINT AS max_err,
         |  sum(e.cms_est - x.exact)::BIGINT AS sum_err,
         |  max(nt$i.n_total)::BIGINT AS n_total,
         |  (2718 * max(nt$i.n_total) // (1000 * $width))::BIGINT
         |    AS err_bound
         |FROM est$i e JOIN ex x USING (term), nt$i""".stripMargin
    Q(
      (s, d) => {
        val docs = mutBatch(
          t(s, d, "documents").select(col("doc_id"), col("text"))
            .filter(col("doc_id") < N_MAX))
        val terms = termsOf(docs)
        val ctlRoot = graft.sources.Artifacts.versionedRoot(
          "graft-cms-sat-ctl", d, Seq("documents.parquet"))
        val growRoot = graft.sources.Artifacts.versionedRoot(
          "graft-cms-sat-grow", d, Seq("documents.parquet"))
        if (SketchIndex.resolve(ctlRoot).isEmpty)
          SketchIndex.publish(terms, "term", CMS_D, W0, ctlRoot)
        if (SketchIndex.resolve(growRoot).isEmpty)
          SketchIndex.publish(terms, "term", CMS_D, W0, growRoot)
        if (VersionedDirs.versionsOf(growRoot).size < 2)
          require(SketchIndex.regrowOnBias(s, terms, "term", growRoot,
              BUDGET_PPM, FACTOR).nonEmpty,
            s"saturation trigger must fire at width $W0")
        // the trigger's other arm, re-judged on EVERY run: at the
        // regrown width the same budget holds, so no rebuild fires
        require(SketchIndex.regrowOnBias(s, terms, "term", growRoot,
            BUDGET_PPM, FACTOR).isEmpty,
          "trigger re-fired on the regrown artifact")
        SketchIndex.biasAudit(s, terms, "term", ctlRoot)
          .select(lit("1_narrow").as("stage"), col("*"))
          .unionByName(SketchIndex.biasAudit(s, terms, "term", growRoot)
            .select(lit("2_regrown").as("stage"), col("*")))
          .orderBy("stage")
      },
      s"""WITH cmsp(r, a, b) AS (VALUES ${CountMin.paramsSqlValues(CMS_D)}),
         |mt AS (
         |  SELECT doc_id, $mutBatchSql AS text
         |  FROM documents WHERE doc_id < $N_MAX),
         |qt AS (
         |  SELECT DISTINCT t AS term FROM (
         |    SELECT unnest(${TextFunctions.wordsSql("text")}) AS t
         |    FROM mt)
         |  WHERE length(t) > 0),
         |${cmsWorldSql(0, "TRUE", "qt", width = W0, src = "mt")},
         |${cmsWorldSql(1, "TRUE", "qt", width = W0 * FACTOR, src = "mt")},
         |ex AS (SELECT term, count(*)::BIGINT AS exact
         |       FROM wf0 GROUP BY 1)
         |SELECT * FROM (
         |  ${auditSql(0, "1_narrow", W0)}
         |  UNION ALL
         |  ${auditSql(1, "2_regrown", W0 * FACTOR)})
         |ORDER BY stage""".stripMargin)
  }

  // -------------------------------------------------- graph index (q312+)

  /** Supplier node ids share the customer namespace at this offset
    * (the q70 convention).
    */
  private val GOFF = 10000000L

  /** The trade graph's directed-symmetric weighted edges under an
    * order predicate: one (cust, supp) edge per distinct trading
    * pair, weight = the number of distinct orders linking them, both
    * directions. Order-keyed predicates make batches DISJOINT order
    * sets, so per-edge weights add across base ∪ deltas — the sum
    * semantics [[GraphIndex]] serves.
    */
  private def tradeEdges(s: SparkSession, d: String,
                         pred: Column): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val ew = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(pred)
      .select(col("o_custkey").cast("long").as("u"),
        (col("l_suppkey") + GOFF).cast("long").as("v"),
        col("o_orderkey").as("ok"))
      .distinct()
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
    ew.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionByName(
        ew.select(col("v").as("src"), col("u").as("dst"), col("w")))
  }

  /** The DIRECTED trade edges (customer → supplier only):
    * [[tradeEdges]] without the symmetrizing union — the world where
    * in- and out-neighborhoods genuinely differ, built for the
    * reverse-probe judgment (q325).
    */
  private def tradeEdgesDirected(s: SparkSession, d: String,
                                 pred: Column): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(pred)
      .select(col("o_custkey").cast("long").as("u"),
        (col("l_suppkey") + GOFF).cast("long").as("v"),
        col("o_orderkey").as("ok"))
      .distinct()
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .select(col("u").as("src"), col("v").as("dst"), col("w"))
  }

  /** The oracle twin of [[tradeEdges]]: CTEs `e0$sfx`/`ew$sfx`/
    * `adj$sfx` for one edge world under `pred` (suffixed so one query
    * can carry several worlds).
    */
  private def tradeAdjSql(pred: String, sfx: String = ""): String =
    s"""e0$sfx AS (SELECT DISTINCT o.o_custkey::BIGINT AS u,
       |         (l.l_suppkey + $GOFF)::BIGINT AS v
       |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |       WHERE $pred),
       |ew$sfx AS (
       |  SELECT e.u, e.v, count(*)::BIGINT AS w FROM (
       |    SELECT DISTINCT o.o_custkey::BIGINT AS u,
       |      (l.l_suppkey + $GOFF)::BIGINT AS v, o.o_orderkey AS ok
       |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |    WHERE $pred) e
       |  GROUP BY e.u, e.v),
       |adj$sfx AS (SELECT u AS src, v AS dst, w FROM ew$sfx
       |        UNION ALL SELECT v, u, w FROM ew$sfx)""".stripMargin

  private val G_BASE = "o_orderkey % 10 < 6"
  private val G_B0 = "o_orderkey % 10 IN (6, 7)"
  private val G_B1 = "o_orderkey % 10 >= 8"

  /** The mixed probe node set the graph queries share: a customer
    * slice plus a supplier slice (so probes traverse both endpoint
    * kinds of the symmetric adjacency).
    */
  private def gProbeNodes(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").filter(col("c_custkey") % 19 === 0)
      .select(col("c_custkey").cast("long").as("node"))
      .unionByName(t(s, d, "supplier").filter(col("s_suppkey") % 11 === 0)
        .select((col("s_suppkey") + GOFF).cast("long").as("node")))

  private val gProbeNodesSql: String =
    s"""pn AS (SELECT c_custkey::BIGINT AS node FROM customer
       |       WHERE c_custkey % 19 = 0
       |       UNION ALL
       |       SELECT (s_suppkey + $GOFF)::BIGINT FROM supplier
       |       WHERE s_suppkey % 11 = 0)""".stripMargin

  /** Persisted adjacency index served end-to-end (q312) — the eighth
    * family's publish → fold → probe chain: the trade graph commits
    * once ([[GraphIndex.publish]] — at 100 TB the lineitem⋈orders
    * edge derivation is paid HERE, not per query), a later order
    * batch folds in at batch cost as a tagged delta, and the
    * neighbors probe serves the weight-SUM of base ∪ delta over the
    * probe set's touched src-buckets only. Weights are sums, so the
    * delta fold is NOT idempotent — the family's [[SketchIndex]]
    * burden in a row-keyed layout — and the oracle's flat edge
    * recount over the combined order range would catch a double fold
    * as a doubled weight.
    */
  val graphIndexServe: Q = Q(
    (s, d) => {
      val root = graft.sources.Artifacts.versionedRoot(
        "graft-graph-idx", d, Seq("lineitem.parquet", "orders.parquet"),
        logicVersion = 2)
      if (GraphIndex.resolve(root).isEmpty)
        GraphIndex.publish(tradeEdges(s, d, expr(G_BASE)), root)
      if (!GraphIndex.folded(root, "b0"))
        GraphIndex.fold(s, tradeEdges(s, d, expr(G_B0)), root, tag = "b0")
      // the redelivery, deliberately UNguarded so it replays on every
      // run: absorbed by the live delta dir (or _folded.json after a
      // merge) — a re-commit would double every b0 weight
      GraphIndex.fold(s, tradeEdges(s, d, expr(G_B0)), root, tag = "b0")
      GraphIndex.neighbors(s, gProbeNodes(s, d), root)
        .select("node", "nbr", "w").orderBy("node", "nbr")
    },
    s"""WITH ${tradeAdjSql("o.o_orderkey % 10 < 8")},
       |$gProbeNodesSql
       |SELECT p.node, a.dst AS nbr, a.w
       |FROM pn p JOIN adj a ON a.src = p.node
       |ORDER BY node, nbr""".stripMargin)

  /** k-hop traversal through the committed adjacency (q313): BFS
    * distance ≤ 2 from a root slice of customers, each hop ONE
    * bucket-pruned probe of the frontier (the artifact is never read
    * whole — hop 1 touches the roots' buckets, hop 2 the frontier's).
    * The oracle unrolls two explicit hop joins and takes the min
    * distance per (root, node) — first-discovery level ≡ min-dist,
    * the BFS invariant the iterative probe must preserve.
    */
  val graphKhop: Q = {
    val K = 2
    Q(
      (s, d) => {
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-graph-khop", d, Seq("lineitem.parquet", "orders.parquet"),
          logicVersion = 2)
        if (GraphIndex.resolve(root).isEmpty)
          GraphIndex.publish(tradeEdges(s, d, expr(G_BASE)), root)
        if (!GraphIndex.folded(root, "b0"))
          GraphIndex.fold(s, tradeEdges(s, d, expr(G_B0)), root, tag = "b0")
        val roots = t(s, d, "customer")
          .filter(col("c_custkey") % 101 === 3)
          .select(col("c_custkey").cast("long").as("node"))
        GraphIndex.khop(s, roots, K, root)
          .orderBy("root", "dist", "node")
      },
      s"""WITH ${tradeAdjSql("o.o_orderkey % 10 < 8")},
         |roots AS (SELECT c_custkey::BIGINT AS root FROM customer
         |          WHERE c_custkey % 101 = 3),
         |h1 AS (SELECT DISTINCT r.root, a.dst AS node
         |       FROM roots r JOIN adj a ON a.src = r.root),
         |h2 AS (SELECT DISTINCT h.root, a.dst AS node
         |       FROM h1 h JOIN adj a ON a.src = h.node),
         |cand AS (
         |  SELECT root, root AS node, 0 AS dist FROM roots
         |  UNION ALL SELECT root, node, 1 FROM h1
         |  UNION ALL SELECT root, node, 2 FROM h2)
         |SELECT root, node, min(dist)::BIGINT AS dist
         |FROM cand GROUP BY root, node
         |ORDER BY root, dist, node""".stripMargin)
  }

  /** Two-sided graph deletion judged end-to-end (q314): a GDPR
    * "delete these users" lands on the adjacency through the
    * [[graft.operators.PurgeCascade.graph]] arm — tombstone →
    * mergeCompact (which must drop the purged customers' OWN rows
    * AND every (supplier → purged customer) row scattered across
    * other src-buckets, the side bucket pruning cannot localize) —
    * then the folded b0 delta REDELIVERS (absorbed via
    * `_folded.json`; a re-commit would both double-count surviving
    * weights and resurrect the purged users' edges). The probe set
    * mixes purged customers (must emit NOTHING), surviving
    * customers, and suppliers (whose lists must have FORGOTTEN the
    * purged customers); the oracle replays the survivor world from a
    * corpus where those users never traded.
    */
  val graphPurge: Q = Q(
    (s, d) => {
      val root = graft.sources.Artifacts.versionedRoot(
        "graft-graph-purge", d, Seq("lineitem.parquet", "orders.parquet"),
        logicVersion = 2)
      // one cold block (the q290 shape): publish, fold, purge — with
      // vacuum, so a rerun's resolve() finds the single compacted
      // generation and skips straight to the probes
      if (GraphIndex.resolve(root).isEmpty) {
        GraphIndex.publish(tradeEdges(s, d, expr(G_BASE)), root)
        GraphIndex.fold(s, tradeEdges(s, d, expr(G_B0)), root, tag = "b0")
        val del = t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").cast("long").as("node"))
        graft.operators.PurgeCascade.purge(s, del,
          Seq(graft.operators.PurgeCascade.graph(root)), vacuum = true)
      }
      // the at-least-once redelivery AFTER the purge consumed the
      // delta — absorbed on every run through _folded.json
      GraphIndex.fold(s, tradeEdges(s, d, expr(G_B0)), root, tag = "b0")
      val probe = gProbeNodes(s, d).unionByName(
        t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").cast("long").as("node")))
      GraphIndex.neighbors(s, probe, root)
        .select("node", "nbr", "w").orderBy("node", "nbr")
    },
    s"""WITH ${tradeAdjSql("o.o_orderkey % 10 < 8 AND o.o_custkey % 7 <> 0")},
       |$gProbeNodesSql,
       |pp AS (SELECT node FROM pn
       |       UNION ALL
       |       SELECT c_custkey::BIGINT FROM customer WHERE c_custkey % 7 = 0)
       |SELECT p.node, a.dst AS nbr, a.w
       |FROM pp p JOIN adj a ON a.src = p.node
       |ORDER BY node, nbr""".stripMargin)

  /** In-neighbor census through the dst-bucketed mirror (q325) —
    * "who points at u" on a DIRECTED graph ([[tradeEdgesDirected]]:
    * customer → supplier, never symmetrized), the probe the r13
    * single-layout artifact answered only by scanning every src
    * bucket. [[GraphIndex.inNeighbors]] reads the `in/` twin pruned
    * to the probe set's dst buckets, summing base ∪ the b0 delta and
    * masking BOTH a two-sided tombstone set (a customer slice — the
    * src side of every served list — plus a supplier slice probed
    * directly, which must emit NOTHING) and a durable supplier ban.
    * The oracle replays the directed edge world relationally with
    * all three masks, so hash equality proves the mirror serves
    * exactly the out-layout's edge set — twin consistency, judged.
    */
  val graphInNeighbors: Q = Q(
    (s, d) => {
      val root = graft.sources.Artifacts.versionedRoot(
        "graft-graph-in", d, Seq("lineitem.parquet", "orders.parquet"),
        logicVersion = 2)
      if (GraphIndex.resolve(root).isEmpty) {
        GraphIndex.publish(tradeEdgesDirected(s, d, expr(G_BASE)), root)
        GraphIndex.fold(s, tradeEdgesDirected(s, d, expr(G_B0)), root,
          tag = "b0")
        // two-sided deletion frame: customers (everyone's in-list
        // must forget them) AND suppliers (probed below — must
        // vanish); tombstones stay UNcompacted so the mirror's
        // mask-at-read path is what serves
        GraphIndex.addTombstones(s,
          t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
            .select(col("c_custkey").cast("long").as("node"))
            .unionByName(t(s, d, "supplier")
              .filter(col("s_suppkey") % 11 === 5)
              .select((col("s_suppkey") + GOFF).cast("long").as("node"))),
          "node", root)
        GraphIndex.addBans(s,
          t(s, d, "supplier").filter(col("s_suppkey") % 13 === 2)
            .select((col("s_suppkey") + GOFF).cast("long").as("node")),
          "node", root)
      }
      val probe = t(s, d, "supplier").filter(col("s_suppkey") % 9 === 0)
        .select((col("s_suppkey") + GOFF).cast("long").as("node"))
      GraphIndex.inNeighbors(s, probe, root)
        .select("node", "nbr", "w").orderBy("node", "nbr")
    },
    s"""WITH e0 AS (
       |  SELECT DISTINCT o.o_custkey::BIGINT AS u,
       |    (l.l_suppkey + $GOFF)::BIGINT AS v, o.o_orderkey AS ok
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE o.o_orderkey % 10 < 8),
       |e AS (SELECT u, v, count(*)::BIGINT AS w FROM e0 GROUP BY u, v),
       |pn AS (SELECT (s_suppkey + $GOFF)::BIGINT AS node FROM supplier
       |       WHERE s_suppkey % 9 = 0)
       |SELECT p.node, a.u AS nbr, a.w
       |FROM pn p JOIN e a ON a.v = p.node
       |WHERE a.u % 7 <> 0
       |  AND (a.v - $GOFF) % 11 <> 5
       |  AND (a.v - $GOFF) % 13 <> 2
       |ORDER BY node, nbr""".stripMargin)

  /** BUCKET-LOCAL purge compaction judged (q330) — the scale form of
    * the graph family's GDPR rewrite, enabled by the q325 mirror:
    * [[GraphIndex.purgeCompact]] finds the touched-bucket set of each
    * twin through ONE pruned probe of the OTHER twin (every edge with
    * a tombstoned endpoint names the bucket it occupies on the far
    * side), rewrites only those dirs, and carries every untouched
    * bucket into the new generation as a verbatim file copy — at
    * 100 TB a surgical rewrite instead of the r13 full-artifact pass.
    * Judged on the directed trade world through BOTH probe
    * directions off the compacted generation (arm 1: customers'
    * out-lists must have forgotten the purged suppliers; arm 2:
    * suppliers' in-lists the purged customers) — the oracle's
    * never-ingested replay catches a row that a wrongly-skipped
    * bucket would have retained, on either side. The spec pins the
    * bucket-locality itself (untouched dirs byte-listed identical).
    */
  val graphPurgeLocal: Q = Q(
    (s, d) => {
      val root = graft.sources.Artifacts.versionedRoot(
        "graft-graph-plocal", d, Seq("lineitem.parquet", "orders.parquet"),
        logicVersion = 2)
      if (GraphIndex.resolve(root).isEmpty) {
        GraphIndex.publish(
          tradeEdgesDirected(s, d, expr("o_orderkey % 10 < 8")), root)
        GraphIndex.addTombstones(s,
          t(s, d, "customer").filter(col("c_custkey") % 11 === 4)
            .select(col("c_custkey").cast("long").as("node"))
            .unionByName(t(s, d, "supplier")
              .filter(col("s_suppkey") % 9 === 3)
              .select((col("s_suppkey") + GOFF).cast("long").as("node"))),
          "node", root)
        GraphIndex.purgeCompact(s, root)
      }
      val custProbe = t(s, d, "customer")
        .filter(col("c_custkey") % 17 === 0)
        .select(col("c_custkey").cast("long").as("node"))
      val suppProbe = t(s, d, "supplier")
        .filter(col("s_suppkey") % 9 === 0)
        .select((col("s_suppkey") + GOFF).cast("long").as("node"))
      GraphIndex.neighbors(s, custProbe, root)
        .select(lit("1_out").as("arm"), col("node"), col("nbr"), col("w"))
        .unionByName(GraphIndex.inNeighbors(s, suppProbe, root)
          .select(lit("2_in").as("arm"), col("node"), col("nbr"),
            col("w")))
        .orderBy("arm", "node", "nbr")
    },
    s"""WITH e0 AS (
       |  SELECT DISTINCT o.o_custkey::BIGINT AS u,
       |    (l.l_suppkey + $GOFF)::BIGINT AS v, o.o_orderkey AS ok
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE o.o_orderkey % 10 < 8),
       |e AS (
       |  SELECT u, v, count(*)::BIGINT AS w FROM e0
       |  WHERE u % 11 <> 4 AND (v - $GOFF) % 9 <> 3
       |  GROUP BY u, v),
       |co AS (SELECT c_custkey::BIGINT AS node FROM customer
       |       WHERE c_custkey % 17 = 0),
       |sp AS (SELECT (s_suppkey + $GOFF)::BIGINT AS node FROM supplier
       |       WHERE s_suppkey % 9 = 0)
       |SELECT * FROM (
       |  SELECT '1_out' AS arm, p.node, a.v AS nbr, a.w
       |  FROM co p JOIN e a ON a.u = p.node
       |  UNION ALL
       |  SELECT '2_in', p.node, a.u, a.w
       |  FROM sp p JOIN e a ON a.v = p.node) z
       |ORDER BY arm, node, nbr""".stripMargin)

  /** Streaming connectivity gate across a PURGE boundary (q315) — the
    * streaming × delete cell for the graph family, completing the
    * matrix's eighth row: batch 0's endpoints are degree-censused
    * against the committed base ([[graft.streaming.GraphStream]] —
    * census BEFORE fold, so a batch never sees itself), the batch
    * folds in tagged; a GDPR node purge compacts (consuming b0's
    * delta); batch 0 REDELIVERS (census absorbed by its committed
    * dir, fold by `_folded.json` — edge weights are sums, so a
    * re-commit would double-count AND resurrect the purged users);
    * batch 1 censuses the survivor world. The family's distinctive
    * judged signal: a purged customer appearing among batch 1's
    * endpoints reports degree 0 — identity forgotten, not just rows
    * hidden — while batch 0's committed census is history the purge
    * must NOT rewrite.
    */
  val graphPurgeStream: Q = Q(
    (s, d) => {
      val idxRoot = graft.sources.Artifacts.versionedRoot(
        "graft-graph-pstream-idx", d,
        Seq("lineitem.parquet", "orders.parquet"), logicVersion = 2)
      val outRoot = graft.sources.Artifacts.versionedRoot(
        "graft-graph-pstream-out", d,
        Seq("lineitem.parquet", "orders.parquet"), logicVersion = 2)
      if (GraphIndex.resolve(idxRoot).isEmpty)
        GraphIndex.publish(tradeEdges(s, d, expr(G_BASE)), idxRoot)
      val gs = new graft.streaming.GraphStream(s, idxRoot, outRoot)
      gs.processBatch(tradeEdges(s, d, expr(G_B0)), 0)
      if (VersionedDirs.versionsOf(idxRoot).size < 2) {
        GraphIndex.addTombstones(s,
          t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
            .select(col("c_custkey").cast("long").as("node")),
          "node", idxRoot)
        GraphIndex.mergeCompact(s, idxRoot)
      }
      // the redelivery AFTER the purge consumed b0's delta: both
      // halves absorbed, on every run
      gs.processBatch(tradeEdges(s, d, expr(G_B0)), 0)
      gs.processBatch(tradeEdges(s, d, expr(G_B1)), 1)
      gs.results().orderBy("batch_id", "node")
    },
    s"""WITH ${tradeAdjSql("o.o_orderkey % 10 < 6", "b")},
       |${tradeAdjSql(
           "o.o_orderkey % 10 < 8 AND o.o_custkey % 7 <> 0", "s")},
       |${tradeAdjSql("o.o_orderkey % 10 IN (6, 7)", "0")},
       |${tradeAdjSql("o.o_orderkey % 10 >= 8", "1")},
       |ep0 AS (SELECT DISTINCT src AS node FROM adj0),
       |ep1 AS (SELECT DISTINCT src AS node FROM adj1),
       |c0 AS (SELECT p.node, count(a.dst)::BIGINT AS out_deg,
       |         coalesce(sum(a.w), 0)::BIGINT AS w_total,
       |         0::BIGINT AS batch_id
       |       FROM ep0 p LEFT JOIN adjb a ON a.src = p.node
       |       GROUP BY p.node),
       |c1 AS (SELECT p.node, count(a.dst)::BIGINT AS out_deg,
       |         coalesce(sum(a.w), 0)::BIGINT AS w_total,
       |         1::BIGINT AS batch_id
       |       FROM ep1 p LEFT JOIN adjs a ON a.src = p.node
       |       GROUP BY p.node)
       |SELECT node, out_deg, w_total, batch_id FROM c0
       |UNION ALL SELECT node, out_deg, w_total, batch_id FROM c1
       |ORDER BY batch_id, node""".stripMargin)

  /** Centrality OVER the committed artifact (q316) — the
    * artifact → analytics composition: [[graft.operators.PageRank]]
    * (q70's exact-integer recurrence) runs on
    * [[GraphIndex.edges]] — the full served edge set of base ∪ a
    * live delta under an UNCOMPACTED two-sided tombstone mask, the
    * strongest state the accessor can serve (sum + mask both
    * applied lazily in one plan). A GDPR-purged user must not just
    * vanish from rank rows — their ABSENCE reshapes every survivor's
    * centrality (outdegree drops, mass re-routes), which is why the
    * oracle replays the full damped recurrence over the survivor
    * world rather than filtering the pre-purge ranking. At 100 TB
    * the edge derivation is the artifact's publish cost; the
    * analytics pay one artifact scan + the node-keyed iteration
    * shuffles.
    */
  val graphPagerank: Q = {
    val ITERS = 3; val K = 20
    def iterCte(i: Int): String =
      s"""s$i AS (
         |  SELECT r${i - 1}.node AS src, (r // outdeg)::BIGINT AS share
         |  FROM r${i - 1} JOIN od ON r${i - 1}.node = od.src),
         |f$i AS (
         |  SELECT e.dst AS node, sum(share) AS inflow
         |  FROM e JOIN s$i ON e.src = s$i.src GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.node,
         |    ((15 * (${graft.operators.PageRank.SCALE} // nn.n_nodes)) // 100
         |     + (85 * coalesce(f.inflow, 0)) // 100)::BIGINT AS r
         |  FROM nodes n CROSS JOIN nn
         |  LEFT JOIN f$i f ON n.node = f.node)"""
    Q(
      (s, d) => {
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-graph-pr", d, Seq("lineitem.parquet", "orders.parquet"),
          logicVersion = 2)
        if (GraphIndex.resolve(root).isEmpty) {
          GraphIndex.publish(tradeEdges(s, d, expr(G_BASE)), root)
          GraphIndex.fold(s, tradeEdges(s, d, expr(G_B0)), root, tag = "b0")
          // tombstones stay UNcompacted: the analytics read through
          // the mask, not a rewritten generation
          GraphIndex.addTombstones(s,
            t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
              .select(col("c_custkey").cast("long").as("node")),
            "node", root)
        }
        val e = GraphIndex.edges(s, root).select("src", "dst")
        graft.operators.PageRank.ranks(e, "src", "dst", ITERS)
          .select(col("node"), col("r").as("rank_units"))
          .orderBy(desc("rank_units"), asc("node")).limit(K)
      },
      s"""WITH e0 AS (
         |  SELECT DISTINCT o.o_custkey::BIGINT AS u,
         |    (l.l_suppkey + $GOFF)::BIGINT AS v
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE o.o_orderkey % 10 < 8 AND o.o_custkey % 7 <> 0),
         |e AS (SELECT u AS src, v AS dst FROM e0
         |      UNION SELECT v, u FROM e0),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes),
         |od AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
         |r0 AS (SELECT node,
         |         (${graft.operators.PageRank.SCALE} // n_nodes)::BIGINT AS r
         |       FROM nodes, nn),
         |${(1 to ITERS).map(iterCte).mkString(",\n")}
         |SELECT node, r AS rank_units FROM r$ITERS
         |ORDER BY rank_units DESC, node LIMIT $K""".stripMargin)
  }

  /** Weighted shortest paths OVER the committed artifact (q332) —
    * the third artifact → analytics composition beside q313 (BFS
    * k-hop) and q316 (PageRank), completing the traversal set a graph
    * serving layer owes its callers: [[graft.operators
    * .ShortestPaths]]' bounded Bellman-Ford (q154's exact-integer
    * relaxation) runs on [[GraphIndex.edges]] — base ∪ live delta
    * weight-sums under the UNCOMPACTED two-sided tombstone mask,
    * q316's shared root, so the artifact publishes once for both
    * analytics. Edge cost is the affinity form (w' = max(1, 12 −
    * served_weight)): the SERVED weight is what prices the route, so
    * a fold that double-counted a delta or a mask that leaked a
    * purged customer would reprice paths corpus-wide — the oracle
    * replays the survivor world's weights and unrolls the identical
    * relaxation rounds, so either failure breaks the hash. At 100 TB:
    * the edge derivation is the artifact's publish cost; each
    * relaxation round is one node-keyed join + one min-aggregate,
    * map-side combinable, lineage held O(1) by per-round checkpoints.
    */
  val graphSssp: Q = {
    val H = 4; val SRC = 1L; val K = 50
    def round(i: Int): String =
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(dist)::BIGINT AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT em.dst AS node, d.dist + em.w AS dist
         |    FROM d${i - 1} d JOIN em ON em.src = d.node) u
         |  GROUP BY node)"""
    Q(
      (s, d) => {
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-graph-pr", d, Seq("lineitem.parquet", "orders.parquet"),
          logicVersion = 2)
        if (GraphIndex.resolve(root).isEmpty) {
          GraphIndex.publish(tradeEdges(s, d, expr(G_BASE)), root)
          GraphIndex.fold(s, tradeEdges(s, d, expr(G_B0)), root, tag = "b0")
          GraphIndex.addTombstones(s,
            t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
              .select(col("c_custkey").cast("long").as("node")),
            "node", root)
        }
        val e = GraphIndex.edges(s, root)
          .select(col("src"), col("dst"),
            greatest(lit(1L), lit(12L) - col("w")).as("w"))
        graft.operators.ShortestPaths.distances(e, "src", "dst", "w",
            SRC, H)
          .orderBy(col("dist"), col("node")).limit(K)
      },
      s"""WITH ${tradeAdjSql(
             "o.o_orderkey % 10 < 8 AND o.o_custkey % 7 <> 0")},
         |em AS (SELECT src, dst, greatest(1, 12 - w)::BIGINT AS w
         |       FROM adj),
         |d0(node, dist) AS (VALUES (${SRC}::BIGINT, 0::BIGINT)),
         |${(1 to H).map(round).mkString(",\n")}
         |SELECT node, dist FROM d$H ORDER BY dist, node LIMIT $K""".stripMargin)
  }

  /** Variance-balanced subspace allocation for PQ (q317) — the
    * dimension-PERMUTATION member of the OPQ family (Ge et al.,
    * "Optimized Product Quantization", CVPR 2013 — their natural
    * baseline, and the form FAISS's OPQ matrix reduces to when
    * restricted to a permutation): PQ splits dims into m consecutive
    * blocks, so when the energy-heavy dims happen to be ADJACENT one
    * subspace's ks cells drown while the others' are wasted.
    * Balancing — rank dims by energy, deal them round-robin across
    * subspaces — costs ZERO extra bytes at serving time (the
    * permutation is metadata) and strictly lowers total distortion on
    * anisotropic data. Judged at equal (m, dsub, ks, iters) budget on
    * a constructed anisotropic world (the q302 doctrine: the first m
    * dims carry 8× the energy via an INTEGER multiply applied after
    * micro-scaling, so the oracle replays the whole world float-free):
    * identity layout crams all m hot dims into subspace 0; balanced
    * gives each subspace exactly one. Both arms' mean quantization
    * error ((Σ min-d²) div n over (vec, sub) pairs —
    * [[PqIndex]]'s publish-baseline formula) is oracle-replayed from
    * scratch; the strict inequality is spec-pinned like q302's.
    *
    * Scale shape: the energy pass is one DIM-row aggregate (the
    * collect is model-constant-bounded — DIM ≤ 64, the BpeIndex
    * merge-log adjudication class); fit and distortion are the
    * standard PQ passes. A deployment would freeze the permutation in
    * the artifact's params exactly like the codebooks.
    */
  val pqDimBalance: Q = {
    val INDEX_MAX = 300L; val HI = PQ_M; val SCALEF = 8L
    def armSql(arm: String, ixSel: String): String =
      s"""SELECT '$arm' AS arm, qerr, n_subs FROM (
         |WITH e0 AS (
         |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
         |    round(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS xs0
         |  FROM embeddings WHERE vec_id < $INDEX_MAX),
         |e AS (SELECT vec_id, dim,
         |        xs0 * (CASE WHEN dim <= $HI THEN $SCALEF ELSE 1 END) AS xs
         |      FROM e0),
         |en AS (SELECT dim, sum(xs * xs) AS energy FROM e GROUP BY dim),
         |rk AS (SELECT dim,
         |         (row_number() OVER (ORDER BY energy DESC, dim) - 1) AS r
         |       FROM en),
         |ix AS ($ixSel),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |md AS (
         |  SELECT vec_id, sub, min(d2) AS d2 FROM (
         |    SELECT ix.vec_id, c.sub, c.cell,
         |      sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |    FROM ix JOIN pc$PQ_ITERS c
         |      ON ix.sub = c.sub AND ix.sdim = c.sdim
         |    GROUP BY 1, 2, 3)
         |  GROUP BY 1, 2)
         |SELECT (sum(d2) // count(*))::BIGINT AS qerr,
         |  count(*)::BIGINT AS n_subs
         |FROM md)""".stripMargin
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") < INDEX_MAX)
        val es = VectorQuantizer.scaled(emb, "vec_id", "embedding")
          .select(col("vec_id"),
            transform(col("xs"),
              (x, i) => when(i < HI, x * SCALEF).otherwise(x)).as("xs"))
          .persist()
        // per-dim energy → balanced permutation; DIM rows collected —
        // a model constant (≤64), never data-sized
        val ranked = es.select(posexplode(col("xs")).as(Seq("pos", "x")))
          .groupBy("pos").agg(sum(col("x") * col("x")).as("energy"))
          .collect().map(r => (r.getInt(0), r.getLong(1)))
          .sortBy { case (p, en) => (-en, p) }.map(_._1)
        // srcAt(p) = the original dim serving new position p: energy
        // rank r lands at subspace r % m, slot r div m
        val srcAt = new Array[Int](ranked.length)
        for (r <- ranked.indices)
          srcAt((r % PQ_M) * PQ_DSUB + (r / PQ_M)) = ranked(r)
        val esP = es.select(col("vec_id"),
          array(srcAt.toIndexedSeq.map(i =>
            element_at(col("xs"), i + 1)): _*).as("xs"))
        def qerrOf(e: DataFrame): DataFrame = {
          val cent = VectorQuantizer.fitPQ(
            e, "vec_id", PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS)
          VectorQuantizer.subVectors(e, "vec_id", PQ_M, PQ_DSUB)
            .join(broadcast(cent), Seq("sub"))
            .select(col("vec_id"), col("sub"),
              VectorQuantizer.l2DistSq(col("xs"), col("cs")).as("d2"))
            .groupBy("vec_id", "sub").agg(min("d2").as("d2"))
            .agg(expr("CAST(sum(d2) div count(*) AS BIGINT)").as("qerr"),
              count(lit(1)).as("n_subs"))
        }
        val out = qerrOf(es)
          .select(lit("1_identity").as("arm"), col("qerr"), col("n_subs"))
          .unionByName(qerrOf(esP)
            .select(lit("2_balanced").as("arm"), col("qerr"),
              col("n_subs")))
          .orderBy("arm")
          .localCheckpoint()
        es.unpersist()
        out
      },
      s"""${armSql("1_identity",
        s"SELECT vec_id, (dim - 1) // $PQ_DSUB AS sub, " +
          s"(dim - 1) % $PQ_DSUB + 1 AS sdim, xs FROM e")}
         |UNION ALL
         |${armSql("2_balanced",
        s"SELECT e.vec_id, rk.r % $PQ_M AS sub, " +
          s"rk.r // $PQ_M + 1 AS sdim, e.xs FROM e JOIN rk USING (dim)")}
         |ORDER BY arm""".stripMargin)
  }

  /** The re-ingestion ban gate (q318) — "forgotten must STAY
    * forgotten", the closure q314/q315 leave open: tombstones mask
    * what was ALREADY ingested and reset at compaction, so a later
    * batch re-mentioning a deleted identity (an at-least-once
    * upstream, a backfill, a fresh trade by a supposedly-erased user)
    * would serve again. [[GraphIndex.addBans]] commits a DURABLE node
    * set that [[GraphIndex.fold]] filters arriving edges against
    * (both endpoints) at the ingestion gate and every read path masks
    * besides. Judged chain: publish base → stream batch 0 → purge
    * AND ban the deleted users (tombstone → compact, bans surviving
    * the compaction that resets tombstones) → redeliver batch 0
    * (absorbed) → stream batch 1, which CONTAINS the banned users'
    * later trades — the final neighbors probe must equal a world
    * where those users' edges from ANY batch never existed. Without
    * the ban, batch 1's re-mentions would hash-mismatch (tombstones
    * are gone by then — the oracle would catch exactly the hole this
    * closes).
    */
  val graphBanGate: Q = Q(
    (s, d) => {
      val idxRoot = graft.sources.Artifacts.versionedRoot(
        "graft-graph-ban-idx", d,
        Seq("lineitem.parquet", "orders.parquet"), logicVersion = 2)
      val outRoot = graft.sources.Artifacts.versionedRoot(
        "graft-graph-ban-out", d,
        Seq("lineitem.parquet", "orders.parquet"), logicVersion = 2)
      if (GraphIndex.resolve(idxRoot).isEmpty)
        GraphIndex.publish(tradeEdges(s, d, expr(G_BASE)), idxRoot)
      val gs = new graft.streaming.GraphStream(s, idxRoot, outRoot)
      gs.processBatch(tradeEdges(s, d, expr(G_B0)), 0)
      if (VersionedDirs.versionsOf(idxRoot).size < 2) {
        val del = t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").cast("long").as("node"))
        GraphIndex.addTombstones(s, del, "node", idxRoot)
        // the durable half: survives the compaction below
        GraphIndex.addBans(s, del, "node", idxRoot)
        GraphIndex.mergeCompact(s, idxRoot)
      }
      gs.processBatch(tradeEdges(s, d, expr(G_B0)), 0) // absorbed
      // batch 1 RE-MENTIONS banned users (their %10>=8 orders exist);
      // the fold-side ban filter keeps them out of the delta
      gs.processBatch(tradeEdges(s, d, expr(G_B1)), 1)
      val probe = gProbeNodes(s, d).unionByName(
        t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").cast("long").as("node")))
      GraphIndex.neighbors(s, probe, idxRoot)
        .select("node", "nbr", "w").orderBy("node", "nbr")
    },
    s"""WITH ${tradeAdjSql("o.o_custkey % 7 <> 0")},
       |$gProbeNodesSql,
       |pp AS (SELECT node FROM pn
       |       UNION ALL
       |       SELECT c_custkey::BIGINT FROM customer WHERE c_custkey % 7 = 0)
       |SELECT p.node, a.dst AS nbr, a.w
       |FROM pp p JOIN adj a ON a.src = p.node
       |ORDER BY node, nbr""".stripMargin)

  /** The q317 permutation FROZEN IN THE ARTIFACT and served (q319) —
    * the lifecycle closure: a permutation derived at query time is a
    * drift hazard (a probe that skipped or re-derived it would
    * ADC-score queries in a different basis than the codes), so
    * [[PqIndex.publish]] now takes `dimPerm`, records it in
    * `_params.json` beside the codebooks, and EVERY later scaling —
    * probe queries, delta appends, drift measurements, compaction
    * carry-forward — applies the committed permutation. Judged as a
    * recall comparison at equal (m, dsub, ks) budget on the
    * anisotropic world (the first m dims ×8 — a float power-of-two
    * multiply, exact on both engines): identity vs balanced artifacts
    * probed through the SAME [[PqIndex.probeTopK]] call, scored
    * against the exact integer-L2 truth (which is
    * permutation-INVARIANT, so one truth serves both arms). The
    * oracle replays energy → rank → permuted layout → Lloyd → encode
    * → ADC for both arms from scratch: a hash match proves the
    * artifact applied its frozen permutation to both sides of the
    * ADC, bit-exactly.
    */
  val pqPermServe: Q = {
    val INDEX_MAX = 300L; val Q_MAX = 320L; val NQ = Q_MAX - INDEX_MAX
    val HI = PQ_M; val SCALEF = 8
    val eCtes =
      s"""ea0 AS (
         |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
         |    unnest(embedding)::DOUBLE AS x
         |  FROM embeddings WHERE vec_id < $Q_MAX),
         |e AS (
         |  SELECT vec_id, dim,
         |    round(x * (CASE WHEN dim <= $HI THEN $SCALEF ELSE 1 END)
         |          * 1000000)::BIGINT AS xs
         |  FROM ea0)""".stripMargin
    def armSql(name: String, layout: String): String = {
      // layout maps (dim) -> (sub, sdim); applied to index AND queries
      s"""SELECT '$name' AS variant, query_id, index_id FROM (
         |WITH $eCtes,
         |en AS (SELECT dim, sum(xs * xs) AS energy FROM e
         |       WHERE vec_id < $INDEX_MAX GROUP BY dim),
         |rk AS (SELECT dim,
         |         (row_number() OVER (ORDER BY energy DESC, dim) - 1) AS r
         |       FROM en),
         |lay AS ($layout),
         |ix AS (SELECT e.vec_id, l.sub, l.sdim, e.xs
         |       FROM e JOIN lay l USING (dim) WHERE e.vec_id < $INDEX_MAX),
         |qp AS (SELECT e.vec_id, l.sub, l.sdim, e.xs
         |       FROM e JOIN lay l USING (dim)
         |       WHERE e.vec_id >= $INDEX_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |fd AS (
         |  SELECT ix.vec_id, c.sub, c.cell,
         |    sum((ix.xs - c.cs) * (ix.xs - c.cs)) AS d2
         |  FROM ix JOIN pc$PQ_ITERS c ON ix.sub = c.sub AND ix.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT vec_id, sub, cell,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cell) AS rnk
         |    FROM fd) WHERE rnk = 1),
         |dtab AS (
         |  SELECT q.vec_id AS query_id, c.sub, c.cell,
         |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
         |  FROM qp q JOIN pc$PQ_ITERS c ON q.sub = c.sub AND q.sdim = c.sdim
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT dt.query_id, cd.vec_id AS index_id,
         |    sum(dt.d2)::BIGINT AS adc_d2
         |  FROM codes cd JOIN dtab dt ON cd.sub = dt.sub AND cd.cell = dt.cell
         |  GROUP BY 1, 2),
         |rked AS (
         |  SELECT query_id, index_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY adc_d2, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id FROM rked WHERE rnk <= $PQ_K)"""
        .stripMargin
    }
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") < Q_MAX)
        val aniso = emb.select(col("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i < HI, x * lit(SCALEF.toFloat)).otherwise(x))
            .as("embedding"))
        val index = aniso.filter(col("vec_id") < INDEX_MAX)
        val queries = aniso.filter(col("vec_id") >= INDEX_MAX)
        val rootI = graft.sources.Artifacts.versionedRoot(
          "graft-pq-perm-id", d, Seq("embeddings.parquet"))
        val rootP = graft.sources.Artifacts.versionedRoot(
          "graft-pq-perm-bal", d, Seq("embeddings.parquet"))
        val eI = VectorQuantizer.scaled(index, "vec_id", "embedding")
        if (PqIndex.resolve(rootP).isEmpty) {
          // the balanced permutation, derived once at PUBLISH time
          // from the train slice's energies (DIM-row collect — a
          // model constant) and frozen into the artifact
          val ranked = eI.select(posexplode(col("xs")).as(Seq("pos", "x")))
            .groupBy("pos").agg(sum(col("x") * col("x")).as("energy"))
            .collect().map(r => (r.getInt(0), r.getLong(1)))
            .sortBy { case (p, en) => (-en, p) }.map(_._1)
          val srcAt = new Array[Int](ranked.length)
          for (r <- ranked.indices)
            srcAt((r % PQ_M) * PQ_DSUB + (r / PQ_M)) = ranked(r)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, rootP,
            dimPerm = Some(srcAt.toIndexedSeq))
        }
        if (PqIndex.resolve(rootI).isEmpty)
          PqIndex.publish(index, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, rootI)
        // exact-L2 truth on the anisotropic world — permutation-
        // INVARIANT, so one truth scores both arms
        val eQ = VectorQuantizer.scaled(queries, "vec_id", "embedding")
        val truth = eI.crossJoin(broadcast(eQ.select(
            col("vec_id").as("query_id"), col("xs").as("qxs"))))
          .select(col("query_id"), col("vec_id").as("index_id"),
            VectorQuantizer.l2DistSq(col("qxs"), col("xs")).as("d2"))
          .withColumn("rnk", row_number().over(Window
            .partitionBy("query_id").orderBy(asc("d2"), asc("index_id"))))
          .filter(col("rnk") <= PQ_K)
          .select(col("query_id"), col("index_id"), lit(1L).as("hit"))
        def armOf(root: String, name: String) =
          PqIndex.probeTopK(s, queries, "vec_id", "embedding", PQ_K, root)
            .select(lit(name).as("variant"), col("query_id"),
              col("index_id"))
        concurrently(Seq(() => armOf(rootI, "1_identity"),
            () => armOf(rootP, "2_balanced")))
          .reduce(_.unionByName(_))
          .join(truth, Seq("query_id", "index_id"), "left")
          .groupBy("variant")
          .agg(count(lit(1)).as("n_pairs"),
            coalesce(sum("hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * PQ_K})"))
          .orderBy("variant")
      },
      s"""WITH truth AS (
         |  SELECT query_id, index_id FROM (
         |    WITH $eCtes,
         |    td AS (
         |      SELECT q.vec_id AS query_id, x.vec_id AS index_id,
         |        sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
         |      FROM e q JOIN e x USING (dim)
         |      WHERE q.vec_id >= $INDEX_MAX AND x.vec_id < $INDEX_MAX
         |      GROUP BY 1, 2)
         |    SELECT query_id, index_id FROM (
         |      SELECT query_id, index_id,
         |        row_number() OVER (PARTITION BY query_id
         |                           ORDER BY d2, index_id) AS rnk
         |      FROM td) WHERE rnk <= $PQ_K)),
         |ia AS (${armSql("1_identity",
        s"SELECT dim, (dim - 1) // $PQ_DSUB AS sub, " +
          s"(dim - 1) % $PQ_DSUB + 1 AS sdim FROM en")}),
         |ba AS (${armSql("2_balanced",
        s"SELECT dim, r % $PQ_M AS sub, r // $PQ_M + 1 AS sdim FROM rk")})
         |SELECT variant, count(*)::BIGINT AS n_pairs,
         |  coalesce(sum(hit), 0)::BIGINT AS n_hit,
         |  (coalesce(sum(hit), 0) * 1000000 // ${NQ * PQ_K})::BIGINT
         |    AS recall_ppm
         |FROM (
         |  SELECT p.variant,
         |    CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM (SELECT * FROM ia UNION ALL SELECT * FROM ba) p
         |  LEFT JOIN truth t ON t.query_id = p.query_id
         |    AND t.index_id = p.index_id)
         |GROUP BY variant ORDER BY variant""".stripMargin)
  }

  /** The dedup family's re-ingestion ban gate (q320) — q318's closure
    * generalized through the shared [[graft.operators.Bans]] log: a
    * purged doc id re-submitted by a backfill would re-enter the
    * index the moment compaction resets the tombstones, and worse —
    * its signature in the batch TAIL would hand every later
    * near-dup probe a link back to content the pipeline promised to
    * forget. [[DedupIndex.addBans]] commits the durable set;
    * [[graft.streaming.DedupStream]] drops banned ids BEFORE banding
    * commits anything (their signatures never land in the tail —
    * gated, not masked), and probes/compactions mask-and-scrub
    * besides. Judged chain: batch 0 ingests and compacts; the purge
    * tombstones AND bans every 10th doc; batch 1 re-submits the
    * banned ids (gated); batch 2 probes near-identical COPIES of the
    * banned docs under fresh ids — if the gate had leaked, the
    * copies' identical band keys would pair with batch 1's
    * resurrected signatures, and the oracle (a world where banned
    * ids are simply never present on either side) would catch it.
    */
  val dedupBanGate: Q = {
    val NB = 3L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, b, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        // originals + legit duplicate copies of NON-banned docs (the
        // +10⁶ shift preserves the %10 residue, so no copy is banned)
        val corpus = docs.unionByName(
            docs.filter(col("doc_id") % 10 =!= 0)
              .select((col("doc_id") + 1000000L).as("doc_id"),
                col("text")))
          .withColumn("b", col("doc_id") % NB)
        def batch(i: Long) =
          corpus.filter(col("b") === i).select("doc_id", "text")
        // near-identical copies of the BANNED docs under fresh ids —
        // the batch-2 probes that would find batch 1's leak
        val banCopies = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-dedup-ban", d, Seq("documents.parquet"))
        val compactedRoot = s"$root/compacted"
        val ds = new graft.streaming.DedupStream(s, root,
          "doc_id", "text", MH_K, MH_BANDS, MH_R)
        ds.processBatch(batch(0), 0)
        ds.compactIndex(); ds.vacuumFolded()
        if (DedupIndex.bans(s, compactedRoot).isEmpty) {
          val del = corpus.filter(col("doc_id") % 10 === 0)
            .select("doc_id")
          DedupIndex.addTombstones(s, del, "doc_id", compactedRoot)
          DedupIndex.addBans(s, del, "doc_id", compactedRoot)
        }
        // batch 1 RE-SUBMITS the banned ids (b covers every residue);
        // the ingest gate drops them before their signatures commit
        ds.processBatch(batch(1), 1)
        ds.processBatch(batch(1), 1) // at-least-once: absorbed
        ds.processBatch(batch(2).unionByName(banCopies), 2)
        ds.compactIndex(); ds.vacuumFolded()
        ds.matches().orderBy("new_id", "index_id")
      },
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |corpus AS (
         |  SELECT doc_id, text, doc_id % $NB AS b FROM docs
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, (doc_id + 1000000) % $NB
         |  FROM docs WHERE doc_id % 10 <> 0
         |  UNION ALL
         |  SELECT doc_id + 2000000, text, 2 FROM docs
         |  WHERE doc_id % 10 = 0),
         |w AS (SELECT doc_id, b, ${TextFunctions.wordsSql("text")} AS arr
         |      FROM corpus),
         |sh AS (SELECT DISTINCT doc_id, b,
         |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
         |sig AS (
         |  SELECT doc_id, b,
         |    $sigCols
         |  FROM sh GROUP BY doc_id, b),
         |bands AS (
         |  $bandRowsSql)
         |SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |FROM bands a JOIN bands x
         |  ON a.band = x.band AND a.band_key = x.band_key
         |WHERE a.b > x.b
         |  AND NOT (a.doc_id % 10 = 0 AND a.doc_id < 1000000)
         |  AND NOT (x.doc_id % 10 = 0 AND x.doc_id < 1000000)
         |ORDER BY new_id, index_id""".stripMargin)
  }

  /** The lexical family's re-ingestion ban gate (q321) — the cell
    * where a leak is WORST: re-appending a purged doc would not just
    * resurface it, it would shift the COLLECTION STATISTICS (+1 to N,
    * its dl to Σdl, its terms' df) and move every OTHER doc's BM25
    * score — a compliance failure that silently degrades ranking for
    * everyone. [[LexIndex.addBans]] commits the durable set;
    * [[graft.streaming.LexStream]] and [[LexIndex.appendDelta]] gate
    * arriving batches so a banned doc's rows AND its stats
    * contribution never commit; probes mask and compactions scrub
    * besides. Judged chain: batch 0 ingests; the purge tombstones +
    * compacts (stats recomputed from survivors) and BANS the ids;
    * batch 0 redelivers (absorbed); batch 1 carries the BACKFILL —
    * the banned ids re-submitted — and is gated to its legit docs;
    * batch 2 then probes a world whose stats and postings must equal
    * the never-re-ingested corpus. A leaked ban hash-mismatches
    * batch 2 twice over: the banned docs rank again, and every
    * surviving score moves with the shifted stats.
    */
  val lexBanGate: Q = {
    val BASE_MAX = 300L; val B0_MAX = 350L; val B1_MAX = 400L
    val B2_MAX = 450L; val K = 3
    def world(i: Int, corpusPred: String, qLo: Long, qHi: Long): String =
      s"""tf$i AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |         FROM tok WHERE $corpusPred GROUP BY 1, 2),
         |dl$i AS (SELECT doc_id, count(*)::BIGINT AS dl
         |         FROM tok WHERE $corpusPred GROUP BY 1),
         |df$i AS (SELECT term, count(*)::BIGINT AS df FROM tf$i GROUP BY 1),
         |st$i AS (SELECT count(*)::BIGINT AS n_docs,
         |           sum(dl)::BIGINT AS sumdl FROM dl$i),
         |qt$i AS (
         |  SELECT DISTINCT doc_id AS query_id, term FROM tok
         |  WHERE doc_id >= $qLo AND doc_id < $qHi),
         |sc$i AS (
         |  SELECT q.query_id, f.doc_id AS index_id,
         |    ${graft.operators.LexIndex.contribSql(
               "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")} AS contrib
         |  FROM tf$i f JOIN qt$i q USING (term) JOIN df$i d USING (term)
         |  JOIN dl$i l ON l.doc_id = f.doc_id CROSS JOIN st$i),
         |ag$i AS (
         |  SELECT query_id, index_id, count(*)::BIGINT AS n_hit,
         |    sum(contrib)::BIGINT AS score
         |  FROM sc$i GROUP BY 1, 2),
         |rk$i AS (
         |  SELECT ag$i.*, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, index_id) AS rnk FROM ag$i)"""
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-ban-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-lex-ban-out", d, Seq("documents.parquet"))
        if (LexIndex.resolve(idxRoot).isEmpty)
          LexIndex.publish(docs.filter(col("doc_id") < BASE_MAX),
            "doc_id", "text", idxRoot)
        val ls = new graft.streaming.LexStream(
          s, idxRoot, outRoot, "doc_id", "text", K)
        val b0 = docs.filter(
          col("doc_id") >= BASE_MAX && col("doc_id") < B0_MAX)
        ls.processBatch(b0, 0)
        if (LexIndex.bans(s, idxRoot).isEmpty) {
          val del = docs.filter(col("doc_id") < B0_MAX &&
            col("doc_id") % 10 === 0).select("doc_id")
          LexIndex.addTombstones(s, del, "doc_id", idxRoot)
          LexIndex.mergeCompact(s, idxRoot)
          // the durable half: survives every later compaction
          LexIndex.addBans(s, del, "doc_id", idxRoot)
        }
        ls.processBatch(b0, 0) // redelivery: absorbed
        // the BACKFILL: batch 1 re-submits the banned ids alongside
        // its legit docs — the gate drops them before probe AND append
        ls.processBatch(
          docs.filter(col("doc_id") >= B0_MAX && col("doc_id") < B1_MAX)
            .unionByName(docs.filter(col("doc_id") < B0_MAX &&
              col("doc_id") % 10 === 0)), 1)
        // batch 2's scores are the leak detector: stats and postings
        // must equal the never-re-ingested world
        ls.processBatch(docs.filter(
          col("doc_id") >= B1_MAX && col("doc_id") < B2_MAX), 2)
        ls.results().orderBy("query_id", "rnk")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents WHERE doc_id < $B2_MAX),
         |tok AS (
         |  SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM w)
         |  WHERE length(t) > 0),
         |${world(0, s"doc_id < $BASE_MAX", BASE_MAX, B0_MAX)},
         |${world(1, s"doc_id < $B0_MAX AND doc_id % 10 <> 0",
             B0_MAX, B1_MAX)},
         |${world(2,
             s"(doc_id < $B0_MAX AND doc_id % 10 <> 0) OR " +
               s"(doc_id >= $B0_MAX AND doc_id < $B1_MAX)",
             B1_MAX, B2_MAX)}
         |SELECT query_id, index_id, n_hit, score, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT * FROM rk0 WHERE rnk <= $K
         |      UNION ALL SELECT * FROM rk1 WHERE rnk <= $K
         |      UNION ALL SELECT * FROM rk2 WHERE rnk <= $K)
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** The novelty family's re-ingestion ban gate (q322) — the cell
    * where MIN-semantics make a leak uniquely sharp: first occurrence
    * is min(doc_id) and GDPR requests skew toward EARLY ids, so a
    * banned early doc re-folded by a backfill would steal
    * first-occurrence back from the survivor the purge REASSIGNED it
    * to — silently flipping shingle ownership corpus-wide long after
    * the compliance ticket closed. [[FirstSeenIndex.addBans]] commits
    * the durable set; [[graft.streaming.NoveltyStream]] and
    * [[FirstSeenIndex.fold]] gate arriving batches, probes mask,
    * compaction scrubs. The judged output is deliberately
    * OWNERSHIP-SENSITIVE: a novelty census (null vs non-null) cannot
    * see a holder flip, so the audit probes a fresh batch and emits
    * per-doc (n_sh, n_seen, sum_seen) — the SUM of holder ids is
    * exactly what a min-steal moves. Oracle: first-occurrence over
    * the never-re-ingested world (base survivors ∪ both stream
    * batches, banned ids absent everywhere).
    */
  val fsBanGate: Q = {
    val S2 = 250L; val B0_MAX = 400L; val B1_MAX = 450L; val A_MAX = 500L
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val purged = col("doc_id") < S2 && col("doc_id") % 10 === 0
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-fs-ban-idx", d, Seq("documents.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-fs-ban-out", d, Seq("documents.parquet"))
        if (FirstSeenIndex.resolve(idxRoot).isEmpty)
          FirstSeenIndex.publish(
            Dedup.shingleSet(
              docs.filter(col("doc_id") < S2), "doc_id", "text", 3),
            idxRoot)
        val ns = new graft.streaming.NoveltyStream(s, idxRoot, outRoot)
        val b0 = Dedup.shingleSet(
          docs.filter(col("doc_id") >= S2 && col("doc_id") < B0_MAX),
          "doc_id", "text", 3)
        ns.processBatch(b0, 0)
        if (FirstSeenIndex.bans(s, idxRoot).isEmpty) {
          val del = docs.filter(purged).select("doc_id")
          FirstSeenIndex.addTombstones(s, del, "doc_id", idxRoot)
          FirstSeenIndex.mergeCompact(s, idxRoot,
            reassignSrc = Some(Dedup.shingleSet(
              docs.filter(col("doc_id") < B0_MAX && !purged),
              "doc_id", "text", 3)))
          // the durable half: survives every later compaction
          FirstSeenIndex.addBans(s, del, "doc_id", idxRoot)
        }
        ns.processBatch(b0, 0) // redelivery: absorbed
        // the BACKFILL: batch 1 re-submits the banned early docs
        // beside its legit batch — the gate drops them before either
        // the census or the fold commits
        ns.processBatch(
          Dedup.shingleSet(
            docs.filter((col("doc_id") >= B0_MAX &&
              col("doc_id") < B1_MAX) || purged),
            "doc_id", "text", 3), 1)
        val audit = FirstSeenIndex.probe(s,
          Dedup.shingleSet(
            docs.filter(col("doc_id") >= B1_MAX &&
              col("doc_id") < A_MAX), "doc_id", "text", 3), idxRoot)
        audit.groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"),
            count("seen_doc").as("n_seen"),
            coalesce(sum("seen_doc"), lit(0L)).as("sum_seen"))
          .orderBy("doc_id")
      },
      s"""WITH w AS (
         |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
         |  FROM documents WHERE doc_id < $A_MAX),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(${TextFunctions.shinglesSql("arr")}) AS s
         |  FROM w),
         |world AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE doc_id < $B1_MAX
         |    AND NOT (doc_id < $S2 AND doc_id % 10 = 0)),
         |fo AS (SELECT s, min(doc_id) AS seen FROM world GROUP BY s),
         |au AS (SELECT doc_id, s FROM sh
         |       WHERE doc_id >= $B1_MAX AND doc_id < $A_MAX)
         |SELECT a.doc_id, count(*)::BIGINT AS n_sh,
         |  count(f.seen)::BIGINT AS n_seen,
         |  coalesce(sum(f.seen), 0)::BIGINT AS sum_seen
         |FROM au a LEFT JOIN fo f USING (s)
         |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)
  }

  /** The ANN family's re-ingestion ban gate (q323) — a deleted
    * user's embedding RE-UPLOADED: q301 closed the redelivery of the
    * SAME tagged batch through `_folded.json`, but a backfill
    * arriving under a FRESH tag is a legitimate new append the ledger
    * cannot absorb — post-compaction (tombstones reset) its banned
    * vectors would re-enter the LSH tables and every later cosine
    * probe would retrieve the forgotten user again.
    * [[SimIndex.addBans]] commits the durable set;
    * [[SimIndex.appendDelta]] gates arriving batches (banned key
    * rows never commit — selectively: legit vectors in the same
    * batch DO serve), probes mask, compaction scrubs. The oracle's
    * index world holds survivors ∪ the backfill's legit vectors and
    * NEVER the banned ids — a leaked gate hash-mismatches the first
    * probe whose query banding collides with a banned vector.
    */
  val simBanGate: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L; val BF_MAX = 420L
    val Q_MAX = 500L; val K = 3
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val banned = emb.filter(
          col("vec_id") < DELTA_MAX && col("vec_id") % 10 === 0)
        val legit = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < BF_MAX)
        val queries = emb.filter(
          col("vec_id") >= BF_MAX && col("vec_id") < Q_MAX)
        val r = VectorFunctions.mtBits(base.count())
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-sim-ban", d, Seq("embeddings.parquet"))
        if (SimIndex.resolve(root).isEmpty)
          SimIndex.publish(base, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), root)
        if (SimIndex.bans(s, root).isEmpty) {
          if (!SimIndex.folded(root, "b0"))
            SimIndex.appendDelta(delta, "vec_id", "embedding", root,
              tag = "b0")
          SimIndex.addTombstones(s, banned.select("vec_id"), "vec_id",
            root)
          SimIndex.mergeCompact(s, root)
          // the durable half: survives the compaction that just
          // reset the tombstones
          SimIndex.addBans(s, banned.select("vec_id"), "vec_id", root)
        }
        // q301's closure: the SAME tag redelivered, absorbed by ledger
        SimIndex.appendDelta(delta, "vec_id", "embedding", root,
          tag = "b0")
        // the BACKFILL under a FRESH tag — the ledger cannot absorb
        // it; only the gate stands between the banned vectors and the
        // LSH tables (their legit batch-mates must still serve)
        SimIndex.appendDelta(banned.unionByName(legit),
          "vec_id", "embedding", root, tag = "bf")
        SimIndex.probeTopK(s, queries, "vec_id", "embedding", K, root)
          .select(col("query_id"), col("index_id"), col("cos_sim"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
         |              WHERE vec_id < $BASE_MAX),
         |params AS (
         |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
         |    ${VectorFunctions.mtTablesSql(VectorFunctions.mtBitsSql("count(*)"))} AS nt
         |  FROM idx0),
         |ie AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE (vec_id < $DELTA_MAX AND vec_id % 10 <> 0)
         |     OR (vec_id >= $DELTA_MAX AND vec_id < $BF_MAX)),
         |iek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM ie),
         |ikb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM iek),
         |qe AS (
         |  SELECT vec_id, embedding,
         |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
         |  FROM embeddings, params
         |  WHERE vec_id >= $BF_MAX AND vec_id < $Q_MAX),
         |qek AS (
         |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
         |  FROM qe),
         |qkb AS (
         |  SELECT vec_id, embedding, tbl,
         |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
         |  FROM qek),
         |scored AS (
         |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
         |    max(round(${VectorFunctions.cosineSql("q.embedding", "kb.embedding")}, 6))
         |      AS cos_sim
         |  FROM qkb q JOIN ikb kb ON q.tbl = kb.tbl AND q.bucket = kb.bucket
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, index_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos_sim DESC, index_id) AS rnk
         |  FROM scored)
         |SELECT query_id, index_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** The PQ family's re-ingestion ban gate (q324) — q323's closure on
    * the COMPRESSED artifact: PQ deltas are UUID-named (no tag, no
    * ledger absorption at all), so EVERY backfill is a fresh append
    * and the gate at [[PqIndex.appendDelta]] is the only thing
    * keeping a deleted user's re-uploaded embedding out of the code
    * table post-compaction. Banned ids are gated at encode time
    * (their code rows never commit; legit batch-mates still serve —
    * encoded with the SAME frozen codebooks), masked at
    * [[PqIndex.probeTopK]], scrubbed at [[PqIndex.mergeCompact]].
    * Oracle: codebooks fit on the base corpus, the index world =
    * survivors ∪ the backfill's legit vectors, banned absent
    * everywhere.
    */
  val pqBanGate: Q = {
    val BASE_MAX = 300L; val DELTA_MAX = 400L; val BF_MAX = 420L
    val Q_MAX = 440L; val K = PQ_K
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE_MAX)
        val delta = emb.filter(
          col("vec_id") >= BASE_MAX && col("vec_id") < DELTA_MAX)
        val banned = emb.filter(
          col("vec_id") < DELTA_MAX && col("vec_id") % 10 === 0)
        val legit = emb.filter(
          col("vec_id") >= DELTA_MAX && col("vec_id") < BF_MAX)
        val queries = emb.filter(
          col("vec_id") >= BF_MAX && col("vec_id") < Q_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-pq-ban", d, Seq("embeddings.parquet"))
        if (PqIndex.resolve(root).isEmpty)
          PqIndex.publish(base, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, root)
        if (PqIndex.bans(s, root).isEmpty) {
          PqIndex.appendDelta(delta, "vec_id", "embedding", root)
          PqIndex.addTombstones(s, banned.select("vec_id"), "vec_id",
            root)
          PqIndex.mergeCompact(s, root)
          PqIndex.addBans(s, banned.select("vec_id"), "vec_id", root)
          // the BACKFILL: banned re-uploads beside legit new vectors
          // — a UUID-named append no ledger can absorb; the encode
          // gate drops exactly the banned ids (committed once, inside
          // this cold block: PQ appends carry no tag to absorb a
          // replay by, so the backfill commits with the ban already
          // durable)
          PqIndex.appendDelta(banned.unionByName(legit),
            "vec_id", "embedding", root)
        }
        PqIndex.probeTopK(s, queries, "vec_id", "embedding", K, root)
          .select(col("query_id"), col("index_id"), col("adc_d2"),
            col("rnk"))
          .orderBy("query_id", "rnk")
      },
      s"""WITH $pqEpCtes,
         |ix AS (SELECT * FROM ep WHERE vec_id < $BASE_MAX),
         |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
         |        WHERE vec_id < $PQ_KS),
         |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
         |enc AS (SELECT * FROM ep
         |        WHERE (vec_id < $DELTA_MAX AND vec_id % 10 <> 0)
         |           OR (vec_id >= $DELTA_MAX AND vec_id < $BF_MAX)),
         |${pqRankCtes("enc",
             s"q.vec_id >= $BF_MAX AND q.vec_id < $Q_MAX")}
         |SELECT query_id, index_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
         |FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
  }

  /** The fleet report, judged (q326) — [[graft.operators
    * .IndexCatalog]] promoted from spec-only to a driver-judged row
    * set (the r13 verdict's missing item #2). A scripted lifecycle
    * chain over three families (dedup, sim, graph) leaves each root
    * in a KNOWN mixed state — publish → delta fold → `purge(ban =
    * true)` cascade (compacts, resets tombstones, lands the durable
    * ban) → one more pending delta + one uncompacted tombstone set —
    * and the report's six counters per family are judged against a
    * DuckDB replay: nRows recomputed RELATIONALLY from the same
    * parquet tables (docs×bands for the banded signatures, vecs×T for
    * the LSH key rows, 2 layouts × surviving symmetric chain pairs
    * for the graph twins — the oracle knows the families' row
    * arithmetic, so a count drift in any artifact layout breaks the
    * hash), tombstone/ban counts as the deletion slices' sizes, and
    * the lifecycle counts (generations, pending deltas, folded tags)
    * as the scripted chain's invariants. The report itself is
    * metadata-scale: parquet FOOTER sums + listings, zero Spark jobs
    * ([[graft.operators.ParquetFooters]]).
    */
  val indexCatalogReport: Q = {
    val BITS = 8; val TABLES = 4; val VOFF = 10000000L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.PurgeCascade
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-catalog", d,
          Seq("documents.parquet", "embeddings.parquet"))
        val dRoot = s"$root/dedup"; val sRoot = s"$root/sim"
        val gRoot = s"$root/graph"
        // doc i chained to its source's k-th next doc — the q290
        // graph world, where node ids share the deletion id space
        def chain(k: Int) = {
          val ge = t(s, d, "documents")
            .select(col("doc_id"), col("source"))
            .withColumn("nxt", lead("doc_id", k)
              .over(Window.partitionBy("source").orderBy("doc_id")))
            .filter(col("nxt").isNotNull)
            .select(col("doc_id").as("u"), col("nxt").as("v"))
          ge.select(col("u").as("src"), col("v").as("dst"),
              lit(1L).as("w"))
            .unionByName(ge.select(col("v").as("src"),
              col("u").as("dst"), lit(1L).as("w")))
        }
        val targets = Seq(
          PurgeCascade.dedup(dRoot, "id"),
          PurgeCascade.sim(sRoot, "id"),
          PurgeCascade.graph(gRoot, "id"))
        if (DedupIndex.resolve(dRoot).isEmpty) {
          DedupIndex.publish(
            Dedup.minhashSignatures(docs, "doc_id", "text", MH_K),
            "doc_id", MH_BANDS, MH_R, dRoot)
          SimIndex.publish(emb.filter(col("vec_id") % 4 < 3),
            "vec_id", "embedding", BITS, TABLES, sRoot)
          GraphIndex.publish(chain(1), gRoot)
          // one folded delta each for the foldable families
          SimIndex.appendDelta(emb.filter(col("vec_id") % 4 === 3),
            "vec_id", "embedding", sRoot, tag = "b0")
          GraphIndex.fold(s, chain(2), gRoot, tag = "b0")
          // the compliance event: purge + durable ban of a doc slice,
          // compacting all three (consumes the deltas into the
          // _folded ledgers, resets tombstones, retention keeps 2
          // committed generations)
          PurgeCascade.purge(s,
            docs.filter(col("doc_id") % 10 === 3)
              .select(col("doc_id").as("id")),
            targets, ban = true)
          // post-cascade operational residue the report must surface:
          // a LIVE delta on each foldable family and a pending
          // (uncompacted) tombstone set on all three
          SimIndex.appendDelta(emb.filter(col("vec_id") % 4 === 3)
              .select((col("vec_id") + VOFF).as("vec_id"),
                col("embedding")),
            "vec_id", "embedding", sRoot, tag = "post")
          GraphIndex.fold(s, chain(3), gRoot, tag = "post")
          val t2 = docs.filter(col("doc_id") % 10 === 4)
          DedupIndex.addTombstones(s, t2, "doc_id", dRoot)
          SimIndex.addTombstones(s, t2.withColumnRenamed(
            "doc_id", "vec_id"), "vec_id", sRoot)
          GraphIndex.addTombstones(s, t2.withColumnRenamed(
            "doc_id", "node"), "node", gRoot)
        }
        import s.implicits._
        IndexCatalog.reportTargets(s, targets)
          .map(e => (e.family, e.nGenerations.toLong,
            e.nPendingDeltas.toLong, e.nFoldedTags.toLong,
            e.nTombstones, e.nBans, e.nRows))
          .toDF("family", "n_gens", "n_pending", "n_folded",
            "n_tomb", "n_bans", "n_rows")
          .orderBy("family")
      },
      s"""WITH p AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 3),
         |nb AS (SELECT count(*)::BIGINT AS n FROM p),
         |nt AS (SELECT count(*)::BIGINT AS n FROM documents
         |       WHERE doc_id % 10 = 4),
         |ded AS (SELECT count(*)::BIGINT * $MH_BANDS AS n
         |        FROM documents WHERE doc_id % 10 <> 3),
         |simv AS (SELECT count(*)::BIGINT * $TABLES AS n FROM embeddings
         |         WHERE NOT (vec_id % 10 = 3
         |                    AND vec_id IN (SELECT doc_id FROM p))),
         |ch AS (
         |  SELECT u, v FROM (
         |    SELECT doc_id AS u, lead(doc_id, 1) OVER
         |      (PARTITION BY source ORDER BY doc_id) AS v
         |    FROM documents) c1
         |  WHERE v IS NOT NULL
         |  UNION
         |  SELECT u, v FROM (
         |    SELECT doc_id AS u, lead(doc_id, 2) OVER
         |      (PARTITION BY source ORDER BY doc_id) AS v
         |    FROM documents) c2
         |  WHERE v IS NOT NULL),
         |sym AS (SELECT u AS src, v AS dst FROM ch
         |        UNION SELECT v, u FROM ch),
         |gsurv AS (SELECT count(*)::BIGINT * 2 AS n FROM sym
         |          WHERE src NOT IN (SELECT doc_id FROM p)
         |            AND dst NOT IN (SELECT doc_id FROM p))
         |SELECT * FROM (
         |  SELECT 'dedup' AS family, 2::BIGINT AS n_gens,
         |    0::BIGINT AS n_pending, 0::BIGINT AS n_folded,
         |    (SELECT n FROM nt) AS n_tomb, (SELECT n FROM nb) AS n_bans,
         |    (SELECT n FROM ded) AS n_rows
         |  UNION ALL
         |  SELECT 'graph', 2::BIGINT, 1::BIGINT, 1::BIGINT,
         |    (SELECT n FROM nt), (SELECT n FROM nb), (SELECT n FROM gsurv)
         |  UNION ALL
         |  SELECT 'sim', 2::BIGINT, 1::BIGINT, 1::BIGINT,
         |    (SELECT n FROM nt), (SELECT n FROM nb), (SELECT n FROM simv))
         |ORDER BY family""".stripMargin)
  }

  /** Graph-structure ANN (q327) — the NSW/HNSW-family serving shape
    * the similarity stack lacked, composed from two committed
    * families (the q282 doctrine): a kNN EDGE artifact built from
    * coarse-quantizer candidates into a [[graft.operators
    * .GraphIndex]], served by GREEDY BEAM SEARCH as iterated
    * bucket-pruned `neighbors` probes.
    *
    * Build (cold, once per embeddings fingerprint): fit the q53/q274
    * coarse codebook ([[graft.operators.VectorQuantizer]], exact
    * integers), take same-cell pairs as candidates — the IVF
    * composition; at 100 TB the candidate source is the committed
    * PqIndex/SimIndex, never all-pairs — score them with the fused
    * integer L2, keep each node's [[q327 M_KNN]] nearest, symmetrize
    * (NSW graphs are undirected for reachability), publish with
    * w = 1.
    *
    * Serve (per query batch): entry points = a fixed id slice; each
    * of [[q327 ROUNDS]] rounds probes the CURRENT beam's
    * out-neighborhoods through the artifact (frontier-sized,
    * bucket-pruned, ProbeCache-materialized — the khop discipline),
    * scores only the NEWLY discovered nodes exactly (candidate-linear
    * — greedy search with full-precision rescoring, the flat-vector
    * HNSW mode), and keeps the best `beam` as the next frontier.
    * Judged: recall@10 vs the exact brute-force truth at beams 4 and
    * 8 — the graph-serving counterpart of q274's nprobe/recall curve
    * (its comparator: nprobe=1/2/4 at the same corpus), with the
    * whole pipeline — Lloyd rounds, kNN edges, three beam rounds,
    * truth — replayed relationally by the oracle.
    */
  val knnGraphAnn: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L; val NQ = Q_MAX - INDEX_MAX
    val M_KNN = 6; val ROUNDS = 3; val K = 10; val BEAMS = Seq(4, 8)
    val ENT_MOD = 50L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val eAll = VectorQuantizer.scaled(
          emb.filter(col("vec_id") < Q_MAX), "vec_id", "embedding")
          .persist()
        val eIdx = eAll.filter(col("vec_id") < INDEX_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-knn-graph", d, Seq("embeddings.parquet"))
        if (GraphIndex.resolve(root).isEmpty) {
          val cent = VectorQuantizer.fitCentroids(
            eIdx, "vec_id", KM_C, KM_ITERS)
          val cells = VectorQuantizer.assignCells(eIdx, cent, "vec_id")
          val xs = eIdx.select(col("vec_id"), col("xs"))
          val pairs = cells.as("a")
            .join(cells.as("b"), col("a.cell") === col("b.cell") &&
              col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
            .join(xs.select(col("vec_id").as("u"), col("xs").as("xu")), "u")
            .join(xs.select(col("vec_id").as("v"), col("xs").as("xv")), "v")
            .select(col("u"), col("v"),
              VectorQuantizer.l2DistSq(col("xu"), col("xv")).as("d2"))
          val knn = pairs.withColumn("rnk", row_number().over(
              Window.partitionBy("u").orderBy(col("d2"), col("v"))))
            .filter(col("rnk") <= M_KNN)
            .select(col("u"), col("v"))
          GraphIndex.publish(
            knn.select(col("u").as("src"), col("v").as("dst"))
              .unionByName(knn.select(col("v").as("src"),
                col("u").as("dst")))
              .distinct()
              .withColumn("w", lit(1L)),
            root)
        }
        val qxs = eAll.filter(col("vec_id") >= INDEX_MAX)
          .select(col("vec_id").as("query_id"), col("xs").as("qx"))
        val ixs = eIdx.select(col("vec_id").as("node"), col("xs").as("nx"))
        def score(cand: DataFrame): DataFrame =
          cand.join(ixs, "node").join(qxs, "query_id")
            .select(col("query_id"), col("node"),
              VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2"))
        def topPerQuery(scored: DataFrame, n: Int): DataFrame =
          scored.withColumn("rnk", row_number().over(
              Window.partitionBy("query_id").orderBy(col("d2"), col("node"))))
            .filter(col("rnk") <= n)
            .select(col("query_id"), col("node"))
        val truth = topPerQuery(
          qxs.crossJoin(ixs).select(col("query_id"), col("node"),
            VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2")), K)
          .withColumn("hit", lit(1L))
        val entries = ixs.filter(col("node") % ENT_MOD === 0)
          .select("node")
        def beam(b: Int): DataFrame = {
          var (visited, frontier) =
            beamStage(score(qxs.select("query_id").crossJoin(entries)), b)
          for (_ <- 1 to ROUNDS) {
            if (!frontier.isEmpty) {
              val nb = GraphIndex.neighbors(s, frontier, root)
              val fresh = nb
                .select(col("query_id"), col("nbr").as("node")).distinct()
                .join(visited.select("query_id", "node"),
                  Seq("query_id", "node"), "left_anti")
              val (newV, newF) = beamStage(score(fresh), b)
              // pieces are lineage-free — plain union (khop's rule)
              visited = visited.unionByName(newV)
              frontier = newF
            }
          }
          topPerQuery(visited, K).withColumn("beam", lit(b.toLong))
        }
        concurrently(BEAMS.map(b => () => beam(b))).reduce(_.unionByName(_))
          .join(truth, Seq("query_id", "node"), "left")
          .groupBy("beam")
          .agg(count(lit(1)).as("n_pairs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * K})"))
          .orderBy("beam")
      }, {
        // one beam arm's unrolled rounds: v0/f0 from the entry set,
        // then per round r the fresh frontier n_r (neighbors of
        // f_{r-1} not yet visited), the visited union v_r, and the
        // next beam f_r — all scored off the shared qd table
        def beamCtes(b: Int): String = {
          val rounds = (1 to ROUNDS).map { r =>
            s"""n$r$b AS (
               |  SELECT DISTINCT f.query_id, g.dst AS node
               |  FROM f${r - 1}$b f JOIN g ON g.src = f.node
               |  WHERE NOT EXISTS (SELECT 1 FROM v${r - 1}$b v
               |                    WHERE v.query_id = f.query_id
               |                      AND v.node = g.dst)),
               |v$r$b AS (
               |  SELECT query_id, node, d2 FROM v${r - 1}$b
               |  UNION ALL
               |  SELECT n.query_id, n.node, q.d2
               |  FROM n$r$b n JOIN qd q
               |    ON q.query_id = n.query_id AND q.node = n.node),
               |f$r$b AS (
               |  SELECT query_id, node FROM (
               |    SELECT n.query_id, n.node,
               |      row_number() OVER (PARTITION BY n.query_id
               |                         ORDER BY q.d2, n.node) AS rnk
               |    FROM n$r$b n JOIN qd q
               |      ON q.query_id = n.query_id AND q.node = n.node) z
               |  WHERE rnk <= $b)""".stripMargin
          }.mkString(",\n")
          s"""v0$b AS (
             |  SELECT qd.query_id, qd.node, qd.d2
             |  FROM qd JOIN ent ON qd.node = ent.node),
             |f0$b AS (
             |  SELECT query_id, node FROM (
             |    SELECT query_id, node,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY d2, node) AS rnk
             |    FROM v0$b) z WHERE rnk <= $b),
             |$rounds,
             |res$b AS (
             |  SELECT $b AS beam, query_id, node FROM (
             |    SELECT query_id, node,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY d2, node) AS rnk
             |    FROM v$ROUNDS$b) z WHERE rnk <= $K)""".stripMargin
        }
        s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $INDEX_MAX")},
           |fa AS (
           |  SELECT e.vec_id, c.cell,
           |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
           |  FROM e JOIN c$KM_ITERS c USING (dim)
           |  WHERE e.vec_id < $INDEX_MAX
           |  GROUP BY e.vec_id, c.cell),
           |ca AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT vec_id, cell,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY d2, cell) AS rnk
           |    FROM fa) z WHERE rnk = 1),
           |pd AS (
           |  SELECT a.vec_id AS u, b.vec_id AS v,
           |    sum((ea.xs - eb.xs) * (ea.xs - eb.xs)) AS d2
           |  FROM ca a JOIN ca b ON a.cell = b.cell
           |    AND a.vec_id <> b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
           |  GROUP BY 1, 2),
           |knn AS (
           |  SELECT u, v FROM (
           |    SELECT u, v,
           |      row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rnk
           |    FROM pd) z WHERE rnk <= $M_KNN),
           |g AS (SELECT u AS src, v AS dst FROM knn
           |      UNION SELECT v, u FROM knn),
           |qd AS (
           |  SELECT q.vec_id AS query_id, x.vec_id AS node,
           |    sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
           |  FROM e q JOIN e x ON q.dim = x.dim AND x.vec_id < $INDEX_MAX
           |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY d2, node) AS rnk
           |    FROM qd) z WHERE rnk <= $K),
           |ent AS (SELECT DISTINCT vec_id AS node FROM e
           |        WHERE vec_id < $INDEX_MAX AND vec_id % $ENT_MOD = 0),
           |${BEAMS.map(beamCtes).mkString(",\n")},
           |allres AS (${BEAMS.map(b => s"SELECT * FROM res$b")
                .mkString("\n  UNION ALL ")})
           |SELECT r.beam::BIGINT AS beam, count(*)::BIGINT AS n_pairs,
           |  sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           |    AS n_hit,
           |  (sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
           |    * 1000000 // ${NQ * K})::BIGINT AS recall_ppm
           |FROM allres r LEFT JOIN truth t
           |  ON t.query_id = r.query_id AND t.node = r.node
           |GROUP BY r.beam ORDER BY beam""".stripMargin
      })
  }

  /** Perceptual media fingerprints (q328) — the robustness tier the
    * exact-hash media dedup (q93/q287/q303) provably lacks: those
    * fingerprint sampled frames by EXACT bytes, so a re-encoded or
    * intensity-shifted copy defeats them. This query builds REAL BMP
    * bytes per media ([[graft.multimodal.Multimodal.bmpBytes]], the
    * q248 encoder), DECODES the pixel grid back from the bytes alone
    * (bottom-up rows, stride padding, B/G/R order — the q248 reader),
    * and computes an AVERAGE-HASH over the decoded grid: per-pixel
    * integer luma, thresholded against the image mean (the classic
    * aHash), packed into one int64. A constant intensity shift moves
    * every luma AND the mean equally, so the comparison
    * `luma·n > Σluma` — kept in exact integer cross-multiplied form,
    * no division — is INVARIANT under it: the shifted copy pairs
    * under aHash while its bytes (and byte-checksum fingerprint)
    * differ in every pixel. Judged per arm: block-pair mass
    * (Σ n·(n−1)/2 over fingerprint blocks — aggregated, never
    * materialized, so a coarse hash can't explode the plan) and the
    * two copy-tier pairing counts — the exact arm pairs only the
    * byte-identical tier (shifted = 0, the provable miss), the
    * perceptual arm pairs BOTH. Oracle replays the pixel rule, both
    * fingerprints and the block arithmetic relationally; at 100 TB
    * the shape is one decode pass + two media-keyed aggregations —
    * the q93 family's cost envelope with a second fingerprint column.
    */
  /** BMP grid height shared by the perceptual-media queries
    * (q328/q329).
    */
  private val PH_H = 4

  /** Decoded BMP pixel grid of a media frame (media_id, orig_id,
    * text, shift, w): encode REAL bytes via
    * [[graft.multimodal.Multimodal.bmpBytes]] (the q248 encoder),
    * then read every pixel back from the BYTES alone (bottom-up rows,
    * stride padding, B/G/R order — the q248 reader). Output one row
    * per pixel: (media_id, orig_id, wp, r, c, p, b, g, rr, luma).
    * Shared by the perceptual fingerprint (q328) and the persisted
    * perceptual media index (q329).
    */
  private def bmpGrid(media: DataFrame, sc: Column = lit(1L)): DataFrame = {
    // `sc` is a horizontal upscale factor (pixel replication: output
    // column c shows source column ⌊c/sc⌋ of the w-wide base image) —
    // the q336 scaled-copy generator; the default 1 is a no-op and
    // keeps the q328/q329 grids byte-identical
    def pixel(r: Column, c: Column): (Column, Column, Column) = {
      val cs = floor(c / sc).cast("long")
      val cp = ascii(col("text").substr(
        (pmod(r * col("w") + cs, length(col("text")).cast("long")) + 1)
          .cast("int"), lit(1)))
      (cp % 64 + 10 + col("shift"), cp % 32 + 20 + col("shift"),
        cp % 16 + 30 + col("shift"))
    }
    media.select(col("media_id"), col("orig_id"),
        Multimodal.bmpBytes(col("w") * sc, lit(PH_H.toLong), pixel)
          .as("bmp"))
      .select(col("media_id"), col("orig_id"), col("bmp"),
        Multimodal.leRead(col("bmp"), lit(19), 4).as("wp"),
        Multimodal.leRead(col("bmp"), lit(23), 4).as("hp"))
      .withColumn("row_size", shiftright(col("wp") * 3 + 3, 2) * 4)
      .select(col("media_id"), col("orig_id"), col("bmp"), col("wp"),
        col("hp"), col("row_size"),
        explode(sequence(lit(0L), col("hp") - 1)).as("r"))
      .select(col("media_id"), col("orig_id"), col("bmp"), col("wp"),
        col("r"),
        (lit(54L) + (col("hp") - 1 - col("r")) * col("row_size"))
          .as("row_base"),
        explode(sequence(lit(0L), col("wp") - 1)).as("c"))
      .select(col("media_id"), col("orig_id"), col("wp"), col("r"),
        col("c"),
        (col("r") * col("wp") + col("c")).as("p"),
        Multimodal.leRead(col("bmp"),
          col("row_base") + col("c") * 3 + 1, 1).as("b"),
        Multimodal.leRead(col("bmp"),
          col("row_base") + col("c") * 3 + 2, 1).as("g"),
        Multimodal.leRead(col("bmp"),
          col("row_base") + col("c") * 3 + 3, 1).as("rr"))
      .withColumn("luma", col("rr") * 2 + col("g") * 5 + col("b"))
  }

  val perceptualHash: Q = {
    val H = PH_H; val C1 = 1000000L; val C2 = 2000000L; val SH = 8L
    Q(
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= 1)
        // three tiers off one corpus: originals, byte-identical
        // copies (%8==1), intensity-shifted copies (%8==2 — every
        // channel +SH; channel maxima 73/51/45 keep +8 clamp-free)
        val media = base
          .select(col("doc_id").as("media_id"), col("doc_id").as("orig_id"),
            col("text"), lit(0L).as("shift"))
          .unionByName(base.filter(col("doc_id") % 8 === 1)
            .select((col("doc_id") + C1).as("media_id"),
              col("doc_id").as("orig_id"), col("text"), lit(0L).as("shift")))
          .unionByName(base.filter(col("doc_id") % 8 === 2)
            .select((col("doc_id") + C2).as("media_id"),
              col("doc_id").as("orig_id"), col("text"), lit(SH).as("shift")))
          .withColumn("w", lit(3L) + col("orig_id") % 5)
        // decoded pixel grid — from the BYTES, not the generator
        val grid = bmpGrid(media).persist()
        val stats = grid.groupBy("media_id", "orig_id", "wp")
          .agg(sum("luma").as("luma_sum"), count(lit(1)).as("n_px"),
            sum((col("p") + 1) *
              (col("b") + col("g") * 256 + col("rr") * 65536))
              .as("fp_exact"))
        val fps = grid.select(col("media_id"), col("p"), col("luma"))
          .join(stats.select(col("media_id"), col("luma_sum"),
            col("n_px")), "media_id")
          .groupBy("media_id")
          .agg(sum(when(col("luma") * col("n_px") > col("luma_sum"),
            expr("shiftleft(cast(1 as bigint), cast(p as int))"))
            .otherwise(lit(0L)))
            .as("ahash"))
          .join(stats, "media_id")
          .select(col("media_id"), col("orig_id"), col("wp"),
            col("fp_exact"), col("ahash"))
          .persist()
        def arm(name: String, fp: Column): DataFrame = {
          val keyed = fps.select(col("media_id"), col("orig_id"),
            col("wp"), fp.as("fp"))
          val blockPairs = keyed.groupBy("wp", "fp")
            .agg(count(lit(1)).as("n"))
            .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
              .as("n_block_pairs"))
          val orig = keyed.filter(col("media_id") < C1)
            .select(col("orig_id"), col("fp").as("fp_o"))
          def copied(off: Long) = keyed
            .filter(col("media_id") >= off && col("media_id") < off + C1)
            .select(col("orig_id"), col("fp").as("fp_c"))
            .join(orig, "orig_id")
            .agg(coalesce(sum(when(col("fp_c") === col("fp_o"), 1L)
              .otherwise(0L)), lit(0L)))
          blockPairs.crossJoin(copied(C1).toDF("n_copy_exact"))
            .crossJoin(copied(C2).toDF("n_copy_shifted"))
            .select(lit(name).as("arm"), col("n_block_pairs"),
              col("n_copy_exact"), col("n_copy_shifted"))
        }
        arm("1_exact", col("fp_exact"))
          .unionByName(arm("2_ahash", col("ahash")))
          .orderBy("arm")
      },
      s"""WITH d0 AS (SELECT doc_id, text FROM documents
         |            WHERE length(text) >= 1),
         |m AS (
         |  SELECT doc_id AS media_id, doc_id AS orig_id, text,
         |    0::BIGINT AS shift FROM d0
         |  UNION ALL
         |  SELECT doc_id + $C1, doc_id, text, 0::BIGINT FROM d0
         |  WHERE doc_id % 8 = 1
         |  UNION ALL
         |  SELECT doc_id + $C2, doc_id, text, $SH::BIGINT FROM d0
         |  WHERE doc_id % 8 = 2),
         |p0 AS (SELECT media_id, orig_id, text, shift,
         |         (3 + orig_id % 5)::BIGINT AS w FROM m),
         |g AS (SELECT media_id, orig_id, text, shift, w,
         |        unnest(range(0, $H::BIGINT)) AS r FROM p0),
         |gc AS (SELECT media_id, orig_id, text, shift, w, r,
         |         unnest(range(0, w)) AS c FROM g),
         |px AS (
         |  SELECT media_id, orig_id, w, r * w + c AS p,
         |    ascii(substring(text,
         |      ((r * w + c) % length(text) + 1)::INT, 1)) AS cp,
         |    shift
         |  FROM gc),
         |pv AS (
         |  SELECT media_id, orig_id, w, p,
         |    cp % 64 + 10 + shift AS b, cp % 32 + 20 + shift AS gg,
         |    cp % 16 + 30 + shift AS rr
         |  FROM px),
         |lm AS (SELECT media_id, orig_id, w, p,
         |         rr * 2 + gg * 5 + b AS luma, b, gg, rr FROM pv),
         |st AS (
         |  SELECT media_id, orig_id, w,
         |    sum(luma)::BIGINT AS luma_sum, count(*)::BIGINT AS n_px,
         |    sum((p + 1) * (b + gg * 256 + rr * 65536))::BIGINT AS fp_exact
         |  FROM lm GROUP BY 1, 2, 3),
         |fp AS (
         |  SELECT l.media_id, st.orig_id, st.w, st.fp_exact,
         |    sum(CASE WHEN l.luma * st.n_px > st.luma_sum
         |             THEN (1::BIGINT << l.p::INT) ELSE 0 END)::BIGINT
         |      AS ahash
         |  FROM lm l JOIN st ON l.media_id = st.media_id
         |  GROUP BY 1, 2, 3, 4),
         |arms AS (
         |  SELECT '1_exact' AS arm, media_id, orig_id, w,
         |    fp_exact AS fp FROM fp
         |  UNION ALL
         |  SELECT '2_ahash', media_id, orig_id, w, ahash FROM fp),
         |bp AS (
         |  SELECT arm, coalesce(sum(n * (n - 1) // 2), 0)::BIGINT
         |      AS n_block_pairs
         |  FROM (SELECT arm, w, fp, count(*)::BIGINT AS n
         |        FROM arms GROUP BY 1, 2, 3) z
         |  GROUP BY arm),
         |cp AS (
         |  SELECT o.arm,
         |    coalesce(sum(CASE WHEN c.media_id >= $C1
         |        AND c.media_id < ${2 * C1}
         |        AND c.fp = o.fp THEN 1 ELSE 0 END), 0)::BIGINT
         |      AS n_copy_exact,
         |    coalesce(sum(CASE WHEN c.media_id >= $C2
         |        AND c.fp = o.fp THEN 1 ELSE 0 END), 0)::BIGINT
         |      AS n_copy_shifted
         |  FROM arms o JOIN arms c
         |    ON c.arm = o.arm AND c.orig_id = o.orig_id
         |      AND c.media_id >= $C1
         |  WHERE o.media_id < $C1
         |  GROUP BY o.arm)
         |SELECT bp.arm, bp.n_block_pairs, cp.n_copy_exact,
         |  cp.n_copy_shifted
         |FROM bp JOIN cp ON bp.arm = cp.arm
         |ORDER BY bp.arm""".stripMargin)
  }

  /** PERSISTED perceptual media index (q329) — q328's robustness
    * tier promoted into the index family: the q287 media index's
    * element universe swapped from exact frame bytes (which an
    * intensity shift defeats) to PER-ROW perceptual hashes of the
    * decoded BMP grid. Each media item's element set is its
    * [[PH_H]] row-wise average-hashes (per-row luma thresholded
    * against the ROW mean in cross-multiplied integer form — the
    * q328 invariance argument, row-local), minhash-banded into the
    * SAME [[graft.operators.DedupIndex]] lifecycle — publish once,
    * bucket-pruned probe, tombstone/compact/ban all inherited, zero
    * new index machinery (the q287 doctrine). The judged probe batch
    * mixes intensity-shifted copies of indexed media (ZERO shared
    * bytes with their originals — the exact-byte q287 index provably
    * cannot pair them; their row-hash sets are IDENTICAL, so the
    * perceptual index must) with genuinely new documents; candidates
    * are verified by true shared-row-hash count ≥ 3 of 4. Oracle
    * replays pixels → row hashes → minhash → bands → NEW×INDEX
    * collisions → verification from the raw table. Scale shape =
    * q287's: one decode pass per batch, banded signatures, candidate
    * joins bucket-pruned through the committed artifact.
    */
  val mediaPerceptualIndex: Q = {
    val INDEX_MAX = 400L; val COPY = 1000000L; val SH = 8L
    val MIN_SHARED = 3L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= 1)
        def mediaOf(df: DataFrame, off: Long, shift: Long) =
          df.select((col("doc_id") + off).as("media_id"),
              col("doc_id").as("orig_id"), col("text"),
              lit(shift).as("shift"))
            .withColumn("w", lit(3L) + col("orig_id") % 5)
        val idxM = mediaOf(docs.filter(col("doc_id") < INDEX_MAX), 0, 0)
        val probeM = mediaOf(
            docs.filter(col("doc_id") < INDEX_MAX &&
              col("doc_id") % 8 === 2), COPY, SH)
          .unionByName(mediaOf(docs.filter(col("doc_id") >= INDEX_MAX),
            0, 0))
        // the element set: one perceptual hash per image row —
        // (doc_id, "wp:r:rowhash") strings, the modality-free input
        // minhash banding needs
        def rowSets(m: DataFrame): DataFrame = {
          val g = bmpGrid(m)
          val rs = g.groupBy("media_id", "r")
            .agg(sum("luma").as("lsum"), count(lit(1)).as("n"))
          g.join(rs, Seq("media_id", "r"))
            .groupBy(col("media_id").as("doc_id"), col("wp"), col("r"))
            .agg(sum(when(col("luma") * col("n") > col("lsum"),
              expr("shiftleft(cast(1 as bigint), cast(c as int))"))
              .otherwise(lit(0L))).as("rh"))
            .select(col("doc_id"),
              concat_ws(":", col("wp"), col("r"), col("rh")).as("s"))
        }
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-media-phash", d, Seq("documents.parquet"))
        if (DedupIndex.resolve(root).isEmpty)
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(rowSets(idxM), "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, root)
        // the probe batch's row sets feed BOTH the signature banding
        // and the verification join — one decode pass, not two
        val probeSets = rowSets(probeM).persist()
        val cand = DedupIndex.probe(s,
          Dedup.minhashSignaturesOfSets(probeSets, "doc_id", "s", MH_K),
          "doc_id", MH_BANDS, MH_R, root)
        cand
          .join(probeSets.withColumnRenamed("doc_id", "new_id"),
            Seq("new_id"))
          .join(rowSets(idxM).withColumnRenamed("doc_id", "index_id"),
            Seq("index_id", "s"))
          .groupBy("new_id", "index_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MIN_SHARED)
          .orderBy("new_id", "index_id")
      },
      s"""WITH d0 AS (SELECT doc_id, text FROM documents
         |            WHERE length(text) >= 1),
         |corpus AS (
         |  SELECT doc_id AS media_id, doc_id AS orig_id, text,
         |    0::BIGINT AS shift, 0 AS is_new
         |  FROM d0 WHERE doc_id < $INDEX_MAX
         |  UNION ALL
         |  SELECT doc_id + $COPY, doc_id, text, $SH::BIGINT, 1
         |  FROM d0 WHERE doc_id < $INDEX_MAX AND doc_id % 8 = 2
         |  UNION ALL
         |  SELECT doc_id, doc_id, text, 0::BIGINT, 1
         |  FROM d0 WHERE doc_id >= $INDEX_MAX),
         |p0 AS (SELECT media_id, orig_id, text, shift, is_new,
         |         (3 + orig_id % 5)::BIGINT AS w FROM corpus),
         |g AS (SELECT media_id, text, shift, is_new, w,
         |        unnest(range(0, $PH_H::BIGINT)) AS r FROM p0),
         |gc AS (SELECT media_id, text, shift, is_new, w, r,
         |         unnest(range(0, w)) AS c FROM g),
         |pv AS (
         |  SELECT media_id, is_new, w, r, c,
         |    ascii(substring(text,
         |      ((r * w + c) % length(text) + 1)::INT, 1)) AS cp,
         |    shift
         |  FROM gc),
         |lm AS (
         |  SELECT media_id, is_new, w, r, c,
         |    (cp % 16 + 30 + shift) * 2 + (cp % 32 + 20 + shift) * 5 +
         |      (cp % 64 + 10 + shift) AS luma
         |  FROM pv),
         |rsum AS (
         |  SELECT media_id, r, sum(luma)::BIGINT AS lsum,
         |    count(*)::BIGINT AS n
         |  FROM lm GROUP BY 1, 2),
         |rh AS (
         |  SELECT l.media_id, any_value(l.is_new) AS is_new,
         |    any_value(l.w) AS w, l.r,
         |    sum(CASE WHEN l.luma * rs.n > rs.lsum
         |             THEN (1::BIGINT << l.c::INT) ELSE 0 END)::BIGINT
         |      AS rhash
         |  FROM lm l JOIN rsum rs
         |    ON rs.media_id = l.media_id AND rs.r = l.r
         |  GROUP BY l.media_id, l.r),
         |el AS (
         |  SELECT media_id AS doc_id, is_new,
         |    (w::VARCHAR || ':' || r::VARCHAR || ':' || rhash::VARCHAR)
         |      AS s
         |  FROM rh),
         |sig AS (
         |  SELECT doc_id, is_new,
         |    $sigCols
         |  FROM el GROUP BY doc_id, is_new),
         |bands AS (
         |  $bandRowsSql),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |  FROM bands a JOIN bands x
         |    ON a.band = x.band AND a.band_key = x.band_key
         |  WHERE a.is_new = 1 AND x.is_new = 0)
         |SELECT c.new_id, c.index_id, count(*)::BIGINT AS n_shared
         |FROM cand c
         |JOIN el a ON a.doc_id = c.new_id
         |JOIN el x ON x.doc_id = c.index_id AND x.s = a.s
         |GROUP BY 1, 2
         |HAVING count(*) >= $MIN_SHARED
         |ORDER BY new_id, index_id""".stripMargin)
  }

  /** Graph-ANN purge closure (q331) — the compliance burden of the
    * q327 serving path: when a vector's owner is forgotten, the kNN
    * graph must forget it BOTH as a retrievable result AND as a
    * ROUTING hop (an edge through a purged node would keep steering
    * queries by a deleted user's data). The chain: build the q327
    * kNN artifact on the full corpus, tombstone a vector slice
    * (including one ENTRY point), compact with the bucket-local
    * [[GraphIndex.purgeCompact]] (q330's surgical rewrite — every
    * incident edge physically gone, both twins), then run the SAME
    * beam search against the compacted generation. Judged: recall@10
    * vs the SURVIVOR truth at beam 8 plus an explicit
    * served-purged-ids counter (structurally zero — the artifact has
    * no row to discover them through, and the purged entry simply
    * drops from round 0). The oracle replays the full-corpus kNN
    * build, masks T's incident edges (exactly the physical drop),
    * masks the entry set, and re-walks the three beam rounds — a
    * routing difference on either side breaks the hash.
    */
  val knnGraphPurge: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L; val NQ = Q_MAX - INDEX_MAX
    val M_KNN = 6; val ROUNDS = 3; val K = 10; val B = 8
    val ENT_MOD = 50L
    // the deletion slice: a 4% id rule PLUS entry node 100 (so the
    // entry-point drop is exercised, not just leaf retrieval)
    val delSql = "(vec_id % 25 = 7 OR vec_id = 100)"
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def isDel(c: Column): Column = c % 25 === 7 || c === 100
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val eAll = VectorQuantizer.scaled(
          emb.filter(col("vec_id") < Q_MAX), "vec_id", "embedding")
          .persist()
        val eIdx = eAll.filter(col("vec_id") < INDEX_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-knn-purge", d, Seq("embeddings.parquet"))
        if (GraphIndex.resolve(root).isEmpty) {
          // the q327 build, on the FULL pre-purge corpus (edges are
          // frozen-as-built; the purge drops incident rows, it never
          // re-derives the graph — the family rule)
          val cent = VectorQuantizer.fitCentroids(
            eIdx, "vec_id", KM_C, KM_ITERS)
          val cells = VectorQuantizer.assignCells(eIdx, cent, "vec_id")
          val xs = eIdx.select(col("vec_id"), col("xs"))
          val pairs = cells.as("a")
            .join(cells.as("b"), col("a.cell") === col("b.cell") &&
              col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
            .join(xs.select(col("vec_id").as("u"), col("xs").as("xu")), "u")
            .join(xs.select(col("vec_id").as("v"), col("xs").as("xv")), "v")
            .select(col("u"), col("v"),
              VectorQuantizer.l2DistSq(col("xu"), col("xv")).as("d2"))
          val knn = pairs.withColumn("rnk", row_number().over(
              Window.partitionBy("u").orderBy(col("d2"), col("v"))))
            .filter(col("rnk") <= M_KNN)
            .select(col("u"), col("v"))
          GraphIndex.publish(
            knn.select(col("u").as("src"), col("v").as("dst"))
              .unionByName(knn.select(col("v").as("src"),
                col("u").as("dst")))
              .distinct()
              .withColumn("w", lit(1L)),
            root)
          // the forget: tombstone the slice, compact bucket-locally
          GraphIndex.addTombstones(s,
            eIdx.select(col("vec_id").as("node")).filter(isDel(col("node"))),
            "node", root)
          GraphIndex.purgeCompact(s, root)
        }
        val qxs = eAll.filter(col("vec_id") >= INDEX_MAX)
          .select(col("vec_id").as("query_id"), col("xs").as("qx"))
        val ixs = eIdx.select(col("vec_id").as("node"), col("xs").as("nx"))
        val survivors = ixs.filter(!isDel(col("node")))
        def score(cand: DataFrame): DataFrame =
          cand.join(ixs, "node").join(qxs, "query_id")
            .select(col("query_id"), col("node"),
              VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2"))
        def topPerQuery(scored: DataFrame, n: Int): DataFrame =
          scored.withColumn("rnk", row_number().over(
              Window.partitionBy("query_id").orderBy(col("d2"), col("node"))))
            .filter(col("rnk") <= n)
            .select(col("query_id"), col("node"))
        val truth = topPerQuery(
          qxs.crossJoin(survivors).select(col("query_id"), col("node"),
            VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2")), K)
          .withColumn("hit", lit(1L))
        val entries = survivors.filter(col("node") % ENT_MOD === 0)
          .select("node")
        var (visited, frontier) =
          beamStage(score(qxs.select("query_id").crossJoin(entries)), B)
        for (_ <- 1 to ROUNDS) {
          if (!frontier.isEmpty) {
            val nb = GraphIndex.neighbors(s, frontier, root)
            val fresh = nb
              .select(col("query_id"), col("nbr").as("node")).distinct()
              .join(visited.select("query_id", "node"),
                Seq("query_id", "node"), "left_anti")
            val (newV, newF) = beamStage(score(fresh), B)
            visited = visited.unionByName(newV)
            frontier = newF
          }
        }
        topPerQuery(visited, K)
          .join(truth, Seq("query_id", "node"), "left")
          .agg(count(lit(1)).as("n_pairs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"),
            sum(when(isDel(col("node")), 1L).otherwise(0L))
              .as("n_purged_served"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * K})"))
          .select("n_pairs", "n_hit", "n_purged_served", "recall_ppm")
      }, {
        val rounds = (1 to ROUNDS).map { r =>
          s"""n$r AS (
             |  SELECT DISTINCT f.query_id, g.dst AS node
             |  FROM f${r - 1} f JOIN gm g ON g.src = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM v${r - 1} v
             |                    WHERE v.query_id = f.query_id
             |                      AND v.node = g.dst)),
             |v$r AS (
             |  SELECT query_id, node, d2 FROM v${r - 1}
             |  UNION ALL
             |  SELECT n.query_id, n.node, q.d2
             |  FROM n$r n JOIN qd q
             |    ON q.query_id = n.query_id AND q.node = n.node),
             |f$r AS (
             |  SELECT query_id, node FROM (
             |    SELECT n.query_id, n.node,
             |      row_number() OVER (PARTITION BY n.query_id
             |                         ORDER BY q.d2, n.node) AS rnk
             |    FROM n$r n JOIN qd q
             |      ON q.query_id = n.query_id AND q.node = n.node) z
             |  WHERE rnk <= $B)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $INDEX_MAX")},
           |fa AS (
           |  SELECT e.vec_id, c.cell,
           |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
           |  FROM e JOIN c$KM_ITERS c USING (dim)
           |  WHERE e.vec_id < $INDEX_MAX
           |  GROUP BY e.vec_id, c.cell),
           |ca AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT vec_id, cell,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY d2, cell) AS rnk
           |    FROM fa) z WHERE rnk = 1),
           |pd AS (
           |  SELECT a.vec_id AS u, b.vec_id AS v,
           |    sum((ea.xs - eb.xs) * (ea.xs - eb.xs)) AS d2
           |  FROM ca a JOIN ca b ON a.cell = b.cell
           |    AND a.vec_id <> b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
           |  GROUP BY 1, 2),
           |knn AS (
           |  SELECT u, v FROM (
           |    SELECT u, v,
           |      row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rnk
           |    FROM pd) z WHERE rnk <= $M_KNN),
           |g AS (SELECT u AS src, v AS dst FROM knn
           |      UNION SELECT v, u FROM knn),
           |del AS (SELECT DISTINCT vec_id FROM e
           |        WHERE vec_id < $INDEX_MAX AND $delSql),
           |gm AS (
           |  SELECT src, dst FROM g
           |  WHERE src NOT IN (SELECT vec_id FROM del)
           |    AND dst NOT IN (SELECT vec_id FROM del)),
           |qd AS (
           |  SELECT q.vec_id AS query_id, x.vec_id AS node,
           |    sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
           |  FROM e q JOIN e x ON q.dim = x.dim AND x.vec_id < $INDEX_MAX
           |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
           |    AND x.vec_id NOT IN (SELECT vec_id FROM del)
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY d2, node) AS rnk
           |    FROM qd) z WHERE rnk <= $K),
           |ent AS (SELECT DISTINCT vec_id AS node FROM e
           |        WHERE vec_id < $INDEX_MAX AND vec_id % $ENT_MOD = 0
           |          AND NOT $delSql),
           |v0 AS (
           |  SELECT qd.query_id, qd.node, qd.d2
           |  FROM qd JOIN ent ON qd.node = ent.node),
           |f0 AS (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY d2, node) AS rnk
           |    FROM v0) z WHERE rnk <= $B),
           |$rounds,
           |res AS (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY d2, node) AS rnk
           |    FROM v$ROUNDS) z WHERE rnk <= $K)
           |SELECT count(*)::BIGINT AS n_pairs,
           |  sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           |    AS n_hit,
           |  sum(CASE WHEN r.node % 25 = 7 OR r.node = 100
           |           THEN 1 ELSE 0 END)::BIGINT AS n_purged_served,
           |  (sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
           |    * 1000000 // ${NQ * K})::BIGINT AS recall_ppm
           |FROM res r LEFT JOIN truth t
           |  ON t.query_id = r.query_id AND t.node = r.node""".stripMargin
      })
  }

  /** kNN-graph ANN delta append (q333) — the growth half of the
    * graph-serving lifecycle, the cell the family matrix left open
    * after q327 (whose edge artifact was publish-once per corpus
    * fingerprint: a new vector batch forced a full rebuild). The
    * HNSW-style insert at BATCH cost: the base graph publishes from
    * the base world alone; a new vector batch is encoded with the
    * base's FROZEN coarse quantizer (fit on the base world only —
    * never re-fit on the grown corpus), its candidate edges derive
    * from same-cell pairs against base ∪ batch, each new node keeps
    * its [[q333 M_KNN]] nearest, and the symmetrized edges land as a
    * TAGGED [[graft.operators.GraphIndex.fold]] — O(batch) work, the
    * committed adjacency never read, never rewritten, redeliveries
    * absorbed via the fold ledger (q312's discipline). Beam search
    * then serves base ∪ delta through [[GraphIndex.neighbors]]'
    * weight-sum union — queries route INTO the appended region
    * (entry nodes 300/350 are delta-side) and OUT of it. Judged:
    * recall@10 at beam 8 vs the full-world exact truth plus an
    * explicit appended-nodes-served counter (nonzero iff the fold
    * actually serves — a probe that silently dropped the delta
    * would zero it and break the hash). The oracle replays the
    * SPLIT build exactly: centroids from the base world, base edges
    * from base-only candidates, delta edges from new-node
    * candidates against the grown world — so a Spark-side re-fit on
    * base ∪ batch (the correctness burden of any append) would
    * hash-mismatch.
    */
  val knnGraphAppend: Q = {
    val SPLIT = 300L; val INDEX_MAX = 400L; val Q_MAX = 420L
    val NQ = Q_MAX - INDEX_MAX
    val M_KNN = 6; val ROUNDS = 3; val K = 10; val B = 8
    val ENT_MOD = 50L
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val eAll = VectorQuantizer.scaled(
          emb.filter(col("vec_id") < Q_MAX), "vec_id", "embedding")
          .persist()
        val eIdx = eAll.filter(col("vec_id") < INDEX_MAX)
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-knn-fold", d, Seq("embeddings.parquet"))
        // per-node top-M nearest among same-cell candidates,
        // symmetrized — the shared edge derivation of the base build
        // and the delta insert (only the candidate sides differ)
        def knnEdges(newSide: DataFrame, candSide: DataFrame): DataFrame = {
          val xs = eIdx.select(col("vec_id"), col("xs"))
          val pairs = newSide.as("a")
            .join(candSide.as("b"), col("a.cell") === col("b.cell") &&
              col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
            .join(xs.select(col("vec_id").as("u"), col("xs").as("xu")), "u")
            .join(xs.select(col("vec_id").as("v"), col("xs").as("xv")), "v")
            .select(col("u"), col("v"),
              VectorQuantizer.l2DistSq(col("xu"), col("xv")).as("d2"))
          val knn = pairs.withColumn("rnk", row_number().over(
              Window.partitionBy("u").orderBy(col("d2"), col("v"))))
            .filter(col("rnk") <= M_KNN)
            .select(col("u"), col("v"))
          knn.select(col("u").as("src"), col("v").as("dst"))
            .unionByName(knn.select(col("v").as("src"), col("u").as("dst")))
            .distinct()
            .withColumn("w", lit(1L))
        }
        val needBase = GraphIndex.resolve(root).isEmpty
        if (needBase || !GraphIndex.folded(root, "append-1")) {
          // the FROZEN coarse quantizer: fit on the base world only.
          // Recomputed deterministically when the lifecycle needs it
          // (integer Lloyd — bit-stable); at 100 TB it is the
          // committed IVF coarse codebook, read not re-fit, and the
          // candidate source is the committed cell membership
          // (PqIndex/SimIndex), never a corpus scan
          val eBase = eAll.filter(col("vec_id") < SPLIT)
          val cent = VectorQuantizer.fitCentroids(
            eBase, "vec_id", KM_C, KM_ITERS)
          if (needBase) {
            val cells = VectorQuantizer.assignCells(eBase, cent, "vec_id")
            GraphIndex.publish(knnEdges(cells, cells), root)
          }
          if (!GraphIndex.folded(root, "append-1")) {
            val cellsAll = VectorQuantizer.assignCells(eIdx, cent, "vec_id")
            GraphIndex.fold(s,
              knnEdges(cellsAll.filter(col("vec_id") >= SPLIT), cellsAll),
              root, tag = "append-1")
          }
        }
        val qxs = eAll.filter(col("vec_id") >= INDEX_MAX)
          .select(col("vec_id").as("query_id"), col("xs").as("qx"))
        val ixs = eIdx.select(col("vec_id").as("node"), col("xs").as("nx"))
        def score(cand: DataFrame): DataFrame =
          cand.join(ixs, "node").join(qxs, "query_id")
            .select(col("query_id"), col("node"),
              VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2"))
        def topPerQuery(scored: DataFrame, n: Int): DataFrame =
          scored.withColumn("rnk", row_number().over(
              Window.partitionBy("query_id").orderBy(col("d2"), col("node"))))
            .filter(col("rnk") <= n)
            .select(col("query_id"), col("node"))
        val truth = topPerQuery(
          qxs.crossJoin(ixs).select(col("query_id"), col("node"),
            VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2")), K)
          .withColumn("hit", lit(1L))
        val entries = ixs.filter(col("node") % ENT_MOD === 0)
          .select("node")
        var (visited, frontier) =
          beamStage(score(qxs.select("query_id").crossJoin(entries)), B)
        for (_ <- 1 to ROUNDS) {
          if (!frontier.isEmpty) {
            val nb = GraphIndex.neighbors(s, frontier, root)
            val fresh = nb
              .select(col("query_id"), col("nbr").as("node")).distinct()
              .join(visited.select("query_id", "node"),
                Seq("query_id", "node"), "left_anti")
            val (newV, newF) = beamStage(score(fresh), B)
            visited = visited.unionByName(newV)
            frontier = newF
          }
        }
        topPerQuery(visited, K)
          .join(truth, Seq("query_id", "node"), "left")
          .agg(count(lit(1)).as("n_pairs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"),
            sum(when(col("node") >= SPLIT, 1L).otherwise(0L))
              .as("n_appended_served"))
          .withColumn("recall_ppm",
            expr(s"n_hit * 1000000 div (${NQ * K})"))
          .select("n_pairs", "n_hit", "n_appended_served", "recall_ppm")
      }, {
        val rounds = (1 to ROUNDS).map { r =>
          s"""n$r AS (
             |  SELECT DISTINCT f.query_id, g.dst AS node
             |  FROM f${r - 1} f JOIN g ON g.src = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM v${r - 1} v
             |                    WHERE v.query_id = f.query_id
             |                      AND v.node = g.dst)),
             |v$r AS (
             |  SELECT query_id, node, d2 FROM v${r - 1}
             |  UNION ALL
             |  SELECT n.query_id, n.node, q.d2
             |  FROM n$r n JOIN qd q
             |    ON q.query_id = n.query_id AND q.node = n.node),
             |f$r AS (
             |  SELECT query_id, node FROM (
             |    SELECT n.query_id, n.node,
             |      row_number() OVER (PARTITION BY n.query_id
             |                         ORDER BY q.d2, n.node) AS rnk
             |    FROM n$r n JOIN qd q
             |      ON q.query_id = n.query_id AND q.node = n.node) z
             |  WHERE rnk <= $B)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $SPLIT")},
           |fa AS (
           |  SELECT e.vec_id, c.cell,
           |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
           |  FROM e JOIN c$KM_ITERS c USING (dim)
           |  WHERE e.vec_id < $INDEX_MAX
           |  GROUP BY e.vec_id, c.cell),
           |ca AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT vec_id, cell,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY d2, cell) AS rnk
           |    FROM fa) z WHERE rnk = 1),
           |pdb AS (
           |  SELECT a.vec_id AS u, b.vec_id AS v,
           |    sum((ea.xs - eb.xs) * (ea.xs - eb.xs)) AS d2
           |  FROM ca a JOIN ca b ON a.cell = b.cell
           |    AND a.vec_id <> b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
           |  WHERE a.vec_id < $SPLIT AND b.vec_id < $SPLIT
           |  GROUP BY 1, 2),
           |knb AS (
           |  SELECT u, v FROM (
           |    SELECT u, v,
           |      row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rnk
           |    FROM pdb) z WHERE rnk <= $M_KNN),
           |pdn AS (
           |  SELECT a.vec_id AS u, b.vec_id AS v,
           |    sum((ea.xs - eb.xs) * (ea.xs - eb.xs)) AS d2
           |  FROM ca a JOIN ca b ON a.cell = b.cell
           |    AND a.vec_id <> b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
           |  WHERE a.vec_id >= $SPLIT
           |  GROUP BY 1, 2),
           |knd AS (
           |  SELECT u, v FROM (
           |    SELECT u, v,
           |      row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rnk
           |    FROM pdn) z WHERE rnk <= $M_KNN),
           |g AS (SELECT u AS src, v AS dst FROM knb
           |      UNION SELECT v, u FROM knb
           |      UNION SELECT u, v FROM knd
           |      UNION SELECT v, u FROM knd),
           |qd AS (
           |  SELECT q.vec_id AS query_id, x.vec_id AS node,
           |    sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
           |  FROM e q JOIN e x ON q.dim = x.dim AND x.vec_id < $INDEX_MAX
           |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY d2, node) AS rnk
           |    FROM qd) z WHERE rnk <= $K),
           |ent AS (SELECT DISTINCT vec_id AS node FROM e
           |        WHERE vec_id < $INDEX_MAX AND vec_id % $ENT_MOD = 0),
           |v0 AS (
           |  SELECT qd.query_id, qd.node, qd.d2
           |  FROM qd JOIN ent ON qd.node = ent.node),
           |f0 AS (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY d2, node) AS rnk
           |    FROM v0) z WHERE rnk <= $B),
           |$rounds,
           |res AS (
           |  SELECT query_id, node FROM (
           |    SELECT query_id, node,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY d2, node) AS rnk
           |    FROM v$ROUNDS) z WHERE rnk <= $K)
           |SELECT count(*)::BIGINT AS n_pairs,
           |  sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           |    AS n_hit,
           |  sum(CASE WHEN r.node >= $SPLIT THEN 1 ELSE 0 END)::BIGINT
           |    AS n_appended_served,
           |  (sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
           |    * 1000000 // ${NQ * K})::BIGINT AS recall_ppm
           |FROM res r LEFT JOIN truth t
           |  ON t.query_id = r.query_id AND t.node = r.node""".stripMargin
      })
  }

  /** Graph-ANN on the streaming probe seam (q334) — the last empty
    * cell of the streaming × serving matrix: q327's kNN-graph
    * serving shape behind [[graft.streaming.AnnStream]]'s
    * partially-applied probe fn (exactly how q273 put IVFPQ on the
    * seam), hit by a GDPR purge between batches. Batch 0 probes the
    * full graph with greedy beam search; the purge tombstones a
    * vector slice INCLUDING entry node 100 and compacts with the
    * bucket-local [[GraphIndex.purgeCompact]] (q330/q331's surgical
    * rewrite); batch 0 is then REDELIVERED (absorbed by its
    * committed `_SUCCESS` dir — the at-least-once contract); batch 1
    * probes the purged world. Entry liveness is derived from the
    * ARTIFACT, not from an id rule: the probe asks the graph for the
    * candidate entries' neighborhoods and keeps only nodes that
    * still HAVE adjacency rows — a purged entry (or an entry whose
    * every neighbor purged) drops from round 0 without the prober
    * knowing the deletion predicate, which is what a serving system
    * can actually do. Batches are id-disjoint, so the oracle is two
    * beam replays with per-arm worlds (q305's scheme): batch-0
    * queries walk the full graph, batch-1 queries the masked one —
    * either batch scored against the other's world hash-mismatches.
    */
  val knnAnnStream: Q = {
    val INDEX_MAX = 400L; val B0_MAX = 410L; val Q_MAX = 420L
    val M_KNN = 6; val ROUNDS = 3; val K = 10; val B = 8
    val ENT_MOD = 50L
    val delSql = "(vec_id % 25 = 7 OR vec_id = 100)"
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def isDel(c: Column): Column = c % 25 === 7 || c === 100
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val eAll = VectorQuantizer.scaled(
          emb.filter(col("vec_id") < Q_MAX), "vec_id", "embedding")
          .persist()
        val eIdx = eAll.filter(col("vec_id") < INDEX_MAX)
        val ixs = eIdx.select(col("vec_id").as("node"), col("xs").as("nx"))
        val idxRoot = graft.sources.Artifacts.versionedRoot(
          "graft-knn-pstream-idx", d, Seq("embeddings.parquet"))
        val outRoot = graft.sources.Artifacts.versionedRoot(
          "graft-knn-pstream-out", d, Seq("embeddings.parquet"))
        if (GraphIndex.resolve(idxRoot).isEmpty) {
          // the q327 build on the full pre-purge index world
          val cent = VectorQuantizer.fitCentroids(
            eIdx, "vec_id", KM_C, KM_ITERS)
          val cells = VectorQuantizer.assignCells(eIdx, cent, "vec_id")
          val xs = eIdx.select(col("vec_id"), col("xs"))
          val pairs = cells.as("a")
            .join(cells.as("b"), col("a.cell") === col("b.cell") &&
              col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
            .join(xs.select(col("vec_id").as("u"), col("xs").as("xu")), "u")
            .join(xs.select(col("vec_id").as("v"), col("xs").as("xv")), "v")
            .select(col("u"), col("v"),
              VectorQuantizer.l2DistSq(col("xu"), col("xv")).as("d2"))
          val knn = pairs.withColumn("rnk", row_number().over(
              Window.partitionBy("u").orderBy(col("d2"), col("v"))))
            .filter(col("rnk") <= M_KNN)
            .select(col("u"), col("v"))
          GraphIndex.publish(
            knn.select(col("u").as("src"), col("v").as("dst"))
              .unionByName(knn.select(col("v").as("src"),
                col("u").as("dst")))
              .distinct()
              .withColumn("w", lit(1L)),
            idxRoot)
        }
        // the probe seam: beam search over whatever generation the
        // artifact serves AT BATCH TIME — partially applied over the
        // index-side vectors (full-precision rescoring needs them;
        // in a deployment they ride the index, here the table)
        def graphBeamProbe(sp: SparkSession, batch: DataFrame, id: String,
                           vec: String, k: Int, root: String): DataFrame = {
          val qxs = VectorQuantizer.scaled(batch, id, vec)
            .select(col(id).as("query_id"), col("xs").as("qx"))
          def score(cand: DataFrame): DataFrame =
            cand.join(ixs, "node").join(qxs, "query_id")
              .select(col("query_id"), col("node"),
                VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2"))
          def top(scored: DataFrame, n: Int): DataFrame =
            scored.withColumn("rnk", row_number().over(
                Window.partitionBy("query_id")
                  .orderBy(col("d2"), col("node"))))
              .filter(col("rnk") <= n)
          val entCand = ixs.filter(col("node") % ENT_MOD === 0)
            .select("node")
          // artifact-derived entry liveness: a purged entry has no
          // adjacency row left, so it (and only it) drops here
          val entries = GraphIndex.neighbors(sp, entCand, root)
            .select("node").distinct()
          var (visited, frontier) =
            beamStage(score(qxs.select("query_id").crossJoin(entries)), B)
          for (_ <- 1 to ROUNDS) {
            if (!frontier.isEmpty) {
              val nb = GraphIndex.neighbors(sp, frontier, root)
              val fresh = nb
                .select(col("query_id"), col("nbr").as("node")).distinct()
                .join(visited.select("query_id", "node"),
                  Seq("query_id", "node"), "left_anti")
              val (newV, newF) = beamStage(score(fresh), B)
              visited = visited.unionByName(newV)
              frontier = newF
            }
          }
          top(visited, k)
            .select(col("query_id"), col("node"), col("d2"),
              col("rnk").cast("long").as("rnk"))
        }
        val b0 = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < B0_MAX)
        val b1 = emb.filter(
          col("vec_id") >= B0_MAX && col("vec_id") < Q_MAX)
        val ann = new graft.streaming.AnnStream(
          s, idxRoot, outRoot, "vec_id", "embedding", K,
          probeFn = graphBeamProbe)
        ann.processBatch(b0, 0) // the full world
        // the purge: exactly once (the compacted generation is v2)
        if (VersionedDirs.versionsOf(idxRoot).size < 2) {
          GraphIndex.addTombstones(s,
            eIdx.select(col("vec_id").as("node"))
              .filter(isDel(col("node"))), "node", idxRoot)
          GraphIndex.purgeCompact(s, idxRoot)
        }
        ann.processBatch(b0, 0) // redelivery AFTER the purge: absorbed
        ann.processBatch(b1, 1) // the purged world
        ann.results().orderBy("query_id", "rnk")
      }, {
        def beamCtes(sfx: String, graph: String, ent: String,
                     qPred: String): String = {
          val rounds = (1 to ROUNDS).map { r =>
            s"""n$r$sfx AS (
               |  SELECT DISTINCT f.query_id, g.dst AS node
               |  FROM f${r - 1}$sfx f JOIN $graph g ON g.src = f.node
               |  WHERE NOT EXISTS (SELECT 1 FROM v${r - 1}$sfx v
               |                    WHERE v.query_id = f.query_id
               |                      AND v.node = g.dst)),
               |v$r$sfx AS (
               |  SELECT query_id, node, d2 FROM v${r - 1}$sfx
               |  UNION ALL
               |  SELECT n.query_id, n.node, q.d2
               |  FROM n$r$sfx n JOIN qd q
               |    ON q.query_id = n.query_id AND q.node = n.node),
               |f$r$sfx AS (
               |  SELECT query_id, node FROM (
               |    SELECT n.query_id, n.node,
               |      row_number() OVER (PARTITION BY n.query_id
               |                         ORDER BY q.d2, n.node) AS rnk
               |    FROM n$r$sfx n JOIN qd q
               |      ON q.query_id = n.query_id AND q.node = n.node) z
               |  WHERE rnk <= $B)""".stripMargin
          }.mkString(",\n")
          s"""$ent$sfx AS (
             |  SELECT DISTINCT vec_id AS node FROM e
             |  WHERE vec_id < $INDEX_MAX AND vec_id % $ENT_MOD = 0
             |    AND EXISTS (SELECT 1 FROM $graph g
             |                WHERE g.src = e.vec_id)),
             |v0$sfx AS (
             |  SELECT qd.query_id, qd.node, qd.d2
             |  FROM qd JOIN $ent$sfx ON qd.node = $ent$sfx.node
             |  WHERE $qPred),
             |f0$sfx AS (
             |  SELECT query_id, node FROM (
             |    SELECT query_id, node,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY d2, node) AS rnk
             |    FROM v0$sfx) z WHERE rnk <= $B),
             |$rounds,
             |res$sfx AS (
             |  SELECT query_id, node, d2 FROM (
             |    SELECT query_id, node, d2,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY d2, node) AS rnk
             |    FROM v$ROUNDS$sfx) z WHERE rnk <= $K)""".stripMargin
        }
        s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $INDEX_MAX")},
           |fa AS (
           |  SELECT e.vec_id, c.cell,
           |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
           |  FROM e JOIN c$KM_ITERS c USING (dim)
           |  WHERE e.vec_id < $INDEX_MAX
           |  GROUP BY e.vec_id, c.cell),
           |ca AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT vec_id, cell,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY d2, cell) AS rnk
           |    FROM fa) z WHERE rnk = 1),
           |pd AS (
           |  SELECT a.vec_id AS u, b.vec_id AS v,
           |    sum((ea.xs - eb.xs) * (ea.xs - eb.xs)) AS d2
           |  FROM ca a JOIN ca b ON a.cell = b.cell
           |    AND a.vec_id <> b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
           |  GROUP BY 1, 2),
           |knn AS (
           |  SELECT u, v FROM (
           |    SELECT u, v,
           |      row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rnk
           |    FROM pd) z WHERE rnk <= $M_KNN),
           |gf AS (SELECT u AS src, v AS dst FROM knn
           |       UNION SELECT v, u FROM knn),
           |del AS (SELECT DISTINCT vec_id FROM e
           |        WHERE vec_id < $INDEX_MAX AND $delSql),
           |gm AS (
           |  SELECT src, dst FROM gf
           |  WHERE src NOT IN (SELECT vec_id FROM del)
           |    AND dst NOT IN (SELECT vec_id FROM del)),
           |qd AS (
           |  SELECT q.vec_id AS query_id, x.vec_id AS node,
           |    sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
           |  FROM e q JOIN e x ON q.dim = x.dim AND x.vec_id < $INDEX_MAX
           |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
           |  GROUP BY 1, 2),
           |${beamCtes("a", "gf", "ent",
              s"qd.query_id < $B0_MAX")},
           |${beamCtes("b", "gm", "ent",
              s"qd.query_id >= $B0_MAX")}
           |SELECT query_id, node, d2::BIGINT AS d2,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |                          ORDER BY d2, node) AS BIGINT) AS rnk
           |FROM (SELECT * FROM resa UNION ALL SELECT * FROM resb) u
           |ORDER BY query_id, rnk""".stripMargin
      })
  }

  /** Fleet snapshot manifest (q335) — the cross-family atomic-read
    * seam closed: [[graft.operators.FleetSnapshot]] pins a
    * (family → committed generation) vector with ONE `fleet.mN`
    * rename (the [[graft.FlatFileEngine]] manifest commit,
    * generalized to the index fleet), and a COMPOSED read resolves
    * every family through the same manifest — no generation skew.
    * The chain: SimIndex + PqIndex publish over one corpus → pin m1
    * → a GDPR purge tombstones and compacts BOTH families → pin m2.
    * The judged read is the production two-stage retrieval per
    * snapshot: recall stage = LSH candidates from the pinned sim
    * generation ([[SimIndex.probeTopKAt]] — the generation exactly
    * as committed, no later logs), rank stage = ADC rescore of
    * exactly those candidate pairs against the pinned pq generation
    * ([[PqIndex.adcRescoreAt]] — candidate-linear, the code scan
    * pruned to candidate ids before any ADC work). Both snapshot-1
    * arms run AFTER the purge committed: their rows still serve the
    * purged ids (the pre-purge world the manifest pinned — the
    * whole point), while snapshot-2 rows never do. The oracle
    * replays both stages per arm with per-snapshot index worlds;
    * pairing either stage with the other snapshot's world
    * hash-mismatches — which is exactly the skew the manifest
    * forbids.
    */
  val fleetSnapshotServe: Q = {
    val BASE = 250L; val Q_MAX = 270L; val C = 20; val K = 10
    Q(
      (s, d) => {
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val base = emb.filter(col("vec_id") < BASE)
        val queries = emb.filter(
          col("vec_id") >= BASE && col("vec_id") < Q_MAX)
        val fleetRoot = graft.sources.Artifacts.versionedRoot(
          "graft-fleet", d, Seq("embeddings.parquet"))
        val simRoot = new java.io.File(fleetRoot, "sim").getAbsolutePath
        val pqRoot = new java.io.File(fleetRoot, "pq").getAbsolutePath
        if (FleetSnapshot.list(fleetRoot).isEmpty) {
          val r = VectorFunctions.mtBits(base.count())
          SimIndex.publish(base, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), simRoot)
          PqIndex.publish(base, "vec_id", "embedding",
            PQ_M, PQ_DSUB, PQ_KS, PQ_ITERS, pqRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("sim" -> simRoot, "pq" -> pqRoot))
        }
        if (FleetSnapshot.list(fleetRoot).size < 2) {
          // the purge cascade across BOTH families, then one pin —
          // readers see (pre-purge, pre-purge) or (post, post),
          // never the skewed mix
          val del = base.filter(col("vec_id") % 10 === 3)
            .select("vec_id")
          SimIndex.addTombstones(s, del, "vec_id", simRoot)
          SimIndex.mergeCompact(s, simRoot)
          PqIndex.addTombstones(s, del, "vec_id", pqRoot)
          PqIndex.mergeCompact(s, pqRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("sim" -> simRoot, "pq" -> pqRoot))
        }
        def arm(n: Long): DataFrame = {
          val gens = FleetSnapshot.at(fleetRoot, n)
          val cand = SimIndex.probeTopKAt(s, queries,
              "vec_id", "embedding", C, gens("sim"))
            .select("query_id", "index_id")
          PqIndex.adcRescoreAt(s, queries, "vec_id", "embedding", K,
              gens("pq"), cand)
            .withColumn("snap", lit(n))
            .select("snap", "query_id", "index_id", "adc_d2", "rnk")
        }
        concurrently(Seq(() => arm(1), () => arm(2)))
          .reduce(_.unionByName(_))
          .orderBy("snap", "query_id", "rnk")
      }, {
        // one snapshot arm: LSH candidates (top C by rounded cosine)
        // from that arm's index world, ADC rescore of exactly those
        // pairs, top K — `idxPred` is the survivor predicate of the
        // pinned world
        def armCtes(sfx: String, idxPred: String): String =
          s"""scored$sfx AS (
             |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
             |    max(round(${VectorFunctions.cosineSql(
                    "q.embedding", "kb.embedding")}, 6)) AS cos_sim
             |  FROM qkb q JOIN ikb kb
             |    ON q.tbl = kb.tbl AND q.bucket = kb.bucket
             |  WHERE $idxPred
             |  GROUP BY 1, 2),
             |cand$sfx AS (
             |  SELECT query_id, index_id FROM (
             |    SELECT query_id, index_id,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY cos_sim DESC, index_id)
             |        AS rnk
             |    FROM scored$sfx) z WHERE rnk <= $C),
             |adc$sfx AS (
             |  SELECT dt.query_id, cd.vec_id AS index_id,
             |    sum(dt.d2)::BIGINT AS adc_d2
             |  FROM cds cd JOIN dt ON cd.sub = dt.sub AND cd.cell = dt.cell
             |  WHERE EXISTS (SELECT 1 FROM cand$sfx c
             |                WHERE c.query_id = dt.query_id
             |                  AND c.index_id = cd.vec_id)
             |  GROUP BY 1, 2),
             |res$sfx AS (
             |  SELECT query_id, index_id, adc_d2,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |                            ORDER BY adc_d2, index_id)
             |      AS BIGINT) AS rnk
             |  FROM adc$sfx)""".stripMargin
        s"""WITH idx0 AS (SELECT vec_id, embedding FROM embeddings
           |              WHERE vec_id < $BASE),
           |params AS (
           |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
           |    ${VectorFunctions.mtTablesSql(
                  VectorFunctions.mtBitsSql("count(*)"))} AS nt
           |  FROM idx0),
           |ie AS (
           |  SELECT vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params WHERE vec_id < $BASE),
           |iek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM ie),
           |ikb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM iek),
           |qe AS (
           |  SELECT vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params
           |  WHERE vec_id >= $BASE AND vec_id < $Q_MAX),
           |qek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM qe),
           |qkb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM qek),
           |$pqEpCtes,
           |ix AS (SELECT * FROM ep WHERE vec_id < $BASE),
           |pc0 AS (SELECT sub, vec_id AS cell, sdim, xs AS cs FROM ix
           |        WHERE vec_id < $PQ_KS),
           |${(1 to PQ_ITERS).map(pqIterCte).mkString(",\n")},
           |cds AS (
           |  SELECT vec_id, sub, cell FROM (
           |    SELECT ib.vec_id, c.sub, c.cell,
           |      row_number() OVER (PARTITION BY ib.vec_id, c.sub
           |        ORDER BY sum((ib.xs - c.cs) * (ib.xs - c.cs)), c.cell)
           |        AS rnk
           |    FROM ix ib JOIN pc$PQ_ITERS c
           |      ON ib.sub = c.sub AND ib.sdim = c.sdim
           |    GROUP BY ib.vec_id, c.sub, c.cell) z WHERE rnk = 1),
           |dt AS (
           |  SELECT q.vec_id AS query_id, c.sub, c.cell,
           |    sum((q.xs - c.cs) * (q.xs - c.cs)) AS d2
           |  FROM ep q JOIN pc$PQ_ITERS c
           |    ON q.sub = c.sub AND q.sdim = c.sdim
           |  WHERE q.vec_id >= $BASE AND q.vec_id < $Q_MAX
           |  GROUP BY 1, 2, 3),
           |${armCtes("a", "TRUE")},
           |${armCtes("b", "kb.vec_id % 10 <> 3")}
           |SELECT snap, query_id, index_id, adc_d2, rnk FROM (
           |  SELECT CAST(1 AS BIGINT) AS snap, * FROM resa WHERE rnk <= $K
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT) AS snap, * FROM resb WHERE rnk <= $K
           |) u ORDER BY snap, query_id, rnk""".stripMargin
      })
  }

  /** DCT perceptual hash (q336) — the crop/scale-robustness tier
    * q328's average-hash provably lacks: aHash packs one bit PER
    * PIXEL, so a 2× pixel-replicated upscale (identical content,
    * more pixels) changes the packing and the hash. The pHash
    * pipeline fixes the geometry first: the decoded grid (REAL BMP
    * bytes through the q248 reader, the q328 machinery with a scale
    * column) is nearest-neighbor SAMPLED onto a fixed 8×8 lattice —
    * sampled col ⌊j·W/8⌋, and ⌊⌊j·2W/8⌋/2⌋ = ⌊j·W/8⌋ exactly, so
    * the upscaled copy samples the IDENTICAL source pixels — then
    * mean-centered in exact integers (x = luma·64 − Σluma: a
    * constant intensity shift adds 64c to both terms and cancels,
    * q328's invariance argument carried forward), transformed by a
    * SEPARABLE integer 8×8 DCT-II (two multiply-accumulate passes
    * against one 64-entry integer cosine table — the same literals
    * on both engines, no float in any oracle-visible value), and the
    * 63 AC coefficients threshold against their own mean in
    * cross-multiplied form into one int64. Judged as the q328 arm
    * matrix: the aHash arm pairs the shifted tier but NOT the scaled
    * tier; the DCT arm pairs BOTH — completing the perceptual tier
    * (exact bytes ⊂ aHash ⊂ pHash). Pair mass stays an aggregate
    * over hash blocks, never materialized pairs. The oracle replays
    * the pixel rule, the lattice, both transforms and the block
    * arithmetic relationally; at 100 TB the shape is one decode pass
    * + a 64-row-bounded per-media lattice + two bounded DCT passes —
    * the q93/q328 cost envelope with a second fingerprint column.
    */
  // integer DCT-II cosine table: C(u,i) = round(1024·cos((2i+1)uπ/16)).
  // Generated once here and embedded as LITERALS in both the plans
  // and the oracle SQL — the engines only ever see integers. Shared
  // by q336 (in-plan tier) and q341 (the persisted index).
  private val DCT_CT: Seq[(Long, Long, Long)] =
    for { u <- 0L to 7L; i <- 0L to 7L } yield
      (u, i, math.round(1024.0 *
        math.cos(((2 * i + 1) * u * math.Pi) / 16.0)))

  /** (media_id, dhash) — q336's exact-integer DCT-II perceptual hash
    * of a decoded [[bmpGrid]]: fixed 8×8 nearest-neighbor lattice
    * (the ⌊⌊j·2w/8⌋/2⌋ = ⌊j·w/8⌋ identity makes a 2× upscale
    * hash-identical), exact mean centering (x = 64·luma − Σluma, so
    * an intensity shift cancels), two separable integer DCT passes
    * against [[DCT_CT]], AC signs vs the AC mean packed at idx−1.
    * The whole transform runs as per-media bounded array expressions
    * with materialization boundaries between stages — see the q336
    * scaladoc for the interpreted-HOF re-evaluation hazard those
    * `bound` aggregates exist to defeat.
    */
  private def dctHashes(grid: DataFrame): DataFrame = {
    val sample = grid.select("media_id", "wp").distinct()
      .withColumn("i", explode(sequence(lit(0L), lit(7L))))
      .withColumn("j", explode(sequence(lit(0L), lit(7L))))
      .select(col("media_id"), col("i"), col("j"),
        expr("i div 2").as("r"), expr("j * wp div 8").as("c"))
      .join(grid.select("media_id", "r", "c", "luma"),
        Seq("media_id", "r", "c"))
    def bound(df: DataFrame, arrCol: String): DataFrame =
      df.groupBy("media_id").agg(first(arrCol).as(arrCol))
    val sArr = sample.groupBy("media_id")
      .agg(transform(array_sort(collect_list(struct(
          (col("i") * 8 + col("j")).as("p"), col("luma").as("v")))),
        e => e.getField("v")).as("s64"),
        sum("luma").as("ssum"))
    val ccArr = array(DCT_CT.map(t => lit(t._3)): _*)
    val xArr = bound(sArr.select(col("media_id"),
      expr("transform(s64, v -> v * 64 - ssum)").as("x64")), "x64")
      .withColumn("cc", ccArr)
    val gArr = bound(xArr.select(col("media_id"), expr(
      "transform(sequence(0, 63), k -> aggregate(sequence(0, 7), " +
        "0L, (a, i) -> a + element_at(cc, " +
        "cast((k div 8) * 8 + i + 1 as int)) " +
        "* element_at(x64, cast(i * 8 + (k % 8) + 1 as int))))")
      .as("g64")), "g64")
      .withColumn("cc", ccArr)
    val fArr = bound(gArr.select(col("media_id"), expr(
      "transform(sequence(1, 63), idx -> aggregate(sequence(0, 7), " +
        "0L, (a, j) -> a + element_at(cc, " +
        "cast((idx % 8) * 8 + j + 1 as int)) " +
        "* element_at(g64, cast((idx div 8) * 8 + j + 1 as int))))")
      .as("f64")), "f64")
    fArr
      .withColumn("fsum", expr("aggregate(f64, 0L, (a, y) -> a + y)"))
      .select(col("media_id"), expr(
        "aggregate(sequence(1, 63), 0L, (a, idx) -> a + " +
          "(CASE WHEN element_at(f64, cast(idx as int)) * 63 > fsum " +
          "THEN shiftleft(cast(1 as bigint), cast(idx - 1 as int)) " +
          "ELSE 0L END))").as("dhash"))
  }

  val dctPerceptualHash: Q = {
    val H = PH_H; val C1 = 1000000L; val C2 = 2000000L; val SH = 8L
    val ctVals = DCT_CT
    Q(
      (s, d) => {
        import s.implicits._
        val base = t(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= 1)
        // three tiers off one corpus: originals, 2×-upscaled copies
        // (%8==1 — pixel replication along x: zero shared BYTES, a
        // different pixel COUNT), intensity-shifted copies (%8==2)
        val media = base
          .select(col("doc_id").as("media_id"), col("doc_id").as("orig_id"),
            col("text"), lit(0L).as("shift"), lit(1L).as("sc"))
          .unionByName(base.filter(col("doc_id") % 8 === 1)
            .select((col("doc_id") + C1).as("media_id"),
              col("doc_id").as("orig_id"), col("text"),
              lit(0L).as("shift"), lit(2L).as("sc")))
          .unionByName(base.filter(col("doc_id") % 8 === 2)
            .select((col("doc_id") + C2).as("media_id"),
              col("doc_id").as("orig_id"), col("text"),
              lit(SH).as("shift"), lit(1L).as("sc")))
          .withColumn("w", lit(3L) + col("orig_id") % 5)
        val grid = bmpGrid(media, col("sc")).persist()
        // aHash over the FULL decoded grid — q328's arm, the foil
        val stats = grid.groupBy("media_id", "orig_id", "wp")
          .agg(sum("luma").as("luma_sum"), count(lit(1)).as("n_px"))
        val ahashes = grid.select(col("media_id"), col("p"), col("luma"))
          .join(stats.select(col("media_id"), col("luma_sum"),
            col("n_px")), "media_id")
          .groupBy("media_id")
          .agg(sum(when(col("luma") * col("n_px") > col("luma_sum"),
            expr("shiftleft(cast(1 as bigint), cast(p as int))"))
            .otherwise(lit(0L)))
            .as("ahash"))
        // pHash: the whole transform (fixed 8×8 lattice → centering →
        // both separable DCT passes → thresholding → packing) runs as
        // per-media bounded array expressions — ~1100 integer ops per
        // media in one projection, zero further shuffles (the
        // exploded row form paid two 38M-row exchange+agg passes at
        // sf0.1 and made q336 the suite's slowest query; this is the
        // same math on the same integers). Each stage lands behind a
        // same-key aggregate so the next stage reads a MATERIALIZED
        // array attribute: a Project alias referenced inside a lambda
        // is re-evaluated on every element_at access (interpreted
        // HOFs have no subexpression reuse), and chaining the stages
        // through aliases multiplies into ~1e9 ops per media — see
        // [[dctHashes]], which q341's persisted index shares.
        val dhashes = dctHashes(grid)
        val fps = stats.select(col("media_id"), col("orig_id"), col("wp"))
          .join(ahashes, "media_id").join(dhashes, "media_id")
          .persist()
        // per arm: block-pair mass over the arm's natural key (aHash
        // blocks within a pixel geometry; pHash is geometry-free by
        // construction) + the two copy-tier pairing counters
        def arm(name: String, fp: Column, bk: Column): DataFrame = {
          val keyed = fps.select(col("media_id"), col("orig_id"),
            bk.as("bk"), fp.as("fp"))
          val blockPairs = keyed.groupBy("bk", "fp")
            .agg(count(lit(1)).as("n"))
            .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
              .as("n_block_pairs"))
          val orig = keyed.filter(col("media_id") < C1)
            .select(col("orig_id"), col("fp").as("fp_o"))
          def copied(off: Long) = keyed
            .filter(col("media_id") >= off && col("media_id") < off + C1)
            .select(col("orig_id"), col("fp").as("fp_c"))
            .join(orig, "orig_id")
            .agg(coalesce(sum(when(col("fp_c") === col("fp_o"), 1L)
              .otherwise(0L)), lit(0L)))
          blockPairs.crossJoin(copied(C1).toDF("n_copy_scaled"))
            .crossJoin(copied(C2).toDF("n_copy_shifted"))
            .select(lit(name).as("arm"), col("n_block_pairs"),
              col("n_copy_scaled"), col("n_copy_shifted"))
        }
        arm("1_ahash", col("ahash"), col("wp"))
          .unionByName(arm("2_dct", col("dhash"), lit(0L)))
          .orderBy("arm")
      }, {
        val ctRows = ctVals.map { case (u, i, c) => s"($u, $i, $c)" }
          .mkString(", ")
        s"""WITH d0 AS (SELECT doc_id, text FROM documents
           |            WHERE length(text) >= 1),
           |m AS (
           |  SELECT doc_id AS media_id, doc_id AS orig_id, text,
           |    0::BIGINT AS shift, 1::BIGINT AS sc FROM d0
           |  UNION ALL
           |  SELECT doc_id + $C1, doc_id, text, 0::BIGINT, 2::BIGINT
           |  FROM d0 WHERE doc_id % 8 = 1
           |  UNION ALL
           |  SELECT doc_id + $C2, doc_id, text, $SH::BIGINT, 1::BIGINT
           |  FROM d0 WHERE doc_id % 8 = 2),
           |p0 AS (SELECT media_id, orig_id, text, shift, sc,
           |         (3 + orig_id % 5)::BIGINT AS w,
           |         ((3 + orig_id % 5) * sc)::BIGINT AS wp FROM m),
           |g AS (SELECT media_id, orig_id, text, shift, sc, w, wp,
           |        unnest(range(0, $H::BIGINT)) AS r FROM p0),
           |gc AS (SELECT media_id, orig_id, text, shift, sc, w, wp, r,
           |         unnest(range(0, wp)) AS c FROM g),
           |px AS (
           |  SELECT media_id, orig_id, wp, r, c, r * wp + c AS p,
           |    ascii(substring(text,
           |      ((r * w + c // sc) % length(text) + 1)::INT, 1)) AS cp,
           |    shift
           |  FROM gc),
           |lm AS (
           |  SELECT media_id, orig_id, wp, r, c, p,
           |    (cp % 16 + 30 + shift) * 2 + (cp % 32 + 20 + shift) * 5
           |      + (cp % 64 + 10 + shift) AS luma
           |  FROM px),
           |st AS (
           |  SELECT media_id, orig_id, wp,
           |    sum(luma)::BIGINT AS luma_sum, count(*)::BIGINT AS n_px
           |  FROM lm GROUP BY 1, 2, 3),
           |fpa AS (
           |  SELECT l.media_id, st.orig_id, st.wp,
           |    sum(CASE WHEN l.luma * st.n_px > st.luma_sum
           |             THEN (1::BIGINT << l.p::INT) ELSE 0 END)::BIGINT
           |      AS ahash
           |  FROM lm l JOIN st ON l.media_id = st.media_id
           |  GROUP BY 1, 2, 3),
           |ct AS (SELECT * FROM (VALUES $ctRows) AS t(u, i, coef)),
           |sm AS (
           |  SELECT d.media_id, ii.i, jj.j,
           |    ii.i // 2 AS r, (jj.j * d.wp) // 8 AS c
           |  FROM (SELECT DISTINCT media_id, wp FROM p0) d,
           |    (SELECT unnest(range(0, 8)) AS i) ii,
           |    (SELECT unnest(range(0, 8)) AS j) jj),
           |sv AS (
           |  SELECT sm.media_id, sm.i, sm.j, lm.luma
           |  FROM sm JOIN lm ON lm.media_id = sm.media_id
           |    AND lm.r = sm.r AND lm.c = sm.c),
           |ss AS (SELECT media_id, sum(luma) AS ssum FROM sv GROUP BY 1),
           |sx AS (
           |  SELECT sv.media_id, sv.i, sv.j, sv.luma * 64 - ss.ssum AS x
           |  FROM sv JOIN ss ON sv.media_id = ss.media_id),
           |g1 AS (
           |  SELECT sx.media_id, ct.u, sx.j, sum(ct.coef * sx.x) AS gx
           |  FROM sx JOIN ct ON ct.i = sx.i
           |  GROUP BY 1, 2, 3),
           |f1 AS (
           |  SELECT g1.media_id, g1.u, ct.u AS v,
           |    sum(ct.coef * g1.gx) AS f
           |  FROM g1 JOIN ct ON ct.i = g1.j
           |  GROUP BY 1, 2, 3
           |  HAVING NOT (g1.u = 0 AND ct.u = 0)),
           |fs AS (SELECT media_id, sum(f) AS fsum FROM f1 GROUP BY 1),
           |fpd AS (
           |  SELECT f1.media_id,
           |    sum(CASE WHEN f1.f * 63 > fs.fsum
           |             THEN (1::BIGINT << (f1.u * 8 + f1.v - 1)::INT)
           |             ELSE 0 END)::BIGINT AS dhash
           |  FROM f1 JOIN fs ON f1.media_id = fs.media_id
           |  GROUP BY 1),
           |arms AS (
           |  SELECT '1_ahash' AS arm, fpa.media_id, fpa.orig_id,
           |    fpa.wp AS bk, fpa.ahash AS fp
           |  FROM fpa
           |  UNION ALL
           |  SELECT '2_dct', fpa.media_id, fpa.orig_id, 0::BIGINT,
           |    fpd.dhash
           |  FROM fpa JOIN fpd ON fpa.media_id = fpd.media_id),
           |bp AS (
           |  SELECT arm, coalesce(sum(n * (n - 1) // 2), 0)::BIGINT
           |      AS n_block_pairs
           |  FROM (SELECT arm, bk, fp, count(*)::BIGINT AS n
           |        FROM arms GROUP BY 1, 2, 3) z
           |  GROUP BY arm),
           |cpr AS (
           |  SELECT o.arm,
           |    coalesce(sum(CASE WHEN c.media_id >= $C1
           |        AND c.media_id < ${2 * C1}
           |        AND c.fp = o.fp THEN 1 ELSE 0 END), 0)::BIGINT
           |      AS n_copy_scaled,
           |    coalesce(sum(CASE WHEN c.media_id >= $C2
           |        AND c.fp = o.fp THEN 1 ELSE 0 END), 0)::BIGINT
           |      AS n_copy_shifted
           |  FROM arms o JOIN arms c
           |    ON c.arm = o.arm AND c.orig_id = o.orig_id
           |      AND c.media_id >= $C1
           |  WHERE o.media_id < $C1
           |  GROUP BY o.arm)
           |SELECT bp.arm, bp.n_block_pairs, cpr.n_copy_scaled,
           |  cpr.n_copy_shifted
           |FROM bp JOIN cpr ON bp.arm = cpr.arm
           |ORDER BY bp.arm""".stripMargin
      })
  }

  /** Hybrid retrieval through a PINNED fleet snapshot (q337) — the
    * verdict's composed-read closure made concrete on the q282
    * shape: BM25 (LexIndex) × LSH-ANN (SimIndex) Borda fusion where
    * BOTH arms resolve through ONE [[graft.operators.FleetSnapshot]]
    * manifest instead of "latest". The chain publishes both families
    * over one aligned corpus (doc_id ≡ vec_id), pins m1, purges a
    * doc slice from BOTH (lex compaction recomputes N/Σdl/df from
    * survivors; sim scrubs its key rows), pins m2 — and the judged
    * read then serves the SAME query batch through m1 and m2:
    * the m1 arms run AFTER the purge committed and still fuse the
    * pre-purge world with its pre-purge collection stats (a
    * latest-reader would already see the shrunken N — the skew the
    * manifest forbids), while m2 fuses the survivor world. The
    * oracle replays BM25 + banding + fusion per arm with per-snapshot
    * worlds: pairing either arm's ranking with the other snapshot's
    * stats or survivor set hash-mismatches.
    */
  val pinnedHybridServe: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 410L; val K = 10; val F = 5
    val delSql = "% 7 = 2"
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def isDel(c: Column): Column = c % 7 === 2
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") < INDEX_MAX)
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val fleetRoot = graft.sources.Artifacts.versionedRoot(
          "graft-fleet-hy", d,
          Seq("documents.parquet", "embeddings.parquet"))
        val lexRoot = new java.io.File(fleetRoot, "lex").getAbsolutePath
        val simRoot = new java.io.File(fleetRoot, "sim").getAbsolutePath
        if (FleetSnapshot.list(fleetRoot).isEmpty) {
          LexIndex.publish(base, "doc_id", "text", lexRoot)
          val r = VectorFunctions.mtBits(index.count())
          SimIndex.publish(index, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), simRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("lex" -> lexRoot, "sim" -> simRoot))
        }
        if (FleetSnapshot.list(fleetRoot).size < 2) {
          val del = base.filter(isDel(col("doc_id"))).select("doc_id")
          LexIndex.addTombstones(s, del, "doc_id", lexRoot)
          LexIndex.mergeCompact(s, lexRoot)
          SimIndex.addTombstones(s,
            del.withColumnRenamed("doc_id", "vec_id"), "vec_id", simRoot)
          SimIndex.mergeCompact(s, simRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("lex" -> lexRoot, "sim" -> simRoot))
        }
        val qdocs = docs.filter(
          col("doc_id") >= INDEX_MAX && col("doc_id") < Q_MAX)
        val qterms = qdocs.select(col("doc_id").as("query_id"),
            explode(TextFunctions.words(col("text"))).as("term"))
          .filter(length(col("term")) > 0).distinct()
        val qvec = emb.filter(
          col("vec_id") >= INDEX_MAX && col("vec_id") < Q_MAX)
        def arm(n: Long): DataFrame = {
          val gens = FleetSnapshot.at(fleetRoot, n)
          val lexTop = LexIndex.bm25TopKAt(s, qterms, "query_id", "term",
              K, gens("lex"))
            .select(col("query_id"), col("index_id").as("doc_id"),
              (lit(K + 1) - col("rnk")).cast("long").as("lex_pts"))
          val vecTop = SimIndex.probeTopKAt(s, qvec, "vec_id",
              "embedding", K, gens("sim"))
            .select(col("query_id"), col("index_id").as("doc_id"),
              (lit(K + 1) - col("rnk")).cast("long").as("vec_pts"))
          val fused = lexTop
            .join(vecTop, Seq("query_id", "doc_id"), "full_outer")
            .na.fill(0L, Seq("lex_pts", "vec_pts"))
            .withColumn("borda", col("lex_pts") + col("vec_pts"))
          val wf = Window.partitionBy("query_id")
            .orderBy(desc("borda"), asc("doc_id"))
          fused.withColumn("rnk", row_number().over(wf).cast("long"))
            .filter(col("rnk") <= F)
            .withColumn("snap", lit(n))
            .select("snap", "query_id", "doc_id", "lex_pts", "vec_pts",
              "borda", "rnk")
        }
        concurrently(Seq(() => arm(1), () => arm(2)))
          .reduce(_.unionByName(_))
          .orderBy("snap", "query_id", "rnk")
      }, {
        // one snapshot arm: BM25 over that arm's SURVIVOR world (its
        // own collection stats — the purged generation recomputed
        // N/Σdl/df from survivors) + banding over the same world with
        // the FROZEN publish-time (r, T), Borda-fused
        def armCtes(sfx: String, pred: String => String): String =
          s"""tok$sfx AS (SELECT doc_id, term FROM tok0
             |            WHERE ${pred("doc_id")}),
             |tf$sfx AS (SELECT doc_id, term, count(*)::BIGINT AS tf
             |           FROM tok$sfx GROUP BY 1, 2),
             |dl$sfx AS (SELECT doc_id, count(*)::BIGINT AS dl
             |           FROM tok$sfx GROUP BY 1),
             |df$sfx AS (SELECT term, count(*)::BIGINT AS df
             |           FROM tf$sfx GROUP BY 1),
             |st$sfx AS (SELECT count(*)::BIGINT AS n_docs,
             |             sum(dl)::BIGINT AS sumdl FROM dl$sfx),
             |sc$sfx AS (
             |  SELECT q.query_id, f.doc_id AS index_id,
             |    ${graft.operators.LexIndex.contribSql(
                  "f.tf", "d.df", "l.dl", "n_docs", "sumdl", "//")}
             |      AS contrib
             |  FROM tf$sfx f JOIN qt q USING (term)
             |  JOIN df$sfx d USING (term)
             |  JOIN dl$sfx l ON l.doc_id = f.doc_id CROSS JOIN st$sfx),
             |ag$sfx AS (
             |  SELECT query_id, index_id, sum(contrib)::BIGINT AS score
             |  FROM sc$sfx GROUP BY 1, 2),
             |lextop$sfx AS (
             |  SELECT query_id, index_id AS doc_id,
             |    (${K + 1} - r)::BIGINT AS lex_pts
             |  FROM (SELECT query_id, index_id,
             |          row_number() OVER (PARTITION BY query_id
             |            ORDER BY score DESC, index_id) AS r
             |        FROM ag$sfx) z WHERE r <= $K),
             |ascore$sfx AS (
             |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
             |    max(round(${VectorFunctions.cosineSql(
                  "q.embedding", "kb.embedding")}, 6)) AS cos_sim
             |  FROM qkb q JOIN ikb kb
             |    ON q.tbl = kb.tbl AND q.bucket = kb.bucket
             |  WHERE ${pred("kb.vec_id")}
             |  GROUP BY 1, 2),
             |vectop$sfx AS (
             |  SELECT query_id, index_id AS doc_id,
             |    (${K + 1} - rnk)::BIGINT AS vec_pts
             |  FROM (SELECT query_id, index_id,
             |          row_number() OVER (PARTITION BY query_id
             |            ORDER BY cos_sim DESC, index_id) AS rnk
             |        FROM ascore$sfx) z WHERE rnk <= $K),
             |fr$sfx AS (
             |  SELECT query_id, doc_id,
             |    coalesce(l.lex_pts, 0)::BIGINT AS lex_pts,
             |    coalesce(v.vec_pts, 0)::BIGINT AS vec_pts,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY coalesce(l.lex_pts, 0) + coalesce(v.vec_pts, 0)
             |        DESC, doc_id) AS r
             |  FROM lextop$sfx l FULL OUTER JOIN vectop$sfx v
             |    USING (query_id, doc_id))""".stripMargin
        s"""WITH w AS (
           |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
           |  FROM documents WHERE doc_id < $INDEX_MAX),
           |tok0 AS (
           |  SELECT doc_id, t AS term FROM (
           |    SELECT doc_id, unnest(arr) AS t FROM w)
           |  WHERE length(t) > 0),
           |wq AS (
           |  SELECT doc_id, ${TextFunctions.wordsSql("text")} AS arr
           |  FROM documents WHERE doc_id >= $INDEX_MAX AND doc_id < $Q_MAX),
           |qt AS (
           |  SELECT DISTINCT doc_id AS query_id, t AS term FROM (
           |    SELECT doc_id, unnest(arr) AS t FROM wq)
           |  WHERE length(t) > 0),
           |idx0 AS (SELECT vec_id, embedding FROM embeddings
           |         WHERE vec_id < $INDEX_MAX),
           |params AS (
           |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
           |    ${VectorFunctions.mtTablesSql(
                  VectorFunctions.mtBitsSql("count(*)"))} AS nt
           |  FROM idx0),
           |ie AS (
           |  SELECT vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params WHERE vec_id < $INDEX_MAX),
           |iek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM ie),
           |ikb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM iek),
           |qe AS (
           |  SELECT vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params
           |  WHERE vec_id >= $INDEX_MAX AND vec_id < $Q_MAX),
           |qek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM qe),
           |qkb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM qek),
           |${armCtes("a", c => s"$c IS NOT NULL")},
           |${armCtes("b", c => s"NOT ($c $delSql)")}
           |SELECT snap, query_id, doc_id, lex_pts, vec_pts,
           |  (lex_pts + vec_pts)::BIGINT AS borda, r::BIGINT AS rnk
           |FROM (
           |  SELECT CAST(1 AS BIGINT) AS snap, * FROM fra WHERE r <= $F
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT) AS snap, * FROM frb WHERE r <= $F
           |) u ORDER BY snap, query_id, rnk""".stripMargin
      })
  }

  /** Graph-ANN through PINNED snapshots (q338) — time travel through
    * the SERVING STRUCTURE itself: q327's kNN graph behind
    * [[graft.operators.FleetSnapshot]], with
    * [[GraphIndex.neighborsAt]] walking a committed generation
    * exactly as pinned. The chain builds the graph, pins m1, runs the
    * q331 purge (tombstone a slice INCLUDING entry node 100 →
    * bucket-local purgeCompact → generation 2), pins m2 — then ONE
    * query batch beams through BOTH manifests: the m1 walk runs
    * AFTER the purge committed yet still routes THROUGH the purged
    * nodes and returns them (the pre-purge world the manifest pinned
    * — retention keeps the prior generation readable precisely for
    * this), while the m2 walk neither returns nor routes through
    * them (q331's closure). Entry liveness derives from the PINNED
    * generation per arm — the same artifact-derived rule as q334,
    * evaluated against each snapshot's world. The oracle replays
    * both walks (full graph vs masked graph, per-arm entry
    * existence); a routing difference on either side breaks the
    * hash.
    */
  val pinnedKnnServe: Q = {
    val INDEX_MAX = 400L; val Q_MAX = 420L
    val M_KNN = 6; val ROUNDS = 3; val K = 10; val B = 8
    val ENT_MOD = 50L
    val delSql = "(vec_id % 25 = 7 OR vec_id = 100)"
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def isDel(c: Column): Column = c % 25 === 7 || c === 100
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val eAll = VectorQuantizer.scaled(
          emb.filter(col("vec_id") < Q_MAX), "vec_id", "embedding")
          .persist()
        val eIdx = eAll.filter(col("vec_id") < INDEX_MAX)
        val fleetRoot = graft.sources.Artifacts.versionedRoot(
          "graft-fleet-gr", d, Seq("embeddings.parquet"))
        val graphRoot = new java.io.File(fleetRoot, "knn").getAbsolutePath
        if (FleetSnapshot.list(fleetRoot).isEmpty) {
          val cent = VectorQuantizer.fitCentroids(
            eIdx, "vec_id", KM_C, KM_ITERS)
          val cells = VectorQuantizer.assignCells(eIdx, cent, "vec_id")
          val xs = eIdx.select(col("vec_id"), col("xs"))
          val pairs = cells.as("a")
            .join(cells.as("b"), col("a.cell") === col("b.cell") &&
              col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
            .join(xs.select(col("vec_id").as("u"), col("xs").as("xu")), "u")
            .join(xs.select(col("vec_id").as("v"), col("xs").as("xv")), "v")
            .select(col("u"), col("v"),
              VectorQuantizer.l2DistSq(col("xu"), col("xv")).as("d2"))
          val knn = pairs.withColumn("rnk", row_number().over(
              Window.partitionBy("u").orderBy(col("d2"), col("v"))))
            .filter(col("rnk") <= M_KNN)
            .select(col("u"), col("v"))
          GraphIndex.publish(
            knn.select(col("u").as("src"), col("v").as("dst"))
              .unionByName(knn.select(col("v").as("src"),
                col("u").as("dst")))
              .distinct()
              .withColumn("w", lit(1L)),
            graphRoot)
          FleetSnapshot.pin(fleetRoot, Map("knn" -> graphRoot))
        }
        if (FleetSnapshot.list(fleetRoot).size < 2) {
          GraphIndex.addTombstones(s,
            eIdx.select(col("vec_id").as("node"))
              .filter(isDel(col("node"))), "node", graphRoot)
          GraphIndex.purgeCompact(s, graphRoot)
          FleetSnapshot.pin(fleetRoot, Map("knn" -> graphRoot))
        }
        val qxs = eAll.filter(col("vec_id") >= INDEX_MAX)
          .select(col("vec_id").as("query_id"), col("xs").as("qx"))
        val ixs = eIdx.select(col("vec_id").as("node"), col("xs").as("nx"))
        def score(cand: DataFrame): DataFrame =
          cand.join(ixs, "node").join(qxs, "query_id")
            .select(col("query_id"), col("node"),
              VectorQuantizer.l2DistSq(col("qx"), col("nx")).as("d2"))
        def top(scored: DataFrame, n: Int): DataFrame =
          scored.withColumn("rnk", row_number().over(
              Window.partitionBy("query_id").orderBy(col("d2"), col("node"))))
            .filter(col("rnk") <= n)
        def arm(n: Long): DataFrame = {
          val gen = FleetSnapshot.at(fleetRoot, n)("knn")
          val entCand = ixs.filter(col("node") % ENT_MOD === 0)
            .select("node")
          val entries = GraphIndex.neighborsAt(s, entCand, gen)
            .select("node").distinct()
          var (visited, frontier) =
            beamStage(score(qxs.select("query_id").crossJoin(entries)), B)
          for (_ <- 1 to ROUNDS) {
            if (!frontier.isEmpty) {
              val nb = GraphIndex.neighborsAt(s, frontier, gen)
              val fresh = nb
                .select(col("query_id"), col("nbr").as("node")).distinct()
                .join(visited.select("query_id", "node"),
                  Seq("query_id", "node"), "left_anti")
              val (newV, newF) = beamStage(score(fresh), B)
              visited = visited.unionByName(newV)
              frontier = newF
            }
          }
          top(visited, K)
            .select(lit(n).as("snap"), col("query_id"), col("node"),
              col("d2"), col("rnk").cast("long").as("rnk"))
        }
        concurrently(Seq(() => arm(1), () => arm(2)))
          .reduce(_.unionByName(_))
          .orderBy("snap", "query_id", "rnk")
      }, {
        def beamCtes(sfx: String, graph: String): String = {
          val rounds = (1 to ROUNDS).map { r =>
            s"""n$r$sfx AS (
               |  SELECT DISTINCT f.query_id, g.dst AS node
               |  FROM f${r - 1}$sfx f JOIN $graph g ON g.src = f.node
               |  WHERE NOT EXISTS (SELECT 1 FROM v${r - 1}$sfx v
               |                    WHERE v.query_id = f.query_id
               |                      AND v.node = g.dst)),
               |v$r$sfx AS (
               |  SELECT query_id, node, d2 FROM v${r - 1}$sfx
               |  UNION ALL
               |  SELECT n.query_id, n.node, q.d2
               |  FROM n$r$sfx n JOIN qd q
               |    ON q.query_id = n.query_id AND q.node = n.node),
               |f$r$sfx AS (
               |  SELECT query_id, node FROM (
               |    SELECT n.query_id, n.node,
               |      row_number() OVER (PARTITION BY n.query_id
               |                         ORDER BY q.d2, n.node) AS rnk
               |    FROM n$r$sfx n JOIN qd q
               |      ON q.query_id = n.query_id AND q.node = n.node) z
               |  WHERE rnk <= $B)""".stripMargin
          }.mkString(",\n")
          s"""ent$sfx AS (
             |  SELECT DISTINCT vec_id AS node FROM e
             |  WHERE vec_id < $INDEX_MAX AND vec_id % $ENT_MOD = 0
             |    AND EXISTS (SELECT 1 FROM $graph g
             |                WHERE g.src = e.vec_id)),
             |v0$sfx AS (
             |  SELECT qd.query_id, qd.node, qd.d2
             |  FROM qd JOIN ent$sfx ON qd.node = ent$sfx.node),
             |f0$sfx AS (
             |  SELECT query_id, node FROM (
             |    SELECT query_id, node,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY d2, node) AS rnk
             |    FROM v0$sfx) z WHERE rnk <= $B),
             |$rounds,
             |res$sfx AS (
             |  SELECT query_id, node, d2 FROM (
             |    SELECT query_id, node, d2,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY d2, node) AS rnk
             |    FROM v$ROUNDS$sfx) z WHERE rnk <= $K)""".stripMargin
        }
        s"""WITH ${kmeansCtes(fitPred = s"e.vec_id < $INDEX_MAX")},
           |fa AS (
           |  SELECT e.vec_id, c.cell,
           |    sum((e.xs - c.cs) * (e.xs - c.cs)) AS d2
           |  FROM e JOIN c$KM_ITERS c USING (dim)
           |  WHERE e.vec_id < $INDEX_MAX
           |  GROUP BY e.vec_id, c.cell),
           |ca AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT vec_id, cell,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY d2, cell) AS rnk
           |    FROM fa) z WHERE rnk = 1),
           |pd AS (
           |  SELECT a.vec_id AS u, b.vec_id AS v,
           |    sum((ea.xs - eb.xs) * (ea.xs - eb.xs)) AS d2
           |  FROM ca a JOIN ca b ON a.cell = b.cell
           |    AND a.vec_id <> b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
           |  GROUP BY 1, 2),
           |knn AS (
           |  SELECT u, v FROM (
           |    SELECT u, v,
           |      row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rnk
           |    FROM pd) z WHERE rnk <= $M_KNN),
           |gf AS (SELECT u AS src, v AS dst FROM knn
           |       UNION SELECT v, u FROM knn),
           |del AS (SELECT DISTINCT vec_id FROM e
           |        WHERE vec_id < $INDEX_MAX AND $delSql),
           |gm AS (
           |  SELECT src, dst FROM gf
           |  WHERE src NOT IN (SELECT vec_id FROM del)
           |    AND dst NOT IN (SELECT vec_id FROM del)),
           |qd AS (
           |  SELECT q.vec_id AS query_id, x.vec_id AS node,
           |    sum((q.xs - x.xs) * (q.xs - x.xs)) AS d2
           |  FROM e q JOIN e x ON q.dim = x.dim AND x.vec_id < $INDEX_MAX
           |  WHERE q.vec_id >= $INDEX_MAX AND q.vec_id < $Q_MAX
           |  GROUP BY 1, 2),
           |${beamCtes("a", "gf")},
           |${beamCtes("b", "gm")}
           |SELECT snap, query_id, node, d2::BIGINT AS d2,
           |  CAST(row_number() OVER (PARTITION BY snap, query_id
           |                          ORDER BY d2, node) AS BIGINT) AS rnk
           |FROM (
           |  SELECT CAST(1 AS BIGINT) AS snap, * FROM resa
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT) AS snap, * FROM resb
           |) u ORDER BY snap, query_id, rnk""".stripMargin
      })
  }

  /** Hard-negative mining through a PINNED fleet snapshot (q339) —
    * the q275 composition (retrieval pool minus near-dup positives)
    * re-based on COMMITTED artifacts resolved through ONE
    * [[graft.operators.FleetSnapshot]] manifest: recall stage =
    * LSH-ANN candidates from the pinned sim generation
    * ([[SimIndex.probeTopKAt]]), positive screen = banded-MinHash
    * near-dup pairs from the pinned dedup generation
    * ([[DedupIndex.probeAt]] — the r16 pinned path; duplicates are
    * positives, and training on them as negatives poisons the
    * objective). The query batch is REDELIVERED copies of index docs
    * (id + 1000, same text, same embedding — q91's trick), so the
    * screen provably fires: each copy's top retrieval is its own
    * original, which the dedup arm excludes. The chain publishes
    * both families, pins m1, purges a doc slice from BOTH, pins m2;
    * both judged arms run AFTER the purge committed. The m1 arm
    * still retrieves AND excludes purged originals — mining against
    * the pre-purge world with its pre-purge component structure
    * (a latest-reader would silently emit a purged doc's surviving
    * near-dups as negatives); the m2 arm never sees them. The oracle
    * replays banding, cosine ranking, and the screen per-world;
    * pairing either stage with the other snapshot's world
    * hash-mismatches.
    */
  val pinnedNegatives: Q = {
    val INDEX_MAX = 400L; val Q_SRC = 10L; val C = 12
    val delSql = "% 9 = 4"
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    val bandRowsSql = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def isDel(c: Column): Column = c % 9 === 4
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") < INDEX_MAX)
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val index = emb.filter(col("vec_id") < INDEX_MAX)
        val fleetRoot = graft.sources.Artifacts.versionedRoot(
          "graft-fleet-hn", d,
          Seq("documents.parquet", "embeddings.parquet"))
        val simRoot = new java.io.File(fleetRoot, "sim").getAbsolutePath
        val dedupRoot = new java.io.File(fleetRoot, "dedup").getAbsolutePath
        // the raw tables the arms read directly (query batches) are
        // pinned by content fingerprint alongside the index
        // generations — assertCorpus below fails a pinned read whose
        // corpus moved since the pin (the corpus/index skew guard)
        val corpus = Map(
          "documents" -> s"$d/documents.parquet",
          "embeddings" -> s"$d/embeddings.parquet")
        if (FleetSnapshot.list(fleetRoot).isEmpty) {
          val r = VectorFunctions.mtBits(index.count())
          SimIndex.publish(index, "vec_id", "embedding",
            r, VectorFunctions.mtTables(r), simRoot)
          DedupIndex.publish(
            Dedup.minhashSignatures(base, "doc_id", "text", MH_K),
            "doc_id", MH_BANDS, MH_R, dedupRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("sim" -> simRoot, "dedup" -> dedupRoot), corpus)
        }
        if (FleetSnapshot.list(fleetRoot).size < 2) {
          val del = base.filter(isDel(col("doc_id"))).select("doc_id")
          SimIndex.addTombstones(s,
            del.withColumnRenamed("doc_id", "vec_id"), "vec_id", simRoot)
          SimIndex.mergeCompact(s, simRoot)
          DedupIndex.addTombstones(s, del, "doc_id", dedupRoot)
          DedupIndex.compact(s, dedupRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("sim" -> simRoot, "dedup" -> dedupRoot), corpus)
        }
        // the query batch: redelivered copies of index docs 0..9
        val qdocs = docs.filter(col("doc_id") < Q_SRC)
          .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
        val qvec = emb.filter(col("vec_id") < Q_SRC)
          .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
        val sigQ = Dedup.minhashSignatures(qdocs, "doc_id", "text", MH_K)
        def arm(n: Long): DataFrame = {
          // a pinned read whose query batch comes off the RAW tables
          // must first prove those tables are still the pinned world
          FleetSnapshot.assertCorpus(fleetRoot, n, corpus)
          val gens = FleetSnapshot.at(fleetRoot, n)
          val cand = SimIndex.probeTopKAt(s, qvec, "vec_id",
              "embedding", C, gens("sim"))
            .select(col("query_id"), col("index_id"), col("rnk"))
          val dup = DedupIndex.probeAt(s, sigQ, "doc_id",
              MH_BANDS, MH_R, gens("dedup"))
            .select(col("new_id").as("query_id"), col("index_id"))
            .withColumn("dup", lit(1L))
          val flagged = cand.join(dup, Seq("query_id", "index_id"), "left")
            .na.fill(0L, Seq("dup"))
          val perQ = flagged.groupBy("query_id")
            .agg(count(lit(1)).as("n_cand"), sum("dup").as("n_excluded"))
          val top1 = flagged.filter(col("dup") === 0)
            .withColumn("r2", row_number().over(
              Window.partitionBy("query_id").orderBy("rnk")))
            .filter(col("r2") === 1)
            .select(col("query_id"), col("index_id").as("top_neg_id"),
              col("rnk").as("top_neg_rnk"))
          perQ.join(top1, Seq("query_id"), "left")
            .withColumn("snap", lit(n))
            .select(col("snap"), col("query_id"), col("n_cand"),
              col("n_excluded"),
              (col("n_cand") - col("n_excluded")).as("n_negs"),
              coalesce(col("top_neg_id"), lit(-1L)).as("top_neg_id"),
              coalesce(col("top_neg_rnk"), lit(-1L)).as("top_neg_rnk"))
        }
        concurrently(Seq(() => arm(1), () => arm(2)))
          .reduce(_.unionByName(_))
          .orderBy("snap", "query_id")
      }, {
        // one snapshot arm: cosine top-C over that world's survivor
        // index, banded near-dup screen over the same world, q275's
        // per-query rollup
        def armCtes(sfx: String, pred: String => String): String =
          s"""scored$sfx AS (
             |  SELECT q.vec_id AS query_id, kb.vec_id AS index_id,
             |    max(round(${VectorFunctions.cosineSql(
                    "q.embedding", "kb.embedding")}, 6)) AS cos_sim
             |  FROM qkb q JOIN ikb kb
             |    ON q.tbl = kb.tbl AND q.bucket = kb.bucket
             |  WHERE ${pred("kb.vec_id")}
             |  GROUP BY 1, 2),
             |cand$sfx AS (
             |  SELECT query_id, index_id, rnk FROM (
             |    SELECT query_id, index_id,
             |      CAST(row_number() OVER (PARTITION BY query_id
             |        ORDER BY cos_sim DESC, index_id) AS BIGINT) AS rnk
             |    FROM scored$sfx) z WHERE rnk <= $C),
             |dup$sfx AS (
             |  SELECT DISTINCT a.doc_id AS query_id, b.doc_id AS index_id
             |  FROM bands a JOIN bands b
             |    ON a.band = b.band AND a.band_key = b.band_key
             |  WHERE a.is_new = 1 AND b.is_new = 0
             |    AND ${pred("b.doc_id")}),
             |flag$sfx AS (
             |  SELECT c.query_id, c.index_id, c.rnk,
             |    CASE WHEN d.index_id IS NOT NULL THEN 1 ELSE 0 END AS dup
             |  FROM cand$sfx c LEFT JOIN dup$sfx d
             |    ON d.query_id = c.query_id AND d.index_id = c.index_id),
             |perq$sfx AS (
             |  SELECT query_id, count(*)::BIGINT AS n_cand,
             |    sum(dup)::BIGINT AS n_excluded
             |  FROM flag$sfx GROUP BY query_id),
             |top1$sfx AS (
             |  SELECT query_id, index_id, rnk FROM (
             |    SELECT query_id, index_id, rnk,
             |      row_number() OVER (PARTITION BY query_id
             |        ORDER BY rnk) AS r2
             |    FROM flag$sfx WHERE dup = 0) z WHERE r2 = 1),
             |res$sfx AS (
             |  SELECT p.query_id, p.n_cand, p.n_excluded,
             |    (p.n_cand - p.n_excluded)::BIGINT AS n_negs,
             |    coalesce(t.index_id, -1)::BIGINT AS top_neg_id,
             |    coalesce(t.rnk, -1)::BIGINT AS top_neg_rnk
             |  FROM perq$sfx p LEFT JOIN top1$sfx t USING (query_id))"""
            .stripMargin
        s"""WITH docs AS (SELECT doc_id, text FROM documents),
           |corpus AS (
           |  SELECT doc_id, text, 0 AS is_new FROM docs
           |  WHERE doc_id < $INDEX_MAX
           |  UNION ALL SELECT doc_id + 1000, text, 1 FROM docs
           |    WHERE doc_id < $Q_SRC),
           |w AS (SELECT doc_id, is_new,
           |        ${TextFunctions.wordsSql("text")} AS arr FROM corpus),
           |sh AS (SELECT DISTINCT doc_id, is_new,
           |         unnest(${TextFunctions.shinglesSql("arr")}) AS s FROM w),
           |sig AS (
           |  SELECT doc_id, is_new,
           |    $sigCols
           |  FROM sh GROUP BY doc_id, is_new),
           |bands AS (
           |  $bandRowsSql),
           |idx0 AS (SELECT vec_id, embedding FROM embeddings
           |         WHERE vec_id < $INDEX_MAX),
           |params AS (
           |  SELECT (${VectorFunctions.mtBitsSql("count(*)")}) AS r,
           |    ${VectorFunctions.mtTablesSql(
                  VectorFunctions.mtBitsSql("count(*)"))} AS nt
           |  FROM idx0),
           |ie AS (
           |  SELECT vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params WHERE vec_id < $INDEX_MAX),
           |iek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM ie),
           |ikb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM iek),
           |qe AS (
           |  SELECT vec_id + 1000 AS vec_id, embedding,
           |    ${VectorFunctions.scaledMicroSql("embedding")} AS xs, r, nt
           |  FROM embeddings, params WHERE vec_id < $Q_SRC),
           |qek AS (
           |  SELECT vec_id, embedding, xs, r, unnest(range(0, nt)) AS tbl
           |  FROM qe),
           |qkb AS (
           |  SELECT vec_id, embedding, tbl,
           |    ${VectorFunctions.mtBucketSqlDyn("xs", "tbl", "r")} AS bucket
           |  FROM qek),
           |${armCtes("a", c => s"$c IS NOT NULL")},
           |${armCtes("b", c => s"NOT ($c $delSql)")}
           |SELECT snap, query_id, n_cand, n_excluded, n_negs,
           |  top_neg_id, top_neg_rnk
           |FROM (
           |  SELECT CAST(1 AS BIGINT) AS snap, * FROM resa
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT) AS snap, * FROM resb
           |) u ORDER BY snap, query_id""".stripMargin
      })
  }

  /** Ingestion-gate audit through a PINNED fleet snapshot (q340) —
    * the remaining three pinned read paths judged in one composed
    * gate on q294's drift world: between the pins, the re-crawl
    * comes back in a different orthography (deterministic full-string
    * reversal). The gate ingests the re-crawled batch (first-seen
    * fold + compact, sketch delta + compact) and the tokenizer
    * RETRAINS on the re-crawled corpus; pin m2. The judged read then
    * scores the NEXT re-crawled batch through both manifests, per
    * audit doc: novelty against the pinned first-seen map
    * ([[FirstSeenIndex.scoreAt]]), summed count-min estimates of its
    * terms from the pinned cells ([[SketchIndex.estimateAt]]), and
    * token counts under the pinned tokenizer's own frozen merges
    * ([[BpeIndex.tokenizeAt]]). Every signal separates the worlds:
    * the m1 arm sees the batch as alien (all shingles novel, term
    * estimates near zero, fertility inflated under the forward
    * merges), the m2 arm as yesterday's domain (shared shingles
    * absorbed, real estimates, retrained fertility) — and the m1 arm
    * runs AFTER all of that committed, rows a latest-reader can
    * never produce again. The oracle replays BOTH worlds end to end:
    * two first-occurrence corpora, two exact CMS builds over mixed
    * orthographies, two full BPE trains (the prefixed train chains)
    * with their applies. Reruns that re-publish exercise pin-aware
    * retention: the m1 generations fall below the keep-2 floor and
    * survive only because the live manifest pins them.
    */
  val pinnedIngestGate: Q = {
    val BASE = 300L; val B1 = 360L; val AUD = 380L
    // world 1 = forward base; world 2 = forward base + re-crawled
    // (reversed) batch for the map/sketch, reversed re-crawl for the
    // retrained tokenizer
    def armCtes(i: Int, shCorpus: String, cmsCorpus: String,
                trainTp: String, trainWhere: String, trainText: String,
                pfx: String): String =
      s"""wsh$i AS (
         |  SELECT DISTINCT unnest(${TextFunctions.shinglesSql("arr")}) AS s
         |  FROM (SELECT ${TextFunctions.wordsSql("text")} AS arr
         |        FROM $shCorpus) z),
         |nf$i AS (
         |  SELECT a.doc_id,
         |    CASE WHEN w.s IS NULL AND a.doc_id = bm.bfirst
         |      THEN 1 ELSE 0 END AS novel
         |  FROM ash a JOIN abm bm ON bm.s = a.s
         |  LEFT JOIN wsh$i w ON w.s = a.s),
         |nov$i AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_sh,
         |    sum(novel)::BIGINT AS n_novel
         |  FROM nf$i GROUP BY doc_id),
         |${cmsWorldSql(i, "TRUE", "aqt", CMS_W, cmsCorpus)},
         |cs$i AS (
         |  SELECT t.doc_id, sum(e.cms_est)::BIGINT AS cms_sum
         |  FROM adt t JOIN est$i e USING (term) GROUP BY t.doc_id),
         |${BpeOracle.chainForText(trainWhere, trainText, trainTp)},
         |${BpeOracle.applyChain("adw", pfx, trainTp)},
         |tok$i AS (
         |  SELECT o.doc_id, count(*)::BIGINT AS n_words,
         |    sum(x.n_sub)::BIGINT AS n_subwords
         |  FROM ao o JOIN ${pfx}n x USING (word) GROUP BY o.doc_id),
         |res$i AS (
         |  SELECT doc_id, n_sh, n_novel, n_words, n_subwords, cms_sum
         |  FROM nov$i JOIN tok$i USING (doc_id)
         |  JOIN cs$i USING (doc_id))""".stripMargin
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val fleetRoot = graft.sources.Artifacts.versionedRoot(
          "graft-fleet-gate", d, Seq("documents.parquet"))
        val fsRoot = new java.io.File(fleetRoot, "fs").getAbsolutePath
        val cmsRoot = new java.io.File(fleetRoot, "cms").getAbsolutePath
        val bpeRoot = new java.io.File(fleetRoot, "bpe").getAbsolutePath
        // the audit batch comes off the raw documents table — its
        // content fingerprint is pinned with the index generations
        // and asserted before every pinned read (corpus/index skew)
        val corpus = Map("documents" -> s"$d/documents.parquet")
        if (FleetSnapshot.list(fleetRoot).isEmpty) {
          val base = docs.filter(col("doc_id") < BASE)
          FirstSeenIndex.publish(
            Dedup.shingleSet(base, "doc_id", "text", 3), fsRoot)
          SketchIndex.publish(termsOf(base), "term", CMS_D, CMS_W, cmsRoot)
          BpeIndex.publish(base, "doc_id", "text", BPE_ROUNDS, bpeRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("fs" -> fsRoot, "cms" -> cmsRoot, "bpe" -> bpeRoot),
            corpus)
        }
        if (FleetSnapshot.list(fleetRoot).size < 2) {
          // the re-crawl: batch 1 arrives reversed (q294's drift
          // world); the tokenizer retrains on the re-crawled corpus
          val b1 = docs.filter(col("doc_id") >= BASE && col("doc_id") < B1)
            .select(col("doc_id"), reverse(col("text")).as("text"))
          FirstSeenIndex.fold(s,
            Dedup.shingleSet(b1, "doc_id", "text", 3), fsRoot, tag = "b1")
          FirstSeenIndex.mergeCompact(s, fsRoot)
          if (!SketchIndex.folded(cmsRoot, "b1"))
            SketchIndex.appendDelta(s, termsOf(b1), "term", cmsRoot,
              tag = "b1")
          SketchIndex.mergeCompact(s, cmsRoot)
          BpeIndex.publish(
            docs.filter(col("doc_id") < B1)
              .select(col("doc_id"), reverse(col("text")).as("text")),
            "doc_id", "text", BPE_ROUNDS, bpeRoot)
          FleetSnapshot.pin(fleetRoot,
            Map("fs" -> fsRoot, "cms" -> cmsRoot, "bpe" -> bpeRoot),
            corpus)
        }
        // the audit batch's derived frames are shared by BOTH arms —
        // persist so the shingle/term derivations run once, not per
        // arm (batch-bounded rows)
        val audit = docs.filter(col("doc_id") >= B1 && col("doc_id") < AUD)
          .select(col("doc_id"), reverse(col("text")).as("text"))
          .persist()
        val ash = Dedup.shingleSet(audit, "doc_id", "text", 3).persist()
        val aterm = audit.select(col("doc_id"),
            explode(TextFunctions.words(col("text"))).as("term"))
          .filter(length(col("term")) > 0).distinct().persist()
        def arm(n: Long): DataFrame = {
          // the pinned gate re-reads the raw audit docs — prove the
          // table is still the world the manifest pinned
          FleetSnapshot.assertCorpus(fleetRoot, n, corpus)
          val gens = FleetSnapshot.at(fleetRoot, n)
          val nov = FirstSeenIndex.scoreAt(s, ash, gens("fs"))
          val tok = BpeIndex.tokenizeAt(s, audit, "doc_id", "text",
            gens("bpe"))
          val est = SketchIndex.estimateAt(s, aterm.select("term"),
            "term", gens("cms"))
          val cs = aterm.join(est, Seq("term"))
            .groupBy("doc_id")
            .agg(sum(col("cms_est")).as("cms_sum"))
          nov.join(tok, Seq("doc_id")).join(cs, Seq("doc_id"))
            .withColumn("snap", lit(n))
            .select("snap", "doc_id", "n_sh", "n_novel",
              "n_words", "n_subwords", "cms_sum")
        }
        concurrently(Seq(() => arm(1), () => arm(2)))
          .reduce(_.unionByName(_)).orderBy("snap", "doc_id")
      },
      s"""WITH cmsp(r, a, b) AS (VALUES ${CountMin.paramsSqlValues(CMS_D)}),
         |aw0 AS (
         |  SELECT doc_id,
         |    ${TextFunctions.wordsSql("reverse(text)")} AS arr
         |  FROM documents WHERE doc_id >= $B1 AND doc_id < $AUD),
         |ao AS (
         |  SELECT doc_id, t AS word FROM (
         |    SELECT doc_id, unnest(arr) AS t FROM aw0)
         |  WHERE length(t) > 0),
         |adw AS (SELECT DISTINCT word FROM ao),
         |adt AS (SELECT DISTINCT doc_id, word AS term FROM ao),
         |aqt AS (SELECT DISTINCT term FROM adt),
         |ash AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(${TextFunctions.shinglesSql("arr")}) AS s
         |  FROM aw0),
         |abm AS (SELECT s, min(doc_id) AS bfirst FROM ash GROUP BY s),
         |shc1 AS (SELECT text FROM documents WHERE doc_id < $BASE),
         |shc2 AS (
         |  SELECT text FROM documents WHERE doc_id < $BASE
         |  UNION ALL SELECT reverse(text) FROM documents
         |    WHERE doc_id >= $BASE AND doc_id < $B1),
         |${armCtes(1, "shc1", "shc1", "", s"WHERE doc_id < $BASE",
             "text", "ua")},
         |${armCtes(2, "shc2", "shc2", "w2", s"WHERE doc_id < $B1",
             "reverse(text)", "ub")}
         |SELECT snap, doc_id, n_sh, n_novel, n_words, n_subwords, cms_sum
         |FROM (
         |  SELECT CAST(1 AS BIGINT) AS snap, * FROM res1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT) AS snap, * FROM res2
         |) u ORDER BY snap, doc_id""".stripMargin)
  }

  /** PERSISTED DCT perceptual-hash index (q341) — q336's
    * scale-robust tier promoted into the committed media index,
    * closing the gap the r15 verdict named: q329's artifact serves
    * row-aHash elements, so a SCALED copy probe misses what q336
    * proves catchable in-plan. Two element universes, same
    * [[graft.operators.DedupIndex]] lifecycle, published over the
    * same decoded originals: the row-hash universe (q329's — its
    * elements embed the pixel width, so a 2× upscale shares zero
    * elements with its original by construction) and the DCT-word
    * universe (the 63 AC sign bits of [[dctHashes]] packed into 8
    * per-block words — geometry-free AND shift-free). The judged
    * probe batch mixes 2×-upscaled copies of indexed media,
    * intensity-shifted copies, and novel documents; candidates from
    * each committed artifact are verified by true shared-element
    * count (≥3 of 4 rows / ≥6 of 8 words). The arm matrix is the
    * claim: the row-hash artifact pairs every shifted copy and NO
    * scaled copy; the DCT artifact pairs both tiers — through
    * committed artifacts with bucket-pruned probes, not an in-plan
    * demo. Oracle replays pixels → row hashes AND pixels → lattice →
    * integer DCT → words, both minhash-banded NEW×INDEX chains, and
    * the verification joins.
    */
  val persistedDctIndex: Q = {
    val INDEX_MAX = 400L; val C1 = 1000000L; val C2 = 2000000L
    val SH = 8L; val MIN_ROWH = 3L; val MIN_DCT = 6L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    def bandsSqlFor(sig: String): String = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM $sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= 1)
        def mediaOf(df: DataFrame, off: Long, shift: Long, sc: Long) =
          df.select((col("doc_id") + off).as("media_id"),
              col("doc_id").as("orig_id"), col("text"),
              lit(shift).as("shift"), lit(sc).as("sc"))
            .withColumn("w", lit(3L) + col("orig_id") % 5)
        val idxM = mediaOf(docs.filter(col("doc_id") < INDEX_MAX), 0, 0, 1)
        val probeM = mediaOf(docs.filter(col("doc_id") < INDEX_MAX &&
              col("doc_id") % 8 === 1), C1, 0, 2)
          .unionByName(mediaOf(docs.filter(col("doc_id") < INDEX_MAX &&
            col("doc_id") % 8 === 2), C2, SH, 1))
          .unionByName(mediaOf(docs.filter(col("doc_id") >= INDEX_MAX),
            0, 0, 1))
        // ONE decode pass per media batch, shared by BOTH element
        // universes (the r16 bench showed each universe re-decoding
        // the same grids — at sf0.1 that's four redundant passes over
        // ~5k media per run); the grids are media-bounded (H·wp rows
        // per item) so the cache is small
        def rowSets(g: DataFrame): DataFrame = {
          val rs = g.groupBy("media_id", "r")
            .agg(sum("luma").as("lsum"), count(lit(1)).as("n"))
          g.join(rs, Seq("media_id", "r"))
            .groupBy(col("media_id").as("doc_id"), col("wp"), col("r"))
            .agg(sum(when(col("luma") * col("n") > col("lsum"),
              expr("shiftleft(cast(1 as bigint), cast(c as int))"))
              .otherwise(lit(0L))).as("rh"))
            .select(col("doc_id"),
              concat_ws(":", col("wp"), col("r"), col("rh")).as("s"))
        }
        def dctSets(g: DataFrame): DataFrame =
          dctHashes(g)
            .withColumn("b", explode(sequence(lit(0L), lit(7L))))
            .select(col("media_id").as("doc_id"),
              concat_ws(":", col("b"),
                expr("shiftright(dhash, cast(8 * b as int)) & 255"))
                .as("s"))
        val gridIdx = bmpGrid(idxM, col("sc")).persist()
        val gridProbe = bmpGrid(probeM, col("sc")).persist()
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-dct-index", d, Seq("documents.parquet"))
        val rowhRoot = new java.io.File(root, "rowh").getAbsolutePath
        val dctRoot = new java.io.File(root, "dct").getAbsolutePath
        if (DedupIndex.resolve(rowhRoot).isEmpty)
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(rowSets(gridIdx), "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, rowhRoot)
        if (DedupIndex.resolve(dctRoot).isEmpty)
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(dctSets(gridIdx), "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, dctRoot)
        def arm(name: String, setsOf: DataFrame => DataFrame,
                armRoot: String, minShared: Long): DataFrame = {
          val probeSets = setsOf(gridProbe).persist()
          val cand = DedupIndex.probe(s,
            Dedup.minhashSignaturesOfSets(probeSets, "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, armRoot)
          val verified = cand
            .join(probeSets.withColumnRenamed("doc_id", "new_id"),
              Seq("new_id"))
            .join(setsOf(gridIdx).withColumnRenamed("doc_id", "index_id"),
              Seq("index_id", "s"))
            .groupBy("new_id", "index_id")
            .agg(count(lit(1)).as("n_shared"))
            .filter(col("n_shared") >= minShared)
          verified.agg(
              count(lit(1)).as("n_pairs"),
              coalesce(sum(when(col("new_id") >= C1 &&
                  col("new_id") < C2 &&
                  col("new_id") - C1 === col("index_id"), 1L)
                .otherwise(0L)), lit(0L)).as("n_copy_scaled"),
              coalesce(sum(when(col("new_id") >= C2 &&
                  col("new_id") - C2 === col("index_id"), 1L)
                .otherwise(0L)), lit(0L)).as("n_copy_shifted"))
            .select(lit(name).as("arm"), col("n_pairs"),
              col("n_copy_scaled"), col("n_copy_shifted"))
        }
        concurrently(Seq(() => arm("1_rowh", rowSets, rowhRoot, MIN_ROWH),
            () => arm("2_dct", dctSets, dctRoot, MIN_DCT)))
          .reduce(_.unionByName(_))
          .orderBy("arm")
      }, {
        val ctRows = DCT_CT.map { case (u, i, c) => s"($u, $i, $c)" }
          .mkString(", ")
        s"""WITH d0 AS (SELECT doc_id, text FROM documents
           |            WHERE length(text) >= 1),
           |m AS (
           |  SELECT doc_id AS media_id, doc_id AS orig_id, text,
           |    0::BIGINT AS shift, 1::BIGINT AS sc, 0 AS is_new
           |  FROM d0 WHERE doc_id < $INDEX_MAX
           |  UNION ALL
           |  SELECT doc_id + $C1, doc_id, text, 0::BIGINT, 2::BIGINT, 1
           |  FROM d0 WHERE doc_id < $INDEX_MAX AND doc_id % 8 = 1
           |  UNION ALL
           |  SELECT doc_id + $C2, doc_id, text, $SH::BIGINT, 1::BIGINT, 1
           |  FROM d0 WHERE doc_id < $INDEX_MAX AND doc_id % 8 = 2
           |  UNION ALL
           |  SELECT doc_id, doc_id, text, 0::BIGINT, 1::BIGINT, 1
           |  FROM d0 WHERE doc_id >= $INDEX_MAX),
           |p0 AS (SELECT media_id, orig_id, text, shift, sc, is_new,
           |         (3 + orig_id % 5)::BIGINT AS w,
           |         ((3 + orig_id % 5) * sc)::BIGINT AS wp FROM m),
           |g AS (SELECT media_id, text, shift, sc, is_new, w, wp,
           |        unnest(range(0, $PH_H::BIGINT)) AS r FROM p0),
           |gc AS (SELECT media_id, text, shift, sc, is_new, w, wp, r,
           |         unnest(range(0, wp)) AS c FROM g),
           |px AS (
           |  SELECT media_id, is_new, wp, r, c,
           |    ascii(substring(text,
           |      ((r * w + c // sc) % length(text) + 1)::INT, 1)) AS cp,
           |    shift
           |  FROM gc),
           |lm AS (
           |  SELECT media_id, is_new, wp, r, c,
           |    (cp % 16 + 30 + shift) * 2 + (cp % 32 + 20 + shift) * 5
           |      + (cp % 64 + 10 + shift) AS luma
           |  FROM px),
           |rsum AS (
           |  SELECT media_id, r, sum(luma)::BIGINT AS lsum,
           |    count(*)::BIGINT AS n
           |  FROM lm GROUP BY 1, 2),
           |rhh AS (
           |  SELECT l.media_id, any_value(l.is_new) AS is_new,
           |    any_value(l.wp) AS wp, l.r,
           |    sum(CASE WHEN l.luma * rs.n > rs.lsum
           |             THEN (1::BIGINT << l.c::INT) ELSE 0 END)::BIGINT
           |      AS rhash
           |  FROM lm l JOIN rsum rs
           |    ON rs.media_id = l.media_id AND rs.r = l.r
           |  GROUP BY l.media_id, l.r),
           |rel AS (
           |  SELECT media_id AS doc_id, is_new,
           |    (wp::VARCHAR || ':' || r::VARCHAR || ':' ||
           |      rhash::VARCHAR) AS s
           |  FROM rhh),
           |rsig AS (
           |  SELECT doc_id, is_new,
           |    $sigCols
           |  FROM rel GROUP BY doc_id, is_new),
           |rbands AS (
           |  ${bandsSqlFor("rsig")}),
           |rcand AS (
           |  SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
           |  FROM rbands a JOIN rbands x
           |    ON a.band = x.band AND a.band_key = x.band_key
           |  WHERE a.is_new = 1 AND x.is_new = 0),
           |rvp AS (
           |  SELECT c.new_id, c.index_id
           |  FROM rcand c
           |  JOIN rel a ON a.doc_id = c.new_id
           |  JOIN rel x ON x.doc_id = c.index_id AND x.s = a.s
           |  GROUP BY 1, 2
           |  HAVING count(*) >= $MIN_ROWH),
           |ct AS (SELECT * FROM (VALUES $ctRows) AS t(u, i, coef)),
           |sm AS (
           |  SELECT d.media_id, ii.i, jj.j,
           |    ii.i // 2 AS r, (jj.j * d.wp) // 8 AS c
           |  FROM (SELECT DISTINCT media_id, wp FROM p0) d,
           |    (SELECT unnest(range(0, 8)) AS i) ii,
           |    (SELECT unnest(range(0, 8)) AS j) jj),
           |sv AS (
           |  SELECT sm.media_id, sm.i, sm.j, lm.luma
           |  FROM sm JOIN lm ON lm.media_id = sm.media_id
           |    AND lm.r = sm.r AND lm.c = sm.c),
           |ss AS (SELECT media_id, sum(luma) AS ssum FROM sv GROUP BY 1),
           |sx AS (
           |  SELECT sv.media_id, sv.i, sv.j, sv.luma * 64 - ss.ssum AS x
           |  FROM sv JOIN ss ON sv.media_id = ss.media_id),
           |g1 AS (
           |  SELECT sx.media_id, ct.u, sx.j, sum(ct.coef * sx.x) AS gx
           |  FROM sx JOIN ct ON ct.i = sx.i
           |  GROUP BY 1, 2, 3),
           |f1 AS (
           |  SELECT g1.media_id, g1.u, ct.u AS v,
           |    sum(ct.coef * g1.gx) AS f
           |  FROM g1 JOIN ct ON ct.i = g1.j
           |  GROUP BY 1, 2, 3
           |  HAVING NOT (g1.u = 0 AND ct.u = 0)),
           |fs AS (SELECT media_id, sum(f) AS fsum FROM f1 GROUP BY 1),
           |fpd AS (
           |  SELECT f1.media_id,
           |    sum(CASE WHEN f1.f * 63 > fs.fsum
           |             THEN (1::BIGINT << (f1.u * 8 + f1.v - 1)::INT)
           |             ELSE 0 END)::BIGINT AS dhash
           |  FROM f1 JOIN fs ON f1.media_id = fs.media_id
           |  GROUP BY 1),
           |del AS (
           |  SELECT p.media_id AS doc_id, p.is_new,
           |    (b.b::VARCHAR || ':' ||
           |      ((fpd.dhash >> (8 * b.b)::INT) & 255)::VARCHAR) AS s
           |  FROM (SELECT DISTINCT media_id, is_new FROM p0) p
           |  JOIN fpd ON fpd.media_id = p.media_id
           |  CROSS JOIN (SELECT unnest(range(0, 8)) AS b) b),
           |dsig AS (
           |  SELECT doc_id, is_new,
           |    $sigCols
           |  FROM del GROUP BY doc_id, is_new),
           |dbands AS (
           |  ${bandsSqlFor("dsig")}),
           |dcand AS (
           |  SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
           |  FROM dbands a JOIN dbands x
           |    ON a.band = x.band AND a.band_key = x.band_key
           |  WHERE a.is_new = 1 AND x.is_new = 0),
           |dvp AS (
           |  SELECT c.new_id, c.index_id
           |  FROM dcand c
           |  JOIN del a ON a.doc_id = c.new_id
           |  JOIN del x ON x.doc_id = c.index_id AND x.s = a.s
           |  GROUP BY 1, 2
           |  HAVING count(*) >= $MIN_DCT)
           |SELECT arm, n_pairs, n_copy_scaled, n_copy_shifted FROM (
           |  SELECT '1_rowh' AS arm, count(*)::BIGINT AS n_pairs,
           |    coalesce(sum(CASE WHEN new_id >= $C1 AND new_id < $C2
           |        AND new_id - $C1 = index_id THEN 1 ELSE 0 END),
           |      0)::BIGINT AS n_copy_scaled,
           |    coalesce(sum(CASE WHEN new_id >= $C2
           |        AND new_id - $C2 = index_id THEN 1 ELSE 0 END),
           |      0)::BIGINT AS n_copy_shifted
           |  FROM rvp
           |  UNION ALL
           |  SELECT '2_dct', count(*)::BIGINT,
           |    coalesce(sum(CASE WHEN new_id >= $C1 AND new_id < $C2
           |        AND new_id - $C1 = index_id THEN 1 ELSE 0 END),
           |      0)::BIGINT,
           |    coalesce(sum(CASE WHEN new_id >= $C2
           |        AND new_id - $C2 = index_id THEN 1 ELSE 0 END),
           |      0)::BIGINT
           |  FROM dvp
           |) u ORDER BY arm""".stripMargin
      })
  }

  /** Audio perceptual fingerprint (q342) — the Haitsma-Kalker shape
    * in exact integers, completing audio's exact ⊂ perceptual tier
    * (images got theirs in q328/q336; audio had only exact frame
    * hashes, which an AMPLITUDE-scaled re-encode of the same
    * recording defeats). Every document renders as a complete
    * RIFF/WAVE file (q244's real codec) and the pipeline decodes the
    * BYTES back (LE header fields, two's-complement s16le samples);
    * per 8-sample frame it takes 4 sub-band energies as bounded
    * integer |sample| sums, and the fingerprint is the classic H-K
    * bit lattice: sign of the (band-energy delta across band) delta
    * across FRAMES — bit(f,b) = [ (E(f,b)−E(f,b+1)) −
    * (E(f−1,b)−E(f−1,b+1)) > 0 ]. A positive gain multiplies every
    * energy, every delta, and flips no sign, so the fingerprint is
    * amplitude-invariant by construction — while the exact arm
    * (position-weighted sample sum, the q93 family) changes with
    * every scaled sample. The probe tiers: bit-exact copies (both
    * arms pair all 50) and gain-2 re-encodes (exact arm pairs 0, the
    * H-K arm all 50). Block-pair mass is aggregated per fingerprint,
    * never media×media. The oracle recomputes everything from the
    * source text without seeing the bytes — one wrong byte in
    * encode/decode breaks the hash (q244's doctrine).
    */
  val audioFingerprint: Q = {
    val MAX_S = 96; val C1 = 1000000L; val C2 = 2000000L
    val GAIN = 2L
    Q(
      (s, d) => {
        val base = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= 1)
        def mediaOf(df: DataFrame, off: Long, gain: Long) =
          df.select((col("doc_id") + off).as("media_id"),
            col("doc_id").as("orig_id"), col("text"),
            lit(gain).as("gain"))
        val media = mediaOf(base, 0, 1)
          .unionByName(mediaOf(base.filter(col("doc_id") % 8 === 1), C1, 1))
          .unionByName(
            mediaOf(base.filter(col("doc_id") % 8 === 2), C2, GAIN))
        val n = least(length(col("text")), lit(MAX_S.toLong))
        val rate = lit(8000L) + (col("orig_id") % 3) * 4000L
        def sample(i: Column): Column =
          ((ascii(col("text").substr(i, lit(1))) % 64) - 32) * 500 *
            col("gain")
        val enc = media.select(col("media_id"), col("orig_id"),
          Multimodal.wavBytes(rate, n, sample).as("wav"))
        // decode from the bytes alone: sample count from the LE32
        // data-size field, samples as two's-complement s16le — decoded
        // ONCE per media into a bounded (≤ MAX_S) array attribute, and
        // both fingerprints then fold over that array in one
        // projection. The previous shape exploded ~n rows per media
        // and derived the H-K lattice through two groupBy exchanges
        // plus two self-joins of the band-energy frame — six
        // corpus-sized shuffles for math that is per-media bounded
        // (guide §2.4: remove shuffles outright). The groupBy bound
        // between decode and fold is [[dctHashes]]' materialization
        // boundary: a Project-alias array referenced inside lambdas is
        // re-evaluated per element_at (interpreted HOFs), so the fold
        // must read a MATERIALIZED array attribute.
        def smpOf(i: Column): Column = {
          val raw = Multimodal.leRead(col("wav"), lit(45L) + i * 2L, 2)
          raw - lit(65536L) * (raw >= 32768L).cast("long")
        }
        val sv0 = enc
          .select(col("media_id"), col("orig_id"),
            (Multimodal.leRead(col("wav"), lit(41), 4) / lit(2L))
              .cast("long").as("n_samp"), col("wav"))
          .select(col("media_id"), col("orig_id"), col("n_samp"),
            transform(sequence(lit(1L), col("n_samp")),
              k => smpOf(k - 1)).as("sv"))
        val svb = sv0.groupBy("media_id")
          .agg(first("orig_id").as("orig_id"), first("n_samp").as("n"),
            first("sv").as("sv"))
        // E(f,b) = Σ|s(i)| over the band's ≤2 samples below n; the
        // H-K bit at p = (f-1)·3 + b exists iff 8f+2b+2 < n (both the
        // (f,b)→(f,b+1) delta and its f-1 predecessor exist) — the
        // exact group-existence conditions of the exploded join form,
        // now arithmetic guards
        def ef(fs: String, bs: String): String =
          s"(abs(element_at(sv, cast(($fs) * 8 + ($bs) * 2 + 1 as int)))" +
            s" + (CASE WHEN ($fs) * 8 + ($bs) * 2 + 1 < n THEN " +
            s"abs(element_at(sv, cast(($fs) * 8 + ($bs) * 2 + 2 as int)))" +
            " ELSE 0L END))"
        def de(fs: String): String =
          s"(${ef(fs, "p % 3")} - ${ef(fs, "p % 3 + 1")})"
        val fps = svb.select(col("media_id"), col("orig_id"),
            expr("aggregate(sequence(1, n), 0L, (a, k) -> " +
              "a + k * element_at(sv, cast(k as int)))").as("fp"),
            expr("aggregate(filter(sequence(0, 32), p -> " +
              "8 * (p div 3 + 1) + 2 * (p % 3) + 2 < n), 0L, (a, p) -> " +
              s"a + (CASE WHEN ${de("p div 3 + 1")} > ${de("p div 3")} " +
              "THEN shiftleft(cast(1 as bigint), cast(p as int)) " +
              "ELSE 0L END))").as("fp_hk"))
          .persist()
        def arm(name: String, fp: Column): DataFrame = {
          val keyed = fps.select(col("media_id"), col("orig_id"),
            fp.as("fp"))
          val blockPairs = keyed.groupBy("fp")
            .agg(count(lit(1)).as("n"))
            .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
              .as("n_block_pairs"))
          val orig = keyed.filter(col("media_id") < C1)
            .select(col("orig_id"), col("fp").as("fp_o"))
          def copied(off: Long) = keyed
            .filter(col("media_id") >= off && col("media_id") < off + C1)
            .select(col("orig_id"), col("fp").as("fp_c"))
            .join(orig, "orig_id")
            .agg(coalesce(sum(when(col("fp_c") === col("fp_o"), 1L)
              .otherwise(0L)), lit(0L)))
          blockPairs.crossJoin(copied(C1).toDF("n_copy_exact"))
            .crossJoin(copied(C2).toDF("n_copy_scaled"))
            .select(lit(name).as("arm"), col("n_block_pairs"),
              col("n_copy_exact"), col("n_copy_scaled"))
        }
        arm("1_exact", col("fp"))
          .unionByName(arm("2_hk", col("fp_hk")))
          .orderBy("arm")
      },
      s"""WITH d0 AS (SELECT doc_id, text FROM documents
         |            WHERE length(text) >= 1),
         |m AS (
         |  SELECT doc_id AS media_id, doc_id AS orig_id, text,
         |    1::BIGINT AS gain FROM d0
         |  UNION ALL
         |  SELECT doc_id + $C1, doc_id, text, 1::BIGINT
         |  FROM d0 WHERE doc_id % 8 = 1
         |  UNION ALL
         |  SELECT doc_id + $C2, doc_id, text, $GAIN::BIGINT
         |  FROM d0 WHERE doc_id % 8 = 2),
         |p AS (SELECT media_id, orig_id, gain, text,
         |        least(length(text), $MAX_S) AS n FROM m),
         |sm AS (SELECT media_id, orig_id, gain, text, n,
         |         unnest(range(1, n + 1)) AS i FROM p),
         |sv AS (
         |  SELECT media_id, orig_id, i - 1 AS i,
         |    ((ascii(substring(text, i::INT, 1)) % 64) - 32) * 500 * gain
         |      AS smp
         |  FROM sm),
         |fe AS (
         |  SELECT media_id, sum((i + 1) * smp)::BIGINT AS fp
         |  FROM sv GROUP BY 1),
         |be AS (
         |  SELECT media_id, i // 8 AS f, (i % 8) // 2 AS b,
         |    sum(abs(smp))::BIGINT AS e
         |  FROM sv GROUP BY 1, 2, 3),
         |db AS (
         |  SELECT a.media_id, a.f, a.b, a.e - c.e AS de
         |  FROM be a JOIN be c
         |    ON c.media_id = a.media_id AND c.f = a.f AND c.b = a.b + 1),
         |bits AS (
         |  SELECT cur.media_id, (cur.f - 1) * 3 + cur.b AS p,
         |    CASE WHEN cur.de > prev.de THEN 1 ELSE 0 END AS bit
         |  FROM db cur JOIN db prev
         |    ON prev.media_id = cur.media_id AND prev.f = cur.f - 1
         |      AND prev.b = cur.b),
         |hk AS (
         |  SELECT media_id,
         |    sum(bit * (1::BIGINT << p::INT))::BIGINT AS fp_hk
         |  FROM bits GROUP BY 1),
         |fps AS (
         |  SELECT v.media_id, v.orig_id, fe.fp,
         |    coalesce(hk.fp_hk, 0)::BIGINT AS fp_hk
         |  FROM (SELECT DISTINCT media_id, orig_id FROM sv) v
         |  JOIN fe ON fe.media_id = v.media_id
         |  LEFT JOIN hk ON hk.media_id = v.media_id),
         |arms AS (
         |  SELECT '1_exact' AS arm, media_id, orig_id, fp FROM fps
         |  UNION ALL
         |  SELECT '2_hk', media_id, orig_id, fp_hk FROM fps),
         |bp AS (
         |  SELECT arm, coalesce(sum(n * (n - 1) // 2), 0)::BIGINT
         |      AS n_block_pairs
         |  FROM (SELECT arm, fp, count(*)::BIGINT AS n
         |        FROM arms GROUP BY 1, 2) z
         |  GROUP BY arm),
         |cpr AS (
         |  SELECT o.arm,
         |    coalesce(sum(CASE WHEN c.media_id >= $C1
         |        AND c.media_id < ${2 * C1}
         |        AND c.fp = o.fp THEN 1 ELSE 0 END), 0)::BIGINT
         |      AS n_copy_exact,
         |    coalesce(sum(CASE WHEN c.media_id >= $C2
         |        AND c.fp = o.fp THEN 1 ELSE 0 END), 0)::BIGINT
         |      AS n_copy_scaled
         |  FROM arms o JOIN arms c
         |    ON c.arm = o.arm AND c.orig_id = o.orig_id
         |      AND c.media_id >= $C1
         |  WHERE o.media_id < $C1
         |  GROUP BY o.arm)
         |SELECT bp.arm, bp.n_block_pairs, cpr.n_copy_exact,
         |  cpr.n_copy_scaled
         |FROM bp JOIN cpr ON bp.arm = cpr.arm
         |ORDER BY bp.arm""".stripMargin)
  }

  /** PERSISTED audio perceptual index (q343) — q342's H-K tier
    * promoted into the committed media index, the audio twin of
    * q341: two element universes over the same decoded WAV samples,
    * same [[graft.operators.DedupIndex]] lifecycle. The exact
    * universe is per-frame exact words (position-weighted sample
    * sums — the q93 family's frame hash as an element set); the
    * perceptual universe is per-frame H-K words (q342's three
    * band-delta sign bits per frame boundary, packed — every word
    * amplitude-invariant by the sign argument). The judged probe
    * batch mixes bit-exact re-encodes and gain-2 re-encodes of
    * indexed audio plus novel docs; candidates from each committed
    * artifact are verified by true shared-element majority
    * (2·shared > probe's element count). Arm matrix through the
    * artifacts: the exact-word index pairs every bit-exact copy and
    * NO gain-scaled one; the H-K index pairs both tiers. Oracle
    * replays samples → both element universes → both minhash band
    * chains → verification, all from source text.
    */
  val audioHkIndex: Q = {
    val INDEX_MAX = 400L; val MAX_S = 96
    val C1 = 1000000L; val C2 = 2000000L; val GAIN = 2L
    val sigCols = (0 until MH_K)
      .map(i => s"min(${Hashing.seededSql(i, "s")}) AS h$i")
      .mkString(",\n    ")
    def bandsSqlFor(sig: String): String = (0 until MH_BANDS).map { b =>
      val key = (0 until MH_R).map(r => s"h${b * MH_R + r}")
        .mkString(" || ',' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM $sig"
    }.mkString("\n  UNION ALL ")
    Q(
      (s, d) => {
        val base = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= 1)
        def mediaOf(df: DataFrame, off: Long, gain: Long) =
          df.select((col("doc_id") + off).as("media_id"),
            col("doc_id").as("orig_id"), col("text"),
            lit(gain).as("gain"))
        val idxM = mediaOf(base.filter(col("doc_id") < INDEX_MAX), 0, 1)
        val probeM = mediaOf(base.filter(col("doc_id") < INDEX_MAX &&
              col("doc_id") % 8 === 1), C1, 1)
          .unionByName(mediaOf(base.filter(col("doc_id") < INDEX_MAX &&
            col("doc_id") % 8 === 2), C2, GAIN))
          .unionByName(mediaOf(base.filter(col("doc_id") >= INDEX_MAX),
            0, 1))
        // decode through the real codec, ONCE per media, into a
        // bounded (≤ MAX_S) sample-array attribute — q342's shape:
        // the exploded per-sample frame paid two groupBy exchanges
        // plus two self-joins per universe for math that is
        // per-media bounded (guide §2.4). The groupBy bound between
        // decode and the word folds is [[dctHashes]]' materialization
        // boundary (interpreted HOFs re-evaluate Project aliases).
        def svArrays(m: DataFrame): DataFrame = {
          val n = least(length(col("text")), lit(MAX_S.toLong))
          val rate = lit(8000L) + (col("orig_id") % 3) * 4000L
          def sample(i: Column): Column =
            ((ascii(col("text").substr(i, lit(1))) % 64) - 32) * 500 *
              col("gain")
          def smpOf(i: Column): Column = {
            val raw = Multimodal.leRead(col("wav"), lit(45L) + i * 2L, 2)
            raw - lit(65536L) * (raw >= 32768L).cast("long")
          }
          m.select(col("media_id"),
              Multimodal.wavBytes(rate, n, sample).as("wav"))
            .select(col("media_id"),
              (Multimodal.leRead(col("wav"), lit(41), 4) / lit(2L))
                .cast("long").as("n_samp"), col("wav"))
            .select(col("media_id"), col("n_samp"),
              transform(sequence(lit(1L), col("n_samp")),
                k => smpOf(k - 1)).as("sv"))
            .groupBy("media_id")
            .agg(first("n_samp").as("n"), first("sv").as("sv"))
        }
        // per-frame words as array folds over the decoded samples —
        // frame f exists iff 8f < n (exact) / 8f+2 < n (H-K, the
        // weakest band's delta-pair condition), the same group
        // existence the exploded join form produced relationally
        def exactSets(svb: DataFrame): DataFrame =
          svb.select(col("media_id").as("doc_id"),
            explode(expr(
              "transform(filter(sequence(0, 11), f -> f * 8 < n), " +
                "f -> concat(f, ':', aggregate(sequence(f * 8 + 1, " +
                "least((f + 1) * 8, n)), 0L, (a, k) -> " +
                "a + k * element_at(sv, cast(k as int)))))")).as("s"))
        def hkSets(svb: DataFrame): DataFrame = {
          def ef(fs: String, bs: String): String =
            s"(abs(element_at(sv, cast(($fs) * 8 + ($bs) * 2 + 1 as int)))" +
              s" + (CASE WHEN ($fs) * 8 + ($bs) * 2 + 1 < n THEN " +
              s"abs(element_at(sv, cast(($fs) * 8 + ($bs) * 2 + 2 as int)))" +
              " ELSE 0L END))"
          def de(fs: String): String =
            s"(${ef(fs, "b")} - ${ef(fs, "b + 1")})"
          svb.select(col("media_id").as("doc_id"),
            explode(expr(
              "transform(filter(sequence(1, 11), f -> f * 8 + 2 < n), " +
                "f -> concat(f, ':', aggregate(filter(sequence(0, 2), " +
                "b -> f * 8 + 2 * b + 2 < n), 0L, (a, b) -> " +
                s"a + (CASE WHEN ${de("f")} > ${de("f - 1")} " +
                "THEN shiftleft(cast(1 as bigint), cast(b as int)) " +
                "ELSE 0L END))))")).as("s"))
        }
        val svIdx = svArrays(idxM).persist()
        val svProbe = svArrays(probeM).persist()
        val root = graft.sources.Artifacts.versionedRoot(
          "graft-audio-hk", d, Seq("documents.parquet"))
        val exRoot = new java.io.File(root, "exact").getAbsolutePath
        val hkRoot = new java.io.File(root, "hk").getAbsolutePath
        if (DedupIndex.resolve(exRoot).isEmpty)
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(exactSets(svIdx), "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, exRoot)
        if (DedupIndex.resolve(hkRoot).isEmpty)
          DedupIndex.publish(
            Dedup.minhashSignaturesOfSets(hkSets(svIdx), "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, hkRoot)
        def arm(name: String, setsOf: DataFrame => DataFrame,
                armRoot: String): DataFrame = {
          val probeSets = setsOf(svProbe).persist()
          val nEl = probeSets.groupBy(col("doc_id").as("new_id"))
            .agg(count(lit(1)).as("n_el"))
          val cand = DedupIndex.probe(s,
            Dedup.minhashSignaturesOfSets(probeSets, "doc_id", "s",
              MH_K),
            "doc_id", MH_BANDS, MH_R, armRoot)
          val verified = cand
            .join(probeSets.withColumnRenamed("doc_id", "new_id"),
              Seq("new_id"))
            .join(setsOf(svIdx).withColumnRenamed("doc_id", "index_id"),
              Seq("index_id", "s"))
            .groupBy("new_id", "index_id")
            .agg(count(lit(1)).as("n_shared"))
            .join(nEl, Seq("new_id"))
            .filter(col("n_shared") * 2 > col("n_el"))
          verified.agg(
              count(lit(1)).as("n_pairs"),
              coalesce(sum(when(col("new_id") >= C1 &&
                  col("new_id") < C2 &&
                  col("new_id") - C1 === col("index_id"), 1L)
                .otherwise(0L)), lit(0L)).as("n_copy_exact"),
              coalesce(sum(when(col("new_id") >= C2 &&
                  col("new_id") - C2 === col("index_id"), 1L)
                .otherwise(0L)), lit(0L)).as("n_copy_scaled"))
            .select(lit(name).as("arm"), col("n_pairs"),
              col("n_copy_exact"), col("n_copy_scaled"))
        }
        concurrently(Seq(() => arm("1_exact", exactSets, exRoot),
            () => arm("2_hk", hkSets, hkRoot)))
          .reduce(_.unionByName(_))
          .orderBy("arm")
      },
      s"""WITH d0 AS (SELECT doc_id, text FROM documents
         |            WHERE length(text) >= 1),
         |m AS (
         |  SELECT doc_id AS media_id, doc_id AS orig_id, text,
         |    1::BIGINT AS gain, 0 AS is_new
         |  FROM d0 WHERE doc_id < $INDEX_MAX
         |  UNION ALL
         |  SELECT doc_id + $C1, doc_id, text, 1::BIGINT, 1
         |  FROM d0 WHERE doc_id < $INDEX_MAX AND doc_id % 8 = 1
         |  UNION ALL
         |  SELECT doc_id + $C2, doc_id, text, $GAIN::BIGINT, 1
         |  FROM d0 WHERE doc_id < $INDEX_MAX AND doc_id % 8 = 2
         |  UNION ALL
         |  SELECT doc_id, doc_id, text, 1::BIGINT, 1
         |  FROM d0 WHERE doc_id >= $INDEX_MAX),
         |p AS (SELECT media_id, is_new, gain, text,
         |        least(length(text), $MAX_S) AS n FROM m),
         |sm AS (SELECT media_id, is_new, gain, text, n,
         |         unnest(range(1, n + 1)) AS i FROM p),
         |sv AS (
         |  SELECT media_id, is_new, i - 1 AS i,
         |    ((ascii(substring(text, i::INT, 1)) % 64) - 32) * 500 * gain
         |      AS smp
         |  FROM sm),
         |eel AS (
         |  SELECT media_id AS doc_id, any_value(is_new) AS is_new,
         |    ((i // 8)::VARCHAR || ':' ||
         |      sum((i + 1) * smp)::BIGINT::VARCHAR) AS s
         |  FROM sv GROUP BY media_id, i // 8),
         |be AS (
         |  SELECT media_id, any_value(is_new) AS is_new, i // 8 AS f,
         |    (i % 8) // 2 AS b, sum(abs(smp))::BIGINT AS e
         |  FROM sv GROUP BY media_id, i // 8, (i % 8) // 2),
         |db AS (
         |  SELECT a.media_id, a.is_new, a.f, a.b, a.e - c.e AS de
         |  FROM be a JOIN be c
         |    ON c.media_id = a.media_id AND c.f = a.f AND c.b = a.b + 1),
         |hel AS (
         |  SELECT cur.media_id AS doc_id, any_value(cur.is_new) AS is_new,
         |    (cur.f::VARCHAR || ':' ||
         |      sum(CASE WHEN cur.de > prev.de
         |        THEN (1::BIGINT << cur.b::INT) ELSE 0 END)::VARCHAR) AS s
         |  FROM db cur JOIN db prev
         |    ON prev.media_id = cur.media_id AND prev.f = cur.f - 1
         |      AND prev.b = cur.b
         |  GROUP BY cur.media_id, cur.f),
         |esig AS (
         |  SELECT doc_id, is_new,
         |    $sigCols
         |  FROM eel GROUP BY doc_id, is_new),
         |ebands AS (
         |  ${bandsSqlFor("esig")}),
         |ecand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |  FROM ebands a JOIN ebands x
         |    ON a.band = x.band AND a.band_key = x.band_key
         |  WHERE a.is_new = 1 AND x.is_new = 0),
         |enel AS (SELECT doc_id AS new_id, count(*)::BIGINT AS n_el
         |         FROM eel WHERE is_new = 1 GROUP BY doc_id),
         |evp AS (
         |  SELECT c.new_id, c.index_id
         |  FROM ecand c
         |  JOIN eel a ON a.doc_id = c.new_id
         |  JOIN eel x ON x.doc_id = c.index_id AND x.s = a.s
         |  JOIN enel ne ON ne.new_id = c.new_id
         |  GROUP BY c.new_id, c.index_id, ne.n_el
         |  HAVING count(*) * 2 > ne.n_el),
         |hsig AS (
         |  SELECT doc_id, is_new,
         |    $sigCols
         |  FROM hel GROUP BY doc_id, is_new),
         |hbands AS (
         |  ${bandsSqlFor("hsig")}),
         |hcand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, x.doc_id AS index_id
         |  FROM hbands a JOIN hbands x
         |    ON a.band = x.band AND a.band_key = x.band_key
         |  WHERE a.is_new = 1 AND x.is_new = 0),
         |hnel AS (SELECT doc_id AS new_id, count(*)::BIGINT AS n_el
         |         FROM hel WHERE is_new = 1 GROUP BY doc_id),
         |hvp AS (
         |  SELECT c.new_id, c.index_id
         |  FROM hcand c
         |  JOIN hel a ON a.doc_id = c.new_id
         |  JOIN hel x ON x.doc_id = c.index_id AND x.s = a.s
         |  JOIN hnel ne ON ne.new_id = c.new_id
         |  GROUP BY c.new_id, c.index_id, ne.n_el
         |  HAVING count(*) * 2 > ne.n_el)
         |SELECT arm, n_pairs, n_copy_exact, n_copy_scaled FROM (
         |  SELECT '1_exact' AS arm, count(*)::BIGINT AS n_pairs,
         |    coalesce(sum(CASE WHEN new_id >= $C1 AND new_id < $C2
         |        AND new_id - $C1 = index_id THEN 1 ELSE 0 END),
         |      0)::BIGINT AS n_copy_exact,
         |    coalesce(sum(CASE WHEN new_id >= $C2
         |        AND new_id - $C2 = index_id THEN 1 ELSE 0 END),
         |      0)::BIGINT AS n_copy_scaled
         |  FROM evp
         |  UNION ALL
         |  SELECT '2_hk', count(*)::BIGINT,
         |    coalesce(sum(CASE WHEN new_id >= $C1 AND new_id < $C2
         |        AND new_id - $C1 = index_id THEN 1 ELSE 0 END),
         |      0)::BIGINT,
         |    coalesce(sum(CASE WHEN new_id >= $C2
         |        AND new_id - $C2 = index_id THEN 1 ELSE 0 END),
         |      0)::BIGINT
         |  FROM hvp
         |) u ORDER BY arm""".stripMargin)
  }

  val all: Map[String, Q] = Map(
    "q343_audio_hk_index" -> audioHkIndex,
    "q342_audio_fp" -> audioFingerprint,
    "q341_dct_index" -> persistedDctIndex,
    "q340_pinned_gate" -> pinnedIngestGate,
    "q339_pinned_negatives" -> pinnedNegatives,
    "q338_pinned_knn" -> pinnedKnnServe,
    "q337_pinned_hybrid" -> pinnedHybridServe,
    "q336_dct_phash" -> dctPerceptualHash,
    "q335_fleet_snapshot" -> fleetSnapshotServe,
    "q334_knn_ann_stream" -> knnAnnStream,
    "q333_knn_graph_append" -> knnGraphAppend,
    "q332_graph_sssp" -> graphSssp,
    "q331_knn_graph_purge" -> knnGraphPurge,
    "q330_graph_purge_local" -> graphPurgeLocal,
    "q329_media_phash_index" -> mediaPerceptualIndex,
    "q328_perceptual_hash" -> perceptualHash,
    "q327_knn_graph_ann" -> knnGraphAnn,
    "q326_index_catalog" -> indexCatalogReport,
    "q325_graph_in_census" -> graphInNeighbors,
    "q324_pq_ban_gate" -> pqBanGate,
    "q323_sim_ban_gate" -> simBanGate,
    "q322_fs_ban_gate" -> fsBanGate,
    "q321_lex_ban_gate" -> lexBanGate,
    "q320_dedup_ban_gate" -> dedupBanGate,
    "q319_pq_perm_serve" -> pqPermServe,
    "q318_graph_ban_gate" -> graphBanGate,
    "q317_pq_dim_balance" -> pqDimBalance,
    "q316_graph_pagerank" -> graphPagerank,
    "q315_graph_purge_stream" -> graphPurgeStream,
    "q314_graph_purge" -> graphPurge,
    "q313_graph_khop" -> graphKhop,
    "q312_graph_index" -> graphIndexServe,
    "q311_residual_purge" -> ivfPqResidualPurge,
    "q310_bpe_purge_stream" -> bpePurgeStream,
    "q309_pq_purge_stream" -> pqPurgeStream,
    "q308_dedup_purge_stream" -> dedupPurgeStream,
    "q307_lex_purge_stream" -> lexPurgeStream,
    "q306_cms_purge_stream" -> cmsPurgeStream,
    "q305_ann_purge_stream" -> annPurgeStream,
    "q304_cms_saturation" -> cmsSaturation,
    "q303_media_purge"   -> mediaPurgeCascade,
    "q302_residual_recall" -> ivfPqClustered,
    "q301_sim_redelivery" -> simRedelivery,
    "q300_cms_stream"    -> cmsStreamTwin,
    "q299_cms_purge"     -> cmsPurge,
    "q298_cms_index"     -> cmsIndexServe,
    "q297_bpe_pack"      -> bpePackCompose,
    "q296_bpe_purge"     -> bpeIndexPurge,
    "q295_bpe_stream"    -> bpeStreamTwin,
    "q294_bpe_drift"     -> bpeDriftRetrain,
    "q293_bpe_index"     -> bpeIndexServe,
    "q292_drift_retrain" -> driftRetrain,
    "q291_residual_ivfpq" -> ivfPqResidual,
    "q290_purge_cascade" -> purgeCascadeAudit,
    "q142_source_lang_lift" -> sourceLangLift,
    "q153_er_pipeline" -> erPipeline,
    "q145_padding_waste" -> paddingWaste,
    "q146_phrase_search" -> phraseSearch,
    "q147_heavy_hitters" -> heavyHitters,
    "q148_prefix_jaccard" -> prefixJaccard,
    "q140_survivor_policy" -> survivorPolicy,
    "q139_vocab_coverage" -> vocabCoverageCurve,
    "q138_dedup_savings" -> dedupSavings,
    "q137_editdist_dupes" -> editDistanceDupes,
    "q136_dup_agreement" -> dupMethodAgreement,
    "q135_chunk_roundtrip" -> chunkRoundtrip,
    "q134_vocab_overlap" -> vocabOverlap,
    "q133_prefix_groups" -> prefixGroups,
    "q132_embed_drift" -> embedDrift,
    "q131_quality_dup" -> qualityDupCalibration,
    "q130_epoch_order" -> epochOrder,
    "q129_shard_balance" -> shardBalance,
    "q128_embed_coverage" -> embedCoverage,
    "q127_boilerplate_frac" -> boilerplateFrac,
    "q125_random_projection" -> randomProjection,
    "q124_snapshot_diff" -> snapshotDiff,
    "q119_leak_safe_split" -> leakSafeSplit,
    "q118_minhash_error" -> minhashError,
    "q117_cluster_quality" -> clusterQuality,
    "q116_embed_decontaminate" -> embedDecontaminate,
    "q115_token_budget"  -> tokenBudget,
    "q114_source_blocklist" -> sourceBlocklist,
    "q113_quantized_dedup" -> quantizedDedup,
    "q112_quota_sample"  -> quotaSample,
    "q158_priority_sample" -> prioritySample,
    "q162_skyline"       -> skyline,
    "q164_jsonl_source"  -> jsonlSource,
    "q165_orc_source"    -> orcSource,
    "q167_modal_align"   -> crossModalAlignment,
    "q168_avro_source"   -> avroSource,
    "q169_compaction"    -> compactionPlan,
    "q170_stream_twin"   -> streamBatchTwin,
    "q174_audio_energy"  -> audioEnergy,
    "q186_scene_cuts"    -> sceneCuts,
    "q192_schema_evolution" -> schemaEvolution,
    "q194_gini_lengths"  -> giniLengths,
    "q195_source_divergence" -> sourceDivergence,
    "q199_hybrid_fusion" -> hybridFusion,
    "q201_textrank"      -> textRank,
    "q203_exclusive_phrasing" -> exclusivePhrasing,
    "q208_source_dup_matrix" -> sourceDupMatrix,
    "q211_readability"   -> readability,
    "q212_range_source"  -> rangeSource,
    "q213_csv_source"    -> csvSource,
    "q217_inbatch_negatives" -> inBatchNegatives,
    "q218_epoch_decorrelation" -> epochDecorrelation,
    "q221_mixture_knapsack" -> mixtureKnapsack,
    "q223_format_matrix" -> formatMatrix,
    "q226_threshold_sweep" -> dedupThresholdSweep,
    "q209_vad_segments"  -> vadSegments,
    "q204_mutual_nn"     -> mutualNn,
    "q230_pca_power"     -> pcaPower,
    "q234_ivf_sweep"     -> ivfSweep,
    "q236_cdc_chunking"  -> cdcChunking,
    "q240_zipf_slope"    -> zipfSlope,
    "q207_label_purity"  -> labelPurity,
    "q175_centroid_kappa" -> centroidKappa,
    "q179_global_ordinals" -> globalOrdinals,
    "q111_source_overlap" -> sourceOverlap,
    "q110_templates"     -> templates,
    "q109_norm_audit"    -> normAudit,
    "q108_centroid_outliers" -> centroidOutliers,
    "q106_bpe_fertility" -> bpeFertility,
    "q107_cluster_sizes" -> clusterSizes,
    "q105_filter_attribution" -> filterAttribution,
    "q104_normalized_dedup" -> normalizedDedup,
    "q103_lsh_precision" -> lshPrecision,
    "q102_containment"   -> containmentPairs,
    "q101_bigram_surprisal" -> bigramSurprisal,
    "q100_dataset_card"  -> datasetCard,
    "q99_contamination_frac" -> contaminationFrac,
    "q98_length_histogram" -> lengthHistogram,
    "q97_int8_quant"     -> int8Quant,
    "q96_ann_recall"     -> annRecall,
    "q95_mix_manifest"   -> mixManifestSnapshot,
    "q94_rarity_score"   -> rarityScore,
    "q93_media_dupes"    -> mediaDupes,
    "q87_pipeline_e2e"   -> pipelineE2e,
    "q88_bpe_coverage"   -> bpeCoverage,
    "q89_label_centroids" -> labelCentroids,
    "q91_incremental_dedup" -> incrementalDedup,
    "q243_sim_index"     -> simIndexProbe,
    "q244_wav_decode"    -> wavDecode,
    "q245_substring_spans" -> substringSpans,
    "q246_index_purge"   -> indexPurge,
    "q247_pq_ann"        -> pqAnn,
    "q248_bmp_decode"    -> bmpDecode,
    "q250_sim_index_append" -> simIndexAppend,
    "q252_incremental_cc" -> incrementalCc,
    "q253_sample_alloc"  -> sampleAlloc,
    "q254_water_fill"    -> waterFill,
    "q256_ann_mrr"       -> annMrr,
    "q257_span_contamination" -> spanContamination,
    "q258_sim_index_purge" -> simIndexPurge,
    "q259_ann_stream_twin" -> annStreamTwin,
    "q260_pq_index"      -> pqIndexProbe,
    "q261_pq_append"     -> pqIndexAppend,
    "q262_pq_purge"      -> pqIndexPurge,
    "q263_ivfpq"         -> ivfPq,
    "q264_novelty"       -> noveltyAudit,
    "q265_temperature_mix" -> temperatureMix,
    "q266_incremental_novelty" -> incrementalNovelty,
    "q267_pq_rerank"     -> pqRerank,
    "q268_pq_stream_twin" -> pqStreamTwin,
    "q269_folded_novelty" -> foldedNovelty,
    "q270_ivfpq_index"   -> ivfPqIndexProbe,
    "q271_novelty_purge" -> noveltyPurge,
    "q272_novelty_stream" -> noveltyStreamTwin,
    "q273_ivfpq_stream_twin" -> ivfPqStreamTwin,
    "q274_ivfpq_recall_sweep" -> ivfPqRecallSweep,
    "q275_hard_negatives" -> hardNegatives,
    "q276_novelty_purge_stream" -> noveltyPurgeStream,
    "q277_dsir_sample"   -> dsirSample,
    "q278_bm25"          -> bm25,
    "q279_lex_index"     -> lexIndexProbe,
    "q280_lex_append"    -> lexIndexAppend,
    "q281_lex_purge"     -> lexIndexPurge,
    "q282_hybrid_index"  -> hybridIndexServe,
    "q283_lex_stream"    -> lexStreamTwin,
    "q284_ann_ndcg"      -> annNdcg,
    "q285_substring_probe" -> substringProbe,
    "q286_pack_mask_audit" -> packMaskAudit,
    "q287_media_index"   -> mediaIndex,
    "q288_robust_contamination" -> robustContamination,
    "q289_lex_robustness" -> lexRobustnessCurve,
    "q22_exact_dedup"    -> exactDedup,
    "q23_jaccard_pairs"  -> jaccardPairs,
    "q24_minhash_lsh"    -> minhashLsh,
    "q25_simhash"        -> simhashFp,
    "q26_ann_bruteforce" -> annBruteForce,
    "q27_ann_bucketed"   -> annBucketed,
    "q28_nearest_neighbor" -> nearestNeighbor,
    "q29_text_quality"   -> textQuality,
    "q30_lang_id"        -> langId,
    "q31_token_stats"    -> tokenStats,
    "q32_fingerprints"   -> fingerprints,
    "q33_multimodal_frames" -> multimodalFrames,
    "q34_ann_ivf"        -> annIvf,
    "q36_tfidf_top"      -> tfidfTop,
    "q42_embed_dupes"    -> embedDupes,
    "q43_hash_split"     -> hashSplit,
    "q46_dedup_groups"   -> dedupGroups,
    "q47_winnow_fp"      -> winnow,
    "q48_dedup_apply"    -> dedupApply,
    "q49_stratified_sample" -> stratifiedSample,
    "q50_decontaminate"  -> decontaminate,
    "q51_repetition"     -> repetition,
    "q53_kmeans_codebook" -> kmeansCodebook,
    "q54_ann_trained"    -> annTrained,
    "q55_vocab_top"      -> vocabTop,
    "q56_source_filter"  -> sourceFilter,
    "q57_pii_scrub"      -> piiScrub,
    "q58_chunks"         -> chunks,
    "q59_lsh_verified"   -> lshVerified,
    "q60_adaptive_filter" -> adaptiveFilter,
    "q61_span_dedup"     -> spanDedup,
    "q62_pack_sequences" -> packSequences,
    "q63_collocations"   -> collocations,
    "q64_inverted_index" -> invertedIndex,
    "q66_semantic_dedup" -> semanticDedup,
    "q69_zipf_histogram" -> zipfHistogram,
    "q71_semantic_cells" -> semanticDedupScaled,
    "q72_bpe_merges"     -> bpeMerges,
    "q74_ann_multitable" -> annMultiTable,
    "q75_cms_heavy"      -> cmsHeavy,
    "q76_bpe_tokenize"   -> bpeTokenize,
    "q77_mix_sample"     -> mixSample,
    "q78_feature_hash"   -> featureHash)
}
