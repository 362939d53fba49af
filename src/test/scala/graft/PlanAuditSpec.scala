package graft

/** Physical-plan audits: the scale claims in SCALE.md, asserted.
  * A query that silently regresses to a cartesian product, loses its
  * parquet pushdown, or stops broadcasting its dimension side would
  * still pass the value-level oracle at sf0.01 — these tests are what
  * notice. Plans are inspected pre-execution (the AQE initial plan),
  * which is where static shape properties live.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  // Iterative queries (connected components, k-means) EXECUTE during
  // DataFrame construction — per-round localCheckpoint + convergence
  // aggregates — so "building the plan" would run the whole pipeline
  // and the returned plan would only be the post-checkpoint tail.
  // Their round shapes are audited where they're visible instead:
  // ConnectedComponentsSpec (star rounds), VectorQuantizerSpec (fit).
  private val iterative =
    Set("q46_dedup_groups", "q48_dedup_apply",
      "q53_kmeans_codebook", "q54_ann_trained",
      "q66_semantic_dedup", // reuses the q53 fit (same checkpointed rounds)
      "q71_semantic_cells", // corpus-derived cell count, same fit rounds
      "q70_pagerank", // per-round localCheckpoint (PageRankSpec audits shape)
      "q72_bpe_merges", // per-round localCheckpoint (BpeSpec audits behavior)
      "q79_triangles", // adaptive closure strategy runs o.count() at build
      "q82_lpa_communities", // per-round localCheckpoint (LPA spec audits)
      "q90_personalized_pr", // per-round localCheckpoint (PageRankSpec)
      "q119_leak_safe_split", // q46's CC rounds run at build (same machinery)
      "q152_bfs_hops", // per-hop localCheckpoint (BfsSpec audits semantics)
      "q154_cheapest_nodes", // per-round localCheckpoint (ShortestPathsSpec)
      "q332_graph_sssp", // q154's relaxation rounds over the served
                         // artifact — per-round localCheckpoint at build
      "q153_er_pipeline", // CC rounds run at build (same machinery as q46)
      "q160_kcore", // per-round localCheckpoint + count (KCoreSpec audits)
      "q201_textrank", // PageRank rounds run at build (same machinery as q70)
      "q202_hits", // per-half-round localCheckpoint since r9 (the q230
                   // broadcast-subtree fix); round shape spec'd above
      "q230_pca_power", // Gramian localCheckpoint + per-round vector
                        // checkpoints run at build (PageRank's discipline)
      "q247_pq_ann", // fitPQ's Lloyd rounds checkpoint at build (q53's
                     // machinery with the subspace key)
      "q252_incremental_cc", // base-assign + contracted-CC rounds run at
                             // build (q46's machinery twice)
      "q170_stream_twin", // batch replay COMMITS stream state at build;
                          // audited by DedupStreamSpec + its own oracle
      "q259_ann_stream_twin", // same: AnnStream batches commit at build
                              // (AnnStreamSpec audits the stream side)
      "q263_ivfpq", // coarse fit + fitPQ Lloyd rounds checkpoint at
                    // build (q54 + q247's machinery composed)
      "q268_pq_stream_twin", // AnnStream batches commit at build
                             // (q259's exclusion, PQ probe)
      "q272_novelty_stream", // NoveltyStream batches commit + fold at
                             // build (NoveltyStreamSpec audits)
      "q273_ivfpq_stream_twin", // AnnStream batches commit at build
                                // (q268's exclusion, pruned probe)
      "q276_novelty_purge_stream", // NoveltyStream batches commit +
                                   // purge chain runs at build
                                   // (q272's exclusion)
      "q305_ann_purge_stream", // AnnStream batches commit + the
                               // purge chain runs at build
                               // (q259 + q276's exclusions composed)
      "q306_cms_purge_stream", // SketchStream batches commit + the
                               // subtraction purge runs at build
      "q307_lex_purge_stream", // LexStream batches commit + the
                               // stats-recomputing purge runs at build
      "q308_dedup_purge_stream", // DedupStream batches + two
                                 // compactions run at build
                                 // (q170's exclusion, plus the purge)
      "q309_pq_purge_stream", // AnnStream batches commit + the PQ
                              // purge chain runs at build
                              // (q268 + q276's exclusions composed)
      "q310_bpe_purge_stream", // BpeStream batches commit + the
                               // word purge runs at build
      "q313_graph_khop", // per-hop materialize + frontier isEmpty
                         // run at build (q152's exclusion; GraphIndexSpec
                         // audits pruning + BFS semantics)
      "q315_graph_purge_stream", // GraphStream batches commit + the
                                 // node purge runs at build
      "q316_graph_pagerank", // PageRank rounds checkpoint at build
                             // (q70's exclusion over the artifact scan)
      "q317_pq_dim_balance", // fitPQ Lloyd rounds checkpoint at build
                             // (q247's machinery, twice)
      "q318_graph_ban_gate", // GraphStream batches commit + the
                             // purge+ban chain runs at build
      "q320_dedup_ban_gate", // DedupStream batches + two compactions
                             // + the purge+ban chain run at build
      "q321_lex_ban_gate", // LexStream batches commit + the
                           // purge+ban chain runs at build
      "q322_fs_ban_gate", // NoveltyStream batches commit + the
                          // purge+reassign+ban chain runs at build
      "q334_knn_ann_stream") // AnnStream batches commit + the graph
                             // purge chain runs at build (q305's
                             // exclusion, beam-search probe)

  test("no judged query plans a CartesianProduct") {
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !iterative(name)) {
      assert(!plan(name).contains("CartesianProduct"),
        s"$name degenerated to a cartesian product")
    }
  }

  test("filters are pushed into the parquet scan (q15 pricing summary)") {
    val p = plan("q15_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("scans prune to the referenced columns (q31 token stats)") {
    val p = plan("q31_token_stats")
    // documents has (doc_id, text, lang, source, n_chars); the query
    // touches 3 of 5 — lang/source must not be read
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("lang"), s"q31 reads pruned column lang:\n$p")
    assert(!p.contains("source"), s"q31 reads pruned column source:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort (q13)") {
    assert(plan("q13_topk").contains("TakeOrderedAndProject"))
  }

  test("dimension sides broadcast in the star join (q17 nation revenue)") {
    assert(plan("q17_nation_revenue").contains("BroadcastHashJoin"))
  }

  test("RI filters plan as semi/anti joins, not IN-collects (q04, q03)") {
    assert(plan("q04_load_ri_groups").contains("LeftSemi"))
    assert(plan("q03_ri_sweep").contains("LeftAnti"))
  }

  test("jaccard df-cap is a windowed count, not an extra join (q23)") {
    val p = plan("q23_jaccard_pairs")
    // the cap rides the one shingle-key exchange as a window count;
    // a regression back to groupBy+anti-join would show LeftAnti here
    assert(p.contains("windowspecdefinition"), p)
    assert(!p.contains("LeftAnti"), p)
  }

  test("winnowing build is a single exchange (q47)") {
    val p = plan("q47_winnow_fp")
    // repartition(doc) up front; gram hashing, the window minimum and
    // the fingerprint distinct must all reuse that partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("triangle closure probes wedges via broadcast hash join (q79)") {
    // wedges outnumber edges √m-fold: the closure must be a broadcast
    // probe fused into wedge generation, never a wedge-side exchange
    val p = plan("q79_triangles")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("funnel plans join-free: one per-user conditional-min pivot (q85)") {
    // the naive funnel is events⨝events per stage; this shape must
    // stay a single grouped pivot
    assert(!plan("q85_funnel").contains("Join"), plan("q85_funnel"))
  }

  test("HLL register extraction is one hash exchange (q83)") {
    val p = plan("q83_hll_registers")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("e2e pipeline keeps its stage shapes (q87): semi + anti joins") {
    val p = plan("q87_pipeline_e2e")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("hot scan-agg paths stay inside WholeStageCodegen") {
    // the throughput yardsticks must not fall back to interpreted
    // evaluation: the scan→project→partial-agg pipeline is one (or
    // more) fused codegen stages. q15 = TPC-H Q1 shape, q29 = pure
    // expression text scoring, q80 = the quantile sketch's
    // string-built bucket math, q81 = the 30-term morton interleave.
    // q97 = per-row quantization lambdas, q98 = exact log2 bucket agg
    for (name <- Seq("q15_pricing_summary", "q29_text_quality",
        "q80_quantile_sketch", "q81_zorder_stats",
        "q97_int8_quant", "q98_length_histogram")) {
      // the AQE initial plan hides codegen annotation — ask the
      // codegen explain mode, which prints the fused subtrees
      val p = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
      assert(p.contains("WholeStageCodegen"),
        s"$name fell out of whole-stage codegen:\n${p.take(2000)}")
    }
  }

  test("collocation head totals broadcast; top-k avoids a global sort (q63)") {
    val p = plan("q63_collocations")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bucketed ANN joins on the bucket key — no nested loop (q27, q28, q42, q74)") {
    for (name <- Seq("q27_ann_bucketed", "q28_nearest_neighbor",
        "q42_embed_dupes", "q74_ann_multitable")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name lost its bucket equi-join:\n$p")
      spark.catalog.clearCache() // q28/q42 persist their key tables
    }
  }

  test("multi-table self-joins exchange bare keys, never the embeddings (q28, q42)") {
    for (name <- Seq("q28_nearest_neighbor", "q42_embed_dupes")) {
      val p = plan(name)
      // every hash exchange below the candidate distinct must carry
      // (id, tbl, bucket)-shaped rows; an embedding column inside an
      // exchange means the T-x vector shuffle came back
      val exchanges = "Exchange hashpartitioning\\([^)]*\\)[^\\n]*".r
        .findAllIn(p).toSeq
      assert(exchanges.nonEmpty, p)
      assert(!"Exchange [^\\n]*embedding".r.findFirstIn(p).isDefined,
        s"$name shuffles embeddings on the key exchange:\n$p")
      spark.catalog.clearCache()
    }
  }

  test("range join is day-bucketed — no nested loop (q40)") {
    assert(!plan("q40_range_attrib").contains("BroadcastNestedLoopJoin"))
  }

  test("runtime dim filter prunes fact partitions dynamically (q197)") {
    // the dim rows (top-5 days) exist only at runtime, so the probe
    // scan must carry a dynamicpruning# subquery in its
    // PartitionFilters — without it the 100 TB fact scan reads every
    // day directory instead of 5
    val p = plan("q197_dpp_join")
    assert(p.contains("dynamicpruning"),
      s"q197 lost dynamic partition pruning on the fact scan:\n$p")
  }

  test("IND discovery pays ONE value shuffle, reused by both consumers (q198)") {
    // the column-set aggregate feeds both the per-column counts and
    // the pair expansion; losing exchange reuse would double the
    // (value)-keyed shuffle — the only data-sized exchange in the op.
    // AQE applies reuse at runtime, so execute first and audit the
    // FINAL adaptive plan
    val df = SparkEntry.queries("q198_ind_discovery")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedQueryStage") || p.contains("ReusedExchange"),
      s"q198 recomputes the value shuffle for each consumer:\n$p")
  }

  private def hintCount(name: String): Int = {
    val p = SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    "strategy=broadcast".r.findAllIn(p).size
  }

  test("documented reuse points are actually cached (persist sweep)") {
    // The r8 finding class: a frame documented as "built once, read by
    // N consumers" that is NOT persisted silently re-executes its
    // whole subtree per consumer. Every such documented reuse point
    // must surface as an InMemoryTableScan in the executed plan.
    // (q202/q230's checkpointed rounds are in `iterative`; this sweep
    // covers the plan-auditable ones.)
    val cached = Map(
      "q226_threshold_sweep" -> 2, // jaccardPairs' shingle frame + the
                                   // scored pair list (both aggregates)
      "q206_stationary_mix" -> 1, // the K x K transition matrix pmat
      "q23_jaccard_pairs" -> 1, // the df-capped shingle frame
      // (q243's probe banding left this list in r11: SimIndex.probeTopK
      // now RELEASES its batch cache right after the touched-bucket
      // collect — the join recomputes the batch-sized banding once
      // instead of leaking executor storage on library callers)
      "q245_substring_spans" -> 1) // the span list (stats + best pick)
    for ((name, atLeast) <- cached.toSeq.sortBy(_._1)) {
      val p = plan(name)
      val scans = "InMemoryTableScan".r.findAllIn(p).size
      assert(scans >= atLeast,
        s"$name plans $scans InMemoryTableScan(s), documented reuse " +
          s"expects >= $atLeast — a missing persist() re-executes the " +
          s"shared subtree once per consumer:\n${p.take(1500)}")
      spark.catalog.clearCache()
    }
  }

  test("rollup grains ride ONE Expand, never a union of aggregates (q249)") {
    val p = plan("q249_revenue_rollup")
    assert("Expand".r.findAllIn(p).size == 1,
      s"rollup must be one Expand (4 grains multiplied before the " +
        s"map-side combine), not stacked scans:\n${p.take(1500)}")
    assert(!p.contains("Union"), s"rollup degenerated to unioned " +
      s"aggregations:\n${p.take(1500)}")
  }

  test("binary decode paths stay inside whole-stage codegen (q244, q248)") {
    // the WAV/BMP readers are substr/hex/conv chains — any fallback to
    // interpreted eval here would bite on every byte of every media
    for (name <- Seq("q244_wav_decode", "q248_bmp_decode")) {
      val p = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
      assert(p.contains("WholeStageCodegen"),
        s"$name fell out of whole-stage codegen:\n${p.take(2000)}")
      spark.catalog.clearCache() // q244/q248 persist their meta frame
    }
  }

  test("exact-substring spans: one gram exchange feeds df-cap AND self-join (q245)") {
    val p = plan("q245_substring_spans")
    assert(p.contains("windowspecdefinition"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("retrieval probes serve from COMMITTED artifacts, not corpus recomputes (q282, q285, q288)") {
    // the derive-once/consume-many claim, checked on the plan itself:
    // each probe's scan list must include the committed artifact
    // root(s) — a regression to in-plan recompute (re-hashing the
    // corpus, re-building postings) drops the artifact path from the
    // FileScan locations and re-pays corpus cost per query
    // (q282's lex/sim arms and q288's lex arm are MATERIALIZED RDD
    // scans since r12 — ProbeCache severs the probe's lineage, so the
    // artifact path no longer shows in the OUTER plan. Their
    // artifact-serve property is pinned at the probe layer instead:
    // LexIndexSpec/SimIndexSpec assert the artifact scan + static
    // PartitionFilters on the lazy bm25TopKPlan/probeTopKPlan forms,
    // and CachePolicySpec pins that the returned frame was computed
    // from exactly that plan.)
    val p285 = plan("q285_substring_probe")
    assert(p285.contains("graft-gram-postings"),
      s"q285 stopped reading the gram-posting artifact:\n${p285.take(1200)}")
    val p288 = plan("q288_robust_contamination")
    assert(p288.contains("graft-gram-postings"),
      s"q288's span arm stopped reading the gram-posting artifact:\n${p288.take(1200)}")
  }

  test("novelty is a shingle window-min + keyed aggs — never a pair join (q264)") {
    val p = plan("q264_novelty")
    // the whole point vs near-dup: first-occurrence rides ONE window
    // over the shingle exchange; a regression to shingle-pair joins
    // would explode quadratically on boilerplate-heavy sources
    assert(p.contains("windowspecdefinition"), p.take(1200))
    assert(!p.contains("SortMergeJoin ["), // doc-keyed joins broadcast/hash at this scale
      s"q264 grew a corpus-sized sort-merge join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("temperature mix: corpus work is ONE source aggregate (q265)") {
    val p = plan("q265_temperature_mix")
    // everything after the per-source aggregate (isqrt chain, window
    // apportionment) runs over taxonomy-sized rows; the corpus must
    // contribute exactly one hash aggregate exchange
    assert("Exchange hashpartitioning\\(source".r.findAllIn(p).size == 1,
      s"q265 shuffles the corpus more than once on source:\n${p.take(1500)}")
  }

  test("quantized dedup is one hash exchange — codes never pair (q113)") {
    val p = plan("q113_quantized_dedup")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("embed decontamination never shuffles vectors (q116)") {
    val p = plan("q116_embed_decontaminate")
    // the bench crossJoin is a broadcast nested loop over a FIXED-SIZE
    // suite (intentional); the corpus-side exchange after d2 must
    // carry only (vec_id, d2, bvec) — a vector column inside any
    // exchange means the distance work moved across the wire
    assert(!"Exchange [^\\n]*\\bxs\\b".r.findFirstIn(p).isDefined,
      s"q116 shuffles raw vectors:\n$p")
  }

  test("skew diagnostics top-k avoids a global sort (q120)") {
    assert(plan("q120_skew_diagnostics").contains("TakeOrderedAndProject"))
  }

  test("salted join carries the salt into the physical join key (q121)") {
    val p = plan("q121_salted_join")
    assert(p.contains("_salt"), s"q121 lost its salt column:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("late-data audit is user-keyed, never a global window (q123)") {
    val p = plan("q123_late_data_audit")
    assert(p.contains("windowspecdefinition(user_id"),
      s"q123 window lost its user partitioning:\n$p")
  }

  test("scaling join sides are never hint-forced to broadcast (q16, q17, q48)") {
    // q48's dupe set and q16/q17's customer side grow with the corpus:
    // a broadcast HINT there bypasses AQE's size check and OOMs at
    // scale. Only fixed-cardinality dims (nation=25, region=5 rows)
    // may carry hints — q17 has exactly those two.
    assert(hintCount("q16_shipping_priority") == 0,
      "q16 re-grew a broadcast hint on a scaling side")
    assert(hintCount("q17_nation_revenue") == 2,
      "q17 must hint exactly nation and region, nothing larger")
    assert(hintCount("q48_dedup_apply") == 0,
      "q48's anti-join build side must be AQE-chosen, not hint-forced")
    spark.catalog.clearCache() // q48's CC rounds persist intermediates
  }

  test("snapshot diff classifies via a full-outer EQUI-join on the id (q124)") {
    val p = plan("q124_snapshot_diff")
    assert(p.contains("FullOuter"), s"q124 lost its full-outer join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q124 degenerated to a nested loop:\n$p")
  }

  test("random projection pays one key exchange; the sign matrix never materializes (q125)") {
    val p = plan("q125_random_projection")
    // posexplode is narrow; the r conditional sums partial-aggregate
    // map-side, so the only hash exchange carries (vec_id, partials)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"q125 should shuffle exactly once, on vec_id:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"q125 must not broadcast anything — the sign matrix is a hash:\n$p")
  }

  test("degree histogram reads the materialized pair artifact, no pairing join (q126)") {
    val p = plan("q126_degree_histogram")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q126 co-purchase pairing degenerated to a nested loop:\n$p")
    // the order-keyed self-join moved into the partPairs artifact
    // build (paid once per data version); the query plan itself is
    // join-free — a scan of the pair table into two aggregates
    assert(!p.contains("Join"),
      s"q126 should read graft-copurchase, not re-derive the pairs:\n$p")
  }

  test("vocab-overlap top-K windows per source; the pair join is bigram-equi (q134)") {
    val p = plan("q134_vocab_overlap")
    assert(!p.contains("Exchange SinglePartition"),
      s"q134's rank window must partition by source, never globally:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q134's K-set pair join degenerated:\n$p")
  }

  test("chunk round-trip reassembles inside the doc groupBy — no window (q135)") {
    val p = plan("q135_chunk_roundtrip")
    assert(!p.contains("windowspecdefinition"),
      s"q135 must order chunks via in-group array_sort, not a window:\n$p")
  }

  test("dup-agreement evaluates its join and code projection once (q136)") {
    val p = plan("q136_dup_agreement")
    // base and keyed are persisted: every consumer must read the
    // cache, not re-derive the docs-embeddings join (the 12×
    // re-evaluation this query shipped with cost 14 s at sf0.1)
    assert(p.contains("InMemoryTableScan"),
      s"q136's persisted stages are not wired into the plan:\n$p")
  }

  test("edit-distance block cap rides the bk exchange as a window, not a join (q137)") {
    val p = plan("q137_editdist_dupes")
    assert(p.contains("windowspecdefinition"), p)
    assert(!p.contains("LeftSemi"),
      s"q137's cap regressed to a groupBy + semi-join (second bk shuffle):\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q137's in-block pairing degenerated:\n$p")
  }

  test("rollup expands the lattice before ONE hash aggregate exchange (q144)") {
    val p = plan("q144_rollup_report")
    assert(p.contains("Expand"), s"q144 lost the grouping-sets Expand:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"q144 must aggregate the whole lattice in one exchange:\n$p")
  }

  test("padding batches window by (bucket, shard), never globally (q145)") {
    val p = plan("q145_padding_waste")
    assert(p.contains("windowspecdefinition(bucket"),
      s"q145 window lost its bucket/shard partitioning:\n$p")
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"q145 sorts a corpus-scaled partition:\n$p")
  }

  test("phrase adjacency windows per doc; phrase table joins by key (q146)") {
    val p = plan("q146_phrase_search")
    assert(p.contains("windowspecdefinition(doc_id"),
      s"q146 adjacency window lost its per-doc partitioning:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q146's phrase join degenerated to a nested loop:\n$p")
    spark.catalog.clearCache() // bi is persisted
  }

  test("heavy hitters recount via semi-join on a MapPartitions sketch (q147)") {
    val p = plan("q147_heavy_hitters")
    assert(p.contains("MapPartitions"),
      s"q147 lost the O(K)-state Misra-Gries pass:\n$p")
    assert(p.contains("LeftSemi"),
      s"q147's recount must be candidate-restricted by a semi-join:\n$p")
    spark.catalog.clearCache() // tok is persisted
  }

  test("prefix-jaccard serves off the committed prefix artifact, joins by key (q148)") {
    val p = plan("q148_prefix_jaccard")
    // r14: the corpus-pure front half (tokenize → distinct → df →
    // per-doc rank window) publishes once per documents fingerprint;
    // the WARM plan must read the committed artifact — no window, no
    // tokenizer re-derivation — and keep the candidate join + verify
    // on equi-keys
    assert(p.contains("graft-prefjacc"),
      s"q148 is re-deriving its prefix table instead of reading the " +
        s"committed artifact:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"q148's warm plan re-ran the prefix rank window the artifact " +
        s"was published to amortize:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q148 degenerated off its equi-joins:\n$p")
    spark.catalog.clearCache()
  }

  test("incremental join reads its persisted base view, not a re-derive (q150)") {
    val p = plan("q150_incremental_join")
    assert(p.contains("InMemoryTableScan"),
      s"q150's base view V0 must be persisted and reused:\n$p")
    spark.catalog.clearCache()
  }

  test("rolling HLL moves registers, never users: no distinct before the merge (q156)") {
    val p = plan("q156_hll_rolling")
    // two hash aggregates (day regs, rolled merge) + a bounded explode;
    // a (user, day) distinct sneaking in would recreate q149's shape
    assert(p.contains("Generate explode"),
      s"q156 lost the bounded x7 register explode:\n$p")
    assert(!p.toLowerCase.contains("distinct"),
      s"q156 must aggregate registers, not distinct users:\n$p")
  }

  test("hyperball rounds are key joins feeding (node, bucket) aggregates (q157)") {
    val p = plan("q157_hyperball")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q157's neighbor merge degenerated off its equi-join:\n$p")
    assert(p.contains("max(r"),
      s"q157 lost the register max-merge aggregate:\n$p")
    spark.catalog.clearCache() // edges are persisted
  }

  test("priority sample plans per-partition top-K, not a global sort (q158)") {
    val p = plan("q158_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"q158 must heap-select the K winners, not globally sort:\n$p")
  }

  test("sweep cumsum windows per day, never a single global partition (q159)") {
    val p = plan("q159_peak_concurrency")
    assert(p.contains("windowspecdefinition(day"),
      s"q159's running sum lost its per-day partitioning:\n$p")
  }

  test("skyline is window passes only — dominance never becomes a join (q162)") {
    val p = plan("q162_skyline")
    assert(!p.contains("Join"),
      s"q162 grew a join; dominance must stay a window prefix-max:\n$p")
    assert(p.contains("windowspecdefinition(shard"),
      s"q162's local pass lost its shard partitioning:\n$p")
  }

  test("rolling quantiles move (day, bucket) rows: aggs + explode, no distinct (q163)") {
    val p = plan("q163_quantile_rolling")
    assert(p.contains("Generate explode"),
      s"q163 lost the bounded x7 histogram explode:\n$p")
    assert(!p.toLowerCase.contains("distinct"),
      s"q163 must merge bucket counts, never distinct raw values:\n$p")
  }

  test("broadcast hints appear ONLY on documented constant-bounded sides " +
      "(suite-wide sweep)") {
    // The generalized q48/q16/q17 rule: a broadcast HINT bypasses AQE's
    // size check, so a hint on a side that scales with the corpus OOMs
    // at 100 TB no matter what the sf0.01 oracle says. Every hint in
    // the codebase must therefore sit on a side bounded by a CONSTANT
    // (a 1-row aggregate scalar, a fixed query/bench set, a sketch
    // table, a source/lang taxonomy) and be registered here with its
    // bound. Any new hint — or a hint-count change on a listed query —
    // fails this sweep until it's justified below.
    val bounded = Map(
      "q17_nation_revenue" -> 2, // nation (25) + region (5) dims
      "q21_approx_distinct" -> 1, // 1-row exact-count scalar
      "q26_ann_bruteforce" -> 1, // fixed 5-query set
      "q27_ann_bucketed" -> 1, // fixed 5-query set
      "q34_ann_ivf" -> 2, // scale-derived pivot codebook + query set
      "q36_tfidf_top" -> 1, // 1-row corpus-size scalar
      "q50_decontaminate" -> 1, // fixed benchmark shingle suite
      "q56_source_filter" -> 1, // per-source threshold table (taxonomy)
      "q60_adaptive_filter" -> 1, // per-source quota table (taxonomy)
      "q63_collocations" -> 1, // 1-row token-total scalar
      "q74_ann_multitable" -> 1, // fixed query set (multi-table keys)
      "q75_cms_heavy" -> 1, // d x w count-min sketch table
      "q77_mix_sample" -> 3, // per-source rates (taxonomy) x2 + scalar
      "q80_quantile_sketch" -> 1, // constant quantile list
      "q95_mix_manifest" -> 1, // 1-row min-count scalar (manifest pin)
      "q96_ann_recall" -> 2, // fixed query set, both ANN arms
      "q103_lsh_precision" -> 1, // 1-row candidate-count scalar
      "q115_token_budget" -> 1, // 1-row total-tokens scalar
      "q116_embed_decontaminate" -> 1, // fixed bench-vector suite
      "q120_skew_diagnostics" -> 1, // 1-row corpus aggregate scalar
      "q122_incremental_agg" -> 2, // 1-row delta-fingerprint scalars
      "q141_quantile_error" -> 1, // constant quantile list
      "q163_quantile_rolling" -> 1, // constant quantile list
      "q172_purge_sweep" -> 4, // one nation (25) dim hint; the hinted
                               // cohort subtree fans into 4 branches
      "q175_centroid_kappa" -> 1, // 1-row chance-expectation scalar
      "q179_global_ordinals" -> 1, // 20-row source-offset table (taxonomy)
      "q180_replica_diff" -> 2, // ≤256-row mismatched-bucket list, both replicas
      "q181_assoc_rules" -> 1, // 1-row basket-total scalar
      "q187_ab_test" -> 1, // 1-row average-spend scalar
      "q189_benford" -> 1, // 1-row positive-count scalar
      "q195_source_divergence" -> 1, // 1-row global-token-total scalar
      "q197_dpp_join" -> 1, // calendar dim (≤366 rows/yr), the DPP source
      "q198_ind_discovery" -> 1, // 13-row column-registry count table
      "q199_hybrid_fusion" -> 1, // fixed 5-query probe set (vector arm)
      "q219_layout_pruning" -> 3, // 1-row probe-box scalar ×2 + 1-row truth
      "q226_threshold_sweep" -> 2, // 5-row threshold list, 2 consumer branches
      "q228_behavior_lift" -> 1, // 1-row basket-total scalar
      "q232_pseudonym_audit" -> 2, // two 1-row overlap scalars
      "q233_seasonality" -> 1, // nation (25) dim
      // (q237 moved to ZERO hints in r11: the anchor scalar and every
      // hierarchical-rank rollup join are UNHINTED — q139's
      // discipline: size statistics broadcast them, and any hint
      // would replicate through the chained axis lineage and trip
      // this sweep with structural copies)
      "q242_revenue_concentration" -> 1, // 4-row coverage-threshold list
                                         // (bucket rollup join unhinted,
                                         // as q237)
      "q238_repeat_hazard" -> 4, // 1-row anchor scalar fanned into the
                                 // conv/cens/axis consumer branches
      "q234_ivf_sweep" -> 12, // fixed 10-query set + 16-pivot codebook,
                              // replicated across the 4 sweep arms +
                              // the shared brute-force truth arm
      "q229_revenue_shares" -> 2, // nation (25) + region (5) dims
      "q243_sim_index" -> 1, // fixed 100-query audit set (exact-truth
      // arm); the index probe itself hints nothing
      "q249_revenue_rollup" -> 2, // nation (25) + region (5) dims
      "q256_ann_mrr" -> 2, // fixed 20-query set, both ANN arms (q96's bound)
      // (q260/q261/q262/q270's probe-internal hints — m·ks codebook,
      // batch-bounded ADC table, nq·nprobe probed-cell table — moved
      // OUT of the outer plan in r12: ProbeCache materializes the
      // probe result, so the outer plan is an RDD scan; the bounds
      // are pinned on the lazy probeTopKPlan form by PqIndexSpec)
      "q267_pq_rerank" -> 1, // the fixed 20-query float-vector side
                             // of the rerank (probe hints are inside
                             // the materialized probe since r12)
      "q277_dsir_sample" -> 2, // 1024-row hashed-bucket ratio table
                               // (D is a layout constant), replicated
                               // structurally into the sel + pool
                               // consumer branches of the scored set
      "q278_bm25" -> 2, // 5-row derived query-term set + 1-row
                        // (N, Σdl) corpus scalar
      // (q279-q282's lex probes hint NOTHING since the df window
      // replaced the broadcast df table — the pruned artifact scan
      // feeds the plan once)
      "q284_ann_ndcg" -> 2, // fixed 100-query set (the exact-truth
                            // arm, q243's bound), replicated
                            // structurally into the DCG + IDCG
                            // consumer branches; the artifact probe
                            // hints nothing
      "q291_residual_ivfpq" -> 1, // the fixed 20-query exact-truth
                                  // arm (q96's bound); both artifact
                                  // probes are materialized RDD scans
      "q302_residual_recall" -> 1, // same fixed 20-query exact-truth
                                   // arm over the constructed
                                   // clustered world (q291's bound)
      "q292_drift_retrain" -> 1,  // same fixed 20-query exact-truth
                                  // arm; both generation probes are
                                  // materialized RDD scans
      "q319_pq_perm_serve" -> 1)  // same fixed 20-query exact-truth
                                  // arm (q302's bound); both artifact
                                  // probes are materialized RDD scans
      // (q274's 11 probe-internal hints also moved inside the
      // materialized probes in r12 — expected 0 in the outer plan)
      // (q202/q230 moved to `iterative` in r9 — their per-round
      // localCheckpoints truncate the lineage the old hint counts
      // measured; q205's nation hint lives in the publish closure,
      // not the judged read plan — the read is a hint-free artifact
      // scan)
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !iterative(name)) {
      val hints = hintCount(name)
      assert(hints == bounded.getOrElse(name, 0),
        s"$name carries $hints broadcast hint(s), expected " +
          s"${bounded.getOrElse(name, 0)} — a hint on a corpus-scaled " +
          "side OOMs at scale; register the bound here only if the " +
          "side is constant-bounded")
      spark.catalog.clearCache()
    }
  }

  test("the ORC scan gets the same pushdown discipline as parquet (q165)") {
    val p = plan("q165_orc_source")
    assert(p.contains("EqualTo(source,src3)"),
      s"q165's source filter did not reach the ORC reader:\n$p")
  }
}
