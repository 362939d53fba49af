package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, PipelineQueries}

/** Self-validating invariants of q113–q116 — the properties their
  * docstrings promise, checked at sf0.001. The oracle gate checks
  * value-level parity with DuckDB; these check the CLAIMS (injected
  * duplicates collapse, thresholds rank correctly, budget math is the
  * ceil-div it says it is).
  */
class PipelineInvariantsSpec extends SparkSpec {

  test("q113: every quantized-code group is exactly original + perturbed copy") {
    val g = PipelineQueries.quantizedDedup.fn(spark, sf0001).cache()
    try {
      assert(g.filter(col("n_copies") =!= 2L).count() == 0,
        "a +1-micro-unit perturbation failed to collapse (or codes collided)")
      // the survivor is always the original, never the injected copy
      assert(g.filter(col("keep_id") >= 1000000L).count() == 0)
    } finally g.unpersist()
  }

  test("q114: exactly TOPK sources blocked, and they have the worst fail rates") {
    val rows = PipelineQueries.sourceBlocklist.fn(spark, sf0001).collect()
    val blocked = rows.filter(_.getAs[Long]("blocked") == 1L)
    assert(blocked.length == math.min(3, rows.length))
    if (blocked.length < rows.length) {
      val bestBlocked = blocked.map(_.getAs[Long]("fail_milli")).min
      val worstUnblocked = rows.filter(_.getAs[Long]("blocked") == 0L)
        .map(_.getAs[Long]("fail_milli")).max
      assert(bestBlocked >= worstUnblocked,
        s"blocked floor $bestBlocked < unblocked ceiling $worstUnblocked")
    }
  }

  test("q115: budget uniform across sources, epochs = ceil(budget/tokens)") {
    val rows = PipelineQueries.tokenBudget.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("budget")).distinct.length == 1)
    rows.foreach { r =>
      val toks = r.getAs[Long]("toks")
      val b = r.getAs[Long]("budget")
      assert(r.getAs[Long]("epochs") == (b + toks - 1) / math.max(toks, 1L))
    }
  }

  test("q116: every injected benchmark copy surfaces at distance zero") {
    val injected = PipelineQueries.embedDecontaminate.fn(spark, sf0001)
      .filter(col("vec_id") >= 1000000L).collect()
    assert(injected.nonEmpty, "no injected copies flagged")
    injected.foreach { r =>
      assert(r.getAs[Long]("min_d2") == 0L,
        s"injected ${r.getAs[Long]("vec_id")} at d2 ${r.getAs[Long]("min_d2")}")
    }
  }

  test("q135: every source reassembles losslessly (computed mismatch is 0)") {
    val rows = PipelineQueries.chunkRoundtrip.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_mismatch") == 0L,
      s"${r.getAs[String]("source")} lost content in the chunk round-trip"))
  }

  test("q136: each injected class lands in its designated matrix cell") {
    val rows = PipelineQueries.dupMethodAgreement.fn(spark, sf0001).collect()
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    // class 0 (both) + class 16 (sem-only) + class 32 (lex-only) each
    // inject pairs, so every disagreement cell must be populated and
    // both-dup must cover at least the class-0 twins
    assert(tot("n_both") > 0, "class-0 twins missing from the both cell")
    assert(tot("n_sem_only") > 0, "class-16 twins missing from sem-only")
    assert(tot("n_lex_only") > 0, "class-32 twins missing from lex-only")
    assert(tot("n_neither") > tot("n_both") + tot("n_sem_only") + tot("n_lex_only"),
      "the undisturbed corpus should dominate the matrix")
  }

  test("q137: every mutated twin pairs with its base at edit distance 1") {
    val pairs = PipelineQueries.editDistanceDupes.fn(spark, sf0001).collect()
    val byA = pairs.groupBy(_.getAs[Long]("id_a"))
    // bases with doc_id % 16 == 1 and a >=30-char prefix got a twin at
    // +8000000 with one char deleted — each must surface at dist 1
    val twins = pairs.filter(r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 8000000L)
    assert(twins.nonEmpty, "no mutated twin surfaced")
    twins.foreach(r => assert(r.getAs[Long]("dist") == 1L,
      s"twin pair ${r.getAs[Long]("id_a")} at dist ${r.getAs[Long]("dist")}"))
    assert(byA.nonEmpty)
  }

  test("q140: max-quality never retains less quality than min-id, and the " +
    "below-base-id class forces disagreements") {
    val rows = PipelineQueries.survivorPolicy.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_maxq_sum") >= r.getAs[Long]("q_minid_sum"),
        s"${r.getAs[String]("source")}: max-quality policy retained less quality")
    }
    assert(rows.map(_.getAs[Long]("n_disagree")).sum > 0,
      "the id-below-base class should force policy disagreements")
  }

  test("q144: the rollup lattice is self-consistent (cells sum to " +
    "subtotals, subtotals to the grand total)") {
    val rows = graft.queries.AnalyticsQueries.rollupReport.fn(spark, sf0001)
      .collect()
    val cells = rows.filter(r => r.getAs[Long]("g_src") == 0L &&
      r.getAs[Long]("g_lang") == 0L)
    val subs = rows.filter(r => r.getAs[Long]("g_src") == 0L &&
      r.getAs[Long]("g_lang") == 1L)
    val grand = rows.filter(_.getAs[Long]("g_src") == 1L)
    assert(grand.length == 1)
    subs.foreach { sub =>
      val src = sub.getAs[String]("source")
      val mine = cells.filter(_.getAs[String]("source") == src)
      assert(mine.map(_.getAs[Long]("n_docs")).sum == sub.getAs[Long]("n_docs"),
        s"cells of $src don't sum to its subtotal")
    }
    assert(subs.map(_.getAs[Long]("n_docs")).sum ==
      grand.head.getAs[Long]("n_docs"))
  }

  test("q145: padded cost dominates actual tokens; waste in [0, 1000)") {
    val rows = PipelineQueries.paddingWaste.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("padded") >= r.getAs[Long]("actual"))
      val w = r.getAs[Long]("waste_th")
      assert(w >= 0L && w < 1000L, s"waste_th $w out of range")
    }
  }

  test("q146: every phrase hits at least one doc, hits >= docs, <= K rows") {
    val rows = PipelineQueries.phraseSearch.fn(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("n_hits") >= r.getAs[Long]("n_docs"),
        "a doc can hold multiple occurrences, never fewer hits than docs")
    }
    spark.catalog.clearCache()
  }

  test("q148: prefix-filtered join equals the brute-force join " +
    "(completeness on a second corpus)") {
    import graft.functions.TextFunctions
    val pruned = PipelineQueries.prefixJaccard.fn(spark, sf0001)
      .select("a", "b", "n_shared", "j_th").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val tok = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
      .distinct()
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val brute = tok.as("x").join(tok.as("y"),
        col("x.w") === col("y.w") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("sh"))
      .join(sz.select(col("doc_id").as("a"), col("len").as("la")), "a")
      .join(sz.select(col("doc_id").as("b"), col("len").as("lb")), "b")
      .filter(col("sh") * 39 >= (col("la") + col("lb")) * 19)
      .selectExpr("a", "b", "sh", "sh * 1000 div (la + lb - sh) AS j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(pruned == brute,
      s"prefix filter lost ${brute -- pruned} / invented ${pruned -- brute}")
    spark.catalog.clearCache()
  }

  test("q149: a 7-day window never counts fewer users than its last day") {
    val rows = graft.queries.AnalyticsQueries.rollingActives.fn(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("wau7") >= r.getAs[Long]("dau"),
        s"${r.getAs[java.sql.Date]("day")}: wau7 < dau")
    }
    spark.catalog.clearCache()
  }

  test("q150: the delta-assembled total equals a direct full-join recompute") {
    val rows = graft.queries.AnalyticsQueries.incrementalJoin.fn(spark, sf0001)
      .collect()
    val direct = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      assert(r.getAs[Long]("n_total") == direct(p),
        s"$p: delta algebra drifted from the direct join")
      assert(r.getAs[Long]("n_base") <= r.getAs[Long]("n_total"))
    }
    spark.catalog.clearCache()
  }

  test("q151: the count-min estimate is a true upper bound (ok_lb = 1)") {
    val r = graft.queries.AnalyticsQueries.joinSizeEstimate.fn(spark, sf0001)
      .collect().head
    assert(r.getAs[Long]("ok_lb") == 1L)
    assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_size"))
    assert(r.getAs[Long]("over_ppm") >= 0L)
  }

  // JVM twin of Hashing.h32 / HyperLogLog.rho for driver-side exact
  // reconstruction (tiny graphs only).
  private def h32jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }
  private def rhoJvm(p: Long, bits: Int = 24): Int =
    (1 to bits).find(k => ((p >> (k - 1)) & 1) == 1).getOrElse(bits + 1)

  test("q156: rolled registers dominate the day's own, and estimate tracks q149") {
    import graft.operators.HyperLogLog
    val rolled = graft.queries.AnalyticsQueries.hllRolling.fn(spark, sf0001)
      .select(col("day").cast("string").as("day"), col("bucket"), col("r"))
      .collect()
    assert(rolled.nonEmpty)
    val ev = graft.Tables(spark, sf0001, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val topDay = ev.groupBy("day").count()
      .orderBy(desc("count"), asc("day"))
      .select(col("day").cast("string")).collect().head.getString(0)
    // per-register dominance: the 7-day max-merge can only raise rho
    val dayRegs = HyperLogLog.registers(
        ev.filter(col("day").cast("string") === topDay),
        col("user_id").cast("string"))
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("r")).toMap
    val rolledDay = rolled.filter(_.getAs[String]("day") == topDay)
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("r")).toMap
    assert(dayRegs.nonEmpty)
    dayRegs.foreach { case (b, r) =>
      assert(rolledDay.getOrElse(b, 0) >= r,
        s"bucket $b: rolled ${rolledDay.get(b)} < single-day $r")
    }
    // the sketch estimate lands near q149's exact distinct for the day
    val exact = graft.queries.AnalyticsQueries.rollingActives.fn(spark, sf0001)
      .filter(col("day").cast("string") === topDay)
      .collect().head.getAs[Long]("wau7")
    val sqlCtx = spark
    import sqlCtx.implicits._
    val est = HyperLogLog.estimate(
      rolledDay.toSeq.map { case (b, r) => (b, r) }.toDF("bucket", "r"))
    assert(math.abs(est - exact) <= math.max(0.35 * exact, 4.0),
      s"estimate $est vs exact $exact on $topDay")
    spark.catalog.clearCache()
  }

  test("q157: register sets equal an exact 2-hop ball reconstruction") {
    val edges = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.Tables(spark, sf0001, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 10000000L).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val got = graft.queries.AnalyticsQueries.hyperball.fn(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("nn2"), r.getAs[Long]("sr2")))).toMap
    assert(got.nonEmpty && got.size == adj.size)
    adj.foreach { case (v, n1) =>
      val ball = n1.flatMap(u => adj(u) + u) + v // {v} ∪ N ∪ N²
      // q157 runs HyperBall's low-memory layout: P=4, 28 payload bits
      val regs = ball.groupBy(u => h32jvm(u.toString) & 15L)
        .map { case (_, us) =>
          us.map(u => rhoJvm(h32jvm(u.toString) >> 4, bits = 28)).max }
      assert(got(v) == ((regs.size.toLong, regs.map(_.toLong).sum)),
        s"node $v: sketch ${got(v)} != exact-ball reconstruction")
    }
    spark.catalog.clearCache()
  }

  test("q158: the sample is exactly the top-K of the full priority order") {
    val sel = PipelineQueries.prioritySample.fn(spark, sf0001).collect()
    val all = graft.Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars"),
        graft.functions.Hashing.h32(col("doc_id").cast("string")).as("h"))
      .selectExpr("doc_id", "(n_chars * 4294967296) div (h + 1) AS p")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(sel.length == math.min(100, all.length))
    val ids = sel.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.size == sel.length, "duplicate doc in sample")
    val rejected = all.filterNot(kv => ids.contains(kv._1))
    if (rejected.nonEmpty) {
      val minSel = sel.map(_.getAs[Long]("priority")).min
      assert(minSel >= rejected.map(_._2).max,
        "a rejected doc outranks a selected one")
    }
  }

  test("q160: the pendant path cascades off, the organic core keeps degree >= k") {
    val rows = graft.queries.AnalyticsQueries.kcoreResidual.fn(spark, sf0001)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    assert(rows.nonEmpty)
    // the 8-round budget exceeds the 6-node cascade, so the result IS
    // the 2-core: every survivor has in-core degree >= 2
    rows.foreach { case (n, d) => assert(d >= 2L, s"node $n at degree $d") }
    assert(!rows.keySet.exists(_ >= 20000000L), "an injected path node survived")
    assert(rows.contains(1L), "customer 1 (the path anchor) must survive")
  }

  test("q161: histogram is self-consistent and covers every customer") {
    val rows = graft.queries.AnalyticsQueries.kanonAudit.fn(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gs = r.getAs[Long]("gs")
      assert(r.getAs[Long]("n_customers") == gs * r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("at_risk") == (if (gs < 5) 1L else 0L))
    }
    val total = graft.Tables(spark, sf0001, "customer").count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == total,
      "histogram does not partition the customer table")
  }

  test("q164: exactly the injected lines quarantine; no corrupt leakage into langs") {
    val rows = PipelineQueries.jsonlSource.fn(spark, sf0001).collect()
    val corrupt = rows.filter(_.getAs[String]("lang") == "(corrupt)")
    assert(corrupt.length == 1 && corrupt.head.getAs[Long]("n_docs") == 7L)
    assert(corrupt.head.getAs[Long]("chars") == 0L)
    // the lang rows must equal the parquet truth — the roundtrip is lossless
    val truth = graft.Tables(spark, sf0001, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.filterNot(_.getAs[String]("lang") == "(corrupt)").foreach { r =>
      assert(truth(r.getAs[String]("lang")) ==
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("chars"))),
        s"${r.getAs[String]("lang")}: JSONL roundtrip drifted from parquet")
    }
  }

  test("q165: the ORC copy aggregates identically to the parquet original") {
    val got = PipelineQueries.orcSource.fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("chars"), r.getAs[Long]("id_sum")))).toMap
    val truth = graft.Tables(spark, sf0001, "documents")
      .filter(col("source") === "src3")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("c"),
        sum("doc_id").as("i"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == truth)
  }

  test("q162: two-pass skyline equals the brute-force dominance frontier") {
    val pts = graft.Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars"),
        round(graft.functions.TextFunctions.qualityScore(
          graft.functions.TextFunctions.words(col("text"))) * 1e6)
          .cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    val got = PipelineQueries.skyline.fn(spark, sf0001)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == brute,
      s"missing ${brute -- got}, extra ${got -- brute}")
  }

  test("q163: rolled quantiles are monotone and equal trunc3 of the exact quantile") {
    def trunc3(v: Long): Long = {
      val s = v.toString
      val p = if (s.length > 3) math.pow(10, s.length - 3).toLong else 1L
      v - v % p
    }
    val got = graft.queries.AnalyticsQueries.quantileRolling.fn(spark, sf0001)
      .select(col("day").cast("string").as("day"), col("q_pct"), col("est_cents"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (day, rs) =>
        day -> rs.map(r => r.getAs[Int]("q_pct") -> r.getAs[Long]("est_cents")).toMap }
    assert(got.nonEmpty)
    // driver-side exact: the rolled multiset per window-end day
    val vals = graft.Tables(spark, sf0001, "events")
      .select(to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getAs[java.sql.Date]("day").toLocalDate, r.getLong(1)))
    val rolled = vals.flatMap { case (d, c) =>
      (0 to 6).map(off => d.plusDays(off).toString -> c) }
      .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sorted }
    got.foreach { case (day, qs) =>
      assert(qs(50) <= qs(95) && qs(95) <= qs(99), s"$day: not monotone")
      val sorted = rolled(day)
      qs.foreach { case (q, est) =>
        val n = sorted.length
        val exact = sorted((((q.toLong * n) + 99) / 100 - 1).toInt.max(0))
        assert(est == trunc3(exact),
          s"$day p$q: est $est != trunc3($exact)")
      }
    }
    spark.catalog.clearCache()
  }

  test("q159: sweep peak equals the brute-force overlap maximum per day") {
    val got = graft.queries.AnalyticsQueries.peakConcurrency.fn(spark, sf0001)
      .select(col("day").cast("string").as("day"), col("n_events"), col("peak"))
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_events"), r.getAs[Long]("peak"))))
      .toMap
    val iv = graft.Tables(spark, sf0001, "events")
      .select(col("ts"), to_date(col("ts")).as("day"))
      .select(col("day").cast("string").as("day"),
        unix_millis(col("ts")).as("s"),
        unix_millis(least(col("ts") + expr("INTERVAL 5 MINUTE"),
          date_add(col("day"), 1).cast("timestamp"))).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.size == iv.map(_._1).distinct.length)
    iv.groupBy(_._1).foreach { case (day, rows) =>
      val spans = rows.map(r => (r._2, r._3))
      // concurrency is maximized at some interval start: count open [s,e)
      val peak = spans.map { case (s, _) =>
        spans.count { case (s2, e2) => s2 <= s && s < e2 } }.max
      assert(got(day) == ((rows.length.toLong, peak.toLong)),
        s"$day: got ${got(day)}, brute-force (${rows.length}, $peak)")
    }
    spark.catalog.clearCache()
  }
  test("q253/q254: allocations conserve their budgets exactly and respect caps") {
    // q253: largest-remainder apportionment hits the label budget
    val a = PipelineQueries.sampleAlloc.fn(spark, sf0001).collect()
    assert(a.map(_.getAs[Long]("alloc")).sum == 100L,
      "apportionment missed the budget")
    a.foreach { r =>
      assert(r.getAs[Long]("n_sel") == r.getAs[Long]("alloc"),
        s"selection count != allocation for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("n_docs"))
    }
    // q254: water level spends the budget exactly, never over-allocates,
    // and unsaturated sources sit within 1 token of each other
    val w = PipelineQueries.waterFill.fn(spark, sf0001).collect()
    val demands = w.map(_.getAs[Long]("demand")).sum
    val budget = demands * 30 / 100
    assert(w.map(_.getAs[Long]("alloc")).sum == budget,
      "water-filling missed the budget")
    w.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("demand"))
      if (r.getAs[Long]("saturated") == 1L)
        assert(r.getAs[Long]("alloc") == r.getAs[Long]("demand"))
    }
    val unsat = w.filter(_.getAs[Long]("saturated") == 0L)
      .map(_.getAs[Long]("alloc"))
    if (unsat.nonEmpty)
      assert(unsat.max - unsat.min <= 1,
        s"unsaturated levels diverge: ${unsat.toSeq}")
  }

  test("q302: residual coding's recall is STRICTLY higher at equal code budget") {
    val rows = PipelineQueries.ivfPqClustered.fn(spark, sf0001).collect()
      .map(r => r.getAs[String]("variant") -> r.getAs[Long]("recall_ppm"))
      .toMap
    assert(rows.keySet == Set("flat_code", "residual"))
    assert(rows("residual") > rows("flat_code"),
      s"no recall gain from by_residual on the clustered world: $rows")
  }

  test("q317: balanced dimension allocation STRICTLY lowers PQ distortion at equal budget") {
    val rows = PipelineQueries.pqDimBalance.fn(spark, sf0001).collect()
      .map(r => r.getAs[String]("arm") -> r.getAs[Long]("qerr")).toMap
    assert(rows.keySet == Set("1_identity", "2_balanced"))
    assert(rows("2_balanced") < rows("1_identity"),
      s"no distortion gain from balancing on the anisotropic world: $rows")
  }

  test("q319: the frozen-permutation artifact serves STRICTLY higher recall") {
    val rows = PipelineQueries.pqPermServe.fn(spark, sf0001).collect()
      .map(r => r.getAs[String]("variant") -> r.getAs[Long]("recall_ppm"))
      .toMap
    assert(rows.keySet == Set("1_identity", "2_balanced"))
    assert(rows("2_balanced") > rows("1_identity"),
      s"the artifact-served permutation bought no recall: $rows")
  }

  test("q255: every attribution model conserves total purchase cents") {
    val rows = AnalyticsQueries.touchAttribution.fn(spark, sf0001).collect()
    val byModel = rows.groupBy(_.getAs[String]("model"))
      .map { case (m, rs) => m -> rs.map(_.getAs[Long]("revenue_cents")).sum }
    assert(byModel.size == 3)
    assert(byModel.values.toSet.size == 1,
      s"models disagree on total revenue: $byModel")
  }

}
