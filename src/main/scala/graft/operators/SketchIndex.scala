package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted count-min sketch — [[CountMin]] lifted into the
  * publish / probe / delta / purge lifecycle (seventh member of the
  * persisted-index family): the hot-key / frequency monitor a
  * pipeline keeps NEXT TO its corpus, answering "how often has this
  * term/key/URL been seen so far" at every ingestion gate without a
  * key-domain groupBy over the corpus. Two properties no sibling
  * family has, both consequences of sketch LINEARITY
  * (sketch(A ∪ B) = sketch(A) + sketch(B), cell-wise):
  *
  *   - the delta fold is ARITHMETIC, not row-union: a batch's own
  *     d·w-cell sketch lands as a delta and the serving state is the
  *     cell-SUM of base ∪ deltas — maintenance is O(d·w) per batch
  *     regardless of corpus size, and [[mergeCompact]] is one tiny
  *     aggregate;
  *   - the purge is an exact SUBTRACTION: deleting a known row set
  *     commits (served cells − the deletion batch's own sketch),
  *     bit-identical to a fresh build over the survivors — no
  *     rebuild, no corpus rescan, O(d·w). (The standard CMS caveat
  *     holds: subtracting rows that were never ingested corrupts
  *     cells — the deletion frame must be the ingested rows, which a
  *     GDPR request has.)
  *
  * The artifact is d·w counter rows — bounded by sketch geometry,
  * never by data — so there is no bucket pruning to do: probes
  * broadcast the summed sketch. Total ingested count N is derivable
  * from the sketch itself (Σ cnt over any one hash row), so no stats
  * sidecar can drift from the cells. Determinism is [[CountMin]]'s:
  * the affine hash family is engine-identical, so every cell, every
  * estimate, and every subtraction replays bit-for-bit in the
  * oracle.
  *
  * Layout per committed generation: `cells/` (r, cell, cnt) +
  * `_params.json` {"depth","width"} + `_folded.json` (delta names a
  * compaction/purge consumed — [[FirstSeenIndex.foldedOf]]'s closure;
  * here the hazard is arithmetic: a redelivered fold after a merge
  * would DOUBLE-COUNT its cells, sums are not idempotent).
  */
object SketchIndex {

  def resolve(root: String): Option[String] = VersionedDirs.resolve(root)

  private val CellSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "r INT, cell BIGINT, cnt BIGINT")

  private def writeCells(cells: DataFrame, dir: java.io.File): Unit =
    cells.select(col("r").cast("int"), col("cell").cast("long"),
        col("cnt").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)

  private def paramsText(genPath: String): String =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(genPath, "_params.json"))

  /** The frozen (depth, width) of the newest committed generation. */
  def geometry(root: String): (Int, Int) = {
    val p = resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root"))
    val t = paramsText(p)
    def f(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(t)
      .map(_.group(1).toInt).getOrElse(
        throw new IllegalStateException(s"malformed params under $root"))
    (f("depth"), f("width"))
  }

  /** Build and commit the sketch of `items`' string column `term` as
    * the next version.
    *
    * Re-publishing into a root that already has a generation (the
    * [[regrowOnBias]] path) INVALIDATES the delta log: pending deltas
    * hold cells of the OLD geometry, and summing them against a
    * regrown width would corrupt every estimate — so `items` must be
    * the full ingested corpus (deltas included), the new generation's
    * `_folded.json` names the consumed dirs (redelivered tagged
    * deltas absorb) and the purge ledger carries forward.
    */
  def publish(items: DataFrame, term: String, depth: Int, width: Int,
              root: String): String = synchronized {
    val prev = resolve(root)
    val deltaSnap = if (prev.isDefined) deltas(root) else Nil
    val foldedNames = (prev.map(foldedOf).getOrElse(Set.empty) ++
      deltaSnap.map(p => new java.io.File(p).getName)).toSeq.sorted
    val purgedNames = prev.map(purgedOf).getOrElse(Set.empty).toSeq.sorted
    val path = VersionedDirs.commit(root) { st =>
      writeCells(CountMin.build(items, term, depth, width),
        new java.io.File(st, "cells"))
      java.nio.file.Files.writeString(
        new java.io.File(st, "_params.json").toPath,
        s"""{"depth":$depth,"width":$width}""")
      if (foldedNames.nonEmpty)
        java.nio.file.Files.writeString(
          new java.io.File(st, "_folded.json").toPath,
          foldedNames.map(n => s""""$n"""").mkString("[", ",", "]"))
      if (purgedNames.nonEmpty)
        java.nio.file.Files.writeString(
          new java.io.File(st, "_purged.json").toPath,
          purgedNames.map(n => s""""$n"""").mkString("[", ",", "]"))
      java.nio.file.Files.createFile(
        new java.io.File(st, "_SUCCESS").toPath)
      ()
    }
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    deltaSnap.foreach(p => rm(new java.io.File(p)))
    path
  }

  // ------------------------------------------------------ deltas

  private def deltaDir(root: String): java.io.File =
    new java.io.File(root, "deltas")

  def deltas(root: String): Seq[String] =
    Option(deltaDir(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch-") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getAbsolutePath).sorted.toSeq

  private def foldedOf(genPath: String): Set[String] = {
    val f = new java.io.File(genPath, "_folded.json")
    if (!f.isFile) Set.empty
    else """"([^"]+)"""".r.findAllMatchIn(
      java.nio.file.Files.readString(f.toPath)).map(_.group(1)).toSet
  }

  /** True when a delta tagged `tag` has already committed — live in
    * the delta log, or consumed by a merge/purge (its name in the
    * resolved generation's `_folded.json`). Cell sums are NOT
    * idempotent, so this closure is what keeps an at-least-once
    * redelivery from double-counting.
    */
  def folded(root: String, tag: String): Boolean = {
    val live = new java.io.File(
      new java.io.File(deltaDir(root), s"batch-$tag"), "_SUCCESS").isFile
    live || resolve(root).exists(p => foldedOf(p)(s"batch-$tag"))
  }

  /** Commit a batch's OWN sketch as a delta — O(d·w), the committed
    * cells never read or rewritten. Serving state is the cell-sum of
    * base ∪ deltas (linearity).
    */
  def appendDelta(spark: SparkSession, items: DataFrame, term: String,
                  root: String,
                  tag: String = java.util.UUID.randomUUID().toString)
      : String = synchronized {
    val genPath = resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root"))
    val dr = deltaDir(root); dr.mkdirs()
    val target = new java.io.File(dr, s"batch-$tag")
    if (new java.io.File(target, "_SUCCESS").isFile)
      return target.getAbsolutePath
    if (foldedOf(genPath)(s"batch-$tag")) return genPath
    graft.sources.Artifacts.notePublish()
    val (d, w) = geometry(root)
    val staging = new java.io.File(dr,
      s".staging-${java.util.UUID.randomUUID()}")
    writeCells(CountMin.build(items, term, d, w), staging)
    require(staging.renameTo(target), s"delta rename failed into $dr")
    target.getAbsolutePath
  }

  /** Delta roots NOT yet consumed by the generation at `genPath` —
    * the read set every consumer must use: a delta named in
    * `_folded.json` is already IN the generation's cells, and unlike
    * the min/union families a double-read here double-COUNTS (sums
    * are not idempotent), so the filter is load-bearing for the
    * crash window between a rewrite's commit and its delta cleanup.
    */
  private def liveDeltas(root: String, genPath: String): Seq[String] = {
    val folded = foldedOf(genPath)
    deltas(root).filterNot(p => folded(new java.io.File(p).getName))
  }

  /** The serving cells: cell-sum of base ∪ live (unconsumed) deltas —
    * ≤ d·w rows after the aggregate, at any corpus size.
    */
  private def servedCells(spark: SparkSession, root: String): DataFrame = {
    val genPath = resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root"))
    (new java.io.File(genPath, "cells").toString +:
        liveDeltas(root, genPath))
      .map(p => spark.read.schema(CellSchema).parquet(p))
      .reduce(_.unionByName(_))
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
  }

  /** Point estimates for `queries`' distinct `term` values against
    * the served state: min over the term's d cells, absent terms
    * estimate 0. Also returns `n_total` (Σ row-0 cells — the total
    * ingested count, derived from the sketch itself) on every row so
    * callers can threshold hot keys (est ≥ N/k) without a stats
    * sidecar. Materialized per the [[ProbeCache]] contract.
    */
  def estimate(spark: SparkSession, queries: DataFrame, term: String,
               root: String): DataFrame = {
    val (d, w) = geometry(root)
    val cells = servedCells(spark, root)
    val n = cells.filter(col("r") === 0)
      .agg(coalesce(sum("cnt"), lit(0L)).as("n_total"))
    val q = queries.select(col(term)).distinct().persist()
    try ProbeCache.materialize(
      CountMin.estimate(cells, q, term, d, w).crossJoin(broadcast(n)))
    finally { q.unpersist(); () }
  }

  /** [[estimate]] against a PINNED committed generation — the
    * fleet-snapshot read path ([[FleetSnapshot]]): point estimates
    * from `genPath`'s cells EXACTLY as committed — no delta log, no
    * later purge rewrites (post-snapshot state by definition, the
    * [[SimIndex.probeTopKAt]] contract). Geometry comes from the
    * PINNED generation's own `_params.json`, so a regrow committed
    * after the pin (different width) can never skew a pinned
    * estimate. Cell read is ≤ d·w rows — model-constant, the same
    * bounded class as [[estimate]]'s.
    */
  def estimateAt(spark: SparkSession, queries: DataFrame, term: String,
                 genPath: String): DataFrame = {
    graft.sources.Artifacts.noteResolveHit()
    val t = paramsText(genPath)
    def f(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(t)
      .map(_.group(1).toInt).getOrElse(
        throw new IllegalStateException(s"malformed params under $genPath"))
    val (d, w) = (f("depth"), f("width"))
    val cells = spark.read.schema(CellSchema)
      .parquet(new java.io.File(genPath, "cells").toString)
    val n = cells.filter(col("r") === 0)
      .agg(coalesce(sum("cnt"), lit(0L)).as("n_total"))
    val q = queries.select(col(term)).distinct().persist()
    try ProbeCache.materialize(
      CountMin.estimate(cells, q, term, d, w).crossJoin(broadcast(n)))
    finally { q.unpersist(); () }
  }

  /** Fold the delta log physically: commit the cell-sum as the next
    * generation and record consumed delta names (carried forward) in
    * `_folded.json`, then drop the consumed dirs.
    */
  def mergeCompact(spark: SparkSession, root: String): String =
    rewrite(spark, root, identity)

  /** Purge tags already applied to the generation at `genPath` — the
    * subtraction twin of `_folded.json`: subtraction is NOT
    * idempotent (a re-run with the same deletion set subtracts
    * twice), so [[purge]] records its tag (carried forward across
    * generations) and absorbs a repeat.
    */
  private def purgedOf(genPath: String): Set[String] = {
    val f = new java.io.File(genPath, "_purged.json")
    if (!f.isFile) Set.empty
    else """"([^"]+)"""".r.findAllMatchIn(
      java.nio.file.Files.readString(f.toPath)).map(_.group(1)).toSet
  }

  /** True when a purge tagged `tag` has already been applied. */
  def purged(root: String, tag: String): Boolean =
    resolve(root).exists(p => purgedOf(p)(tag))

  /** A content fingerprint of a (small) deletion frame — the default
    * purge tag, so retrying the same deletion set is absorbed without
    * the caller inventing names: count + order-free seeded-hash sum
    * over the term column (one aggregate; GDPR deletion sets are
    * request-sized).
    */
  def deletionTag(deleted: DataFrame, term: String): String = {
    val r = deleted
      .select(graft.functions.Hashing.seeded(0, col(term)).as("h"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum("h"), lit(0L)).cast("long").as("fp"))
      .first()
    s"del-${r.getLong(0)}-${java.lang.Long.toHexString(r.getLong(1))}"
  }

  /** Exact deletion by linearity: commit (served cells − the deletion
    * rows' own sketch) as the next generation — bit-identical to a
    * fresh build over the survivors, O(d·w), no corpus rescan. The
    * deletion frame must be the INGESTED rows being forgotten (the
    * class-doc caveat). A repeat of the same deletion set — an
    * at-least-once compliance runner, a crashed cascade re-run — is
    * ABSORBED: the purge tag (by default the deletion frame's own
    * content fingerprint) is recorded in the committed generation's
    * `_purged.json` and a tagged re-run returns the existing
    * generation instead of subtracting twice.
    */
  def purge(spark: SparkSession, deleted: DataFrame, term: String,
            root: String, tag: Option[String] = None): String = {
    val t = tag.getOrElse(deletionTag(deleted, term))
    // cheap early absorb; rewrite re-checks INSIDE its lock (two
    // concurrent same-tag purges must not both pass this check and
    // subtract twice)
    resolve(root) match {
      case Some(p) if purgedOf(p)(t) => return p
      case _ => ()
    }
    val (d, w) = geometry(root)
    val neg = CountMin.build(deleted, term, d, w)
      .select(col("r"), col("cell"), (-col("cnt")).as("cnt"))
    rewrite(spark, root, served =>
      served.unionByName(neg)
        .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
        .filter(col("cnt") =!= 0L), purgeTag = Some(t))
  }

  private def rewrite(spark: SparkSession, root: String,
                      f: DataFrame => DataFrame,
                      purgeTag: Option[String] = None): String =
    synchronized {
    val genPath = resolve(root).getOrElse(
      throw new IllegalStateException(s"no committed index under $root"))
    // locked re-check of the purge ledger: a concurrent same-tag
    // purge that committed while this call waited must absorb here
    purgeTag.foreach { t => if (purgedOf(genPath)(t)) return genPath }
    val deltaSnap = deltas(root)
    val params = paramsText(genPath)
    val cells = f(servedCells(spark, root))
    val foldedNames = (foldedOf(genPath) ++
      deltaSnap.map(p => new java.io.File(p).getName)).toSeq.sorted
    val purgedNames = (purgedOf(genPath) ++ purgeTag).toSeq.sorted
    val path = VersionedDirs.commit(root) { st =>
      writeCells(cells, new java.io.File(st, "cells"))
      java.nio.file.Files.writeString(
        new java.io.File(st, "_params.json").toPath, params)
      java.nio.file.Files.writeString(
        new java.io.File(st, "_folded.json").toPath,
        foldedNames.map(n => s""""$n"""").mkString("[", ",", "]"))
      java.nio.file.Files.writeString(
        new java.io.File(st, "_purged.json").toPath,
        purgedNames.map(n => s""""$n"""").mkString("[", ",", "]"))
      java.nio.file.Files.createFile(
        new java.io.File(st, "_SUCCESS").toPath)
      ()
    }
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    deltaSnap.foreach(p => rm(new java.io.File(p)))
    Option(deltaDir(root).listFiles()).getOrElse(Array.empty)
      .filter(VersionedDirs.stagingOrphan).foreach(rm)
    path
  }

  /** Drop every generation but the newest committed one. */
  def vacuumOld(root: String): Unit = synchronized {
    VersionedDirs.retainLatestGenerations(root, keep = 1)
  }

  // ------------------------------------------------------ saturation

  /** Saturation audit of the served sketch against ground truth: the
    * frozen (depth, width) never change while N grows, so estimate
    * bias creeps up as ~N/w and NOTHING in the serving path notices —
    * the family's q292-analog drift hazard. One row:
    * (width, n_terms, n_exact, max_err, sum_err, n_total, err_bound)
    * where `corpus` is the INGESTED occurrence rows (exact counts
    * must be the truth the sketch summarizes), errs are
    * (estimate − exact) ≥ 0, and err_bound is the count-min
    * guarantee ε·N (ε = e/w) as the integer surrogate
    * (2718·N) div (1000·w) — measured bias vs the paper bound, from
    * committed artifacts, zero floats. Cost: one corpus groupBy
    * (vocabulary-sized exchange) + the broadcast-sketch estimate —
    * audit cadence, never per probe.
    */
  def biasAudit(spark: SparkSession, corpus: DataFrame, term: String,
                root: String): DataFrame = {
    val (_, w) = geometry(root)
    val exact = corpus.groupBy(col(term))
      .agg(count(lit(1)).as("exact"))
    estimate(spark, corpus, term, root)
      .join(exact, Seq(term))
      .select((col("cms_est") - col("exact")).as("err"), col("n_total"))
      .agg(count(lit(1)).as("n_terms"),
        coalesce(sum(when(col("err") === 0L, 1L).otherwise(0L)), lit(0L))
          .as("n_exact"),
        coalesce(max("err"), lit(0L)).as("max_err"),
        coalesce(sum("err"), lit(0L)).as("sum_err"),
        coalesce(max("n_total"), lit(0L)).as("n_total"))
      .select(lit(w.toLong).as("width"), col("n_terms"), col("n_exact"),
        col("max_err"), col("sum_err"), col("n_total"),
        expr(s"2718 * n_total div (1000 * $w)").as("err_bound"))
  }

  /** Width-regrow republish trigger — fire a rebuild at
    * `widthFactor`× the frozen width iff the measured max bias
    * exceeds `budgetPpm` parts-per-million of N ([[biasAudit]], one
    * audit pass); the rebuild cost (one corpus scan) is paid only on
    * fire, the [[PqIndex.retrainOnDrift]] doctrine. `corpus` must be
    * the full ingested rows — the rebuild subsumes the delta log,
    * which the re-publish invalidates (see [[publish]]). Returns the
    * new committed path when fired.
    */
  def regrowOnBias(spark: SparkSession, corpus: DataFrame, term: String,
                   root: String, budgetPpm: Long,
                   widthFactor: Int = 4): Option[String] = {
    val r = biasAudit(spark, corpus, term, root).first()
    val maxErr = r.getAs[Long]("max_err")
    val n = r.getAs[Long]("n_total")
    if (maxErr * 1000000L > budgetPpm * n) {
      val (d, w) = geometry(root)
      Some(publish(corpus, term, d, w * widthFactor, root))
    } else None
  }
}
