package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing: assemble documents into fixed token-budget bins
  * (the step after context-length chunking that turns a corpus into
  * training sequences). Next-fit is the streaming discipline every
  * large-scale packer actually ships — one pass, O(1) state — and,
  * unlike first-fit-decreasing, it is computable without holding a
  * stratum in memory.
  *
  * Packing is inherently sequential *within* an ordering, so the
  * corpus is hash-bucketed into strata and packed independently per
  * stratum — the standard trick for parallelizing a sequential fold.
  * Shape: one shuffle (repartition by stratum) + an in-partition sort,
  * then a streaming `mapPartitions` fold with constant memory. At
  * 100 TB you raise the stratum count (e.g. `id % 100_000`) so strata
  * stay executor-sized and parallelism stays ≫ executor count; the
  * fold itself never materializes a stratum.
  *
  * This is the one operator family where `mapPartitions` is the right
  * tool (the prompt's tier (d)): a reset-at-threshold running sum is
  * not expressible in windowed SQL without recursion, and the typed
  * fold keeps the sequential part explicit and O(1).
  */
object Packing {

  /** Assign each row to a bin: next-fit over rows ordered by `id`
    * within each `stratum`. A row opens a new bin when adding it would
    * exceed `budget`; a row larger than `budget` occupies a bin alone.
    * Returns (stratum, id, tok, bin) with `bin` numbered from 0 per
    * stratum. All columns are cast to long — callers keep the exact
    * integer domain the oracle needs.
    */
  def nextFitPack(df: DataFrame, stratum: String, id: String, tok: String,
                  budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted: Dataset[(Long, Long, Long)] = df
      .select(col(stratum).cast("long"), col(id).cast("long"),
        col(tok).cast("long"))
      // the typed decode below NPEs on null primitives, and a
      // null-keyed row has no stratum to pack into — drop, don't crash
      .na.drop()
      .as[(Long, Long, Long)]
      .repartition(col(stratum))
      .sortWithinPartitions(col(stratum), col(id))
    sorted.mapPartitions { it =>
      // a partition holds whole strata (hash partitioning), sorted by
      // (stratum, id); the fold resets at each stratum boundary.
      // first-row state is a flag, not a sentinel value — a genuine
      // stratum of Long.MinValue must still reset the bin numbering
      var first = true
      var cur = 0L
      var bin = 0L
      var cum = 0L
      it.map { case (s, i, t) =>
        if (first || s != cur) { first = false; cur = s; bin = 0L; cum = t }
        else if (cum + t > budget) { bin += 1; cum = t }
        else cum += t
        (s, i, t, bin)
      }
    }.toDF(stratum, id, tok, "bin")
  }
}
