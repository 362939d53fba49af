package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.MvRewrite
import graft.sources.Artifacts

/** The lineitem summary MV behind [[graft.plans.MvRewrite]]: one row
  * per (l_returnflag, l_linestatus, ship_day) carrying the partial
  * aggregates every matchable query re-aggregates from —
  * `sum_qty` (double partial sums of the integral-valued quantity:
  * exact), `n_rows`, and `price_cents` (exact integer cents, kept for
  * the next supported-shape extension). The grain is deliberately
  * finer than the rewrite's dimension set, so a rewritten query still
  * performs a genuine (tiny) re-aggregation and a future day-filter
  * extension has the column it needs.
  *
  * Published through [[Artifacts.publishOnce]] — fingerprint-keyed,
  * atomic stage+rename, retention-floored — so the MV can never serve
  * stale data: a base-table change mints a new root and the installed
  * rule is re-pointed by [[install]]. This is the same
  * freshness-by-construction discipline as [[DedupIndex]], applied to
  * query acceleration instead of dedup probing.
  */
object MaterializedView {

  /** Bump when the MV derivation or schema changes. */
  val LogicVersion = 1

  def lineitemAggRoot(spark: SparkSession, sfDir: String): String =
    Artifacts.publishOnce("mv-lineitem-agg", sfDir, Seq("lineitem"),
      LogicVersion) { stage =>
      Tables(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          to_date(col("l_shipdate")).as("ship_day"))
        .agg(sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          sum(expr("cast(round(l_extendedprice * 100) as long)"))
            .as("price_cents"))
        .coalesce(1) // ≤ |rf|·|ls|·days rows — one summary file
        .write.parquet(stage)
    }

  /** Publish (or resolve) the MV for `sfDir` and (re)install the
    * rewrite rule on the session. Idempotent: one rule per sf-dir,
    * re-pointed if a data refresh minted a fresh MV root. The rule is
    * exact, so leaving it installed session-wide is safe — any
    * aggregate it can answer has, by construction, the same result
    * from the MV as from the base scan.
    */
  def install(spark: SparkSession, sfDir: String): String = {
    val root = lineitemAggRoot(spark, sfDir)
    val others = spark.experimental.extraOptimizations.filterNot {
      case MvRewrite(_, s, _) => s == sfDir
      case _ => false
    }
    spark.experimental.extraOptimizations =
      others :+ MvRewrite(spark, sfDir, root)
    root
  }
}
