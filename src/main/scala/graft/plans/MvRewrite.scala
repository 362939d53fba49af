package graft.plans

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view query rewriting — the optimizer tier above the
  * native expressions ([[CharPolyHash]], [[CosineSimilarity]]): a
  * `Rule[LogicalPlan]` that redirects whole aggregate subtrees from
  * the base `lineitem` scan onto a pre-aggregated MV artifact
  * ([[graft.operators.MaterializedView]]), installed post-hoc on a
  * live session via `spark.experimental.extraOptimizations` (the
  * runtime twin of the `SparkSessionExtensions.injectOptimizerRule`
  * route [[GraftExtensions]] serves at session build).
  *
  * This is the single biggest lever a 100 TB deployment has: a
  * matching dashboard aggregate stops scanning the fact table
  * entirely and re-aggregates a KB-scale summary instead — the
  * scan-cost ratio IS the MV-to-fact size ratio (~10⁵ here, more at
  * production grain). The rewrite is exact, never approximate, which
  * is what makes it safe to leave installed session-wide:
  *
  *  - it only fires on an `Aggregate` whose ONLY leaf is THIS
  *    sf-dir's `lineitem.parquet` scan, reached through pure
  *    attribute projections (any Filter/Join/expression in between
  *    blocks the match — those shapes are not answerable from the
  *    MV's grain without predicate analysis);
  *  - grouping columns must be a subset of the MV's dimension
  *    columns ({l_returnflag, l_linestatus}; the MV carries a finer
  *    ship-day grain, so a matched query still re-aggregates —
  *    grain-subset rewriting, as in Calcite's MV rules);
  *  - aggregates must be built from `sum(l_quantity)` (→
  *    `sum(sum_qty)`) and `count(*)`/`count(lit)` (→
  *    `coalesce(sum(n_rows), 0)`), possibly nested under row-level
  *    expressions (casts survive via subtree transform). Anything
  *    else — other columns, `distinct`, filtered aggregates — aborts
  *    the match and the plan runs against the base table untouched.
  *
  * Output attribute `ExprId`s are preserved by re-aliasing every
  * rewritten output to its original id, so parent operators (sorts,
  * projections, joins) above the aggregate never notice the swap.
  * The rewrite is idempotent: the rewritten subtree's leaf is the MV
  * root, which no longer matches the base-path guard.
  */
object MvRewrite {
  /** True iff some leaf of `plan` is a file scan rooted under `path`
    * — how callers (q171's self-check, MvRewriteSpec) assert the
    * rewrite actually fired instead of trusting it silently.
    */
  def scansPath(plan: LogicalPlan, path: String): Boolean =
    plan.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toUri.getPath.startsWith(path))
        case _ => false
      }
      case _ => false
    }
}

final case class MvRewrite(spark: SparkSession, sfDir: String,
                           mvRoot: String) extends Rule[LogicalPlan] {

  private val basePath = new File(sfDir, "lineitem.parquet").getAbsolutePath
  private val dims = Set("l_returnflag", "l_linestatus")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate
        if agg.groupingExpressions.forall {
          case a: AttributeReference => dims(a.name)
          case _ => false
        } && scanOf(agg.child, basePath) =>
      rewrite(agg).getOrElse(agg)
  }

  /** True iff `p` is the base lineitem scan reached only through
    * attribute-only projections (no filters, joins, or computed
    * columns — shapes the MV grain cannot answer).
    */
  private def scanOf(p: LogicalPlan, path: String): Boolean = p match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      scanOf(c, path)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toUri.getPath == path)
      case _ => false
    }
    case _ => false
  }

  /** None ⇒ some aggregate/column is not answerable from the MV; the
    * caller keeps the original plan (abort must be all-or-nothing —
    * a half-rewritten aggregate would mix scans).
    */
  private def rewrite(agg: Aggregate): Option[Aggregate] = {
    // fresh analysis per match: a query may embed two rewritten
    // aggregates (self-join of summaries) and they must not share
    // attribute ids
    val mvPlan = spark.read.parquet(mvRoot).queryExecution.analyzed
    val mvAttr: Map[String, AttributeReference] =
      mvPlan.output.map(a => a.name -> a.asInstanceOf[AttributeReference]).toMap

    def rewriteAggCall(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case sm: Sum => sm.child match {
            case a: AttributeReference if a.name == "l_quantity" =>
              Some(ae.copy(aggregateFunction = sm.copy(child = mvAttr("sum_qty"))))
            case _ => None
          }
          case c: Count if c.children.forall(_.foldable) =>
            // count(*) over base rows = sum of the MV's per-key row
            // counts; coalesce keeps count's non-null contract
            Some(Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(mvAttr("n_rows"))),
              Literal(0L))))
          case _ => None
        }
      case _ => None
    }

    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if dims(a.name) =>
        Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(child, name) =>
        var ok = true
        val newChild = child.transform {
          case e if rewriteAggCall(e).isDefined => rewriteAggCall(e).get
          case a: AttributeReference =>
            // transform descends into the replacement subtree too, so
            // the MV's own attributes come back through here — keep
            // them; only surviving base attrs outside the dimension
            // set make the expression unanswerable
            if (mvPlan.outputSet.contains(a)) a
            else if (dims(a.name)) mvAttr(a.name)
            else { ok = false; a }
        }
        // any surviving base-relation reference means the expression
        // needs row-level data the MV does not carry
        val leafOk = newChild.references.forall(r =>
          mvPlan.outputSet.exists(_.exprId == r.exprId))
        if (ok && leafOk) Some(Alias(newChild, name)(exprId = al.exprId))
        else None
      case _ => None
    }

    if (rewritten.exists(_.isEmpty)) None
    else {
      val newGroup = agg.groupingExpressions.map {
        case a: AttributeReference => mvAttr(a.name)
        case g => g
      }
      Some(Aggregate(newGroup, rewritten.map(_.get), mvPlan))
    }
  }
}
