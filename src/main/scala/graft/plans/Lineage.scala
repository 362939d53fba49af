package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction from an ANALYZED logical plan —
  * the governance/debugging view every pipeline team eventually asks
  * for ("which source columns can influence this output column?"),
  * answered from the plan itself so it can never drift from the code.
  *
  * The walk is a fixpoint over `ExprId`s: every operator's named
  * expressions contribute `output-id → referenced-ids` edges
  * (projections/aggregates via their [[Alias]]es, generators via
  * their generator outputs), leaves ground ids in `file:column`
  * names, and transitive closure resolves each visible output to its
  * source-column set. Filters/joins/sorts don't RENAME columns, so
  * they add no edges for value lineage; their predicate inputs are
  * reported separately as CONTROL lineage (columns that can change
  * which rows appear — the distinction lineage tools draw between
  * value and row provenance). Conservative by design: an expression
  * lineage is the union of its children's — no attempt to prove a
  * column's value is unaffected by an input it references.
  *
  * Driver-side plan traversal only — the DataFrame is never
  * executed; cost is plan-sized, never data-sized.
  */
object Lineage {

  final case class Report(value: Map[String, Set[String]],
                          control: Set[String])

  /** Lineage of every output column of `df`. Keys are output column
    * names; values are `<fileBaseName>.<column>` source names.
    */
  def of(df: DataFrame): Report = {
    val plan = df.queryExecution.analyzed
    // source grounding: attribute id -> "file.column" at scan leaves
    val ground = scala.collection.mutable.Map.empty[ExprId, Set[String]]
    // derivation edges: attribute id -> ids it derives from
    val edges = scala.collection.mutable.Map.empty[ExprId, Set[ExprId]]
    // control-lineage input ids (filter/join predicates)
    val control = scala.collection.mutable.Set.empty[ExprId]

    def refs(e: Expression): Set[ExprId] =
      e.collect { case a: AttributeReference => a.exprId }.toSet

    def sourceName(rel: LogicalRelation): String = rel.relation match {
      case fs: HadoopFsRelation =>
        val p = fs.location.rootPaths.headOption.map(_.getName)
          .getOrElse("scan")
        p.stripSuffix(".parquet")
      case _ => "scan"
    }

    plan.foreach {
      case lr: LogicalRelation =>
        val src = sourceName(lr)
        lr.output.foreach(a => ground(a.exprId) =
          ground.getOrElse(a.exprId, Set.empty) + s"$src.${a.name}")
      case l: LocalRelation =>
        l.output.foreach(a => ground(a.exprId) =
          ground.getOrElse(a.exprId, Set.empty) + s"local.${a.name}")
      case p: Project =>
        p.projectList.foreach {
          case al: Alias =>
            edges(al.exprId) = edges.getOrElse(al.exprId, Set.empty) ++
              refs(al.child)
          case _ => () // bare attribute: same id flows through
        }
      case a: Aggregate =>
        a.aggregateExpressions.foreach {
          case al: Alias =>
            edges(al.exprId) = edges.getOrElse(al.exprId, Set.empty) ++
              refs(al.child)
          case _ => ()
        }
        // grouping keys gate which rows aggregate together
        a.groupingExpressions.foreach(e => control ++= refs(e))
      case g: Generate =>
        val in = refs(g.generator)
        g.generatorOutput.foreach(o =>
          edges(o.exprId) = edges.getOrElse(o.exprId, Set.empty) ++ in)
      case w: Window =>
        w.windowExpressions.foreach {
          case al: Alias =>
            edges(al.exprId) = edges.getOrElse(al.exprId, Set.empty) ++
              refs(al.child)
          case _ => ()
        }
      case f: Filter => control ++= refs(f.condition)
      case j: Join => j.condition.foreach(c => control ++= refs(c))
      case e: Expand =>
        // rollup/cube: each output attribute derives from the union of
        // its position across all projections
        e.output.zipWithIndex.foreach { case (o, i) =>
          val in = e.projections.flatMap(row =>
            if (i < row.length) refs(row(i)) else Nil).toSet
          if (in.nonEmpty && in != Set(o.exprId))
            edges(o.exprId) = edges.getOrElse(o.exprId, Set.empty) ++
              (in - o.exprId)
        }
      case _ => ()
    }

    def resolve(id: ExprId, seen: Set[ExprId]): Set[String] =
      if (seen(id)) Set.empty
      else ground.getOrElse(id, Set.empty) ++
        edges.getOrElse(id, Set.empty)
          .flatMap(x => resolve(x, seen + id))

    Report(
      value = plan.output.map(a =>
        a.name -> resolve(a.exprId, Set.empty)).toMap,
      control = control.flatMap(id => resolve(id, Set.empty)).toSet)
  }
}
