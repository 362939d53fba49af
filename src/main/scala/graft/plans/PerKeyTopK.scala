package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a WHOLE-OPERATOR Catalyst extension — the (c)
  * tier of the customization ladder (native expressions are (b),
  * the MV rewrite rule is the optimizer tier): a custom logical
  * node, a planner [[SparkStrategy]], and a physical
  * [[PerKeyTopKExec]], because no composition of built-ins expresses
  * "the first k rows per key" without a per-partition SORT — the
  * standard `row_number().over(partitionBy(key).orderBy(o)) <= k`
  * plans Exchange → Sort(key, o) → Window → Filter, paying
  * O(n log n) comparisons and a full sort buffer (spillable, but
  * paid) for output that only ever needs k rows per key.
  *
  * This operator plans Partial → Exchange(key) → Final, the shape of
  * partial aggregation:
  *
  *  - the PARTIAL node runs before the shuffle with no distribution
  *    requirement and caps every (key, partition) at k rows via a
  *    bounded heap — so the EXCHANGE moves at most k rows per key
  *    per upstream partition instead of the whole input (for top-3
  *    over millions of rows per key, the shuffle shrinks by orders
  *    of magnitude — the same reason partial aggregation exists);
  *  - the FINAL node requires `ClusteredDistribution(keys)` (the
  *    planner inserts the exchange) and merges the per-partition
  *    survivors with the same bounded heap, emitting each key's rows
  *    in ranking order.
  *
  * Per-row cost is O(log k) against a k-sized heap; state is
  * (distinct keys in partition) × k rows — the hash-aggregate state
  * class, far below the sort buffer the window form fills with the
  * ENTIRE partition. Determinism: callers make `order` total (a
  * tie-break column), exactly as the window form requires.
  */
case class PerKeyTopKNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : PerKeyTopKNode = copy(child = newChild)
}

/** Planner strategy: Partial(child) under Final — the exchange
  * appears between them via the Final node's required distribution.
  */
object PerKeyTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PerKeyTopKNode(keys, order, k, child) =>
      PerKeyTopKExec(keys, order, k, partial = false,
        PerKeyTopKExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class PerKeyTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan)
      : PerKeyTopKExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = RowOrdering.create(sortOrder, schema)
      // per key: a bounded worst-at-head heap (reverse ordering), so
      // a row only enters if it beats the current k-th best. State is
      // keys-in-partition x k row copies — the hash-agg state class.
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          -ord.compare(a, b)
      }
      val state = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = state.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](limit, worstFirst)
          state.put(key.copy(), q)
        }
        if (q.size < limit) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) {
          q.poll(); q.add(row.copy()); ()
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      state.values().forEach { q =>
        val rows = new Array[InternalRow](q.size)
        var i = rows.length - 1
        // heap drains worst-first; filling backwards yields each
        // key's rows in ranking order
        while (i >= 0) { rows(i) = q.poll(); i -= 1 }
        out ++= rows
      }
      out.iterator
    }, preservesPartitioning = true)
  }
}

/** Builder: `PerKeyTopK(df, keys, order, k)` — resolves plain
  * `col("x")` / `col("x").desc` references against `df`, installs
  * [[PerKeyTopKStrategy]] on the session if absent (the post-hoc
  * twin of `SparkSessionExtensions.injectPlannerStrategy`, which
  * [[GraftExtensions]] also wires for built-with-extensions
  * sessions), and returns the DataFrame over the custom node.
  */
object PerKeyTopK {
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column],
            k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(PerKeyTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PerKeyTopKStrategy
    val child = df.queryExecution.analyzed
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute =>
        child.output.find(a =>
            spark.sessionState.analyzer.resolver(a.name, u.name))
          .getOrElse(throw new IllegalArgumentException(
            s"column ${u.name} not in ${child.output.map(_.name)}"))
    }
    val keyExprs = keys.map(c =>
      resolve(org.apache.spark.sql.graft.ColumnBridge.catalystExpression(c)))
    val sortOrders = order.map(c =>
      org.apache.spark.sql.graft.ColumnBridge.catalystExpression(c) match {
        case so: SortOrder => so.copy(child = resolve(so.child))
        case e => SortOrder(resolve(e), Ascending)
      })
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      PerKeyTopKNode(keyExprs, sortOrders, k, child))
  }
}
