package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer squared-L2 distance over two `array<long>`
  * columns — the k-means/IVF hot path ([[graft.operators
  * .VectorQuantizer]]). Same extension-ladder rationale as
  * [[CosineSimilarity]]: one fused dimension-agnostic loop inside
  * whole-stage codegen, where the long-form alternative (posexplode +
  * per-dim join + groupBy sum) materializes corpus×cells×dim rows
  * through a shuffle — measured 64× more rows than scoring one fused
  * row per (vector, cell) pair at dim 64.
  *
  * Exactness contract: inputs come from [[graft.operators
  * .VectorQuantizer.scaled]], whose guarded |x| ≤ 23 micro-unit domain
  * bounds Σ(x−c)² < 2⁶³ for any dim ≤ 4096 — the long accumulator
  * cannot wrap, so the value is bit-identical to the oracle's
  * per-dim SUM((xs−cs)²) on every engine (integer addition is
  * order-free). Mismatched lengths sum over the common prefix — the
  * quantizer always produces equal-length arrays.
  */
case class L2DistSq(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got $l and $r")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "l2_dist_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistSq =
    copy(left = newLeft, right = newRight)
}

object L2DistSq {
  /** FunctionRegistry entry: `SELECT l2_dist_sq(a, b)` for SQL users. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2_dist_sq"),
    new ExpressionInfo(classOf[L2DistSq].getName, "l2_dist_sq"),
    (children: Seq[Expression]) => L2DistSq(children.head, children(1)))
}
