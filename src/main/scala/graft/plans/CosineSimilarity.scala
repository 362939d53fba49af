package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns
  * — the custom-Expression tier of the extension ladder (SURVEY.md
  * §7.4): used where composition stops being good enough. The
  * composed alternatives both have a cost the generated loop avoids:
  * `zip_with`/`aggregate` are CodegenFallback (an interpreted lambda
  * dispatch per element), and a fixed-dimension `element_at`
  * expansion codegens 3·dim scattered array reads and bakes the
  * dimensionality into the plan. `doGenCode` emits one tight fused
  * loop (dot product and both norms in a single pass over the
  * arrays), dimension-agnostic, inside whole-stage codegen.
  *
  * Result parity is load-bearing: the accumulators sum in ascending
  * element order, exactly like the HOF fold and DuckDB's
  * `list_dot_product` over `DOUBLE[]`, so scores hash-match the
  * oracle bit-for-bit (ExpressionSpec asserts equality against the
  * HOF composition). Mismatched lengths compare over the common
  * prefix; a zero vector yields NaN (0/0) on every path alike.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // explicit type check instead of ExpectsInputTypes (whose
  // AbstractDataType is private[sql]); float arrays only — no
  // implicit casts, matching how embeddings are actually stored
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** FunctionRegistry entry: `SELECT cosine_sim(a, b)` for SQL users. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children.head, children(1)))
}

/** Session extension hook: `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` (or `.withExtensions` at build time)
  * registers the engine's native functions for SQL use — the
  * production route for shipping custom expressions with a library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSimilarity.description)
    ext.injectFunction(L2DistSq.description)
    ext.injectFunction(MultiTableBuckets.description)
    ext.injectFunction(CharPolyHash.description)
    ext.injectFunction(CharEnergy.description)
    // the whole-operator tier: the per-key top-k planner strategy
    // ([[PerKeyTopK]]); its builder also self-installs post-hoc on
    // sessions built without extensions
    ext.injectPlannerStrategy(_ => PerKeyTopKStrategy)
  }
}
