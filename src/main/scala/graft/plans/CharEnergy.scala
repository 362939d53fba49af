package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd frame-energy fold — the "loudness" half of the
  * multimodal decode seam, sibling of [[CharPolyHash]]: for a k-byte
  * frame, `energy = Σ_{j<k} (byte_j − center)²` in one fused byte
  * loop per row (the windowed-RMS shape an audio pipeline computes
  * per PCM frame; here the deterministic byte-stand-in the container's
  * codec-free environment uses — swapping real PCM in changes the
  * decode seam, not this fold).
  *
  * Same cross-engine contract as the char-hash family:
  *
  *  - positions past the string's end fold byte 0 (the SQL twin's
  *    `ascii("") = 0`);
  *  - non-ASCII bytes in the read prefix RAISE (byte vs code-point
  *    read parity — [[graft.functions.Hashing.asciiGuard]]);
  *  - null in → null out.
  *
  * Bounded by k·center² ≤ 256·2¹⁴ — exact in int64 (and in int32,
  * but the family's output type is BIGINT everywhere).
  */
case class CharEnergy(child: Expression, k: Int, center: Int)
  extends UnaryExpression {

  require(k >= 1 && k <= 256, s"frame length must be in [1,256], got $k")
  require(center >= 0 && center <= 127, s"center must be a 7-bit value, got $center")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "char_energy"

  private val errMsg =
    "CharEnergy: non-ASCII text breaks cross-engine parity " +
      "(byte vs code-point read); transliterate first"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var j = 0
    while (j < k) {
      var c = 0L
      if (j < b.length) {
        if (b(j) < 0) throw new IllegalArgumentException(errMsg)
        c = b(j).toLong
      }
      val dvt = c - center
      acc += dvt * dvt
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val dv = ctx.freshName("dv")
      s"""
         |byte[] $b = $c.getBytes();
         |long $acc = 0L;
         |for (int $j = 0; $j < $k; $j++) {
         |  long $dv = -${center}L;
         |  if ($j < $b.length) {
         |    if ($b[$j] < 0) {
         |      throw new IllegalArgumentException("${errMsg}");
         |    }
         |    $dv = (long) $b[$j] - ${center}L;
         |  }
         |  $acc += $dv * $dv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEnergy =
    copy(child = newChild)
}

object CharEnergy {
  /** FunctionRegistry entry: `SELECT char_energy(s, k, center)` for
    * SQL users (k and center must be foldable int literals).
    */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_energy"),
    new ExpressionInfo(classOf[CharEnergy].getName, "char_energy"),
    (children: Seq[Expression]) => CharEnergy(children.head,
      children(1).eval().asInstanceOf[Int],
      children(2).eval().asInstanceOf[Int]))

  /** DuckDB twin of the fold — kept adjacent so the two engines can
    * only change together ([[graft.functions.Hashing.charHashSql]]
    * discipline). `frame` should be a plain column reference.
    */
  def sql(frame: String, k: Int, center: Int): String =
    (1 to k).map { j =>
      s"(ascii(substr($frame, $j, 1)) - $center) * " +
        s"(ascii(substr($frame, $j, 1)) - $center)"
    }.mkString("(", " + ", ")::BIGINT")
}
