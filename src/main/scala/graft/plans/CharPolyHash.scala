package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial char-gram hash — one fused byte loop
  * replacing [[graft.functions.Hashing]]'s k-term chained
  * `ascii(substr(g, j, 1))` fold (k ladder rungs of substr allocation
  * + codepoint decode per row; at q93's k=32 that is 32 chained
  * expression nodes per frame).
  *
  * Semantics are BIT-IDENTICAL to the column fold it replaces, which
  * is what the DuckDB oracle replays ([[graft.functions.Hashing
  * .charHashSql]]):
  *
  *  - Horner fold `acc = (acc·257 + byte) mod (2³¹−1)` over exactly k
  *    terms;
  *  - positions past the string's end fold 0 (the fold's
  *    `ascii("") = 0` behavior for short grams);
  *  - any non-ASCII byte in the read prefix RAISES — the
  *    [[graft.functions.Hashing.asciiGuard]] domain contract, enforced
  *    in the same pass instead of a separate octet/char length
  *    compare (Spark's `ascii` reads bytes, DuckDB's reads code
  *    points; parity holds only on single-byte text);
  *  - null in → null out (guard included), matching the fold's
  *    null-transparent chain.
  *
  * Intermediates stay below 257·2³¹ < 2⁴⁰ — exact in int64 on both
  * engines, the family's standing discipline.
  */
case class CharPolyHash(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1 && k <= 256, s"gram length must be in [1,256], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "char_poly_hash"

  private val errMsg =
    "Hashing.charHash: non-ASCII text breaks cross-engine parity " +
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
      acc = (acc * 257L + c) % 2147483647L
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val ch = ctx.freshName("ch")
      s"""
         |byte[] $b = $c.getBytes();
         |long $acc = 0L;
         |for (int $j = 0; $j < $k; $j++) {
         |  long $ch = 0L;
         |  if ($j < $b.length) {
         |    if ($b[$j] < 0) {
         |      throw new IllegalArgumentException("${errMsg}");
         |    }
         |    $ch = (long) $b[$j];
         |  }
         |  $acc = ($acc * 257L + $ch) % 2147483647L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

object CharPolyHash {
  /** FunctionRegistry entry: `SELECT char_poly_hash(s, k)` for SQL
    * users (k must be a foldable int literal).
    */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_poly_hash"),
    new ExpressionInfo(classOf[CharPolyHash].getName, "char_poly_hash"),
    (children: Seq[Expression]) => CharPolyHash(children.head,
      children(1).eval().asInstanceOf[Int]))
}
