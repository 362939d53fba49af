package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `tables` multi-table SimHash bucket keys of one scaled vector
  * in a single fused pass — the hashing hot path of the multi-table
  * LSH family ([[graft.operators.Similarity]] `multiTable*`).
  *
  * Table `t`, bit `i` is the sign of the random-hyperplane projection
  * Σ_j σ(t,i,j)·xs[j], with σ ∈ {±1} drawn from an integer mix
  * (see [[MultiTableBuckets.MIX_MUL]]) — unlike coordinate-sampling
  * schemes, hyperplane bits are independent across tables even when
  * `tables·bits` exceeds the embedding dimension, which is what makes
  * the 1−(1−p^r)^T recall formula honest (a dim-64 corpus has only 64
  * physical sign bits to sample; hyperplanes are unlimited).
  *
  * Exactness: `xs` comes from the guarded micro-unit scaling
  * ([[graft.functions.VectorFunctions.scaledMicro]], |x| ≤ 23), so
  * |Σ σ·xs| ≤ dim·23·10⁶ < 2⁴⁷ — exact int64 on every engine; the
  * DuckDB twin ([[graft.functions.VectorFunctions.mtBucketSqlDyn]])
  * replays the identical mix and sums, so bucket keys are
  * bit-identical. Bits are packed little-endian into a long
  * (`bits ≤ 62` enforced by [[graft.functions.VectorFunctions
  * .mtBits]]), one array element per table.
  *
  * Cost: tables·bits·dim fused long ops per vector inside whole-stage
  * codegen — the composed HOF equivalent would be an interpreted
  * lambda dispatch per multiply (measured order-of-magnitude slower
  * at the q74 shape).
  */
case class MultiTableBuckets(child: Expression, bits: Int, tables: Int)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
  require(tables >= 1, s"at least one table, got $tables")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> argument, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "mt_buckets"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val dim = xs.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        var acc = 0L
        var j = 0
        while (j < dim) {
          val u = (t.toLong * 4096L + i) * 4096L + j
          val m = (u * MultiTableBuckets.MIX_MUL + MultiTableBuckets.MIX_ADD) %
            MultiTableBuckets.MIX_MOD
          acc += (1L - 2L * (m % 2L)) * xs.getLong(j)
          j += 1
        }
        if (acc > 0L) bucket |= 1L << i
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val u = ctx.freshName("u")
      val m = ctx.freshName("m")
      s"""
         |int $dim = $xs.numElements();
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      long $u = (((long) $t) * 4096L + $i) * 4096L + $j;
         |      long $m = ($u * ${MultiTableBuckets.MIX_MUL}L +
         |        ${MultiTableBuckets.MIX_ADD}L) % ${MultiTableBuckets.MIX_MOD}L;
         |      $acc += (1L - 2L * ($m % 2L)) * $xs.getLong($j);
         |    }
         |    if ($acc > 0L) $bucket |= 1L << $i;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MultiTableBuckets =
    copy(child = newChild)
}

object MultiTableBuckets {
  /** FunctionRegistry entry: `SELECT mt_buckets(xs, 9, 8)` for SQL
    * users — bits and tables must be integer literals (they shape the
    * generated code).
    */
  val description: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("mt_buckets"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MultiTableBuckets].getName, "mt_buckets"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        s"mt_buckets(xs, bits, tables) takes 3 arguments, got ${children.size}")
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"mt_buckets: $name must be an integer literal, got $other")
      }
      MultiTableBuckets(children.head,
        intLit(children(1), "bits"), intLit(children(2), "tables"))
    })

  /** σ-mix constants, shared verbatim by the DuckDB twin: σ(t,i,j) =
    * 1 − 2·(((u·MUL + ADD) mod MOD) mod 2) with u = (t·4096+i)·4096+j.
    * MOD = 2³¹−1 (odd prime — low-bit parity of a power-of-2-modulus
    * LCG would be periodic); u < 2³¹ and u·MUL < 2⁶³, exact in int64.
    */
  val MIX_MUL: Long = 2654435761L
  val MIX_ADD: Long = 40503L
  val MIX_MOD: Long = 2147483647L
}
