package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: integer dot product of two `array<int>`
  * code vectors with LONG accumulation — the scoring kernel of
  * int8-quantized ANN serving ([[graft.ext.Similarity]]
  * `sim_topk_sq8`). Every term and the running sum are EXACT integers
  * (|code| ≤ 127 ⇒ |term| ≤ 16129, far inside long range at any
  * dimension), so candidate ranking over quantized codes is bit-stable
  * across engines and partitionings by construction — no float-sum
  * ordering to round away, which is precisely why production SQ8
  * pipelines rank candidates in the integer domain and spend floats
  * only on the short re-rank list.
  *
  * Same codegen rationale as [[DotProduct]]: the declarative
  * `aggregate(zip_with(...))` form is interpreted; this is one fused
  * loop inside whole-stage codegen. Evaluated over the common prefix.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "vector_dot_int"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        long $dot = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $dot += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
