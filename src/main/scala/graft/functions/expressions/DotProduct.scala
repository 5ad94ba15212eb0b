package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of an `array<float>` vector
  * with an `array<double>` vector (typically a literal hyperplane) or
  * another `array<float>` vector (self/pair dot — vector norms,
  * [[graft.ext.Similarity.embStats]]), double accumulation in index
  * order.
  *
  * The built-in formulation `aggregate(zip_with(v, w, _*_), 0d, _+_)`
  * evaluates interpreted (higher-order functions are CodegenFallback in
  * Spark) and allocates an intermediate array per row; this expression
  * is a tight codegen loop. Accumulation order matches the sequential
  * fold, so results are bit-for-bit identical to the built-in form.
  * Evaluated over the common prefix of the two arrays.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) |
           (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double|float>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val yFloat = rightIsFloat
    var dot = 0.0
    var i = 0
    while (i < n) {
      val yi = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += x.getFloat(i).toDouble * yi
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val yGet =
        if (rightIsFloat) s"((double) $b.getFloat($i))" else s"$b.getDouble($i)"
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += ((double) $a.getFloat($i)) * $yGet;
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
