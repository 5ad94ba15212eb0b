package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: weighted squared distance of an
  * `array<float>` vector from an `array<double>` center with
  * `array<double>` per-dimension weights —
  * `Σ_i (x_i − μ_i)² · w_i`, the diagonal-Mahalanobis scoring loop of
  * `emb_outliers` ([[graft.ext.Similarity.outlierScores]]).
  *
  * Same rationale as [[CosineSimilarityD]]: the declarative
  * `aggregate(zip_with(...))` formulation evaluates interpreted
  * (higher-order functions are CodegenFallback) and allocates an
  * intermediate array per corpus row; this kernel is one fused codegen
  * loop with zero allocation. Per-term arithmetic
  * `((x−μ)·(x−μ))·w` and left-to-right accumulation over the common
  * prefix are bit-for-bit the HOF chain it replaces (KernelLawsSpec
  * law), so swapping it in cannot move the oracle hash.
  */
case class WeightedSqDist(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>, array<double>), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "weighted_sq_dist"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mu = b.asInstanceOf[ArrayData]
    val w = c.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), math.min(mu.numElements(), w.numElements()))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val e = x.getFloat(i).toDouble - mu.getDouble(i)
      acc += (e * e) * w.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val e = ctx.freshName("e")
      s"""
        int $n = Math.min($a.numElements(), Math.min($b.numElements(), $c.numElements()));
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $e = ((double) $a.getFloat($i)) - $b.getDouble($i);
          $acc += ($e * $e) * $c.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
