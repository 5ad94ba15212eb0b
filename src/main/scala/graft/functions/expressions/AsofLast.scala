package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: as-of lookup into a per-key sorted
  * timeline.
  *
  * `AsofLast(arr, key)` — `arr` is an `array<struct<t, ...>>` sorted
  * ascending by its first field `t`, `key` is a scalar of the same
  * (microsecond-long-backed) type; returns the LAST struct with
  * `t <= key`, or null when none qualifies. This is the probe half of
  * an as-of join: build each join key's timeline once (groupBy +
  * sort_array of a small per-key array), then every probe row is an
  * O(log n) binary search inside whole-stage codegen — no union, no
  * global sort of the probe side, no range explosion.
  *
  * Preconditions (by construction at every call site): array elements
  * are non-null, `t` is non-null, and the array is sorted ascending —
  * `sort_array(collect_list(struct(t, ...)))` produces exactly this.
  *
  * Accepted `t`/`key` physical types: TIMESTAMP, TIMESTAMP_NTZ, LONG —
  * all long-backed, compared as raw microseconds (session UTC).
  */
case class AsofLast(left: Expression, right: Expression)
    extends BinaryExpression {

  private def longBacked(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.nonEmpty && longBacked(fields.head.dataType) &&
          longBacked(right.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<long-backed t, ...>>, long-backed key), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private lazy val elementType: StructType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def dataType: DataType = elementType
  override def nullable: Boolean = true
  override def prettyName: String = "asof_last"

  override def nullSafeEval(a: Any, k: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val key = k.asInstanceOf[Long]
    val n = elementType.length
    var lo = 0
    var hi = arr.numElements() - 1
    var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, n).getLong(0) <= key) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (res < 0) null else arr.getStruct(res, n).copy()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val nFields = elementType.length
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val res = ctx.freshName("res")
      s"""
        int $lo = 0, $hi = $a.numElements() - 1, $res = -1;
        while ($lo <= $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($a.getStruct($mid, $nFields).getLong(0) <= $k) { $res = $mid; $lo = $mid + 1; }
          else { $hi = $mid - 1; }
        }
        if ($res < 0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $a.getStruct($res, $nFields);
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
