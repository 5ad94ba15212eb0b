package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the `k` nearest coarse-quantizer cells
  * of a vector, by cosine similarity — the per-row argmax/arg-top-k at
  * the heart of IVF cell assignment and probe selection.
  *
  * Input: an `array<float>` vector and the broadcast quantizer as DATA
  * (`array<struct<cell: long, cw: array<float>>>`, one row's worth —
  * see [[graft.ext.Similarity.ivfTopK]] for why the quantizer must be
  * data, not generated code). Output: the top-`k` cell ids ordered by
  * (cosine DESC, cell ASC) — exactly the total order the oracle's
  * `row_number() OVER (ORDER BY cscore DESC, cell ASC)` uses.
  *
  * Equivalent declarative formulation (what this replaces):
  * {{{
  *   slice(sort_array(transform(qcells, c ->
  *     struct(cosine(v, c.cw) AS s, -c.cell AS nc)), false), 1, k)
  * }}}
  * Spark evaluates higher-order functions INTERPRETED, per element:
  * the transform walks |cells| structs per row through the
  * non-codegen evaluator and allocates a struct per cell — measured as
  * the dominant cost of `sim_ivf_topk` (the one plan the round-3
  * audit flagged perf-weak). This kernel runs the whole
  * O(|cells| × dim) scoring loop in one compiled method with a
  * k-sized insertion top-k and zero per-cell allocation, while
  * keeping the zero-shuffle / no-SortAggregate plan shape unchanged.
  *
  * Semantics match the declarative form bit-for-bit (asserted in
  * OperatorSpec): scores accumulate in double in index order (same as
  * [[CosineSimilarity]]); cells whose centroid (or the vector) has
  * zero norm score null and are skipped — they can never be selected,
  * mirroring how a null cosine sorts last under the struct ordering.
  * If fewer than `k` cells are scorable the result is shorter than
  * `k`; it is empty (not null) when no cell is scorable.
  */
case class CellTopK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val cellsOk = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == LongType && (f1.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (vecOk && cellsOk && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<struct<long, array<float>>>, k >= 1), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString}, k=$k)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cell_top_k"

  override def nullSafeEval(v: Any, cells: Any): Any =
    CellTopK.compute(v.asInstanceOf[ArrayData], cells.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CellTopK.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (v, cells) => {
      s"${ev.value} = $cls.compute($v, $cells, $k);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CellTopK {

  /** One compiled pass: prefix sums of the query's squared elements
    * once, then per cell a fused dot+norm loop and an insertion into
    * the k-sized (score DESC, cell ASC) top list.
    * O(dim + |cells| × (dim + k)) per row, zero allocation beyond the
    * prefix array and the k-sized result.
    *
    * All three accumulators (dot, query norm, cell norm) cover the
    * SAME common-prefix range — exactly [[CosineSimilarity]]'s
    * semantics for unequal lengths. The query norm over a length-n
    * prefix is px(n), built by the identical sequential adds, so for
    * full-length cells (the only case the IVF plan produces) the
    * score is bit-for-bit the declarative-equivalence value.
    */
  def compute(v: ArrayData, cells: ArrayData, k: Int): ArrayData = {
    val nv = v.numElements()
    val px = new Array[Double](nv + 1)
    var i = 0
    while (i < nv) {
      val xi = v.getFloat(i).toDouble
      px(i + 1) = px(i) + xi * xi
      i += 1
    }
    val topId = new Array[Long](k)
    val topS = new Array[Double](k)
    var m = 0
    val nc = cells.numElements()
    var c = 0
    while (c < nc) {
      if (!cells.isNullAt(c)) {
        val cell = cells.getStruct(c, 2)
        val cid = cell.getLong(0)
        val cw = cell.getArray(1)
        val n = math.min(nv, cw.numElements())
        var dot = 0.0
        var ny = 0.0
        var j = 0
        while (j < n) {
          val xj = v.getFloat(j).toDouble
          val yj = cw.getFloat(j).toDouble
          dot += xj * yj
          ny += yj * yj
          j += 1
        }
        val nx = px(n)
        if (nx != 0.0 && ny != 0.0) {
          val s = dot / (math.sqrt(nx) * math.sqrt(ny))
          var pos = m
          while (pos > 0 &&
              (s > topS(pos - 1) || (s == topS(pos - 1) && cid < topId(pos - 1)))) {
            pos -= 1
          }
          if (pos < k) {
            var j2 = math.min(m, k - 1)
            while (j2 > pos) {
              topS(j2) = topS(j2 - 1); topId(j2) = topId(j2 - 1)
              j2 -= 1
            }
            topS(pos) = s
            topId(pos) = cid
            if (m < k) m += 1
          }
        }
      }
      c += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(topId, m))
  }
}
