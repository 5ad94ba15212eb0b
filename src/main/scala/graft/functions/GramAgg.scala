package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass Gram/covariance sufficient statistics over the
  * embedding corpus: folds every vector into ONE row of
  * `(n, Σx_i, Σx_i·x_j upper-triangle)` — the exact inputs the
  * covariance matrix, PCA training, and whitening transforms need.
  *
  * Why one typed fold and not D(D+1)/2 declarative `sum(x_i*x_j)`
  * aggregates: 2080 aggregate expressions blow up codegen (the
  * [[graft.ext.Similarity.ivfTopK]] quantizer lesson: big-arity
  * anything must be DATA, not generated code), while this aggregator
  * keeps one 17 KB double-array buffer per task and exchanges exactly
  * one buffer per task — the [[CentroidAgg]] shape. At 100 TB the
  * exchange stays D²-sized and corpus-independent; the per-row cost is
  * the unavoidable D²/2 multiply-adds.
  *
  * Buffer layout: `count` + `sums[D]` + row-major upper triangle
  * `tri[D(D+1)/2]` with `tri(i,j) = offset(i) + (j−i)`,
  * `offset(i) = i·D − i(i−1)/2` — mirrored by the declarative index
  * arithmetic in `emb_covariance` and by [[graft.ext.Similarity.pca]].
  */
class GramAgg
    extends Aggregator[Seq[Float], (Long, Array[Double], Array[Double]),
      (Long, Seq[Double], Seq[Double])] {

  override def zero: (Long, Array[Double], Array[Double]) =
    (0L, Array.empty, Array.empty)

  override def reduce(
      b: (Long, Array[Double], Array[Double]),
      v: Seq[Float]): (Long, Array[Double], Array[Double]) = {
    val d = v.length
    val (n, s0, t0) = b
    val s = if (s0.isEmpty) new Array[Double](d) else s0
    val t = if (t0.isEmpty) new Array[Double](d * (d + 1) / 2) else t0
    // IndexedSeq fast path: WrappedArray from the row converter
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = v(i); i += 1 }
    var k = 0
    i = 0
    while (i < d) {
      s(i) += x(i)
      var j = i
      while (j < d) { t(k) += x(i) * x(j); j += 1; k += 1 }
      i += 1
    }
    (n + 1, s, t)
  }

  override def merge(
      a: (Long, Array[Double], Array[Double]),
      b: (Long, Array[Double], Array[Double])): (Long, Array[Double], Array[Double]) =
    if (a._1 == 0) b
    else if (b._1 == 0) a
    else {
      var i = 0
      while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      i = 0
      while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }

  override def finish(
      b: (Long, Array[Double], Array[Double])): (Long, Seq[Double], Seq[Double]) =
    (b._1, b._2.toSeq, b._3.toSeq)

  override def bufferEncoder: Encoder[(Long, Array[Double], Array[Double])] =
    ExpressionEncoder[(Long, Array[Double], Array[Double])]()
  override def outputEncoder: Encoder[(Long, Seq[Double], Seq[Double])] =
    ExpressionEncoder[(Long, Seq[Double], Seq[Double])]()
}

object GramAgg {
  /** `agg(gram($"embedding").as("g"))` →
    * `struct<_1: n, _2: sums, _3: upper-tri products>`.
    */
  val gram: Column => Column = {
    val f = udaf(new GramAgg, ExpressionEncoder[Seq[Float]]())
    emb => f(emb)
  }
}
