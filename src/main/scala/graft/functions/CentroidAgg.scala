package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Global vector-centroid aggregator: folds the whole corpus into ONE
  * row of per-cell `(cell, count, dim-wise sums)` — the index-build
  * step of an IVF coarse quantizer and of per-label class prototypes.
  *
  * Why not `groupBy(cell).agg(sum(emb[0]), …, sum(emb[63]))` + a
  * second `collect_list` aggregation (the previous formulation): the
  * Dim-wide declarative form pays TWO full aggregate chains — a
  * partial+final HashAggregate with a |cells|-row exchange, then a
  * partial+final collect aggregation with a single-partition exchange
  * — four aggregate operators and two exchanges of 65-column rows, and
  * at local bench scale the per-stage scheduling floor of that chain
  * dominated the whole IVF query (~0.5 s of a 0.9 s plan). This
  * aggregator is the same computation as ONE global typed aggregation:
  * each task folds its partition into a |cells|-entry map (the monoid
  * the MergeLawsSpec pattern pins), the exchange carries one map per
  * task (|cells| × Dim doubles — independent of corpus size, the
  * textbook partial-aggregation shape), and finish emits the sorted
  * cell list. Downstream rounding/normalization happens declaratively
  * on the ONE output row, so cross-engine `round` semantics stay
  * Spark's own.
  *
  * Scale: state is |cells| × (Dim+1) doubles per task — bounded by the
  * quantizer size (1k–64k cells in production), not the corpus. The
  * per-row tuple conversion of the udaf bridge is a constant-factor
  * cost on a single linear pass with no wide rows on any exchange.
  */
class CentroidAgg
    extends Aggregator[(Long, Seq[Float]), Map[Long, (Long, Array[Double])],
      Seq[(Long, Long, Seq[Double])]] {

  override def zero: Map[Long, (Long, Array[Double])] = Map.empty

  override def reduce(
      m: Map[Long, (Long, Array[Double])],
      in: (Long, Seq[Float])): Map[Long, (Long, Array[Double])] = {
    val (cell, v) = in
    m.get(cell) match {
      case Some((n, s)) =>
        val lim = math.min(v.length, s.length)
        var i = 0
        while (i < lim) { s(i) += v(i); i += 1 }
        m.updated(cell, (n + 1, s))
      case None =>
        val s = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { s(i) = v(i); i += 1 }
        m.updated(cell, (1L, s))
    }
  }

  override def merge(
      a: Map[Long, (Long, Array[Double])],
      b: Map[Long, (Long, Array[Double])]): Map[Long, (Long, Array[Double])] =
    b.foldLeft(a) { case (acc, (cell, (nb, sb))) =>
      acc.get(cell) match {
        case Some((na, sa)) =>
          val lim = math.min(sa.length, sb.length)
          var i = 0
          while (i < lim) { sa(i) += sb(i); i += 1 }
          acc.updated(cell, (na + nb, sa))
        case None => acc.updated(cell, (nb, sb))
      }
    }

  override def finish(m: Map[Long, (Long, Array[Double])]): Seq[(Long, Long, Seq[Double])] =
    m.toSeq.map { case (cell, (n, s)) => (cell, n, s.toSeq) }.sortBy(_._1)

  override def bufferEncoder: Encoder[Map[Long, (Long, Array[Double])]] =
    ExpressionEncoder[Map[Long, (Long, Array[Double])]]()
  override def outputEncoder: Encoder[Seq[(Long, Long, Seq[Double])]] =
    ExpressionEncoder[Seq[(Long, Long, Seq[Double])]]()
}

object CentroidAgg {
  /** Untyped-DataFrame handle:
    * `agg(centroids($"cell", $"embedding").as("raw"))` →
    * `array<struct<_1: cell, _2: n, _3: array<double> sums>>`,
    * sorted by cell.
    */
  val centroids: (Column, Column) => Column = {
    val f = udaf(new CentroidAgg, ExpressionEncoder[(Long, Seq[Float])]())
    (cell, emb) => f(cell, emb)
  }
}
