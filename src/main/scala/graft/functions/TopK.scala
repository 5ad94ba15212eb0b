package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-K aggregator: keeps the K best (score desc, id asc)
  * pairs per group.
  *
  * Why not `Window.partitionBy(qid).orderBy(score)` + row_number ≤ K:
  * a window shuffles EVERY scored row to the reducer for its group.
  * An `Aggregator` participates in partial aggregation — each map
  * task pre-trims to K rows per group before the exchange, so the
  * shuffle carries O(partitions × K) rows per group instead of O(n).
  * For brute-force ANN scoring (|corpus| rows per query) that is the
  * difference between shuffling the corpus and shuffling K rows.
  *
  * Ordering is a total order (score desc, then id asc), so results are
  * deterministic and partitioning-independent.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortBy(t => (-t._2, t._1)).take(k)

  override def zero: Seq[(Long, Double)] = Nil

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    // fast path: strictly below the floor of a full buffer → drop without sorting
    if (buf.size >= k && {
      val floor = buf.last
      in._2 < floor._2 || (in._2 == floor._2 && in._1 > floor._1)
    }) buf
    else trim(buf :+ in)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}

/** Bounded bottom-K aggregator over exact 64-bit (key, id) pairs:
  * keeps the K smallest by (key asc, id asc). Same partial-aggregation
  * rationale as [[TopKAgg]] — each map task trims its group to K rows
  * before the exchange, so a group holding half the corpus still ships
  * only O(partitions × K) rows to its reducer — but over Long keys,
  * because a Double score would lose the low bits of a 60-bit hash key
  * (53-bit mantissa) and corrupt the ordering.
  */
class BottomKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private val ord = Ordering.Tuple2[Long, Long]

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] = s.sorted(ord).take(k)

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    // fast path: at or above the ceiling of a full buffer → drop without sorting
    if (buf.size >= k && ord.lteq(buf.last, in)) buf
    else trim(buf :+ in)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopK {
  /** Untyped-DataFrame handle:
    * `groupBy(qid).agg(topK(10)($"id", $"score").as("hits"))`
    * → `array<struct<_1: id, _2: score>>` sorted best-first.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAgg(k), ExpressionEncoder[(Long, Double)]())
    (id, score) => f(id, score)
  }

  /** `groupBy(g).agg(bottomK(50)($"key", $"id").as("kept"))`
    * → `array<struct<_1: key, _2: id>>` sorted smallest-first.
    */
  def bottomK(k: Int): (Column, Column) => Column = {
    val f = udaf(new BottomKAgg(k), ExpressionEncoder[(Long, Long)]())
    (key, id) => f(key, id)
  }
}
