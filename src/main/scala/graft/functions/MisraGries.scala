package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter summary over 64-bit keys: a k-counter
  * frequency sketch whose guarantee is one-sided — any key with true
  * frequency > N/(k+1) of the N-element stream is PRESENT in the
  * summary (counts are undercounts; absence proves rarity, presence
  * proves nothing). That one-sidedness is exactly what the two-pass
  * heavy-hitter pipeline needs ([[graft.functions.TextAnalysis]]
  * `text_heavy_hitters`): pass 1 folds the corpus into ≤ k candidate
  * keys with NO per-key shuffle — the summary is the aggregation
  * buffer, merged associatively across partitions — and pass 2
  * exact-counts only the ≤ k candidates, so the final thresholded set
  * is exact and deterministic no matter how the sketch's internal
  * state varied with partitioning.
  *
  * Why not a plain groupBy-count to find frequent keys: at 100 TB the
  * full per-key aggregate shuffles one row per DISTINCT key (billions
  * for tokens); the sketch's exchange is k longs per map task, and the
  * confirm pass's exchange is ≤ k × partitions rows. This is the
  * bounded-state discipline [[TopKAgg]] applies to ranking, applied to
  * frequency.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS'12): sum
  * counters pairwise, then subtract the (k+1)-th largest count from
  * every counter and drop the non-positive — keeps ≤ k counters and
  * preserves the N/(k+1) error bound additively across merges.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[Long]] {

  private def trim(m: Map[Long, Long]): Map[Long, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      m.collect { case (h, n) if n > cut => h -> (n - cut) }
    }

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(m: Map[Long, Long], h: Long): Map[Long, Long] =
    m.get(h) match {
      case Some(n) => m.updated(h, n + 1)
      case None if m.size < k => m.updated(h, 1L)
      case None => // decrement-all step: the classic MG counter trade
        m.collect { case (kk, n) if n > 1 => kk -> (n - 1) }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    trim(a.foldLeft(b) { case (acc, (h, n)) => acc.updated(h, acc.getOrElse(h, 0L) + n) })

  override def finish(m: Map[Long, Long]): Seq[Long] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MisraGries {
  /** `agg(mg(32)($"h").as("cand"))` → `array<long>` of ≤ k candidate
    * keys, sorted (sorting makes the array deterministic GIVEN the
    * final counter set; the set itself may vary with partitioning —
    * consumers must exact-confirm, see [[MisraGriesAgg]]).
    */
  def mg(k: Int): Column => Column = {
    val f = udaf(new MisraGriesAgg(k), ExpressionEncoder[Long]())
    h => f(h)
  }
}
