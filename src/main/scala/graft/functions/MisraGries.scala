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
  * Buffer layout — the [[CentroidAgg]] mutable-cell trick: counters
  * live in single-element `Array[Long]` cells inside an immutable map,
  * so the HOT path (a key already in the summary) is one in-place
  * increment with ZERO allocation; map reallocation happens only on
  * insert and on the decrement step that actually frees a slot. Keeps
  * the `ExpressionEncoder` (no kryo) while making the per-row cost of
  * a corpus-scale fold an array write.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS'12): sum
  * counters pairwise, then subtract the (k+1)-th largest count from
  * every counter and drop the non-positive — keeps ≤ k counters and
  * preserves the N/(k+1) error bound additively across merges.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[Long, Map[Long, Array[Long]], Seq[Long]] {

  private def trim(m: Map[Long, Array[Long]]): Map[Long, Array[Long]] =
    if (m.size <= k) m
    else {
      val cut = m.valuesIterator.map(_(0)).toSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (h, c) if c(0) > cut => h -> Array(c(0) - cut) }
    }

  override def zero: Map[Long, Array[Long]] = Map.empty

  override def reduce(m: Map[Long, Array[Long]], h: Long): Map[Long, Array[Long]] =
    m.get(h) match {
      case Some(c) => c(0) += 1; m // hot path: in-place, zero alloc
      case None if m.size < k => m.updated(h, Array(1L))
      case None =>
        // decrement-all (the classic MG counter trade); rebuild the map
        // only when a counter actually hits zero and frees a slot
        var freed = false
        m.valuesIterator.foreach { c => c(0) -= 1; if (c(0) == 0) freed = true }
        if (freed) m.filter(_._2(0) > 0) else m
    }

  override def merge(
      a: Map[Long, Array[Long]],
      b: Map[Long, Array[Long]]): Map[Long, Array[Long]] =
    trim(b.foldLeft(a) { case (acc, (h, c)) =>
      acc.get(h) match {
        case Some(ca) => ca(0) += c(0); acc
        case None => acc.updated(h, c)
      }
    })

  override def finish(m: Map[Long, Array[Long]]): Seq[Long] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Array[Long]]] =
    ExpressionEncoder[Map[Long, Array[Long]]]()
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
