package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests (SURVEY.md §5.4) for the summary-merge monoid: the
  * reference MERGE's UPDATE branch (pattern_1_1.py:110-112) is a
  * commutative monoid on (count: +, updated_at: max) — these laws are
  * what make the incremental patterns equal the batch recompute under
  * ANY batch boundaries.
  */
object MergeLawsSpec extends Properties("SummaryMergeMonoid") {

  /** (count_of_clicks, updated_at-as-epoch-micros) */
  type S = (Long, Long)
  private val zero: S = (0L, Long.MinValue)
  private def merge(a: S, b: S): S = (a._1 + b._1, math.max(a._2, b._2))

  private val genS: Gen[S] = for {
    c <- Gen.chooseNum(0L, 1000000L)
    t <- Gen.chooseNum(-1000000L, 1000000L)
  } yield (c, t)

  private val genEvents: Gen[List[S]] = Gen.listOf(genS)

  property("commutative") = Prop.forAll(genS, genS) { (a, b) =>
    merge(a, b) == merge(b, a)
  }

  property("associative") = Prop.forAll(genS, genS, genS) { (a, b, c) =>
    merge(merge(a, b), c) == merge(a, merge(b, c))
  }

  property("identity") = Prop.forAll(genS) { a =>
    merge(a, zero) == a && merge(zero, a) == a
  }

  property("batch-boundary invariance: any split folds to the same summary") =
    Prop.forAll(genEvents, Gen.chooseNum(0, 100)) { (events, splitPct) =>
      val full = events.foldLeft(zero)(merge)
      val cut = events.length * splitPct / 100
      val (b1, b2) = events.splitAt(cut)
      val merged = merge(b1.foldLeft(zero)(merge), b2.foldLeft(zero)(merge))
      full == merged
    }
}
