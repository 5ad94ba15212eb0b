package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for [[graft.functions.TopKAgg]] — the partial-
  * aggregation contract. Spark is free to reduce inputs in any order,
  * partition them arbitrarily, and merge partial buffers in any
  * association; the aggregator's answer must be the plain
  * sort-and-take of the whole multiset regardless. Generators bias
  * toward id collisions and tied scores because the tiebreak
  * (score desc, id asc) is exactly where a heap trim goes subtly
  * wrong.
  */
object TopKLawsSpec extends Properties("TopKAgg") {

  type E = (Long, Double)

  private def agg(k: Int) = new graft.functions.TopKAgg(k)

  /** Reference semantics: total order (score desc, id asc), first k. */
  private def reference(xs: List[E], k: Int): Seq[E] =
    xs.sortBy(t => (-t._2, t._1)).take(k)

  private val genE: Gen[E] = for {
    id <- Gen.chooseNum(0L, 20L)                    // force id collisions
    s <- Gen.oneOf(0.0, 0.25, 0.5, 0.5, 1.0, -1.0) // force score ties
  } yield (id, s)

  private val genList: Gen[List[E]] = Gen.listOf(genE)
  private val genK: Gen[Int] = Gen.chooseNum(1, 7)

  property("sequential fold equals sort-and-take") =
    Prop.forAll(genList, genK) { (xs, k) =>
      val a = agg(k)
      a.finish(xs.foldLeft(a.zero)(a.reduce)) == reference(xs, k)
    }

  property("any two-way partitioning merges to the same answer") =
    Prop.forAll(genList, genK, Gen.chooseNum(0, 100)) { (xs, k, pct) =>
      val a = agg(k)
      val (b1, b2) = xs.splitAt(xs.length * pct / 100)
      val merged = a.merge(b1.foldLeft(a.zero)(a.reduce), b2.foldLeft(a.zero)(a.reduce))
      a.finish(merged) == reference(xs, k)
    }

  property("merge is commutative on trimmed buffers") =
    Prop.forAll(genList, genList, genK) { (xs, ys, k) =>
      val a = agg(k)
      val (bx, by) = (xs.foldLeft(a.zero)(a.reduce), ys.foldLeft(a.zero)(a.reduce))
      a.merge(bx, by) == a.merge(by, bx)
    }

  property("merge is associative up to finish") =
    Prop.forAll(genList, genList, genList, genK) { (xs, ys, zs, k) =>
      val a = agg(k)
      val (bx, by, bz) =
        (xs.foldLeft(a.zero)(a.reduce), ys.foldLeft(a.zero)(a.reduce), zs.foldLeft(a.zero)(a.reduce))
      a.finish(a.merge(a.merge(bx, by), bz)) == a.finish(a.merge(bx, a.merge(by, bz)))
    }

  property("reduce order is irrelevant (shuffled input, same answer)") =
    Prop.forAll(genList, genK, Gen.long) { (xs, k, seed) =>
      val a = agg(k)
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      a.finish(shuffled.foldLeft(a.zero)(a.reduce)) ==
        a.finish(xs.foldLeft(a.zero)(a.reduce))
    }
}
