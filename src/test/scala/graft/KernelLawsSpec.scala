package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.CentroidAgg
import graft.functions.expressions.CellTopK

/** Property tests for the round-4 kernels.
  *
  * [[CellTopK]]: the compiled arg-top-k must equal the plain-Scala
  * reference (score every cell with the double-accumulated cosine,
  * sort by (score desc, cell asc), take k, skip zero-norm) on random
  * vectors — generators bias toward duplicate centroids (score ties →
  * the cell-asc tiebreak) and zero vectors (the null-score skip).
  *
  * [[CentroidAgg]]: the partial-aggregation monoid law — any
  * two-way partitioning of the input folded separately and merged
  * must equal the single sequential fold, up to floating-point
  * re-association (counts and key sets exactly, sums to 1e-9
  * relative), which is precisely the freedom Spark exercises between
  * map-side partials and the final merge.
  */
object KernelLawsSpec extends Properties("graft kernels") {

  // ── CellTopK ─────────────────────────────────────────────────────

  private val Dim = 4

  private val genVec: Gen[Array[Float]] = Gen.frequency(
    8 -> Gen.listOfN(Dim, Gen.oneOf(-2f, -1f, -0.5f, 0f, 0.5f, 1f, 2f))
      .map(_.toArray),
    1 -> Gen.const(Array.fill(Dim)(0f))) // zero-norm: unscorable

  private val genCells: Gen[List[(Long, Array[Float])]] = for {
    n <- Gen.chooseNum(0, 8)
    base <- Gen.listOfN(n, genVec)
    // duplicate some centroids so scores tie and the id tiebreak matters
    dup <- Gen.chooseNum(0, n)
  } yield (base ++ base.take(dup)).zipWithIndex.map { case (w, i) => (i.toLong, w) }

  private def cellsData(cells: List[(Long, Array[Float])]): ArrayData =
    new GenericArrayData(cells.map { case (id, w) =>
      new GenericInternalRow(Array[Any](id, ArrayData.toArrayData(w)))
    }.toArray[Any])

  /** Reference cosine with CosineSimilarity's exact unequal-length
    * semantics: all three accumulators over the common prefix.
    */
  private def cosRef(v: Array[Float], w: Array[Float]): Option[Double] = {
    val n = math.min(v.length, w.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      dot += v(i).toDouble * w(i).toDouble
      nx += v(i).toDouble * v(i).toDouble
      ny += w(i).toDouble * w(i).toDouble
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) None else Some(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  private def topRef(v: Array[Float], cells: List[(Long, Array[Float])], k: Int): Seq[Long] =
    cells.flatMap { case (id, w) => cosRef(v, w).map(s => (id, s)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(k).map(_._1)

  property("CellTopK.compute equals sort-by-(score desc, cell asc)-take-k") =
    Prop.forAll(genVec, genCells, Gen.chooseNum(1, 6)) { (v, cells, k) =>
      val got = CellTopK.compute(ArrayData.toArrayData(v), cellsData(cells), k)
        .toLongArray().toSeq
      got == topRef(v, cells, k)
    }

  // unequal lengths: every accumulator covers the common prefix —
  // CosineSimilarity's exact semantics — so the ORDERING must match
  // the reference, not just membership
  property("CellTopK matches the reference ordering on length-mismatched cells") =
    Prop.forAll(genVec, genVec, Gen.chooseNum(1, 3)) { (v, w, k) =>
      val cells = List(0L -> v.take(2), 1L -> (v ++ v), 2L -> w.take(3),
        3L -> (w ++ v), 4L -> Array.empty[Float])
      val got = CellTopK.compute(ArrayData.toArrayData(v), cellsData(cells), k)
        .toLongArray().toSeq
      got == topRef(v, cells, k)
    }

  // ── CosineSimilarityD ────────────────────────────────────────────

  /** Reference: the exact `zip_with`+`aggregate` double fold the
    * kernel replaced — three independent sequential accumulators over
    * the common prefix, null on zero norm.
    */
  private def cosRefD(v: Array[Float], w: Array[Double]): Option[Double] = {
    val n = math.min(v.length, w.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      dot += v(i).toDouble * w(i)
      nx += v(i).toDouble * v(i).toDouble
      ny += w(i) * w(i)
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) None else Some(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  private val genVecD: Gen[Array[Double]] = Gen.frequency(
    8 -> Gen.listOfN(Dim, Gen.oneOf(-1.5, -0.333333, 0.0, 0.123456, 0.5, 2.0))
      .map(_.toArray),
    1 -> Gen.const(Array.fill(Dim)(0.0)))

  property("CosineSimilarityD equals the sequential double fold, bit-for-bit") =
    Prop.forAll(genVec, genVecD) { (v, w) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
      val got = graft.functions.expressions.CosineSimilarityD(
        Literal.create(v, ArrayType(FloatType)),
        Literal.create(w, ArrayType(DoubleType))).eval(null)
      cosRefD(v, w) match {
        case None => got == null
        // bit equality, not tolerance: the law is the fold itself
        case Some(d) => got != null &&
          java.lang.Double.doubleToLongBits(got.asInstanceOf[Double]) ==
            java.lang.Double.doubleToLongBits(d)
      }
    }

  // ── CentroidAgg ──────────────────────────────────────────────────

  private val genRows: Gen[List[(Long, Seq[Float])]] = for {
    n <- Gen.chooseNum(0, 30)
    rows <- Gen.listOfN(n, for {
      cell <- Gen.chooseNum(0L, 4L) // force cell collisions
      v <- genVec
    } yield (cell, v.toSeq))
  } yield rows

  private def foldAll(rows: List[(Long, Seq[Float])]) = {
    val a = new CentroidAgg
    rows.foldLeft(a.zero)(a.reduce)
  }

  private def close(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    }

  property("CentroidAgg: any two-way split folds+merges to the sequential fold") =
    Prop.forAll(genRows, Gen.chooseNum(0, 100)) { (rows, pct) =>
      val cut = rows.length * pct / 100
      val (l, r) = rows.splitAt(cut)
      val a = new CentroidAgg
      val merged = a.merge(foldAll(l), foldAll(r))
      val whole = foldAll(rows)
      merged.keySet == whole.keySet && whole.keySet.forall { cell =>
        merged(cell)._1 == whole(cell)._1 && close(merged(cell)._2, whole(cell)._2)
      }
    }

  // ── GramAgg ──────────────────────────────────────────────────────

  private val genGramRows: Gen[List[Seq[Float]]] = for {
    n <- Gen.chooseNum(0, 20)
    rows <- Gen.listOfN(n, genVec.map(_.toSeq))
  } yield rows

  private def gramFold(rows: List[Seq[Float]]) = {
    val a = new graft.functions.GramAgg
    rows.foldLeft(a.zero)(a.reduce)
  }

  property("GramAgg: any two-way split folds+merges to the sequential fold") =
    Prop.forAll(genGramRows, Gen.chooseNum(0, 100)) { (rows, pct) =>
      val cut = rows.length * pct / 100
      val (l, r) = rows.splitAt(cut)
      val a = new graft.functions.GramAgg
      val merged = a.merge(gramFold(l), gramFold(r))
      val whole = gramFold(rows)
      merged._1 == whole._1 &&
        close(merged._2, whole._2) && close(merged._3, whole._3)
    }

  // ── MisraGriesAgg ────────────────────────────────────────────────

  private val genStream: Gen[List[Long]] = for {
    n <- Gen.chooseNum(0, 200)
    // small key space with planted heavies so decrements and the
    // one-sided guarantee are both exercised
    xs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const(1L), 3 -> Gen.const(2L), 1 -> Gen.chooseNum(3L, 40L)))
  } yield xs

  private def mgFold(k: Int, xs: List[Long]) = {
    val a = new graft.functions.MisraGriesAgg(k)
    xs.foldLeft(a.zero)(a.reduce)
  }

  property("MisraGries: split+merge keeps every key above N/(k+1) — the mergeable guarantee") =
    Prop.forAll(genStream, Gen.chooseNum(0, 100), Gen.chooseNum(2, 6)) { (xs, pct, k) =>
      val cut = xs.length * pct / 100
      val (l, r) = xs.splitAt(cut)
      val a = new graft.functions.MisraGriesAgg(k)
      val merged = a.merge(mgFold(k, l), mgFold(k, r))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val n = xs.size.toLong
      merged.size <= k &&
        exact.forall { case (key, c) => c * (k + 1) <= n || merged.contains(key) }
    }

  // ── classifierYScale ladder ──────────────────────────────────────

  /** Doc counts biased toward the exact ladder boundaries (±1) plus a
    * uniform sweep across twelve decades — the headroom law must hold
    * AT the cutovers, not just between them.
    */
  private val genNDocs: Gen[Long] = {
    val ladderMax = graft.functions.TextAnalysis.YScaleLadder.last._1
    val bounds = graft.functions.TextAnalysis.YScaleLadder
      .flatMap { case (nMax, _) => Seq(nMax - 1, nMax, nMax + 1) }
      .filter(_ <= ladderMax) // past the ladder the rule RAISES (law below)
    Gen.frequency(
      1 -> Gen.oneOf(bounds),
      2 -> Gen.chooseNum(1L, 5L * 1000L * 1000 * 1000 * 1000))
  }

  property("yScale ladder: exact-GD headroom N*ys*1000 < 2^60 holds and ys is maximal") =
    Prop.forAll(genNDocs) { n =>
      import graft.functions.TextAnalysis
      val ys = TextAnalysis.classifierYScale(n)
      val shift = BigInt(1) << 60
      val holds = BigInt(n) * ys * 1000 < shift
      // maximality: one ladder rung up would break the bound (except
      // at the 10^9 cap, where small corpora keep full resolution)
      val maximal = ys == TextAnalysis.ClassifierYScale ||
        BigInt(n) * (ys * 10) * 1000 >= shift
      holds && maximal && ys >= 1L
    }

  property("yScale ladder: past the ys=1 rung the rule fails loudly, never wraps") =
    Prop.forAll(Gen.chooseNum(1L, 1000L)) { d =>
      import graft.functions.TextAnalysis
      val past = TextAnalysis.YScaleLadder.last._1 + d
      scala.util.Try(TextAnalysis.classifierYScale(past)).failed.toOption
        .exists(_.isInstanceOf[IllegalArgumentException])
    }
}
