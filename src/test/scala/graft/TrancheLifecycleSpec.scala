package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup

/** The production tranche lifecycle, chained end to end on fixtures:
  *
  *   release N (old corpus) → persistable artifacts (exact pairs +
  *   component label forest) → tranche N+1 lands → INCREMENTAL exact
  *   pairs (new×old and new×new only) → WARM-START components over
  *   (label forest ∪ new pairs) → refreshed per-source release card
  *
  * pinned stage-by-stage equal to a cold full recompute. This is the
  * composition all the incremental machinery exists for: each piece
  * (`allPairsIncremental`, `componentsWarmStart`, the release card) is
  * oracle-checked separately; this spec pins that CHAINED they
  * reconstruct exactly the state a from-scratch release build produces
  * — old×old work is never re-paired and the contraction restarts from
  * flattened state, yet nothing observable differs.
  *
  * Fixture topology (cutoff = 100; old ids < 100, tranche ≥ 100):
  *   - {1, 2}        identical old docs          → old×old pair
  *   - {3, 100}      J = 9/11 across the cut     → tranche pair
  *   - {4, 5, 103}   chain: (4,5) old, (5,103) tranche; (4,103) is
  *                   BELOW threshold — the component merges old and
  *                   new docs only through the chain, so warm-start
  *                   must stitch a tranche edge onto a prior cluster
  *   - {101, 102}    identical tranche docs      → new×new pair
  *   - 6 (old), 104 (new): singletons, appear in no pair frame
  */
class TrancheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Cutoff = 100L

  /** doc_id → distinct shingle-hash set. */
  private val sets: Seq[(Long, Seq[Long])] = {
    val a = (1L to 5L).map(10000L + _)
    val b = (1L to 10L).map(20000L + _)
    val d = (1L to 10L).map(30000L + _)
    Seq(
      1L -> a,
      2L -> a,
      3L -> b,
      4L -> d,
      5L -> (d.take(9) :+ 31001L),
      6L -> (1L to 6L).map(40000L + _),
      100L -> (b.take(9) :+ 21001L),
      101L -> (1L to 4L).map(50000L + _),
      102L -> (1L to 4L).map(50000L + _),
      103L -> (d.take(9) ++ Seq(31001L, 31002L)),
      104L -> (1L to 7L).map(60000L + _))
  }

  private def exOf(docIds: Long => Boolean): DataFrame =
    sets.filter(s => docIds(s._1))
      .flatMap { case (d, hs) => hs.map(h => (d, hs.size, h)) }
      .toDF("doc_id", "sz", "h")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select("v", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The release card's doc-grain core over the fixture corpus: per
    * source, docs in and docs kept (keeper = not a non-root label).
    */
  private def card(labels: DataFrame): Set[(String, Long, Long)] = {
    val docs = sets.map { case (d, _) =>
      (d, if (d % 2 == 0) "web" else "books")
    }.toDF("doc_id", "source")
    val losers = labels.filter(col("v") =!= col("comp"))
      .select(col("v").as("doc_id"), lit(true).as("is_loser"))
    docs.join(losers, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("docs_in"),
        count(when(col("is_loser").isNull, 1)).as("docs_kept"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("release N → incremental pairs → warm components → card == cold full recompute") {
    val exFull = exOf(_ => true)
    val exOld = exOf(_ < Cutoff)

    // ---- cold full recompute: the ground truth the lifecycle must hit
    val pairsCold = Dedup.allPairsExactOn(exFull)
    val (labelsCold, coldRounds) =
      Dedup.starComponents(pairsCold.select(
        col("doc_a").as("src"), col("doc_b").as("dst")))

    // ---- release N: old-corpus pairs + persisted label state
    val pairsOld = Dedup.allPairsExactOn(exOld)
    assert(pairSet(pairsOld) === Set((1L, 2L), (4L, 5L)))
    val (priorLabels, _) = Dedup.starComponents(pairsOld.select(
      col("doc_a").as("src"), col("doc_b").as("dst")))

    // ---- tranche N+1 lands: incremental pairs touch only id-larger-
    // endpoint-new pairs, and the decomposition is EXACT (the prefix
    // filter's completeness guarantee, composed across the cut)
    val pairsNew = Dedup.allPairsIncrementalOn(exFull, Cutoff)
    assert(pairSet(pairsNew) === Set((3L, 100L), (5L, 103L), (101L, 102L)))
    assert(pairSet(pairsNew).forall(_._2 >= Cutoff))
    assert(pairSet(pairsOld) ++ pairSet(pairsNew) === pairSet(pairsCold))

    // ---- warm-start components: prior label FOREST ∪ tranche edges
    val forest = priorLabels.filter(col("v") =!= col("comp"))
      .select(col("v").as("src"), col("comp").as("dst"))
    val (labelsWarm, warmRounds) = Dedup.starComponents(
      forest.unionByName(pairsNew.select(
        col("doc_a").as("src"), col("doc_b").as("dst"))))
    assert(labelSet(labelsWarm) === labelSet(labelsCold))
    assert(warmRounds <= coldRounds,
      s"warm took $warmRounds rounds vs cold $coldRounds")
    // the chain component really does span the cut with min-id label
    assert(labelSet(labelsWarm).filter(_._2 == 4L).map(_._1) ===
      Set(4L, 5L, 103L))

    // ---- refreshed release card equals the cold card, and the
    // keeper arithmetic is the expected one: losers are {2, 100,
    // 5, 103, 102}; singletons 6 and 104 stay kept
    val cardWarm = card(labelsWarm)
    assert(cardWarm === card(labelsCold))
    assert(cardWarm === Set(
      ("web", 6L, 3L),    // in: 2,4,6,100,102,104 — kept: 4,6,104
      ("books", 5L, 3L))) // in: 1,3,5,101,103    — kept: 1,3,101
  }

  test("streaming twin: foreachBatch tranche chain + crash replay == batch ground truth") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{TrancheLifecycle, VersionedStore}
    implicit val ctx = spark.sqlContext

    // ground truth: the cold full recompute's non-root label forest
    val pairsCold = Dedup.allPairsExactOn(exOf(_ => true))
    val (labelsCold, _) = Dedup.starComponents(pairsCold.select(
      col("doc_a").as("src"), col("doc_b").as("dst")))
    val forestCold = labelSet(labelsCold.filter(col("v") =!= col("comp")))

    def rowsOf(p: Long => Boolean): Seq[(Long, Int, Long)] =
      sets.filter(s => p(s._1))
        .flatMap { case (d, hs) => hs.map(h => (d, hs.size, h)) }

    val input = MemoryStream[(Long, Int, Long)]
    val corpusLog = TestSpark.tmpDir("tranche-stream-log") + "/log"
    val store = new VersionedStore(spark, TestSpark.tmpDir("tranche-stream-labels"))
    val q = TrancheLifecycle.start(
      input.toDF().toDF("doc_id", "sz", "h"), corpusLog, store,
      TestSpark.tmpDir("tranche-stream-ckpt"))
    try {
      // tranche 1 = release N's corpus; tranche 2 = the landing tranche
      input.addData(rowsOf(_ < Cutoff)); q.processAllAvailable()
      input.addData(rowsOf(_ >= Cutoff)); q.processAllAvailable()
    } finally q.stop()

    // committed forest == cold ground truth; card == the batch card
    assert(labelSet(store.read().get) === forestCold)
    val docs = sets.map { case (d, _) =>
      (d, if (d % 2 == 0) "web" else "books")
    }.toDF("doc_id", "source")
    val cardStream = TrancheLifecycle.releaseCard(docs, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cardStream === Set(("web", 6L, 3L), ("books", 5L, 3L)))

    // crash-recovery: replay the LAST batch through the same fold (the
    // PatternsSpec retry idiom — a crash between the corpus-log write
    // and the forest commit makes Spark re-deliver batch 1): the
    // partition rewrites identical rows, the forest re-commits the
    // identical version — nothing observable moves
    val logRows = spark.read.parquet(corpusLog).count()
    val verBefore = store.currentVersion
    TrancheLifecycle.processTranche(corpusLog, store)(
      rowsOf(_ >= Cutoff).toDF("doc_id", "sz", "h"), 1L)
    assert(spark.read.parquet(corpusLog).count() === logRows)
    assert(labelSet(store.read().get) === forestCold)
    assert(store.currentVersion === verBefore)
    assert(cardStream === TrancheLifecycle.releaseCard(docs, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  /** Split stability across tranches: a tranche whose edges MERGE two
    * prior components flips the canonical root — and with it the
    * cluster-hash split assignment — of every doc in the absorbed
    * component. The law pinned here: (a) after every tranche the
    * assignment is still leak-free (no confirmed pair straddles
    * splits — by construction, both endpoints share a component), and
    * (b) the churn census is EXACTLY the absorbed-component mass, with
    * split flips exactly where the root hash crosses a band boundary.
    *
    * Fixture: two 2-doc components over disjoint-ish 21-element sets
    * A and B (J(A,B) = 9/33, far below 4/5), bridged by a tranche of
    * five chain docs stepping A→B in 2-element swaps (adjacent
    * J = 19/23 ≥ 4/5, non-adjacent 17/25 < 4/5) — the merge arrives
    * only through the chain, the warm-start stitch case.
    */
  test("tranche merge churn: absorbed component flips assignment, split stays leak-free") {
    import graft.streaming.{TrancheLifecycle, VersionedStore}

    val setA: Seq[Long] = (1L to 21L).map(70000L + _)
    val tailB: Seq[Long] = (1L to 12L).map(71000L + _)
    val setB: Seq[Long] = setA.take(9) ++ tailB
    // chain step k: drop the last 2k of A's tail-12, take the first
    // 2k of B's tail-12 (k=1..5); step 6 IS setB (doc 21's set)
    def chain(k: Int): Seq[Long] =
      setA.take(9) ++ setA.drop(9).dropRight(2 * k) ++ tailB.take(2 * k)
    val churnSets: Seq[(Long, Seq[Long])] =
      Seq(10L -> setA, 11L -> setA, 20L -> setB, 21L -> setB) ++
        (1 to 5).map(k => (99L + k) -> chain(k))
    def rowsOf(p: Long => Boolean): Seq[(Long, Int, Long)] =
      churnSets.filter(s => p(s._1))
        .flatMap { case (d, hs) => hs.map(h => (d, hs.size, h)) }

    val corpusLog = TestSpark.tmpDir("churn-log") + "/log"
    val store = new VersionedStore(spark, TestSpark.tmpDir("churn-labels"))
    TrancheLifecycle.processTranche(corpusLog, store)(
      rowsOf(_ < 100L).toDF("doc_id", "sz", "h"), 0L)
    val docsOf: Long => Seq[Long] = cut => churnSets.map(_._1).filter(_ < cut)
    def assignment(docIds: Seq[Long]): Map[Long, (Long, Long)] = {
      val forest = labelSet(store.read().get).toMap
      val comps = docIds.map(d => d -> forest.getOrElse(d, d))
      val mods = comps.toDF("doc_id", "comp")
        .withColumn("hash_mod", Dedup.splitHashMod(col("comp")))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      mods.toMap
    }
    def band(hm: Long): String =
      if (hm < 80) "train" else if (hm < 90) "valid" else "test"

    // tranche 1: two separate components {10,11} and {20,21}
    val a1 = assignment(docsOf(100L))
    assert(a1.view.mapValues(_._1).toMap ===
      Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))

    // tranche 2 lands the bridge chain
    TrancheLifecycle.processTranche(corpusLog, store)(
      rowsOf(_ >= 100L).toDF("doc_id", "sz", "h"), 1L)
    val a2 = assignment(churnSets.map(_._1))
    // everything collapsed to the min-id root 10
    assert(a2.view.mapValues(_._1).toMap.values.toSet === Set(10L))

    // (a) leak-free after the merge: every confirmed pair among the
    // landed docs shares a split — recomputed from the exact pair path
    val pairs = Dedup.allPairsExactOn(rowsOf(_ => true).toDF("doc_id", "sz", "h"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (x, y) =>
      assert(band(a2(x)._2) === band(a2(y)._2), s"pair ($x,$y) straddles splits")
    }

    // (b) churn census == the absorbed-component mass: exactly
    // {20, 21} changed comp (20 → 10); their split flips iff the root
    // hash bands differ
    val changedComp = a1.keys.filter(d => a1(d)._1 != a2(d)._1).toSet
    assert(changedComp === Set(20L, 21L))
    val expectFlip = band(a1(20L)._2) != band(a2(20L)._2)
    val changedSplit = a1.keys.filter(d => band(a1(d)._2) != band(a2(d)._2)).toSet
    assert(changedSplit === (if (expectFlip) Set(20L, 21L) else Set.empty[Long]))
  }

  /** Landing-tranche ≡ forest-cutoff consistency on a corpus size NOT
    * divisible by the tranche count. The forests (and the DuckDB
    * oracle) bound tranche t at the FLOORED cutoff n·t div T; the
    * churn census must place each doc's landing tranche by the same
    * rule — smallest t with doc_id < n·t div T, i.e.
    * t = ceil(T·(doc_id+1)/n). The old floor(doc_id·T/n)+1 form agreed
    * only when n·t divided evenly: at n = 50, T = 4 the t=1 cutoff is
    * 50·1 div 4 = 12, so doc 12 belongs to tranche 2 — floor form put
    * it in tranche 1, inflating docs_prev(2) to 13. All driver corpora
    * (500/5000 docs) are multiples of 4, so only this fixture sees it.
    */
  test("split_assignment_churn landing tranche uses the floored forest cutoffs (n=50 ∤ 4)") {
    val dir = TestSpark.tmpDir("churn-odd")
    // 50 docs, all texts pairwise disjoint so no confirmed pairs —
    // every comp is the doc itself and the census reduces to the pure
    // tranche-membership count
    (0L until 50L).map(i =>
        (i, (0 until 8).map(j => s"tok_${i}_$j").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.splitAssignmentChurn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs_prev(t) = #docs landed by t−1 = 50·(t−1) div 4
    assert(got === Map(2L -> 12L, 3L -> 25L, 4L -> 37L))
  }
}
