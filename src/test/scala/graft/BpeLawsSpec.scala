package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Randomized laws for the BPE trainer against plain-Scala references.
  * Generators use a 2-letter alphabet and tiny words so runs ("aaa"),
  * tied counts, and multi-symbol merge partners — exactly where a fold
  * or a tie-break goes subtly wrong — occur constantly. Seeded, so a
  * failure replays.
  */
class BpeLawsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sep = graft.functions.TextAnalysis.BpeSep

  /** Reference left-to-right non-overlapping merge: a just-merged
    * symbol never re-participates within the same pass (it equals
    * s1+s2, never s1 — the same invariant the distributed fold leans
    * on).
    */
  private def refMerge(syms: List[String], s1: String, s2: String): List[String] =
    syms match {
      case a :: b :: rest if a == s1 && b == s2 =>
        (s1 + s2) :: refMerge(rest, s1, s2)
      case a :: rest => a :: refMerge(rest, s1, s2)
      case Nil => Nil
    }

  /** Reference greedy trainer: exact pair counts over the current
    * symbol table, (count desc, s1 asc, s2 asc) argmax, merge, repeat.
    */
  private def refTrain(
      wf0: Map[String, Long], merges: Int): List[(Long, String, String, String, Long)] = {
    var wf: Map[List[String], Long] =
      wf0.map { case (w, n) => (w.toList.map(_.toString), n) }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Long, String, String, String, Long)]
    var step = 1L
    var done = false
    while (step <= merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, n) <- wf; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += n
      if (counts.isEmpty) done = true
      else {
        val ((s1, s2), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((step, s1, s2, s1 + s2, c))
        wf = wf.map { case (syms, n) => (refMerge(syms, s1, s2), n) }
        step += 1
      }
    }
    out.toList
  }

  test("distributed merge fold == reference on random symbol sequences") {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = Vector("a", "b", "ab", "ba", "aa")
    for (_ <- 1 to 12) {
      val (s1, s2) = (alphabet(rnd.nextInt(alphabet.size)),
        alphabet(rnd.nextInt(alphabet.size)))
      val cases = Vector.fill(40)(
        List.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.size))))
      val got = cases.map(_.mkString(sep)).toDF("syms")
        .select(graft.functions.TextAnalysis.bpeMergeFold(col("syms"), s1, s2))
        .collect().map(_.getString(0).split(sep, -1).toList)
      val want = cases.map(refMerge(_, s1, s2))
      assert(got.toSeq === want.toSeq, s"merge ($s1,$s2) diverged")
    }
  }

  test("one-pass disjoint fold == the sequential fold stack it replaces") {
    val rnd = new scala.util.Random(20260816L)
    // symbol universe wide enough to draw several DISJOINT pairs
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "ab", "cd")
    for (trial <- 1 to 12) {
      // draw up to 3 pairs respecting the trainer's disjointness rule
      // (no shared symbol, and no pair reading another's merged string)
      val used = scala.collection.mutable.Set.empty[String]
      val pairs = Iterator.continually(
        (alphabet(rnd.nextInt(alphabet.size)), alphabet(rnd.nextInt(alphabet.size))))
        .filter { case (s1, s2) =>
          if (used(s1) || used(s2) || used(s1 + s2)) false
          else { used += s1; used += s2; used += s1 + s2; true }
        }.take(1 + rnd.nextInt(3)).toSeq
      val cases = Vector.fill(40)(
        List.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size))))
      val df = cases.map(_.mkString(sep)).toDF("syms")
      val got = df.select(graft.functions.TextAnalysis
          .bpeMergeFoldAll(col("syms"), pairs).as("syms"))
        .collect().map(_.getString(0))
      val want = pairs.foldLeft(df) { case (d, (s1, s2)) =>
        d.select(graft.functions.TextAnalysis
          .bpeMergeFold(col("syms"), s1, s2).as("syms"))
      }.collect().map(_.getString(0))
      assert(got.toSeq === want.toSeq, s"trial $trial pairs=$pairs diverged")
    }
  }

  test("batched trainer at batch=1 == exact trainer on random corpora") {
    val rnd = new scala.util.Random(4141414L)
    for (case_ <- 1 to 3) {
      val words = (1 to 3 + rnd.nextInt(5)).map { _ =>
        (1 to 1 + rnd.nextInt(5)).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
      }.distinct
      val wf0 = words.map(w => w -> (1L + rnd.nextInt(3))).toMap
      val wfDf = wf0.toSeq.toDF("t", "n_w")
      // batch=1 selects exactly the exact trainer's argmax each round
      val got = graft.functions.TextAnalysis
        .bpeVocabBatchedFromWf(spark, wfDf, batch = 1)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      val want = refTrain(wf0, graft.functions.TextAnalysis.BpeVocabMerges)
      assert(got === want, s"case $case_: corpus $wf0 diverged")
    }
  }

  test("batched trainer == exact trainer when the top pairs are symbol-disjoint") {
    // four single-pair words with strictly ordered counts and fully
    // disjoint symbols: the exact trainer picks them one per step with
    // counts unchanged between steps (a disjoint merge preserves other
    // pairs' adjacencies), so one batch=4 round must reproduce the
    // exact 4-step history — steps, pairs, AND counts
    val wf0 = Map("ab" -> 9L, "cd" -> 8L, "ef" -> 7L, "gh" -> 6L)
    val wfDf = wf0.toSeq.toDF("t", "n_w")
    val got = graft.functions.TextAnalysis
      .bpeVocabBatchedFromWf(spark, wfDf, merges = 4, batch = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList.sortBy(_._1)
    val want = refTrain(wf0, 4)
    assert(got === want)
  }

  test("distributed trainer == reference greedy on random corpora") {
    val rnd = new scala.util.Random(8151527L)
    for (case_ <- 1 to 4) {
      val words = (1 to 3 + rnd.nextInt(5)).map { _ =>
        (1 to 1 + rnd.nextInt(5)).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
      }.distinct
      val wf0 = words.map(w => w -> (1L + rnd.nextInt(3))).toMap
      val wfDf = wf0.toSeq.toDF("t", "n_w")
      val got = graft.functions.TextAnalysis.bpeVocabFromWf(spark, wfDf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      val want = refTrain(wf0, graft.functions.TextAnalysis.BpeVocabMerges)
      assert(got === want, s"case $case_: corpus $wf0 diverged")
    }
  }

  /** The batched trainer runs two physical paths — the in-memory
    * incremental round loop (word tables ≤ BpeDriverLoopMaxWords) and
    * the distributed fallback — that must learn BIT-IDENTICAL merge
    * sequences: same (count desc, s1, s2) total order, same
    * top-(4·want) candidate over-fetch, same greedy disjoint take,
    * same simultaneous (pre, last) fold. Random corpora with a
    * 2-letter alphabet hit ties, runs, and multi-symbol partners
    * constantly — exactly where a driver-side mirror drifts. The
    * fixed non-BMP words pin the CODE-POINT symbol alphabet: a
    * per-UTF-16-char split would break U+1F600 into two lone
    * surrogates (a different merge universe than Spark's code-point
    * `substring`), and mixing a supplementary code point with a
    * U+E000.. private-use one exercises exactly the range where
    * UTF-8 byte order and Java's UTF-16 order disagree on the
    * tie-break.
    */
  test("in-memory batched loop == distributed batched loop, merge for merge") {
    val rnd = new scala.util.Random(16161616L)
    // U+1F600 (UTF-8 F0.. / UTF-16 D83D..) vs U+E001 (UTF-8 EE.. /
    // UTF-16 E001): UTF-8 orders the emoji AFTER the private-use
    // char, UTF-16 before — their count-1 pair ties force the
    // tie-break to choose between the two orders
    val nonBmp = Seq("a\uD83D\uDE00b", "\uD83D\uDE00\uE001a", "\uE001b")
    for (case_ <- 1 to 3; batch <- Seq(1, 3)) {
      val words = ((1 to 6 + rnd.nextInt(8)).map { _ =>
        (1 to 1 + rnd.nextInt(7)).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
      } ++ nonBmp).distinct
      val wf0 = words.map(w => w -> (1L + rnd.nextInt(3))).toMap
      val wfDf = wf0.toSeq.toDF("t", "n_w")
      def run(maxWords: Long) = graft.functions.TextAnalysis
        .bpeVocabBatchedFromWf(spark, wfDf, merges = 40, batch = batch,
          driverLoopMaxWords = maxWords)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      val driver = run(Long.MaxValue)
      val distributed = run(0L)
      assert(driver === distributed,
        s"case $case_ batch=$batch: paths diverged on corpus $wf0")
    }
  }

  /** The batched trainer's LOUD SEMANTIC FLAG, characterized: batch>1
    * learns a different merge sequence (hence vocabulary) than exact
    * sequential BPE — this census law BOUNDS the divergence and pins
    * encode-quality equivalence instead of leaving both in a probe
    * JSON. (a) encoding the training corpus with the batched list
    * compresses within 8 % of the exact list's total token count —
    * the metric a tokenizer consumer actually experiences (measured:
    * within 1 %, sometimes BETTER than exact — batched-greedy is a
    * different greedy, not a worse one); (b) merge-SET divergence is
    * bounded but NOT small or monotone in batch — one early
    * different pick cascades, so this fixture measures 0.6 % at
    * batch=2 and ~40 % at batch=4 (the 50k-word probe measured 18 %
    * at batch=8) — which is exactly why the docstring flags the knob
    * loudly and quality, not set identity, is the pinned contract.
    */
  test("batched trainer divergence vs exact: bounded set-diff, equivalent encode quality") {
    val rnd = new scala.util.Random(29L)
    val letters = "abcdefgh"
    val words = (1 to 400).map(_ =>
      (1 to 3 + rnd.nextInt(8)).map(_ => letters(rnd.nextInt(letters.length))).mkString
    ).distinct
    val wf0 = words.map(w => w -> (1L + rnd.nextInt(5))).toMap
    val wfDf = wf0.toSeq.toDF("t", "n_w")
    val merges = 160
    val exact = refTrain(wf0, merges)
    assert(exact.size >= merges, s"fixture exhausted at ${exact.size} merges")
    def encodedTokens(mergeList: Seq[(String, String)]): Long =
      wf0.iterator.map { case (w, n) =>
        n * mergeList.foldLeft(w.toList.map(_.toString)) {
          case (syms, (s1, s2)) => refMerge(syms, s1, s2)
        }.size
      }.sum
    val exactSet = exact.map(t => (t._2, t._3)).toSet
    val exactEnc = encodedTokens(exact.map(t => (t._2, t._3)))
    val divBy = scala.collection.mutable.Map.empty[Int, Double]
    for (batch <- Seq(2, 4, 8)) {
      val got = graft.functions.TextAnalysis
        .bpeVocabBatchedFromWf(spark, wfDf, merges, batch)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      assert(got.size === merges, s"batch=$batch exhausted at ${got.size}")
      val setDiff = exactSet.diff(got.toSet).size.toDouble / merges
      val enc = encodedTokens(got)
      info(f"batch=$batch set-divergence=$setDiff%.3f " +
        f"encoded=$enc tokens (exact=$exactEnc)")
      assert(setDiff <= 0.60,
        f"batch=$batch merge-set divergence $setDiff%.3f exceeds the bound")
      assert(enc <= math.ceil(exactEnc * 1.08).toLong,
        s"batch=$batch encode quality $enc vs exact $exactEnc is past 8 %")
      divBy(batch) = setDiff
    }
  }

  /** Production merge counts: the 10-merge oracle regime folds every
    * merge as one stacked projection, which blows Catalyst plan size
    * at tokenizer-realistic N. Past [[TextAnalysis.BpeEncodeChunk]]
    * merges the encoder re-materializes the word→symbols table per
    * chunk instead, so plan depth stays ≤ the chunk size no matter
    * how many merges — this law pins trainer AND chunked encoder
    * against the plain-Scala reference at N ≥ 100.
    */
  test("trainer + chunked encoder == reference at N=120 merges") {
    val rnd = new scala.util.Random(13L)
    val letters = "abcdefgh"
    val words = (1 to 240).map(_ =>
      (1 to 3 + rnd.nextInt(8)).map(_ => letters(rnd.nextInt(letters.length))).mkString
    ).distinct
    val wf0 = words.map(w => w -> (1L + rnd.nextInt(5))).toMap
    val wfDf = wf0.toSeq.toDF("t", "n_w")
    val merges = 120
    val want = refTrain(wf0, merges)
    assert(want.size >= 100, s"fixture exhausted at ${want.size} merges")

    val got = graft.functions.TextAnalysis.bpeVocabFromWf(spark, wfDf, merges)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList.sortBy(_._1)
    assert(got === want)

    // chunked encode under the learned merges == the reference fold —
    // and the chunking really engaged (>= 2 chunks at this N)
    val mergeList = want.map(t => (t._2, t._3))
    assert(mergeList.size > graft.functions.TextAnalysis.BpeEncodeChunk)
    val vocab0 = words.toDF("t").select(col("t"),
      org.apache.spark.sql.functions.array_join(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(1, length(t)), i -> substring(t, i, 1))"),
        sep).as("syms"))
    val gotEnc = graft.functions.TextAnalysis.bpeEncodeSyms(vocab0, mergeList)
      .collect().map(r => r.getString(0) -> r.getString(1).split(sep, -1).toList)
      .toMap
    val wantEnc = words.map { w =>
      w -> mergeList.foldLeft(w.toList.map(_.toString)) {
        case (syms, (s1, s2)) => refMerge(syms, s1, s2)
      }
    }.toMap
    assert(gotEnc === wantEnc)
  }

  /** The r17 replay encoder (driver-side, inverted-index) against the
    * chunked distributed fold chain it replaces under the
    * vocabulary-grain bound: full SYMBOL SEQUENCES equal word for
    * word, with the chunking engaged (merges > BpeEncodeChunk) and
    * the non-BMP fixture words in the table (a per-UTF-16-char split
    * in either path would diverge here).
    */
  test("driver replay encoder == chunked fold-chain encoder, symbol for symbol") {
    val rnd = new scala.util.Random(20260817L)
    val letters = "abcdef"
    val nonBmp = Seq("a😀b", "😀a", "b")
    val words = ((1 to 240).map(_ =>
      (1 to 3 + rnd.nextInt(8)).map(_ => letters(rnd.nextInt(letters.length))).mkString
    ) ++ nonBmp).distinct
    val wf0 = words.map(w => w -> (1L + rnd.nextInt(5))).toMap
    val wfDf = wf0.toSeq.toDF("t", "n_w")
    // merges > BpeEncodeChunk (64 as of r18) so the chunking genuinely
    // engages — the assert below keeps this law honest if the chunk
    // size is ever raised again
    val mergeList = graft.functions.TextAnalysis
      .bpeVocabBatchedFromWf(spark, wfDf, merges = 80, batch = 3)
      .orderBy(col("step"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(mergeList.size > graft.functions.TextAnalysis.BpeEncodeChunk)

    val vocab0 = words.toDF("t").select(col("t"),
      org.apache.spark.sql.functions.array_join(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(1, length(t)), i -> substring(t, i, 1))"),
        sep).as("syms"))
    val chunked = graft.functions.TextAnalysis.bpeEncodeSyms(vocab0, mergeList)
      .collect().map(r => r.getString(0) -> r.getString(1).split(sep, -1).toList)
      .toMap
    val wordsArr = words.toArray
    val replayed = graft.functions.TextAnalysis
      .bpeDriverEncodeSyms(wordsArr, mergeList)
    val driver = wordsArr.indices
      .map(i => wordsArr(i) -> replayed(i).toList).toMap
    assert(driver === chunked)
  }
}
