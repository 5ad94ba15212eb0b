package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval scoring — the serving-side counterpart of the corpus-prep
  * pipeline (reference scope: the warehouse the streaming patterns
  * maintain is what a retrieval layer queries; SURVEY §2.4's aggregate
  * family provides the machinery): classic lexical ranking (BM25,
  * Robertson et al., TREC-3) and hybrid lexical+dense fusion
  * (reciprocal rank fusion, Cormack et al., SIGIR'09) — the standard
  * first-stage retrieval stack of a RAG or dedup-audit system.
  *
  * Determinism discipline (the [[TextAnalysis.unigramLogprob]] rule):
  * every `ln` is rounded at 1e-9 immediately, every per-term
  * contribution is floored to an integer micro-score BEFORE the
  * per-document sum, so float summation order can never reach the
  * oracle compare; ranks are integers by construction.
  */
object Retrieval {

  /** Fixed keyword query for the declared BM25/RRF queries — a
    * constant so the DuckDB oracle can embed the same literals. Real
    * deployments parameterize this; the plan shape (per-row projection
    * over a broadcast term set) is unchanged.
    */
  private[graft] val QueryTerms: Seq[String] = Seq("spark", "join", "window")

  /** BM25 free parameters (the standard Okapi defaults). */
  private[graft] val K1 = 1.2
  private[graft] val B = 0.75

  /** RRF rank-list depth and smoothing constant (Cormack et al. use
    * k=60; depth 100 bounds the fused relation regardless of corpus
    * size).
    */
  private[graft] val RrfK = 60
  private[graft] val RrfDepth = 100

  private def words(c: Column): Column = split(c, " ")

  /** Per-document (dl, term, tf) for the fixed query terms plus the
    * corpus-global (n_docs, sum_dl) — all from ONE scan: term
    * frequencies are per-row array folds over the fixed term set (no
    * corpus-grain explode/shuffle; the only exchanges after this are
    * key-grain at ≤|terms| rows and the final TakeOrdered). That is
    * the 100 TB shape: scoring a fixed query against a corpus is a
    * linear scan however big the corpus, because every per-term
    * reduction happens inside the row.
    */
  private def termFrequencies(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val perTerm = array(QueryTerms.map { t =>
      struct(lit(t).as("term"),
        size(filter(ws, w => w === lit(t))).cast("long").as("tf"))
    }: _*)
    docs
      .select(col("doc_id"), size(ws).cast("long").as("dl"),
        explode(perTerm).as("tt"))
      .select(col("doc_id"), col("dl"),
        col("tt.term").as("term"), col("tt.tf").as("tf"))
      .filter(col("tf") > 0)
  }

  /** Scored BM25 postings: (doc_id, contrib_e6) per matched (doc,
    * term), with idf from the matched-doc counts of this query's own
    * term set. `idf_e9` is floored at 1e-9 straight off the `ln` (libm
    * vs java Math.log agree at that grain) and each term contribution
    * is floored to integer micro-points before the per-doc sum — the
    * sum is exact integer arithmetic.
    */
  private def bm25Scores(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val global = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(words(col("text")))).cast("double").as("sum_dl"))
    val tfs = termFrequencies(docs)
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(global))
      .select(col("term"),
        floor(log(lit(1.0)
            + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * lit(1e9) + lit(0.5)).cast("long").as("idf_e9"),
        col("n_docs"), col("sum_dl"))
    tfs.join(broadcast(dfs), "term")
      .select(col("doc_id"),
        floor(col("idf_e9") / lit(1e9) * (col("tf") * lit(K1 + 1))
            / (col("tf") + lit(K1) * (lit(1 - B)
              + lit(B) * col("dl") / (col("sum_dl") / col("n_docs"))))
          * lit(1e6) + lit(0.5)).cast("long").as("contrib_e6"))
      .groupBy("doc_id")
      .agg(sum(col("contrib_e6")).as("score_e6"),
        count(lit(1)).as("n_terms"))
  }

  /** BM25 top-20 for the fixed keyword query: (doc_id, score_e6,
    * n_terms matched, rank). Final order is TakeOrderedAndProject over
    * the per-doc integer scores.
    */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bm25Scores(spark, sfDir)
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e6").desc, col("doc_id").asc)).cast("long"))
  }

  /** Hybrid retrieval — reciprocal rank fusion of the BM25 list with a
    * dense cosine list against the embedding of vec_id 0 (the "query
    * document"; its own row is excluded from both lists). Each ranker
    * contributes integer points `floor(1e6 / (k + rank))` down to
    * depth [[RrfDepth]]; a doc missing from one list simply gets no
    * points from it (full-outer fusion). Output: top-10 fused with
    * both source ranks.
    *
    * Scale shape: each side reduces to a bounded [[RrfDepth]]-row rank
    * list BEFORE the fusion join — the fusion is constant-size work no
    * matter the corpus; the dense side is one brute-force scan against
    * a single broadcast query vector (swap in the LSH/IVF serving path
    * of [[graft.ext.Similarity]] for billion-vector corpora — same
    * fused contract).
    */
  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.expressions.GraftFunctions.register(spark)
    // rank AFTER a distributed TakeOrdered trim: the single-partition
    // row_number window only ever sees RrfDepth rows, never the corpus
    val bmW = Window.orderBy(col("score_e6").desc, col("doc_id").asc)
    val bm = bm25Scores(spark, sfDir).filter(col("doc_id") =!= 0)
      .orderBy(col("score_e6").desc, col("doc_id").asc).limit(RrfDepth)
      .withColumn("bm25_rank", row_number().over(bmW).cast("long"))
      .select(col("doc_id"), col("bm25_rank"))
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val cosW = Window.orderBy(col("cscore").desc, col("vec_id").asc)
    val dense = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.expressions.GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6).as("cscore"))
      .orderBy(col("cscore").desc, col("vec_id").asc).limit(RrfDepth)
      .withColumn("cos_rank", row_number().over(cosW).cast("long"))
      .select(col("vec_id").as("doc_id"), col("cos_rank"))
    bm.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        (coalesce(floor(lit(1e6) / (lit(RrfK) + col("bm25_rank"))), lit(0L))
          + coalesce(floor(lit(1e6) / (lit(RrfK) + col("cos_rank"))), lit(0L)))
          .cast("long").as("rrf_e6"))
      .orderBy(col("rrf_e6").desc, col("doc_id").asc)
      .limit(10)
  }

  val oracleSql: Map[String, String] = {
    val termValues = QueryTerms.map(t => s"('$t')").mkString(", ")
    val tfCte =
      s"""d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          tf AS (
            SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, t.term,
                   CAST(len(list_filter(ws, w -> w = t.term)) AS BIGINT) AS tf
            FROM d, (VALUES $termValues) t(term)),
          nz AS (SELECT * FROM tf WHERE tf > 0),
          g AS (SELECT count(*) AS n_docs,
                       CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS sum_dl
                FROM documents),
          idf AS (
            SELECT term,
                   CAST(floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1e9 + 0.5)
                     AS BIGINT) AS idf_e9, n_docs, sum_dl
            FROM (SELECT term, count(*) AS df FROM nz GROUP BY term), g),
          contrib AS (
            SELECT doc_id,
                   CAST(floor(idf_e9 / 1e9 * (tf * ${K1 + 1})
                          / (tf + $K1 * (${1 - B} + $B * dl / (sum_dl / n_docs)))
                        * 1e6 + 0.5) AS BIGINT) AS c
            FROM nz JOIN idf USING (term)),
          scored AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_e6,
                   count(*) AS n_terms
            FROM contrib GROUP BY doc_id)"""
    Map(
      "retrieval_bm25" ->
        s"""WITH $tfCte
            SELECT doc_id, score_e6, n_terms,
                   CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC)
                     AS BIGINT) AS rank
            FROM scored ORDER BY score_e6 DESC, doc_id ASC LIMIT 20""",
      "retrieval_rrf" ->
        s"""WITH $tfCte,
            bm AS (
              SELECT doc_id,
                     CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC)
                       AS BIGINT) AS bm25_rank
              FROM scored WHERE doc_id != 0
              QUALIFY bm25_rank <= $RrfDepth),
            dense AS (
              SELECT c.vec_id AS doc_id,
                     CAST(row_number() OVER (ORDER BY cscore DESC, c.vec_id ASC)
                       AS BIGINT) AS cos_rank
              FROM (
                SELECT c.vec_id,
                       round(list_sum([CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE)
                                 for i in range(len(q.embedding))])
                         / (sqrt(list_sum([CAST(q.embedding[i+1] AS DOUBLE) * CAST(q.embedding[i+1] AS DOUBLE)
                                 for i in range(len(q.embedding))]))
                            * sqrt(list_sum([CAST(c.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE)
                                 for i in range(len(c.embedding))]))), 6) AS cscore
                FROM embeddings c, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
                WHERE c.vec_id != 0) c
              QUALIFY cos_rank <= $RrfDepth)
            SELECT doc_id, bm25_rank, cos_rank,
                   CAST(coalesce(floor(1e6 / ($RrfK + bm25_rank)), 0)
                      + coalesce(floor(1e6 / ($RrfK + cos_rank)), 0)
                     AS BIGINT) AS rrf_e6
            FROM bm FULL OUTER JOIN dense USING (doc_id)
            ORDER BY rrf_e6 DESC, doc_id ASC LIMIT 10""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "retrieval_bm25" -> bm25TopK _,
    "retrieval_rrf" -> hybridRrf _,
  )
}
