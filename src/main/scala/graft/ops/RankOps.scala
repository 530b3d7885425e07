package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval ranking — Okapi BM25 (Robertson et al., TREC-3), the
  * scoring function every large-corpus search / hard-negative-mining /
  * data-curation pipeline needs next to the embedding ANN tier.
  *
  * Scale shape (the reason this formulation): the query vocabulary is
  * broadcast and pruned SCAN-SIDE (a left-semi join before any shuffle), so
  * the only wide aggregations are (doc, term) term frequencies over the
  * pruned posting rows and the per-(query, doc) score sum. Document
  * frequencies restricted to the query vocabulary are a SMALL frame —
  * broadcast — so no shuffle ever keys on a hot term ("the" never
  * concentrates a task). Corpus-level statistics (N, avgdl) ride in as a
  * broadcast 1-row cross join, the engine's MAX-scalar pattern.
  *
  * Per-term scores quantize to micro-unit LONGs before the per-(query, doc)
  * sum (the engine's order-independent-sum pattern, see the PQ/ADC tier),
  * so results are bit-reproducible across engines and partitionings.
  */
object RankOps {

  /** The lazy BM25 scoring plan plus the shared postings frame it is built
    * on. The postings frame (corpus explode pruned to the query vocabulary)
    * feeds BOTH the document-frequency broadcast and the scoring join —
    * two full plan instances of the corpus explode otherwise, measured ~2x
    * at the sf1 soak scale — so [[bm25TopK]] persists it for exactly the
    * evaluation's lifetime. Exposed separately so plan audits can inspect
    * the distributed plan without materializing anything.
    */
  private[graft] def bm25Plan(
      docs: DataFrame, docIdCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k1: Double, b: Double, k: Int): (DataFrame, DataFrame) = {
    val toks = TextOps.tokens(col(textCol))
    // query terms (and their distinct vocabulary) are small by contract:
    // broadcast both sides of the pruning
    val qterms = broadcast(queries
      .select(col(queryIdCol).as("query_id"),
        explode(TextOps.tokens(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct())
    val qvocab = broadcast(qterms.select(col("term")).distinct())
    // posting rows pruned to the query vocabulary BEFORE the (doc, term)
    // aggregate — the corpus-wide explode never shuffles
    val dt = docs
      .select(col(docIdCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"), explode(col("__toks")).as("term"))
      .join(qvocab, Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // corpus stats: token counts are integral, so the double sum inside
    // avg() is exact and order-independent
    val stats = broadcast(docs
      .select(size(toks).cast("double").as("__dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("__dl")).as("avgdl")))
    // document frequencies OF THE QUERY TERMS only — a |query vocab|-sized
    // frame, broadcast into the scoring join
    val dfq = broadcast(dt.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df")))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))
    // top-k tail on the k-bounded TopKPairs aggregate, not a row_number
    // window (r19 lesson 6, applied here r21): the window shuffled + sorted
    // EVERY scored (query, doc) pair; the aggregate's map-side state is
    // k-bounded per query. Identical ranking — (score desc, doc_id asc),
    // the aggregate's pinned order; micro-unit LONG sums are exact in the
    // double the aggregate compares.
    val pairSums = dt.join(dfq, Seq("term"))
      .join(qterms, Seq("term"))
      .crossJoin(stats)
      .withColumn("__s", idf * col("tf").cast("double") * (lit(k1) + lit(1.0)) / denom)
      .withColumn("__term_sl", floor(col("__s") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__term_sl")).as("__sl"))
    val agg = {
      import org.apache.spark.sql.GraftExpressionBridge
      GraftExpressionBridge.column(graft.functions.TopKPairs(
        GraftExpressionBridge.expression(col("__sl").cast("double")),
        // TopKPairs holds ids as Long internally (no inputTypes
        // declared) — the explicit cast documents the long-id contract
        // instead of a runtime ClassCastException on a non-long caller
        GraftExpressionBridge.expression(col("doc_id").cast("long")), k)
        .toAggregateExpression())
    }
    val scored = pairSums
      .groupBy(col("query_id"))
      .agg(agg.as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__i", "__e")))
      .select(col("query_id"), col("__e.item_id").as("doc_id"),
        round(col("__e.sim") / lit(1000000.0), 6).as("score"),
        (col("__i") + 1).cast("int").as("rk"))
    (scored, dt)
  }

  /** BM25 top-k: for each query, the `k` highest-scoring documents.
    *
    * The shared postings frame is persisted for the duration of the
    * evaluation (the df-broadcast job populates the cache, the scoring job
    * reuses it) and released in `finally` — the result is materialized
    * before returning, which is bounded at k rows per query by
    * construction (the same bounded-collect contract as event-table
    * discovery); a lazily returned frame would force the persist to
    * outlive the call and leak one cached frame per query in a long-lived
    * session (round-7 verdict hygiene item).
    *
    * @return (query_id, doc_id, score, rk) — score rounded to 6dp,
    *         rk 1..k dense per query, ties broken by doc id.
    */
  def bm25TopK(
      docs: DataFrame, docIdCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10): DataFrame = {
    val (scored, dt) = bm25Plan(docs, docIdCol, textCol,
      queries, queryIdCol, queryTextCol, k1, b, k)
    dt.persist()
    // localCheckpoint(eager): executor-side materialization + lineage
    // truncation — the result stops referencing the persisted doc-term
    // frame so the finally-unpersist holds, and the driver stays out of
    // the data path (the old collect-and-recreate shipped k x |queries|
    // rows through it).
    try scored.localCheckpoint(eager = true)
    finally dt.unpersist(blocking = false)
  }
}
