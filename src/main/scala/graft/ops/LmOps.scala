package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering — the OTHER half of the
  * CCNet recipe (Wenzek et al. 2020): train a cheap LM on a target corpus
  * (here: the quality-labeled slice, the same target DSIR resamples
  * toward), score every document by per-bigram negative log-likelihood,
  * keep the best-fitting tail. Complements [[ClassifyOps]] (discriminative
  * filter) with the generative one.
  *
  * Model: add-one-smoothed bigram LM over whitespace tokens —
  * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)` with `V` = target vocabulary
  * size; an unseen bigram backs off to `1 / (c(w1) + V)` and an unseen
  * history to `1 / V`. Log-probs are quantized ONCE to micro-nat LONGs
  * (`round(ln(p) * 1e6)`), so every per-doc score is an exact
  * order-independent integer sum (the BM25/DSIR/ClassifyOps lesson) and
  * the DuckDB oracle replays it bit-for-bit.
  *
  * Scale shape:
  *  - training is two hash aggregates (unigram + bigram counts) over the
  *    target slice — combinable, no row ever joins;
  *  - scoring pre-aggregates each doc's bigrams to (doc, bigram, cnt)
  *    BEFORE any join (a doc repeating "of the" 1000x costs one row), then
  *    equi-joins the LM;
  *  - the LM join is SALTED: a corpus-hot bigram key ("of the" appears in
  *    every doc) would otherwise concentrate all its (doc, bigram) rows on
  *    one reducer — the LM side replicates `Salt` ways and the probe keys
  *    by (bigram, doc_id % Salt), bounding the widest task at 1/Salt of
  *    the hot key (the `ivfTopKSalted` remedy; results provably identical
  *    to the unsalted join);
  *  - the report is TakeOrdered top-k, never a global sort.
  */
object LmOps {

  /** LM-join salt width (both the bigram and the history-fallback join). */
  val Salt = 8

  private def toks(textCol: Column): Column = TextOps.tokens(textCol)

  /** (w1, w2) bigrams of a document as "w1 w2" strings — the native
    * codegen'd word_shingles expression at w=2 (the interpreted-lambda
    * trap this corpus-wide hot path must not re-enter).
    */
  private def bigrams(textCol: Column): Column = TextOps.shingles(textCol, 2)

  /** The trained LM: the bigram count table (bigram, n, w1) and the
    * unigram count table (w1, c1) — two hash aggregates over the target
    * slice, nothing else.
    */
  def train(target: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val uni = target
      .select(explode(toks(col(textCol))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = target
      .select(explode(bigrams(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    (bi, uni)
  }

  /** Vocabulary size as a broadcastable 1x1 frame. */
  private def vocab(uni: DataFrame): DataFrame =
    broadcast(uni.agg(count(lit(1)).as("__v")))

  /** Micro-nat quantized log-prob column (HALF_UP, exact LONG). */
  private def qlp(p: Column): Column = round(log(p) * lit(1000000.0), 0).cast("long")

  /** Materialize a bounded (top-k) frame while `cached` is persisted, so
    * the cache never outlives the call (the bm25TopK hygiene contract).
    */
  private def boundedResult(report: DataFrame, cached: DataFrame): DataFrame = {
    cached.persist()
    // localCheckpoint(eager): materializes the bounded report EXECUTOR-side
    // and truncates lineage, so the returned frame no longer references
    // `cached` and the unpersist is safe — same lifetime guarantee as the
    // old collect-and-recreate, without routing the rows through the
    // driver (which stops scaling the moment |queries| grows). Cluster
    // caveat: checkpoint blocks are unreplicated, so losing an executor
    // AFTER return makes later actions on the report fail (recompute is
    // impossible past the truncation) — on preemptible fleets, persist
    // the report to a table instead of holding the frame long-term.
    try report.localCheckpoint(eager = true)
    finally cached.unpersist(blocking = false)
  }

  /** The LM report: top `k` bigrams by count (count desc, bigram asc) with
    * their smoothed log-probs. The unigram table feeds both the join and
    * the vocabulary count, so it persists for the (bounded) evaluation.
    */
  def topBigrams(docs: DataFrame, textCol: String, targetFilter: Column,
      k: Int): DataFrame = {
    val (bi, uni) = train(docs.filter(targetFilter), textCol)
    boundedResult(
      bi.join(uni, "w1")
        .crossJoin(vocab(uni))
        .select(col("bigram"), col("n"),
          (qlp((col("n") + lit(1.0)) / (col("c1") + col("__v"))).cast("double") /
            lit(1000000.0)).as("logp"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(k),
      uni)
  }

  /** Score every document: per-token-pair negative log-likelihood under
    * the target LM (lower = closer to the target), as an exact micro-nat
    * sum over the doc's pre-aggregated bigram counts. Keeps the best `k`
    * (nll asc, id tiebreak), materialized while the unigram table is
    * cached. Output: (id, n_bigrams, log_ppl).
    */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, k: Int): DataFrame = {
    val (report, uni) = perplexityPlan(docs, idCol, textCol, targetFilter, k)
    boundedResult(report, uni)
  }

  /** The lazy scoring plan + the frame worth caching across its two
    * consumers (plan-audit hook, same split as `bm25Plan`).
    */
  def perplexityPlan(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, k: Int): (DataFrame, DataFrame) = {
    val (bi, uni) = train(docs.filter(targetFilter), textCol)
    val v = vocab(uni)

    // probe side: per-doc bigram counts, salted by doc id
    val probe = docs
      .select(col(idCol), explode(bigrams(col(textCol))).as("bigram"))
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("__salt", pmod(col(idCol), lit(Salt)))

    // LM sides replicated Salt ways so a hot bigram/history key spreads
    // over Salt reducers
    val saltCol = explode(array((0 until Salt).map(lit): _*)).as("__salt")
    val biS = bi.select(col("bigram"), col("n"), saltCol)
    val uniS = uni.select(col("w1"), col("c1"), saltCol)

    val scored = probe
      .join(biS, Seq("bigram", "__salt"), "left")
      .join(uniS, Seq("w1", "__salt"), "left")
      .crossJoin(v)
      .select(col(idCol), col("cnt"),
        // seen bigram: (n+1)/(c1+V); unseen bigram, seen history:
        // 1/(c1+V); unseen history: 1/V — all quantized identically
        qlp((coalesce(col("n"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("__v"))).as("__qlp"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("__qlp")).as("__qsum"))
      .select(col(idCol), col("n_bigrams"),
        (-col("__qsum").cast("double") /
          (col("n_bigrams").cast("double") * lit(1000000.0))).as("__nll"))
    (scored
      .orderBy(col("__nll"), col(idCol))
      .limit(k)
      .select(col(idCol), col("n_bigrams"),
        graft.ops.SimOps.roundUnits(col("__nll"), 1e4).as("log_ppl")),
      uni)
  }

  // ---- DuckDB oracle generation ----

  /** Shared training CTEs (target slice -> unigram/bigram counts + V).
    * `targetSql` is the boolean target predicate over `documents`.
    */
  def oracleTrainCtes(targetSql: String): String =
    s"""tk AS MATERIALIZED (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t,
       |    $targetSql AS is_target
       |  FROM documents
       |),
       |bg AS MATERIALIZED (
       |  -- mirrors word_shingles(tokens, 2): "w1 w2" per adjacent pair
       |  SELECT doc_id, is_target, array_to_string(t[i:i+1], ' ') AS bigram,
       |    t[i] AS w1
       |  FROM tk, UNNEST(range(1, len(t))) AS u(i)
       |  WHERE len(t) >= 2
       |),
       |uni AS MATERIALIZED (
       |  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
       |    SELECT unnest(t) AS w1 FROM tk WHERE is_target
       |  ) GROUP BY w1
       |),
       |bi AS MATERIALIZED (
       |  SELECT bigram, CAST(count(*) AS BIGINT) AS n, min(w1) AS w1
       |  FROM bg WHERE is_target GROUP BY bigram
       |),
       |voc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni)""".stripMargin

  def oracleTopBigramsSql(targetSql: String, k: Int): String =
    s"""WITH ${oracleTrainCtes(targetSql)}
       |SELECT bigram, n,
       |  CAST(round(ln((n + 1.0) / (c1 + voc.v)) * 1000000.0, 0) AS BIGINT) / 1000000.0
       |    AS logp
       |FROM bi JOIN uni USING (w1), voc
       |ORDER BY n DESC, bigram LIMIT $k""".stripMargin

  def oraclePerplexityFilterSql(targetSql: String, k: Int): String =
    s"""WITH ${oracleTrainCtes(targetSql)},
       |probe AS (
       |  SELECT doc_id, bigram, min(w1) AS w1, CAST(count(*) AS BIGINT) AS cnt
       |  FROM bg GROUP BY doc_id, bigram
       |),
       |scored AS (
       |  SELECT p.doc_id, sum(p.cnt) AS n_bigrams,
       |    sum(p.cnt * CAST(round(ln((COALESCE(b.n, 0) + 1.0)
       |      / (COALESCE(u.c1, 0) + voc.v)) * 1000000.0, 0) AS BIGINT)) AS qsum
       |  FROM probe p
       |  LEFT JOIN bi b USING (bigram)
       |  LEFT JOIN uni u ON p.w1 = u.w1
       |  CROSS JOIN voc
       |  GROUP BY p.doc_id
       |)
       |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       |  floor(-CAST(qsum AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1000000.0) * 1e4 + 0.5) / 1e4
       |    AS log_ppl
       |FROM scored
       |ORDER BY -CAST(qsum AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1000000.0), doc_id
       |LIMIT $k""".stripMargin
}
