package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A linear (logistic-regression) document-quality classifier trained and
  * served INSIDE the engine — the CCNet / GPT-3-style quality filter: score
  * every document against a target class with a cheap linear model over
  * engineered text features, then keep the top of the distribution
  * (Wenzek et al. 2020 "CCNet", Brown et al. 2020 §A; the reference
  * pipeline has no trainable operator — this is a beyond-reference
  * extension for the training-data tier).
  *
  * Scale shape (the whole point of doing this in the engine):
  *  - the feature frame is ONE narrow projection of the corpus (six
  *    bounded [0,1] ratios of integer character/token counts — no
  *    tokenizer state, no vocabulary), persisted once per training run and
  *    released in `finally`;
  *  - each gradient-descent iteration is ONE codegen'd global aggregate
  *    (six sums + a count) with map-side partial combine — no shuffle of
  *    rows, ever; the driver state is k=6 doubles;
  *  - serving is a scan + `TakeOrdered` top-k (never a global sort).
  *
  * Cross-engine determinism (the battery's oracle replays training in
  * DuckDB): per-row gradient contributions are quantized to MICRO-UNIT
  * LONGs before summation (order-independent exact integer sums — the
  * BM25/DSIR lesson), and the weight trajectory is re-quantized to 12
  * decimals after every step, so sub-ulp `exp` differences between
  * engines are snapped instead of compounding across iterations.
  * [[oracleTrainCtes]] generates the DuckDB mirror from the SAME feature
  * list and constants, so the two sides cannot drift.
  */
object ClassifyOps {

  /** Feature count (bias + five bounded ratios). */
  val K = 6
  val Iters = 15
  val LearningRate = 8.0

  /** The training label: the engine's hand-crafted quality heuristic
    * ([[TextOps.qualityScore]] >= threshold) — i.e. the classifier
    * DISTILLS the rule-based scorer into a trainable linear model (the
    * standard bootstrap when no human labels exist yet; on a real corpus
    * the label would be a trusted-source indicator, GPT-3-style). The
    * label shares inputs with three of the six features, so convergence is
    * measurable: ~98% train accuracy after [[Iters]] steps at sf0.01.
    * Threshold comparison is exact double arithmetic (no transcendentals),
    * so both engines label identically.
    */
  val LabelThreshold = 0.45
  def label(textCol: Column): Column =
    TextOps.qualityScore(textCol) >= lit(LabelThreshold)

  /** The label in DuckDB SQL — mirrors [[TextOps.qualityScore]]'s exact
    * expression order (same doubles, bit-for-bit).
    */
  val oracleLabelSql: String =
    """(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
      | + least(CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|a|to|in|is)\b')) AS DOUBLE)
      |   / greatest(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE), 1.0), 1.0) * 0.4
      | + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
      |   / greatest(CAST(length(text) AS DOUBLE), 1.0), 1.0)) * 0.2) >= 0.45"""
      .stripMargin.replace("\n", "")

  /** The engineered features, all bounded to [0,1] and built from exact
    * integer counts (length / regexp counts) so both engines compute
    * identical doubles: bias, length score, stopword density, punctuation
    * ratio, digit ratio, token-count score.
    */
  def features(textCol: Column): Seq[Column] = {
    val len = length(textCol).cast("double")
    val toks = TextOps.tokenCount(textCol).cast("double")
    val punct = TextOps.punctCount(textCol).cast("double")
    val en = TextOps.markerCount(textCol, TextOps.enMarkers).cast("double")
    val digits = (length(textCol) -
      length(regexp_replace(textCol, "[0-9]", ""))).cast("double")
    Seq(
      lit(1.0),
      least(len / lit(500.0), lit(1.0)),
      least(en / greatest(toks, lit(1.0)), lit(1.0)),
      least(punct / greatest(len, lit(1.0)), lit(1.0)),
      least(digits / greatest(len, lit(1.0)), lit(1.0)),
      least(toks / lit(100.0), lit(1.0)))
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  private def dot(w: Array[Double]): Column =
    (0 until K).map(j => lit(w(j)) * col(s"__x$j")).reduce(_ + _)

  /** Quantize a weight to 12 decimals (HALF_UP — the same convention as
    * Spark's and DuckDB's `round`).
    */
  private def q12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train the classifier: `Iters` full-batch GD steps, label = `labelCol`
    * (0/1). Returns the K weights. Each step is one aggregate action; the
    * feature frame persists across steps and is released before return.
    */
  def trainQualityLr(docs: DataFrame, textCol: String, labelCol: Column): Array[Double] = {
    val f = docs.select(labelCol.cast("double").as("__y") +:
      features(col(textCol)).zipWithIndex.map { case (c, j) => c.as(s"__x$j") }: _*)
      .persist()
    try {
      var w = Array.fill(K)(0.0)
      f.count() // materialize once so every iteration scans the cache
      for (_ <- 0 until Iters) {
        val err = sigmoid(dot(w)) - col("__y")
        val aggs = (0 until K).map(j =>
          sum(round(err * col(s"__x$j") * lit(1000000.0), 0).cast("long")).as(s"__g$j")) :+
          count(lit(1)).as("__n")
        val r = f.agg(aggs.head, aggs.tail: _*).head()
        val n = r.getLong(K).toDouble
        w = Array.tabulate(K)(j =>
          q12(w(j) - LearningRate * (r.getLong(j).toDouble / (n * 1000000.0))))
      }
      w
    } finally f.unpersist(blocking = false)
  }

  /** The trained weights as a bounded report: (feature, weight to 6 dp). */
  def qualityLrWeights(docs: DataFrame, textCol: String, labelCol: Column,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    trainQualityLr(docs, textCol, labelCol).zipWithIndex
      .map { case (w, j) => (s"f$j", q6(w)) }.toSeq
      .toDF("feature", "weight").orderBy("feature")
  }

  private def q6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Serve: score every document with the trained weights and keep the
    * top `k` (TakeOrdered; ties broken by id so the cut is deterministic).
    */
  def qualityLrTopK(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, k: Int): DataFrame = {
    val w = trainQualityLr(docs, textCol, labelCol)
    val score = sigmoid(features(col(textCol)).zipWithIndex
      .map { case (c, j) => lit(w(j)) * c }.reduce(_ + _))
    docs.select(col(idCol), score.as("__s"))
      .orderBy(col("__s").desc, col(idCol))
      .limit(k)
      .select(col(idCol), graft.ops.SimOps.roundUnits(col("__s"), 1e6).as("lr_score"))
  }

  /** Train + evaluate on the training corpus: one bounded report row
    * (docs, positive rate, train accuracy) — the convergence proof. The
    * 0/1 sums behind the averages are exact in both engines, so the
    * rounded rates replay bit-for-bit.
    */
  def qualityLrEval(docs: DataFrame, textCol: String, labelCol: Column): DataFrame = {
    val w = trainQualityLr(docs, textCol, labelCol)
    val z = features(col(textCol)).zipWithIndex
      .map { case (c, j) => lit(w(j)) * c }.reduce(_ + _)
    docs.select(labelCol.cast("double").as("__y"), z.as("__z"))
      .agg(count(lit(1)).as("n_docs"),
        graft.ops.SimOps.roundUnits(avg(col("__y")), 1e4).as("pos_rate"),
        graft.ops.SimOps.roundUnits(
          avg(when((col("__z") > lit(0.0)) === (col("__y") > lit(0.5)), 1.0)
            .otherwise(0.0)), 1e4).as("accuracy"))
  }

  // ---- DuckDB oracle generation (same constants, same structure) ----

  /** The feature expressions in DuckDB SQL, index-aligned with
    * [[features]].
    */
  val oracleFeatureSql: Seq[String] = Seq(
    "1.0",
    "least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)",
    """least(CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|a|to|in|is)\b')) AS DOUBLE)
      | / greatest(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE), 1.0), 1.0)"""
      .stripMargin.replace("\n", ""),
    """least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
      | / greatest(CAST(length(text) AS DOUBLE), 1.0), 1.0)""".stripMargin.replace("\n", ""),
    """least(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
      | / greatest(CAST(length(text) AS DOUBLE), 1.0), 1.0)""".stripMargin.replace("\n", ""),
    """least(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) / 100.0, 1.0)""")

  /** CTE chain replaying the exact training loop: `f` (features+label),
    * `w0` (zeros), then per iteration a micro-unit LONG gradient aggregate
    * and a 12-dp-rounded weight update. The final weights CTE is
    * `w$Iters`.
    */
  def oracleTrainCtes(labelSql: String): String = {
    val feat = "f AS MATERIALIZED (\n  SELECT CAST(" + labelSql + " AS DOUBLE) AS y,\n" +
      oracleFeatureSql.zipWithIndex.map { case (sqlExpr, j) => s"    $sqlExpr AS x$j" }
        .mkString(",\n") + "\n  FROM documents\n)"
    val w0 = "w0 AS (SELECT " +
      (0 until K).map(j => s"0.0 AS w$j").mkString(", ") + ")"
    val steps = (1 to Iters).map { t =>
      val z = (0 until K).map(j => s"w.w$j * x$j").mkString(" + ")
      val g = s"g$t AS MATERIALIZED (\n  SELECT count(*) AS n,\n" +
        (0 until K).map(j =>
          s"    sum(CAST(round(((1.0 / (1.0 + exp(-($z))) - y) * x$j) * 1000000.0, 0) AS BIGINT)) AS g$j")
          .mkString(",\n") +
        s"\n  FROM f, w${t - 1} w\n)"
      val w = s"w$t AS MATERIALIZED (\n  SELECT " +
        (0 until K).map(j =>
          s"round(w.w$j - $LearningRate * (CAST(g.g$j AS DOUBLE) / (CAST(g.n AS DOUBLE) * 1000000.0)), 12) AS w$j")
          .mkString(",\n    ") +
        s"\n  FROM w${t - 1} w, g$t g\n)"
      s"$g, $w"
    }
    (Seq(feat, w0) ++ steps).mkString(",\n")
  }

  /** Full oracle for the weights report. */
  def oracleWeightsSql(labelSql: String): String =
    s"WITH ${oracleTrainCtes(labelSql)}\n" +
      (0 until K).map(j =>
        s"SELECT 'f$j' AS feature, round(w$j, 6) AS weight FROM w$Iters")
        .mkString("\nUNION ALL\n") +
      "\nORDER BY feature"

  /** Full oracle for the convergence report. */
  def oracleEvalSql(labelSql: String): String = {
    val z = (0 until K).map(j => s"w.w$j * x$j").mkString(" + ")
    s"""WITH ${oracleTrainCtes(labelSql)}
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  floor(avg(y) * 1e4 + 0.5) / 1e4 AS pos_rate,
       |  floor(avg(CASE WHEN (($z) > 0.0) = (y > 0.5) THEN 1.0 ELSE 0.0 END) * 1e4 + 0.5) / 1e4
       |    AS accuracy
       |FROM f, w$Iters w""".stripMargin
  }

  /** Full oracle for the serving top-k. */
  def oracleTopKSql(labelSql: String, idCol: String, k: Int): String = {
    val z = (0 until K).map(j => s"w.w$j * x$j").mkString(" + ")
    s"""WITH ${oracleTrainCtes(labelSql)},
       |scored AS (
       |  SELECT d.$idCol, 1.0 / (1.0 + exp(-($z))) AS s
       |  FROM (SELECT $idCol, ${oracleFeatureSql.zipWithIndex
        .map { case (e, j) => s"$e AS x$j" }.mkString(", ")}
       |    FROM documents) d, w$Iters w
       |)
       |SELECT $idCol, floor(s * 1e6 + 0.5) / 1e6 AS lr_score FROM scored
       |ORDER BY s DESC, $idCol LIMIT $k""".stripMargin
  }
}
