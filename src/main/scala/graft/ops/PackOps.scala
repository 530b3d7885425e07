package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: sequence packing
  * (documents -> fixed token-budget context windows) and benchmark
  * decontamination (drop training docs that near-match an eval set).
  *
  * Both are first-class large-scale pipeline steps rather than reference
  * operators — they extend the engine the same way the dedup/similarity
  * families do (beyond-parity goals, SURVEY.md §7 step 11).
  */
object PackOps {

  /** Pack documents into fixed token-budget bins ("context windows"),
    * shard-parallel.
    *
    * Documents shard by a stable hash of the id, order by id within the
    * shard, and cut into bins wherever the running token total crosses the
    * budget: `bin = floor(tokens_before / budget)`. A single global greedy
    * pass would serialize the corpus through one partition; per-shard
    * packing is how a real pipeline parallelizes assembly (each shard's
    * bins are independent files). A bin can overflow by at most one
    * document — the standard streaming approximation of first-fit, whose
    * exact per-bin remainder reset is inherently sequential.
    *
    * Scale shape: ONE hash exchange on `shard` serves both windows —
    * `HashPartitioning(shard)` satisfies the `(shard, bin)` clustering of
    * the position window, so Catalyst plans the finer window as a sort
    * (no second shuffle). No window ever sees more than a shard.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Long = 2048L, nShards: Int = 64): DataFrame = {
    val shard = pmod(TextOps.hash32(col(idCol).cast("string")), lit(nShards.toLong))
    val wCum = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPos = Window.partitionBy(col("shard"), col("bin")).orderBy(col(idCol))
    docs
      .select(col(idCol), shard.as("shard"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(wCum), lit(0L)) / lit(budget.toDouble))
          .cast("long"))
      .withColumn("pos", row_number().over(wPos).cast("long"))
  }

  /** Drop training documents that near-match a benchmark/eval set — the
    * decontamination pass every published pretraining pipeline runs before
    * training. Near-match = sharing ANY MinHash LSH band bucket with a
    * benchmark document (the same signatures [[DedupOps]] uses for
    * near-dup detection).
    *
    * Scale shape: candidates come from an equi-join on `(band, bucket)` —
    * never an all-pairs comparison; the benchmark side aggregates to its
    * DISTINCT bucket set first (eval sets are small, so AQE broadcasts
    * it), and the final exclusions apply as one `left_anti` join on the id.
    */
  /** Fixed-size token chunking with overlap — the context-window
    * preprocessing step between cleaning and packing: each document's token
    * stream cuts into `chunkSize`-token windows advancing by
    * `chunkSize - overlap`, the last window clamped at the document end.
    * A document shorter than one chunk yields exactly one chunk.
    *
    * Scale shape: a pure projection + explode — zero shuffles, stays
    * inside WholeStageCodegen (`slice`/`array_join` are ordinary codegen'd
    * expressions, not lambda-bearing higher-order functions).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, overlap: Int = 8): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val step = chunkSize - overlap
    val nChunks = when(col("__n") <= chunkSize, lit(1L))
      .otherwise(lit(1L) +
        floor((col("__n") - chunkSize + (step - 1)) / lit(step.toDouble)).cast("long"))
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
      .withColumn("__i", explode(sequence(lit(0L), nChunks - 1)))
      .select(col(idCol), col("__i").as("chunk_id"),
        slice(col("__tk"), (col("__i") * step + 1).cast("int"), lit(chunkSize)).as("__ck"))
      .select(col(idCol), col("chunk_id"),
        size(col("__ck")).cast("long").as("chunk_tokens"),
        array_join(col("__ck"), " ").as("chunk_text"))
  }

  /** Exact n-gram contamination report (the GPT-3-style decontamination
    * complement to the MinHash-band [[decontaminate]]): for every training
    * document, count the DISTINCT word n-grams it shares with the
    * benchmark set, and flag any overlap as contamination. Published
    * pipelines run exactly this as the conservative pass — a single shared
    * n-gram is grounds for dropping or splitting a document.
    *
    * Scale shape: one explode to `(doc, gram)` with an early distinct
    * (map-side combinable), the benchmark gram set reduces to DISTINCT
    * grams (eval sets are small, so AQE broadcasts the semi-join), and the
    * per-doc count is one combinable aggregate. No all-pairs comparison —
    * cost is linear in total gram count.
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
      isBenchmark: Column, w: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol), isBenchmark.as("__bench"),
      explode(TextOps.shingles(col(textCol), w)).as("__g"))
    val benchGrams = grams.filter(col("__bench")).select(col("__g")).distinct()
    val shared = grams.filter(!col("__bench"))
      .select(col(idCol), col("__g")).distinct()
      .join(benchGrams, Seq("__g"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    docs.filter(!isBenchmark).select(col(idCol))
      .join(shared, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("__n"), lit(0L)) > 0).as("contaminated"))
  }

  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      isBenchmark: Column, k: Int = 16, rows: Int = 4): DataFrame = {
    val bands = DedupOps.lshBandsFromSigArray(
      DedupOps.minhashSignatureArray(docs, idCol, textCol, k, w = 3), idCol, k, rows)
    val flags = docs.select(col(idCol), isBenchmark.as("__bench"))
    val banded = bands.join(flags, Seq(idCol))
    val benchBuckets = banded.filter(col("__bench"))
      .select(col("band"), col("bucket")).distinct()
    val contaminated = banded.filter(!col("__bench"))
      .join(benchBuckets, Seq("band", "bucket"), "left_semi")
      .select(col(idCol)).distinct()
    docs.filter(!isBenchmark).join(contaminated, Seq(idCol), "left_anti")
  }
}
