package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection for LM training corpora — DSIR (Xie et al., NeurIPS
  * 2023): score every raw document by how target-like its hashed n-gram
  * profile is, then resample the raw pool toward the target distribution.
  *
  *   1. features: unigrams + word bigrams hash into `buckets` counts;
  *   2. two bag-of-ngrams distributions fit by global aggregation — the
  *      target docs' and the raw pool's (add-0.5 smoothing);
  *   3. per-doc importance weight: sum over buckets of
  *      `count * (log p_target - log p_raw)` — the log-likelihood ratio
  *      of the doc under the two distributions;
  *   4. selection: plain top-k by weight, and the paper's Gumbel-top-k
  *      resampling (sampling w/o replacement proportional to exp(weight))
  *      with DETERMINISTIC hash-derived uniforms so runs reproduce.
  *
  * Scale shape: the gram explode aggregates straight into (doc, bucket)
  * counts (map-side combinable); the bucket distributions and the LLR
  * table are `buckets`-sized — broadcast; per-bucket contributions
  * quantize to micro-unit LONGs so the per-doc sum is order-independent;
  * the two top-k selections are `TakeOrdered` (per-partition top-k, k
  * rows to the driver), never a global sort or single-partition window.
  */
object SelectOps {

  /** @param isTarget predicate over `docs` columns marking the target
    *                 distribution; raw pool = the complement, which is
    *                 what gets scored and selected.
    * @return one row per raw-pool doc with at least one feature:
    *         (doc_id, weight, sel_top, sel_gumbel 0/1 flags).
    */
  def dsirSelect(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024, k: Int = 100): DataFrame = {
    require(buckets > 0 && k > 0, s"buckets and k must be positive, got $buckets, $k")
    val grams = concat(TextOps.tokens(col(textCol)), TextOps.shingles(col(textCol), 2))
    val feats = docs
      .select(col(idCol).as("doc_id"), isTarget.as("__t"), explode(grams).as("__g"))
      .filter(col("__g") =!= "")
      .select(col("doc_id"), col("__t"),
        pmod(TextOps.hash32(col("__g")), lit(buckets.toLong)).as("__b"))
      .groupBy(col("doc_id"), col("__t"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val dist = feats.groupBy(col("__b")).agg(
      sum(when(col("__t"), col("__c")).otherwise(0L)).as("__cp"),
      sum(when(!col("__t"), col("__c")).otherwise(0L)).as("__cq"))
    val tot = broadcast(dist.agg(
      sum(col("__cp")).cast("double").as("__tp"),
      sum(col("__cq")).cast("double").as("__tq")))
    val smooth = lit(0.5) * lit(buckets.toDouble)
    val llr = broadcast(dist.crossJoin(tot).select(col("__b"),
      (log((col("__cp").cast("double") + lit(0.5)) / (col("__tp") + smooth)) -
        log((col("__cq").cast("double") + lit(0.5)) / (col("__tq") + smooth))).as("__llr")))
    val weights = feats.filter(!col("__t"))
      .join(llr, Seq("__b"))
      .withColumn("__wl",
        floor(col("__c").cast("double") * col("__llr") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__wl")).as("__w"))
    // Gumbel-top-k with hash-derived uniforms: u in (0, 1) keyed off the
    // doc id, g = -ln(-ln(u)); the selection key is weight + g
    val u = (pmod(TextOps.hash32(col("doc_id").cast("string")), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val keyed = weights.withColumn("__kg",
      col("__w").cast("double") / lit(1000000.0) - log(-log(u)))
    val topT = broadcast(weights.orderBy(desc("__w"), col("doc_id")).limit(k)
      .select(col("doc_id"), lit(1L).as("__selT")))
    val topG = broadcast(keyed.orderBy(desc("__kg"), col("doc_id")).limit(k)
      .select(col("doc_id"), lit(1L).as("__selG")))
    weights
      .join(topT, Seq("doc_id"), "left")
      .join(topG, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(col("__w").cast("double") / lit(1000000.0), 6).as("weight"),
        coalesce(col("__selT"), lit(0L)).as("sel_top"),
        coalesce(col("__selG"), lit(0L)).as("sel_gumbel"))
  }
}
