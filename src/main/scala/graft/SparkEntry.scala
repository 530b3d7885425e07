package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CdmQueries, CoreQueries, EtlQueries, EventQueries, LifecycleQueries, LlmQueries, OhdsiBqTemplateQueries, OhdsiCdmQueries, OhdsiTemplateQueries, PipelineQueries, SourceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is registered here as a `(spark, sfDir) => DataFrame` over
  * the driver-generated test tables, with a DuckDB oracle of identical
  * semantics in [[oracleSql]] (same column aliases, same rounding, same
  * deterministic ordering — the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (CoreQueries.defs ++ EventQueries.defs ++ LlmQueries.defs ++ CdmQueries.defs ++
      PipelineQueries.defs ++ SourceQueries.defs ++ LifecycleQueries.defs ++ EtlQueries.defs ++
      OhdsiCdmQueries.defs ++ OhdsiTemplateQueries.defs ++ OhdsiBqTemplateQueries.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — EVERY registered query has one (the decode
    * stub is a deterministic fake, so even `multimodal_decode` replays in
    * SQL); the driver's weaker rows-only fallback is never needed.
    */
  def oracleSql: Map[String, String] =
    (CoreQueries.oracles ++ EventQueries.oracles ++ LlmQueries.oracles ++ CdmQueries.oracles ++
      PipelineQueries.oracles ++ SourceQueries.oracles ++ LifecycleQueries.oracles ++
      EtlQueries.oracles ++ OhdsiCdmQueries.oracles ++ OhdsiTemplateQueries.oracles ++ OhdsiBqTemplateQueries.oracles).toMap
}
