package graft.operators

import graft.model.CdmModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lifecycle operators (D5/D7): dependency-aware cleanup cascade, custom
  * concept removal, mapping tombstoning, and version-metadata stamping.
  */
object Cleanup {

  /** D5: the cascade set of a targeted cleanup
    * (`/root/reference/src/riab/etl/cleanup.py:41-49`): the reference pops
    * dependency levels until the one containing the target, then cleans the
    * target plus EVERY table in all later levels — level-granular, which
    * over-approximates the FK descendants exactly like the original.
    */
  def cascadeTables(model: CdmModel, universe: Seq[String], table: String): Seq[String] = {
    val later = model.dependencyLevels(universe).dropWhile(!_.contains(table)).drop(1)
    table +: later.flatten
  }

  /** P6 removal: drop RiaB-generated custom concepts (ids >= 2e9) from a
    * concept-shaped table (`cleanup/CONCEPT_remove_custom_concepts.sql.jinja:3-4`).
    */
  def removeCustomConcepts(concepts: DataFrame, idCol: String): DataFrame =
    concepts.filter(col(idCol) < MergeOps.CustomConceptBase)

  /** D5: remove mapped ids of the cleaned tables from
    * source_id_to_omop_id_map
    * (`cleanup/SOURCE_ID_TO_OMOP_ID_MAP_remove_ids_by_omop_table.sql.jinja:3-9`).
    */
  def removeMapEntries(map: DataFrame, tableCol: String, tables: Seq[String]): DataFrame =
    map.filter(!col(tableCol).isin(tables: _*))

  /** D7: tombstone stale mappings — `invalid_reason = 'D'` for rows whose
    * validity started before this ETL run
    * (`SOURCE_TO_CONCEPT_MAP_update_invalid_reason.sql.jinja:3-5`,
    * `etl.py:126-129`) — the idempotent-rerun semantics.
    */
  def tombstoneStale(s2cm: DataFrame, etlStart: Column): DataFrame =
    s2cm.withColumn("invalid_reason",
      when(col("valid_start_date") < etlStart, lit("D")).otherwise(col("invalid_reason")))

  /** D7: the 1-row RiaB version metadata record
    * (`cdm_metadata_riab_version.sql.jinja:3-12`); `now` values are passed
    * in (the reference uses CURRENT_DATE/CURRENT_DATETIME) so re-runs are
    * reproducible and oracle-checkable.
    */
  def versionMetadata(
      spark: org.apache.spark.sql.SparkSession,
      cdmVersion: String,
      riabVersion: String,
      metadataDate: java.sql.Date,
      metadataDatetime: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    Seq((riabVersion, metadataDate, metadataDatetime))
      .toDF("value_as_string", "metadata_date", "metadata_datetime")
      .select(
        concat(lit("RIAB_"), lit("VERSION")).as("metadata_id"),
        concat(lit("RIAB_"), lit(s"OMOPCDM$cdmVersion")).as("metadata_concept_id"),
        concat(lit("RIAB_"), lit("EHR")).as("metadata_type_concept_id"),
        lit("Rabbit-in-a-Blender version").as("name"),
        col("value_as_string"),
        lit(null).cast("string").as("value_as_concept_id"),
        lit(null).cast("double").as("value_as_number"),
        col("metadata_date"),
        col("metadata_datetime"))
  }
}
