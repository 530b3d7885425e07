package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Certifies that EVERY template in the reference's sql_server tree is
  * exercised by a verbatim `ohdsi_sql_*` query (or is an intentionally
  * documented near-duplicate of one). Runs only where the reference
  * checkout is present; a template added upstream that this map does not
  * know fails the suite, keeping the verbatim coverage honest.
  */
class TemplateCoverageSpec extends AnyFunSuite {

  /** template file name -> the verbatim entry (or the documented reason). */
  private val Covered: Map[String, String] = Map(
    "sample_etl_query.sql.jinja" -> "ohdsi_sql_upload_insert",
    "sample_usagi_query.sql.jinja" -> "ohdsi_sql_sample_usagi",
    "CONCEPT_remove_custom_concepts.sql.jinja" -> "ohdsi_sql_vocab_cleanup",
    "CONCEPT_remove_custom_concepts_by_{omop_table}__{concept_id_column}_usagi_table.sql.jinja" -> "ohdsi_sql_concept_remove",
    "SOURCE_ID_TO_OMOP_ID_MAP_remove_ids_by_omop_table.sql.jinja" -> "ohdsi_sql_map_cleanup",
    "SOURCE_TO_CONCEPT_MAP_remove_concepts_by_{omop_table}__{concept_id_column}_usagi_table.sql.jinja" -> "ohdsi_sql_s2cm_remove",
    "all_work_table_names.sql.jinja" -> "ohdsi_sql_work_tables",
    "drop.sql.jinja" -> "ohdsi_sql_drop_table",
    "{omop_work}_drop_table.sql.jinja" -> "ohdsi_sql_drop_table",
    "vocabulary_table_truncate.sql.jinja" -> "ohdsi_sql_vocab_cleanup",
    "truncate.sql.jinja" -> "ohdsi_sql_vocab_cleanup",
    "DataQualityDashboard_ddl.sql.jinja" -> "ohdsi_sql_dqd_ddl",
    "OMOPCDM_sql_server_5.4_ddl.sql.jinja" -> "ohdsi_sql_cdm54_ddl + ohdsi_sql_cdm54_full",
    "OMOPCDM_sql_server_5.4_constraints.sql.jinja" -> "ohdsi_sql_cdm54_full",
    "OMOPCDM_sql_server_5.4_indices.sql.jinja" -> "ohdsi_sql_cdm54_full",
    "OMOPCDM_sql_server_5.4_primary_keys.sql.jinja" -> "ohdsi_sql_cdm54_full",
    "SOURCE_ID_TO_OMOP_ID_MAP_ddl.sql.jinja" -> "ohdsi_sql_map_ddl",
    "result_table_ddl_field.sql.jinja" -> "ohdsi_sql_result_ddl",
    "result_table_ddl_concept.sql.jinja" -> "ohdsi_sql_result_ddl",
    "result_table_ddl_table.sql.jinja" -> "ohdsi_sql_result_ddl",
    "get_dqd_run.sql.jinja" -> "ohdsi_sql_get_dqd_run",
    "get_dqd_run_results.sql.jinja" -> "ohdsi_sql_dqd_run_results",
    "get_last_dqd_runs.sql.jinja" -> "ohdsi_sql_last_dqd_runs",
    "CONCEPT_ID_swap_create.sql.jinja" -> "ohdsi_sql_concept_swap",
    "CONCEPT_ID_swap_merge.sql.jinja" -> "ohdsi_sql_concept_swap",
    "CONCEPT_custom_validate.sql.jinja" -> "ohdsi_sql_custom_validate",
    "CONCEPT_custom_validate_duplicates.sql.jinja" -> "ohdsi_sql_validate_dups",
    "CONCEPT_merge.sql.jinja" -> "ohdsi_sql_concept_merge",
    "SOURCE_ID_TO_OMOP_ID_MAP_merge.sql.jinja" -> "ohdsi_sql_map_merge",
    "SOURCE_ID_TO_OMOP_ID_MAP_update_invalid_reason.sql.jinja" -> "ohdsi_sql_map_invalidate",
    "SOURCE_TO_CONCEPT_MAP_check_for_duplicates.sql.jinja" -> "ohdsi_sql_s2cm_dups",
    "SOURCE_TO_CONCEPT_MAP_merge.sql.jinja" -> "ohdsi_sql_stcm_merge",
    "SOURCE_TO_CONCEPT_MAP_update_invalid_reason.sql.jinja" -> "ohdsi_sql_stcm_invalidate",
    "cdm_metadata_git_commit_hash.sql.jinja" -> "ohdsi_sql_metadata_rows",
    "cdm_metadata_riab_version.sql.jinja" -> "ohdsi_sql_metadata_rows",
    "{omop_table}__{concept_id_column}_concept_create.sql.jinja" -> "ohdsi_sql_work_ddl_create",
    "{omop_table}__{concept_id_column}_usagi_create.sql.jinja" -> "ohdsi_sql_work_ddl_create",
    "{omop_table}__{concept_id_column}_usagi_fk_domain_check.sql.jinja" -> "ohdsi_sql_usagi_domain_check",
    "{omop_table}__{concept_id_column}_usagi_non_standard.sql.jinja" -> "ohdsi_sql_usagi_nonstd",
    "{omop_table}__{concept_id_column}_usagi_update_custom_concepts.sql.jinja" -> "ohdsi_sql_usagi_update",
    "{omop_table}_apply_event_columns.sql.jinja" -> "ohdsi_sql_apply_events + ohdsi_sql_apply_events_renumber",
    "{omop_table}_get_event_tables.sql.jinja" -> "ohdsi_sql_event_tables",
    "{omop_table}_merge.sql.jinja" -> "ohdsi_sql_omop_merge",
    "{omop_table}_{sql_file}_insert.sql.jinja" -> "ohdsi_sql_upload_insert",
    "{omop_work_table}_merge_check_for_duplicate_rows.sql.jinja" -> "ohdsi_sql_dup_rows",
    "{omop_work}_ddl.sql.jinja" -> "ohdsi_sql_work_table_ddl",
    "{primary_key_column}_swap_create.sql.jinja" -> "ohdsi_sql_pk_swap",
    "{primary_key_column}_swap_merge.sql.jinja" -> "ohdsi_sql_pk_swap")

  /** The FULL BigQuery-dialect tree (43 templates), each run verbatim
    * (r15: the flagship chain and the concept/usagi family; r16: the
    * remaining 33 via OhdsiBqTemplateQueries) — same full-tree assertion
    * as the sql_server map below.
    */
  private val BqCovered: Map[String, String] = Map(
    "{primary_key_column}_swap_create.sql.jinja" -> "ohdsi_sql_bq_flow",
    "{primary_key_column}_swap_merge.sql.jinja" -> "ohdsi_sql_bq_flow",
    "{omop_table}_merge.sql.jinja" -> "ohdsi_sql_bq_flow + ohdsi_sql_bq_vocab_merge",
    "CONCEPT_ID_swap_create.sql.jinja" -> "ohdsi_sql_bq_concept_swap",
    "CONCEPT_ID_swap_merge.sql.jinja" -> "ohdsi_sql_bq_concept_swap",
    "CONCEPT_merge.sql.jinja" -> "ohdsi_sql_bq_concept_merge",
    "{omop_work_table}_merge_check_for_duplicate_rows.sql.jinja" -> "ohdsi_sql_bq_dup_rows",
    "{omop_table}__{concept_id_column}_usagi_non_standard.sql.jinja" -> "ohdsi_sql_bq_usagi_checks",
    "{omop_table}__{concept_id_column}_usagi_fk_domain_check.sql.jinja" -> "ohdsi_sql_bq_usagi_checks",
    "{omop_table}__{concept_id_column}_usagi_update_custom_concepts.sql.jinja" -> "ohdsi_sql_bq_usagi_update",
    "sample_etl_query.sql.jinja" -> "ohdsi_sql_bq_upload_insert",
    "sample_usagi_query.sql.jinja" -> "ohdsi_sql_bq_sample_usagi",
    "CONCEPT_remove_custom_concepts.sql.jinja" -> "ohdsi_sql_bq_vocab_cleanup",
    "CONCEPT_remove_custom_concepts_by_{omop_table}__{concept_id_column}_usagi_table.sql.jinja" -> "ohdsi_sql_bq_concept_remove",
    "SOURCE_ID_TO_OMOP_ID_MAP_remove_ids_by_omop_table.sql.jinja" -> "ohdsi_sql_bq_map_cleanup",
    "SOURCE_TO_CONCEPT_MAP_remove_concepts_by_{omop_table}__{concept_id_column}_usagi_table.sql.jinja" -> "ohdsi_sql_bq_s2cm_remove",
    "all_work_table_names.sql.jinja" -> "ohdsi_sql_bq_work_tables",
    "truncate.sql.jinja" -> "ohdsi_sql_bq_vocab_cleanup",
    "DataQualityDashboard_ddl.sql.jinja" -> "ohdsi_sql_bq_dqd_ddl",
    "OMOPCDM_bigquery_5.4_ddl.sql.jinja" -> "ohdsi_sql_bq_cdm54_ddl",
    "SOURCE_ID_TO_OMOP_ID_MAP_ddl.sql.jinja" -> "ohdsi_sql_bq_map_ddl + ohdsi_sql_bq_clustered_write",
    "result_table_ddl_field.sql.jinja" -> "ohdsi_sql_bq_result_ddl",
    "result_table_ddl_concept.sql.jinja" -> "ohdsi_sql_bq_result_ddl",
    "result_table_ddl_table.sql.jinja" -> "ohdsi_sql_bq_result_ddl",
    "get_dqd_run.sql.jinja" -> "ohdsi_sql_bq_get_dqd_run",
    "get_dqd_run_results.sql.jinja" -> "ohdsi_sql_bq_dqd_run_results",
    "get_last_dqd_runs.sql.jinja" -> "ohdsi_sql_bq_last_dqd_runs",
    "CONCEPT_custom_validate.sql.jinja" -> "ohdsi_sql_bq_custom_validate",
    "CONCEPT_custom_validate_duplicates.sql.jinja" -> "ohdsi_sql_bq_validate_dups",
    "SOURCE_ID_TO_OMOP_ID_MAP_merge.sql.jinja" -> "ohdsi_sql_bq_map_merge",
    "SOURCE_ID_TO_OMOP_ID_MAP_update_invalid_reason.sql.jinja" -> "ohdsi_sql_bq_map_invalidate",
    "SOURCE_TO_CONCEPT_MAP_check_for_duplicates.sql.jinja" -> "ohdsi_sql_bq_s2cm_dups",
    "SOURCE_TO_CONCEPT_MAP_merge.sql.jinja" -> "ohdsi_sql_bq_stcm_merge",
    "SOURCE_TO_CONCEPT_MAP_update_invalid_reason.sql.jinja" -> "ohdsi_sql_bq_stcm_invalidate",
    "cdm_metadata_git_commit_hash.sql.jinja" -> "ohdsi_sql_bq_metadata_rows",
    "cdm_metadata_riab_version.sql.jinja" -> "ohdsi_sql_bq_metadata_rows",
    "{omop_table}__{concept_id_column}_concept_create.sql.jinja" -> "ohdsi_sql_bq_work_ddl_create",
    "{omop_table}__{concept_id_column}_usagi_create.sql.jinja" -> "ohdsi_sql_bq_work_ddl_create",
    "{omop_table}_apply_event_columns.sql.jinja" -> "ohdsi_sql_bq_apply_events + ohdsi_sql_bq_apply_events_renumber",
    "{omop_table}_get_event_tables.sql.jinja" -> "ohdsi_sql_bq_event_tables",
    "{omop_table}_{sql_file}_insert.sql.jinja" -> "ohdsi_sql_bq_upload_insert",
    "{omop_work}_ddl.sql.jinja" -> "ohdsi_sql_bq_work_table_ddl",
    "vocabulary_table_refill.sql.jinja" -> "ohdsi_sql_bq_vocab_refill")

  test("every BigQuery-dialect template is exercised by a verbatim entry") {
    val root = new java.io.File(
      "/root/reference/src/riab/etl/bigquery/templates")
    assume(root.isDirectory, "reference checkout not present — skipping")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val templates = walk(root).map(_.getName).filter(_.endsWith(".sql.jinja"))
    assert(templates.nonEmpty)
    val uncovered = templates.filterNot(BqCovered.contains)
    assert(uncovered.isEmpty,
      s"bq templates without a verbatim entry: ${uncovered.sorted.mkString(", ")}")
    val phantom = BqCovered.keySet -- templates.toSet
    assert(phantom.isEmpty, s"claimed bq templates not in the tree: ${phantom.mkString(", ")}")
    val queries = graft.SparkEntry.queries.keySet
    val claimed = BqCovered.values.flatMap(_.split(raw"[\s(+)]+"))
      .filter(_.startsWith("ohdsi_sql_")).toSet
    val missing = claimed -- queries
    assert(missing.isEmpty, s"claimed entries not registered: ${missing.mkString(", ")}")
  }

  /** vendored bq resource name -> reference path (relative to the
    * bigquery templates root) — the verbatim discipline's provenance
    * map, asserted BYTE-IDENTICAL below.
    */
  private val BqVendored: Map[String, String] = Map(
    "bq_sample_etl_query" -> "cdm_folders/sample_etl_query.sql.jinja",
    "bq_sample_usagi_query" -> "cdm_folders/sample_usagi_query.sql.jinja",
    "bq_concept_remove_custom" -> "cleanup/CONCEPT_remove_custom_concepts.sql.jinja",
    "bq_concept_remove_by_usagi" -> "cleanup/CONCEPT_remove_custom_concepts_by_{omop_table}__{concept_id_column}_usagi_table.sql.jinja",
    "bq_map_remove_ids" -> "cleanup/SOURCE_ID_TO_OMOP_ID_MAP_remove_ids_by_omop_table.sql.jinja",
    "bq_s2cm_remove" -> "cleanup/SOURCE_TO_CONCEPT_MAP_remove_concepts_by_{omop_table}__{concept_id_column}_usagi_table.sql.jinja",
    "bq_all_work_table_names" -> "cleanup/all_work_table_names.sql.jinja",
    "bq_truncate" -> "cleanup/truncate.sql.jinja",
    "bq_dqd_ddl" -> "ddl/DataQualityDashboard_ddl.sql.jinja",
    "OMOPCDM_bigquery_5.4_ddl" -> "ddl/OMOPCDM_bigquery_5.4_ddl.sql.jinja",
    "bq_map_ddl" -> "ddl/SOURCE_ID_TO_OMOP_ID_MAP_ddl.sql.jinja",
    "bq_result_table_ddl_concept" -> "ddl/result_table_ddl_concept.sql.jinja",
    "bq_result_table_ddl_field" -> "ddl/result_table_ddl_field.sql.jinja",
    "bq_result_table_ddl_table" -> "ddl/result_table_ddl_table.sql.jinja",
    "bq_get_dqd_run" -> "dqd/get_dqd_run.sql.jinja",
    "bq_get_dqd_run_results" -> "dqd/get_dqd_run_results.sql.jinja",
    "bq_get_last_dqd_runs" -> "dqd/get_last_dqd_runs.sql.jinja",
    "bq_custom_validate" -> "etl/CONCEPT_custom_validate.sql.jinja",
    "bq_custom_validate_duplicates" -> "etl/CONCEPT_custom_validate_duplicates.sql.jinja",
    "bq_map_merge" -> "etl/SOURCE_ID_TO_OMOP_ID_MAP_merge.sql.jinja",
    "bq_map_invalidate" -> "etl/SOURCE_ID_TO_OMOP_ID_MAP_update_invalid_reason.sql.jinja",
    "bq_s2cm_dups" -> "etl/SOURCE_TO_CONCEPT_MAP_check_for_duplicates.sql.jinja",
    "bq_stcm_merge" -> "etl/SOURCE_TO_CONCEPT_MAP_merge.sql.jinja",
    "bq_stcm_invalidate" -> "etl/SOURCE_TO_CONCEPT_MAP_update_invalid_reason.sql.jinja",
    "bq_metadata_git" -> "etl/cdm_metadata_git_commit_hash.sql.jinja",
    "bq_metadata_riab" -> "etl/cdm_metadata_riab_version.sql.jinja",
    "bq_concept_create" -> "etl/{omop_table}__{concept_id_column}_concept_create.sql.jinja",
    "bq_usagi_create" -> "etl/{omop_table}__{concept_id_column}_usagi_create.sql.jinja",
    "bq_apply_event_columns" -> "etl/{omop_table}_apply_event_columns.sql.jinja",
    "bq_get_event_tables" -> "etl/{omop_table}_get_event_tables.sql.jinja",
    "bq_upload_insert" -> "etl/{omop_table}_{sql_file}_insert.sql.jinja",
    "bq_work_ddl" -> "etl/{omop_work}_ddl.sql.jinja",
    "bq_vocab_refill" -> "vocabulary/vocabulary_table_refill.sql.jinja")

  test("every vendored bq resource is byte-identical to its reference original") {
    val root = new java.io.File("/root/reference/src/riab/etl/bigquery/templates")
    assume(root.isDirectory, "reference checkout not present — skipping")
    BqVendored.foreach { case (resName, relPath) =>
      val in = getClass.getResourceAsStream(s"/graft/ohdsi/$resName.sql.jinja")
      assert(in != null, s"missing vendored resource $resName.sql.jinja")
      val vendored = in.readAllBytes()
      val original = java.nio.file.Files.readAllBytes(
        new java.io.File(root, relPath).toPath)
      assert(java.util.Arrays.equals(vendored, original),
        s"$resName.sql.jinja drifted from $relPath")
    }
  }

  /** vendored sql_server resource name -> reference path (relative to
    * the sql_server templates root).
    */
  private val SqlServerVendored: Map[String, String] = Map(
    "DataQualityDashboard_ddl" -> "ddl/DataQualityDashboard_ddl.sql.jinja",
    "OMOPCDM_sql_server_5.4_ddl" -> "ddl/OMOPCDM_sql_server_5.4_ddl.sql.jinja",
    "OMOPCDM_sql_server_5.4_primary_keys" -> "ddl/OMOPCDM_sql_server_5.4_primary_keys.sql.jinja",
    "OMOPCDM_sql_server_5.4_indices" -> "ddl/OMOPCDM_sql_server_5.4_indices.sql.jinja",
    "OMOPCDM_sql_server_5.4_constraints" -> "ddl/OMOPCDM_sql_server_5.4_constraints.sql.jinja",
    "result_table_ddl_concept" -> "ddl/result_table_ddl_concept.sql.jinja",
    "result_table_ddl_field" -> "ddl/result_table_ddl_field.sql.jinja",
    "result_table_ddl_table" -> "ddl/result_table_ddl_table.sql.jinja",
    "omop_table_apply_event_columns" -> "etl/{omop_table}_apply_event_columns.sql.jinja",
    "omop_table_merge" -> "etl/{omop_table}_merge.sql.jinja")

  test("every vendored sql_server resource is byte-identical to its reference original") {
    val root = new java.io.File("/root/reference/src/riab/etl/sql_server/templates")
    assume(root.isDirectory, "reference checkout not present — skipping")
    SqlServerVendored.foreach { case (resName, relPath) =>
      val in = getClass.getResourceAsStream(s"/graft/ohdsi/$resName.sql.jinja")
      assert(in != null, s"missing vendored resource $resName.sql.jinja")
      val vendored = in.readAllBytes()
      val original = java.nio.file.Files.readAllBytes(
        new java.io.File(root, relPath).toPath)
      assert(java.util.Arrays.equals(vendored, original),
        s"$resName.sql.jinja drifted from $relPath")
    }
  }

  test("every sql_server template is exercised by a verbatim entry") {
    val root = new java.io.File(
      "/root/reference/src/riab/etl/sql_server/templates")
    assume(root.isDirectory, "reference checkout not present — skipping")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val templates = walk(root).map(_.getName).filter(_.endsWith(".sql.jinja"))
    assert(templates.nonEmpty)
    val uncovered = templates.filterNot(Covered.contains)
    assert(uncovered.isEmpty,
      s"templates without a verbatim entry: ${uncovered.sorted.mkString(", ")}")
    // and every claimed entry name actually exists in the registered suite
    val queries = graft.SparkEntry.queries.keySet
    val claimed = Covered.values.flatMap(_.split(raw"[\s(+)]+"))
      .filter(_.startsWith("ohdsi_sql_")).toSet
    val missing = claimed -- queries
    assert(missing.isEmpty, s"claimed entries not registered: ${missing.mkString(", ")}")
  }
}
