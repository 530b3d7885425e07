package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-pipeline validation operators — the reference's runtime "test suite"
  * (SURVEY.md §5): bounded duplicate reports, referential null-detection,
  * and Usagi standard/domain checks.
  *
  * The grouped duplicate detectors cap their reports at 100 rows (O2,
  * `/root/reference/src/riab/etl/bigquery/templates/etl/{omop_work_table}_merge_check_for_duplicate_rows.sql.jinja:64`)
  * and order them for human readability (O4, `etl.py:501`). The join-based
  * validators ([[missingDimension]], [[domainViolations]]) return the raw
  * violation stream — the composing query applies the ORDER BY + LIMIT,
  * exactly as the reference's templates carry the LIMIT in the surrounding
  * SQL. Unlike the reference we use a full deterministic sort before each
  * LIMIT so the reported subset is stable.
  */
object Validate {

  val ViolationCap = 100

  /** A1: duplicate-mapping detector — `(sourceCode, conceptId)` appearing
    * more than once in a usagi CSV (warn)
    * (`/root/reference/src/riab/etl/etl.py:492-508`).
    */
  def duplicateMappings(usagi: DataFrame, codeCol: String, conceptCol: String): DataFrame =
    usagi
      .groupBy(col(codeCol), col(conceptCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy(desc("cnt"), col(codeCol), col(conceptCol))
      .limit(ViolationCap)

  /** A2: upload duplicate-row check — UNION ALL of per-query uploads grouped
    * by the table's natural key, `HAVING COUNT(*) > 1`, with the offending
    * upload-table names aggregated
    * (`{omop_work_table}_merge_check_for_duplicate_rows.sql.jinja:3-64`).
    */
  def duplicateUploadRows(uploads: Seq[DataFrame], keyCols: Seq[String], uploadNameCol: String): DataFrame = {
    val all = uploads.reduce(_ unionByName _)
    all
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        concat_ws(",", array_sort(collect_set(col(uploadNameCol)))).as("upload_tables"))
      .filter(col("cnt") > 1)
      .orderBy(desc("cnt") +: keyCols.map(col): _*)
      .limit(ViolationCap)
  }

  /** A3/A4: grouped duplicate check raised as an error — source_to_concept_map
    * `(source_code, target_concept_id)` (`SOURCE_TO_CONCEPT_MAP_check_for_duplicates.sql.jinja:3-25`)
    * and custom-concept `concept_code` (`CONCEPT_custom_validate_duplicates.sql.jinja:3-11`).
    */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy(desc("cnt") +: keyCols.map(col): _*)
      .limit(ViolationCap)

  /** J6: validation join — left join a dimension and keep rows whose
    * dimension is missing (`CONCEPT_custom_validate.sql.jinja:3-11`; raised
    * at `bigquery/etl.py:146-162`). The dimension is broadcast (domain /
    * vocabulary / concept_class are tiny).
    */
  def missingDimension(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    facts
      .join(broadcast(dim), facts(factKey) === dim(dimKey), "left")
      .filter(dim(dimKey).isNull)
      .select(facts.columns.toIndexedSeq.map(facts(_)): _*)

  /** J7: Usagi domain check — inner join mapped concepts to the concept
    * dimension and flag rows whose domain is outside the FK's allowed set
    * (`{omop_table}__{concept_id_column}_usagi_fk_domain_check.sql.jinja:3-19`,
    * driver `bigquery/etl.py:583-625`).
    */
  def domainViolations(
      usagi: DataFrame,
      concept: DataFrame,
      conceptIdCol: String,
      domainCol: String,
      allowedDomains: Seq[String]): DataFrame = {
    val c = concept.withColumnRenamed("concept_id", "__concept_id")
    usagi
      .join(broadcast(c), usagi(conceptIdCol) === c("__concept_id"))
      .filter(!lower(c(domainCol)).isin(allowedDomains.map(_.toLowerCase): _*))
      .drop("__concept_id")
  }

  /** J7 (warn variant): usagi mappings that point at NON-STANDARD concepts
    * — inner join to the concept dimension, flag `standard_concept <> 'S'`
    * (`{omop_table}__{concept_id_column}_usagi_non_standard.sql.jinja:3-13`;
    * warned, not raised, at `bigquery/etl.py:583-604`).
    */
  def nonStandardMappings(
      usagi: DataFrame,
      concept: DataFrame,
      conceptIdCol: String,
      standardCol: String): DataFrame = {
    val c = concept.withColumnRenamed("concept_id", "__concept_id")
    usagi
      .join(broadcast(c), usagi(conceptIdCol) === c("__concept_id"))
      .filter(c(standardCol).isNull || c(standardCol) =!= "S")
      .drop("__concept_id")
  }

  /** P4: DQD evaluation filter — the check CSVs carry SQL predicates that
    * select the applicable check rows (`data_quality.py:219-224`); Spark SQL
    * parses them natively.
    */
  def evaluationFilter(checks: DataFrame, predicate: String): DataFrame =
    checks.filter(expr(predicate))
}
