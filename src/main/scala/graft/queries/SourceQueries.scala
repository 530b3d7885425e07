package graft.queries

import graft.Tables
import graft.model.Cdm54
import graft.sources.CsvSources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** CSV ingestion entries (S1/S2/S3): each query deterministically STAGES a
  * CSV derived from the test tables (bounded dimension collects, sorted),
  * reads it back through the typed reader, and the DuckDB oracle re-reads
  * the same staged file with `read_csv` — so the reader's schema handling,
  * date parsing, and missing-value semantics are what is actually checked.
  */
object SourceQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val StageDir = "/root/repo/target/csv_stage"

  private def stage(name: String, lines: Seq[String]): String = {
    Files.createDirectories(Paths.get(StageDir))
    val p = Paths.get(s"$StageDir/$name")
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  /** S1: Usagi mapping CSV — 6 projected columns (`etl.py:58-65,776-794`). */
  val csvUsagiRead: Q = (s, d) => {
    val prios = t(s, d, "orders").select("o_orderpriority").distinct()
      .collect().map(_.getString(0)).sorted // bounded dimension (5 values)
    val lines = "sourceCode,sourceName,mappingStatus,conceptId,conceptName,domainId" +:
      prios.zipWithIndex.map { case (p, i) =>
        val status = if (p.startsWith("5")) "FLAGGED" else "APPROVED"
        s"$p,${p.toLowerCase},$status,${i + 1},concept ${i + 1},observation"
      }.toSeq
    val path = stage("usagi.csv", lines)
    CsvSources.readUsagi(s, path).orderBy("sourceCode")
  }

  /** S2: custom-concept CSV — ISO dates, missing strings -> ""
    * (`etl.py:67-78,744-774`).
    */
  val csvConceptsRead: Q = (s, d) => {
    val names = t(s, d, "nation").select("n_name").distinct()
      .collect().map(_.getString(0)).sorted
    val lines = ("concept_id,concept_name,domain_id,vocabulary_id,concept_class_id," +
      "standard_concept,concept_code,valid_start_date,valid_end_date,invalid_reason") +:
      names.zipWithIndex.map { case (n, i) =>
        // standard_concept and invalid_reason left empty -> read as ""
        s"${2000000000L + i + 1},$n,geography,GRAFT,Location,,NAT-$i,2020-01-15,2099-12-31,"
      }.toSeq
    val path = stage("custom_concepts.csv", lines)
    CsvSources.readCustomConcepts(s, path).orderBy("concept_id")
  }

  /** S3: Athena vocabulary TSV typed from the CDM model with yyyyMMdd date
    * parsing + O1 pre-sort (`import_vocabularies.py:144-185`).
    */
  val csvVocabRead: Q = (s, d) => {
    val types = t(s, d, "part").select("p_type").distinct()
      .collect().map(_.getString(0)).sorted
    val header = Cdm54.model.columns("concept").mkString("\t")
    val lines = header +: types.zipWithIndex.map { case (ty, i) =>
      Seq(s"${i + 1}", ty, "Observation", "GRAFT", "Clinical Finding", "S",
        s"PT-$i", "20200115", "20991231", "").mkString("\t")
    }.toSeq
    val path = stage("concept.csv", lines)
    CsvSources.readVocabulary(s, path, "concept", Cdm54.model).orderBy("concept_id")
  }

  val defs: Seq[(String, Q)] = Seq(
    "csv_usagi_read" -> csvUsagiRead,
    "csv_concepts_read" -> csvConceptsRead,
    "csv_vocab_read" -> csvVocabRead)

  val oracles: Seq[(String, String)] = Seq(
    "csv_usagi_read" ->
      s"""SELECT * FROM read_csv('$StageDir/usagi.csv', header=true, columns={
         |  'sourceCode':'VARCHAR','sourceName':'VARCHAR','mappingStatus':'VARCHAR',
         |  'conceptId':'BIGINT','conceptName':'VARCHAR','domainId':'VARCHAR'})
         |ORDER BY sourceCode""".stripMargin,
    "csv_concepts_read" ->
      s"""SELECT concept_id, concept_name, domain_id, vocabulary_id, concept_class_id,
         |  COALESCE(standard_concept, '') AS standard_concept, concept_code,
         |  valid_start_date, valid_end_date, COALESCE(invalid_reason, '') AS invalid_reason
         |FROM read_csv('$StageDir/custom_concepts.csv', header=true, columns={
         |  'concept_id':'BIGINT','concept_name':'VARCHAR','domain_id':'VARCHAR',
         |  'vocabulary_id':'VARCHAR','concept_class_id':'VARCHAR','standard_concept':'VARCHAR',
         |  'concept_code':'VARCHAR','valid_start_date':'DATE','valid_end_date':'DATE',
         |  'invalid_reason':'VARCHAR'})
         |ORDER BY concept_id""".stripMargin,
    "csv_vocab_read" ->
      s"""SELECT concept_id, concept_name, domain_id, vocabulary_id, concept_class_id,
         |  standard_concept, concept_code,
         |  CAST(strptime(valid_start_date, '%Y%m%d') AS DATE) AS valid_start_date,
         |  CAST(strptime(valid_end_date, '%Y%m%d') AS DATE) AS valid_end_date,
         |  invalid_reason
         |FROM read_csv('$StageDir/concept.csv', delim='\\t', header=true, columns={
         |  'concept_id':'BIGINT','concept_name':'VARCHAR','domain_id':'VARCHAR',
         |  'vocabulary_id':'VARCHAR','concept_class_id':'VARCHAR','standard_concept':'VARCHAR',
         |  'concept_code':'VARCHAR','valid_start_date':'VARCHAR','valid_end_date':'VARCHAR',
         |  'invalid_reason':'VARCHAR'})
         |ORDER BY concept_id""".stripMargin)
}
