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

  // absolute so the oracle SQL dumped into oracle_sql.json points DuckDB at
  // the same files regardless of the comparing process's cwd
  val StageDir = new java.io.File(s"${graft.io.Zones.defaultRoot}/csv_stage").getAbsolutePath

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

  /** S9 with template rendering: the user query arrives as a staged
    * `.sql.jinja` FILE whose `{{project_raw}}`/`{{omop_table}}` variables
    * are substituted before `spark.sql` — the contract real users' ETL
    * folders rely on (`etl.py:930-940`, `bigquery/etl.py:325-345`).
    */
  val etlUserQueryRendered: Q = (s, d) => {
    val path = stage("person.sql.jinja", Seq(
      "SELECT o_orderkey AS {{omop_table}}_source_key,",
      "  o_orderpriority AS priority",
      "FROM {{project_raw}}_orders",
      "WHERE o_totalprice > 150000"))
    t(s, d, "orders").createOrReplaceTempView("myraw_orders")
    val sql = graft.sources.SqlTemplates.fromFile(
      Paths.get(path), omopTable = "person", projectRaw = "myraw",
      datasetWork = "work", datasetOmop = "omop")
    s.sql(sql).distinct().orderBy("person_source_key")
  }

  /** S4+S3+O1+D6 composed: the 9-table vocabulary import flow
    * (`import_vocabularies.py:40-121`) — drop the uploaded work copies,
    * unzip the Athena bundle, typed-read + pre-sort each member file, stage
    * it in the work zone, then REFILL the omop zone table from the staged
    * copy. The checked rows are read back from the omop zone, so the whole
    * unzip -> read -> stage -> refill path is what the oracle certifies.
    */
  val vocabImportRefill: Q = (s, d) => {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val types = t(s, d, "part").select("p_type").distinct()
      .collect().map(_.getString(0)).sorted
    val conceptLines = Cdm54.model.columns("concept").mkString("\t") +:
      types.zipWithIndex.map { case (ty, i) =>
        Seq(s"${i + 1}", ty, "Observation", "GRAFT", "Clinical Finding", "S",
          s"PT-$i", "20200115", "20991231", "").mkString("\t")
      }.toSeq
    val vocabLines = Cdm54.model.columns("vocabulary").mkString("\t") +:
      Seq(
        Seq("GRAFT", "Graft generated", "graft", "v1", "0").mkString("\t"),
        Seq("NONE", "OMOP Standardized Vocabularies", "OMOP", "v5.0", "44819096").mkString("\t"))
    Files.createDirectories(Paths.get(StageDir))
    val zipPath = s"$StageDir/vocab_bundle.zip"
    val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(zipPath)))
    try
      Seq("CONCEPT.csv" -> conceptLines, "VOCABULARY.csv" -> vocabLines).foreach {
        case (name, lines) =>
          zos.putNextEntry(new ZipEntry(name))
          zos.write(lines.mkString("\n").getBytes("UTF-8"))
          zos.closeEntry()
      }
    finally zos.close()

    val zones = graft.io.Zones.forPurpose("vocab")
    val members = Seq("concept" -> "CONCEPT.csv", "vocabulary" -> "VOCABULARY.csv")
    members.foreach { case (tb, _) => zones.drop(s, "work", tb) } // :40-58
    val extractDir = s"$StageDir/vocab_extracted"
    CsvSources.extractZip(zipPath, extractDir) // S4
    members.foreach { case (tb, file) =>
      zones.write( // stage the typed, pre-sorted read (:59-105)
        CsvSources.readVocabulary(s, s"$extractDir/$file", tb, Cdm54.model),
        "work", tb)
      zones.refill(s, tb) // D6: truncate+insert the omop copy (:59-71)
    }
    zones.read(s, "omop", "concept")
      .select(lit("concept").as("table_name"),
        col("concept_id").cast("string").as("id"), col("concept_name").as("name"))
      .unionByName(zones.read(s, "omop", "vocabulary")
        .select(lit("vocabulary").as("table_name"),
          col("vocabulary_id").as("id"), col("vocabulary_name").as("name")))
      .orderBy("table_name", "id")
  }

  val defs: Seq[(String, Q)] = Seq(
    "csv_usagi_read" -> csvUsagiRead,
    "csv_concepts_read" -> csvConceptsRead,
    "csv_vocab_read" -> csvVocabRead,
    "etl_user_query_rendered" -> etlUserQueryRendered,
    "vocab_import_refill" -> vocabImportRefill)

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
    "etl_user_query_rendered" ->
      """SELECT DISTINCT o_orderkey AS person_source_key, o_orderpriority AS priority
        |FROM orders WHERE o_totalprice > 150000
        |ORDER BY person_source_key""".stripMargin,
    "vocab_import_refill" ->
      s"""SELECT 'concept' AS table_name, CAST(concept_id AS VARCHAR) AS id, concept_name AS name
         |FROM read_csv('$StageDir/vocab_extracted/CONCEPT.csv', delim='\\t', header=true, columns={
         |  'concept_id':'BIGINT','concept_name':'VARCHAR','domain_id':'VARCHAR',
         |  'vocabulary_id':'VARCHAR','concept_class_id':'VARCHAR','standard_concept':'VARCHAR',
         |  'concept_code':'VARCHAR','valid_start_date':'VARCHAR','valid_end_date':'VARCHAR',
         |  'invalid_reason':'VARCHAR'})
         |UNION ALL
         |SELECT 'vocabulary', vocabulary_id, vocabulary_name
         |FROM read_csv('$StageDir/vocab_extracted/VOCABULARY.csv', delim='\\t', header=true, columns={
         |  'vocabulary_id':'VARCHAR','vocabulary_name':'VARCHAR','vocabulary_reference':'VARCHAR',
         |  'vocabulary_version':'VARCHAR','vocabulary_concept_id':'BIGINT'})
         |ORDER BY table_name, id""".stripMargin,
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
