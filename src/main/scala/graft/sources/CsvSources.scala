package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.CdmModel

/** CSV ingestion sources — the reference's user-facing input formats.
  *
  *  - S1 Usagi mapping CSVs (`/root/reference/src/riab/etl/etl.py:776-794`,
  *    schema `:58-65`): 6 projected columns, conceptId Int64.
  *  - S2 custom-concept CSVs (`etl.py:744-774`, schema `:67-78`): 10
  *    columns, ISO dates, missing strings read as empty string
  *    (`missing_utf8_is_empty_string=True`).
  *  - S3 vocabulary CSVs (`import_vocabularies.py:144-185`): tab-separated,
  *    schema from the CDM model, date columns parsed with `%Y%m%d`, sorted
  *    by the first (id) column before staging (O1).
  *  - S4 Athena zip bundle extraction (`import_vocabularies.py:60-93`).
  *
  * All readers hand Spark an explicit schema — no sampling/inference pass
  * over 100 TB of input — so the CSV scan is a single streaming pass per
  * file split.
  */
object CsvSources {

  /** S1: Usagi CSV schema (`etl.py:58-65`). */
  val usagiSchema: StructType = StructType(Seq(
    StructField("sourceCode", StringType),
    StructField("sourceName", StringType),
    StructField("mappingStatus", StringType),
    StructField("conceptId", LongType),
    StructField("conceptName", StringType),
    StructField("domainId", StringType)))

  def readUsagi(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(usagiSchema)
      .option("header", "true")
      .csv(path)
      .select(usagiSchema.fieldNames.toIndexedSeq.map(col): _*)

  /** S2: custom-concept CSV schema (`etl.py:67-78`). */
  val conceptSchema: StructType = StructType(Seq(
    StructField("concept_id", LongType),
    StructField("concept_name", StringType),
    StructField("domain_id", StringType),
    StructField("vocabulary_id", StringType),
    StructField("concept_class_id", StringType),
    StructField("standard_concept", StringType),
    StructField("concept_code", StringType),
    StructField("valid_start_date", DateType),
    StructField("valid_end_date", DateType),
    StructField("invalid_reason", StringType)))

  /** Missing strings -> "" like the reference's
    * `missing_utf8_is_empty_string=True` (`etl.py:758`).
    */
  def readCustomConcepts(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema(conceptSchema)
      .option("header", "true")
      .csv(path)
    conceptSchema.fields.foldLeft(raw) { (df, f) =>
      if (f.dataType == StringType) df.withColumn(f.name, coalesce(col(f.name), lit("")))
      else df
    }.select(conceptSchema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** S3: one Athena vocabulary TSV, typed from the CDM model with `%Y%m%d`
    * date parsing and the O1 pre-sort on the first column.
    */
  def readVocabulary(spark: SparkSession, path: String, table: String, model: CdmModel): DataFrame = {
    val target = model.sparkSchema(table)
    // read date columns as STRING first: the files carry yyyyMMdd, which is
    // not Spark's CSV date format
    val readSchema = StructType(target.map(f =>
      if (f.dataType == DateType) f.copy(dataType = StringType) else f))
    val raw = spark.read
      .schema(readSchema)
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)
    val parsed = target.fields.foldLeft(raw) { (df, f) =>
      if (f.dataType == DateType) df.withColumn(f.name, to_date(col(f.name), "yyyyMMdd"))
      else df
    }
    parsed.sort(target.fieldNames.head)
  }

  /** S4: unzip a vocabulary bundle to a directory (driver-side, like the
    * reference), returning the extracted file names.
    */
  def extractZip(zipPath: String, destDir: String): Seq[String] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.util.zip.ZipFile
    import scala.jdk.CollectionConverters._
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    val zip = new ZipFile(zipPath)
    try {
      zip.entries().asScala.filterNot(_.isDirectory).map { e =>
        val out = dest.resolve(e.getName).normalize()
        require(out.startsWith(dest), s"zip entry escapes destination: ${e.getName}")
        Files.createDirectories(out.getParent)
        Files.copy(zip.getInputStream(e), out, StandardCopyOption.REPLACE_EXISTING)
        e.getName
      }.toSeq.sorted
    } finally zip.close()
  }
}
