package graft.sources

import graft.SparkSpec
import graft.model.Cdm54
import java.nio.file.{Files, Paths}

/** S1-S4 CSV/zip ingestion semantics. */
class CsvSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-csv")
    val p = dir.resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("readUsagi applies the 6-column schema with typed conceptId") {
    val path = write("u.csv",
      """sourceCode,sourceName,mappingStatus,conceptId,conceptName,domainId
        |A01,aortic issue,APPROVED,317009,Aortic thing,Condition""".stripMargin)
    val rows = CsvSources.readUsagi(spark, path)
      .as[(String, String, String, Long, String, String)].collect()
    assert(rows.toSeq == Seq(("A01", "aortic issue", "APPROVED", 317009L, "Aortic thing", "Condition")))
  }

  test("readCustomConcepts parses ISO dates and maps missing strings to empty") {
    val path = write("c.csv",
      """concept_id,concept_name,domain_id,vocabulary_id,concept_class_id,standard_concept,concept_code,valid_start_date,valid_end_date,invalid_reason
        |2000000001,Custom,Observation,LOCAL,Clinical Finding,,C-1,2020-01-15,2099-12-31,""".stripMargin)
    val r = CsvSources.readCustomConcepts(spark, path).collect().head
    assert(r.getAs[String]("standard_concept") == "")
    assert(r.getAs[String]("invalid_reason") == "")
    assert(r.getAs[java.sql.Date]("valid_start_date").toString == "2020-01-15")
  }

  test("readVocabulary parses tab-separated yyyyMMdd dates through the CDM schema") {
    val path = write("concept.csv",
      Seq(
        Cdm54.model.columns("concept").mkString("\t"),
        Seq("42", "Name", "Obs", "V", "CC", "S", "CODE", "20200115", "20991231", "").mkString("\t"))
        .mkString("\n"))
    val r = CsvSources.readVocabulary(spark, path, "concept", Cdm54.model).collect().head
    assert(r.getAs[Long]("concept_id") == 42L)
    assert(r.getAs[java.sql.Date]("valid_start_date").toString == "2020-01-15")
    assert(r.getAs[java.sql.Date]("valid_end_date").toString == "2099-12-31")
  }

  test("extractZip unpacks entries and refuses path traversal") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("graft-zip")
    val zipPath = dir.resolve("bundle.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipPath))
    zos.putNextEntry(new ZipEntry("CONCEPT.csv")); zos.write("a\tb\n".getBytes); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("VOCABULARY.csv")); zos.write("c\td\n".getBytes); zos.closeEntry()
    zos.close()
    val out = dir.resolve("out").toString
    val names = CsvSources.extractZip(zipPath.toString, out)
    assert(names == Seq("CONCEPT.csv", "VOCABULARY.csv"))
    assert(Files.readAllLines(Paths.get(out, "CONCEPT.csv")).get(0) == "a\tb")
  }
}
