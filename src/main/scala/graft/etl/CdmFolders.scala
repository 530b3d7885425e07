package graft.etl

import graft.model.CdmModel
import java.nio.file.{Files, Path}

/** `--create-folders` (S-surface glue): scaffold the ETL folder structure a
  * user fills with raw queries, Usagi CSVs and custom-concept CSVs —
  * `/root/reference/src/riab/etl/create_cdm_folders.py:25-103`. Per ETL
  * table: a folder with a sample raw query (template variables the S9
  * renderer substitutes); per concept column (FK into `concept`): a
  * subfolder with a sample Usagi source query, the Usagi source/full CSV
  * headers, and a `custom/` folder with the custom-concept CSV header.
  * Sample files carry the reference's `._jinja` / `._csv` suffixes so the
  * ETL skips them until the user activates them by renaming.
  */
object CdmFolders {

  /** The reference's example CSV headers, verbatim
    * (`create_cdm_folders.py:66-101`).
    */
  val UsagiSourceHeader = "sourceCode,sourceName,sourceFrequency"
  val UsagiFullHeader: String =
    "sourceCode,sourceName,sourceFrequency,sourceAutoAssignedConceptIds," +
      "ADD_INFO:additionalInfo,matchScore,mappingStatus,equivalence,statusSetBy," +
      "statusSetOn,conceptId,conceptName,domainId,mappingType,comment,createdBy," +
      "createdOn,assignedReviewer"
  val CustomConceptHeader: String =
    "concept_id,concept_name,domain_id,vocabulary_id,concept_class_id," +
      "standard_concept,concept_code,valid_start_date,valid_end_date,invalid_reason"

  private def sampleEtlQuery(model: CdmModel, table: String): String = {
    val cols = model.sparkSchema(table).fields.map { f =>
      val note =
        (if (model.pk(table).contains(f.name)) " -- primary key" else "") +
          (if (model.requiredColumns(table).contains(f.name)) " -- required" else "")
    s"  CAST(NULL AS ${f.dataType.sql}) AS ${f.name}$note"
    }
    s"""-- Sample raw query for the $table table: replace the NULL casts with
       |-- your source columns. {{project_raw}} renders to your raw zone.
       |SELECT
       |${cols.mkString(",\n")}
       |FROM {{project_raw}}_$table
       |""".stripMargin
  }

  private def sampleUsagiQuery(table: String, conceptCol: String): String =
    s"""-- Sample Usagi source query for $table.$conceptCol: emit the distinct
       |-- source values with frequencies, then map them in Usagi.
       |SELECT source_value AS sourceCode,
       |  source_value AS sourceName,
       |  count(*) AS sourceFrequency
       |FROM {{project_raw}}_$table
       |GROUP BY source_value
       |""".stripMargin

  /** Create the folder tree under `root`; returns every created path
    * (sorted, root-relative) so callers/tests can assert the layout.
    */
  def create(model: CdmModel, root: Path): Seq[String] = {
    Files.createDirectories(root)
    val created = scala.collection.mutable.ArrayBuffer.empty[String]
    def write(p: Path, content: String): Unit = {
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
      created += root.relativize(p).toString
    }
    for (table <- model.tables) {
      write(root.resolve(table).resolve("example.sql._jinja"), sampleEtlQuery(model, table))
      val conceptCols = model.conceptFks(table)
      for (c <- conceptCols) {
        val dir = root.resolve(table).resolve(c)
        write(dir.resolve("example.sql._jinja"), sampleUsagiQuery(table, c))
        write(dir.resolve("example._csv"), UsagiSourceHeader)
        write(dir.resolve("example_usagi._csv"), UsagiFullHeader)
        write(dir.resolve("custom").resolve("example._csv"), CustomConceptHeader)
      }
    }
    created.sorted.toSeq
  }
}
