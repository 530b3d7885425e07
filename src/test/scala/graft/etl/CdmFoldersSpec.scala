package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CdmFoldersSpec extends AnyFunSuite {

  test("scaffolds the reference's ETL folder layout over the CDM 5.4 model") {
    val root = Files.createTempDirectory("cdm_folders")
    val m = graft.model.Cdm54.model
    val created = CdmFolders.create(m, root)

    // every table gets its sample raw query
    assert(m.tables.forall(t => created.contains(s"$t/example.sql._jinja")))
    // person.gender_concept_id is an FK into concept -> full usagi scaffold
    val base = "person/gender_concept_id"
    for (f <- Seq(s"$base/example.sql._jinja", s"$base/example._csv",
        s"$base/example_usagi._csv", s"$base/custom/example._csv"))
      assert(created.contains(f), s"missing $f")
    // headers are the reference's, verbatim
    assert(Files.readString(root.resolve(s"$base/example._csv"))
      === "sourceCode,sourceName,sourceFrequency")
    assert(Files.readString(root.resolve(s"$base/custom/example._csv"))
      .startsWith("concept_id,concept_name,domain_id"))
    // the sample raw query uses the S9 template variable and every column
    val sql = Files.readString(root.resolve("person/example.sql._jinja"))
    assert(sql.contains("FROM {{project_raw}}_person"))
    assert(m.columns("person").forall(c => sql.contains(s"AS $c")))
    // rendered through the S9 substitution, the variable disappears
    val rendered = graft.sources.SqlTemplates.render(sql, Map("project_raw" -> "raw"))
    assert(!rendered.contains("{{") && rendered.contains("FROM raw_person"))
  }
}
