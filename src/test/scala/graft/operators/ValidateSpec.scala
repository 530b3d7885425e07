package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-pipeline validation operators — the reference's runtime checks. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateMappings (A1) reports multi-mapped (code, concept) pairs desc") {
    val usagi = Seq(
      ("s1", 1L), ("s1", 1L), ("s1", 1L),
      ("s2", 2L), ("s2", 2L),
      ("s3", 3L)).toDF("sourceCode", "conceptId")
    val out = Validate.duplicateMappings(usagi, "sourceCode", "conceptId")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("s1", 1L, 3L), ("s2", 2L, 2L)))
  }

  test("duplicateKeys (A3/A4) caps the report at 100 rows") {
    val df = (1 to 250).flatMap(i => Seq(i, i)).toDF("k")
    val out = Validate.duplicateKeys(df, Seq("k"))
    assert(out.count() == 100)
  }

  test("duplicateUploadRows (A2) aggregates offending upload-table names") {
    val u1 = Seq((1L, "u1"), (2L, "u1")).toDF("pk", "src")
    val u2 = Seq((1L, "u2")).toDF("pk", "src")
    val out = Validate.duplicateUploadRows(
      Seq(u1.withColumn("upload_table", lit("u1")), u2.withColumn("upload_table", lit("u2"))),
      Seq("pk"), "upload_table")
    val rows = out.select($"pk", $"cnt", $"upload_tables").as[(Long, Long, String)].collect()
    assert(rows.toSeq == Seq((1L, 2L, "u1,u2")))
  }

  test("missingDimension (J6) returns fact rows whose dimension is absent") {
    val facts = Seq(("c1", "Gender"), ("c2", "Nope")).toDF("code", "domain_id")
    val dims = Seq(Tuple1("Gender")).toDF("domain_id_dim")
    val out = Validate.missingDimension(facts, dims, "domain_id", "domain_id_dim")
    assert(out.select("code").as[String].collect().toSeq == Seq("c2"))
  }

  test("domainViolations (J7) flags mapped concepts outside the allowed domains") {
    val usagi = Seq(("s1", 1L), ("s2", 2L)).toDF("sourceCode", "conceptId")
    val concept = Seq((1L, "Gender"), (2L, "Drug")).toDF("concept_id", "domain_id")
    val out = Validate.domainViolations(usagi, concept, "conceptId", "domain_id", Seq("gender"))
    assert(out.select("sourceCode").as[String].collect().toSeq == Seq("s2"))
  }

  test("evaluationFilter (P4) applies a SQL predicate string") {
    val checks = Seq(("f1", 1), ("f2", 0)).toDF("name", "isRequired")
    val out = Validate.evaluationFilter(checks, "isRequired = 1")
    assert(out.select("name").as[String].collect().toSeq == Seq("f1"))
  }
}
