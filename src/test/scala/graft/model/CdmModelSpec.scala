package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata layer: vendored CDM 5.4 model, accessors, and the FK-dependency
  * level resolution (port of etl_base.py:56-347).
  */
class CdmModelSpec extends AnyFunSuite {
  private val m = Cdm54.model

  test("vendored CDM 5.4 metadata: 39 tables, 432 fields, 28 ETL tables") {
    assert(m.tables.size == 39)
    assert(m.fields.size == 432)
    assert(m.etlTables.size == 28)
    assert(m.etlTables.contains("vocabulary") && m.etlTables.contains("cdm_source"))
    assert(!m.etlTables.contains("concept") && !m.etlTables.contains("cohort"))
  }

  test("dependency levels match the faithful etl_base.py decomposition") {
    // Computed per etl_base.py:155-218 WITH the documented FK patches and
    // ERA extra edges applied — the README.md:44-73 tree predates the
    // cost->payer_plan_period patch (#714) and the ERA edges (:192-195),
    // which push cost and the ERA tables to later levels.
    val expected = Seq(
      Seq("vocabulary"),
      Seq("cdm_source", "fact_relationship", "location", "metadata"),
      Seq("care_site"),
      Seq("provider"),
      Seq("person"),
      Seq("death", "episode", "observation_period", "payer_plan_period",
        "specimen", "visit_occurrence"),
      Seq("cost", "episode_event", "visit_detail"),
      Seq("condition_occurrence", "device_exposure", "drug_exposure",
        "measurement", "note", "observation", "procedure_occurrence"),
      Seq("condition_era", "dose_era", "drug_era", "note_nlp"))
    assert(m.dependencyLevels(m.etlTables) == expected)
  }

  test("a circular FK reference raises") {
    val cyclic = CdmModel(fields = Seq(
      CdmField("a", "a_id", "int64", required = true, isPk = true, None, "CDM"),
      CdmField("a", "b_id", "int64", required = false, isPk = false, Some("b"), "CDM"),
      CdmField("b", "b_id", "int64", required = true, isPk = true, None, "CDM"),
      CdmField("b", "a_id", "int64", required = false, isPk = false, Some("a"), "CDM")))
    val e = intercept[IllegalStateException](cyclic.dependencyLevels(Seq("a", "b")))
    assert(e.getMessage.contains("Circular reference"))
  }

  test("pk / auto-numbering / fks accessors (incl. the three FK patches)") {
    assert(m.pk("person").contains("person_id"))
    assert(m.pk("death").isEmpty && m.pk("cdm_source").isEmpty)
    assert(m.isPkAutoNumbering("person"))
    assert(!m.isPkAutoNumbering("vocabulary")) // string PK: no surrogate swap
    assert(m.fks("note_nlp") == Map("note_id" -> "note"))                  // #539
    assert(m.fks("episode").get("episode_parent_id").contains("episode")) // #707
    assert(m.fks("cost").get("payer_plan_period_id")
      .contains("payer_plan_period"))                                     // #714
    // FKs to concept are excluded (etl_base.py:302-321)
    assert(!m.fks("person").contains("gender_concept_id"))
    assert(m.fks("visit_detail")("visit_occurrence_id") == "visit_occurrence")
  }

  test("schemas: DDL types from metadata, work-zone event columns as STRING") {
    val person = m.sparkSchema("person")
    assert(person.size == 18)
    assert(person("person_id") == StructField("person_id", LongType, nullable = false))
    assert(person("birth_datetime") == StructField("birth_datetime", TimestampType, nullable = true))
    val meas = m.workSchema("measurement")
    assert(m.sparkSchema("measurement")("measurement_event_id").dataType == LongType)
    assert(meas("measurement_event_id").dataType == StringType)
    assert(m.events("fact_relationship").size == 2)
    assert(m.clustering("person") ==
      Seq("gender_concept_id", "location_id", "race_concept_id", "person_id"))
  }

  test("natural keys: the four template special cases, else the PK") {
    assert(m.naturalKey("fact_relationship") == Seq("fact_id_1", "fact_id_2"))
    assert(m.naturalKey("death") == Seq("person_id"))
    assert(m.naturalKey("cdm_source") == Seq("cdm_source_name"))
    assert(m.naturalKey("episode_event") == Seq("episode_id"))
    assert(m.naturalKey("person") == Seq("person_id"))
    assert(m.naturalKey("visit_detail") == Seq("visit_detail_id"))
  }

  test("required columns and fk domains") {
    assert(m.requiredColumns("observation_period") ==
      Seq("observation_period_id", "person_id", "observation_period_start_date",
        "observation_period_end_date", "period_type_concept_id"))
    assert(m.fkDomains("person")("gender_concept_id") == Seq("gender"))
  }

  test("aux model (D2): lineage map + DQD results DDL from metadata") {
    val aux = Cdm54.aux
    assert(aux.tables == Seq("source_id_to_omop_id_map", "dqd_results"))
    val mapSchema = aux.sparkSchema("source_id_to_omop_id_map")
    assert(mapSchema.size == 7)
    assert(mapSchema("omop_id") == StructField("omop_id", LongType, nullable = false))
    assert(aux.clustering("source_id_to_omop_id_map") == Seq("omop_table", "omop_id"))
    assert(aux.sparkSchema("dqd_results")("pct_violated_rows").dataType == DoubleType)
  }

  test("tpch test model resolves into the expected levels") {
    val t = TpchModel.model
    assert(t.dependencyLevels(t.tables) == Seq(
      Seq("part", "region"), Seq("nation"), Seq("customer", "supplier"),
      Seq("orders"), Seq("lineitem")))
  }

  test("printTree renders one branch per table with level indentation") {
    val tree = m.printTree(m.etlTables)
    assert(tree.linesIterator.size == 28)
    assert(tree.startsWith("└──vocabulary\n"))
    assert(tree.contains(" " * 8 + "└──person")) // level 4, two spaces per level
  }
}
