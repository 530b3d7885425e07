package graft.queries

import graft.Tables
import graft.model.{Cdm54, TpchModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-driven queries (S5/P1/P3/D1 + the DAG planner): everything here
  * is GENERATED from a [[graft.model.CdmModel]] — the oracle SQL pins the
  * generator's output against an independently hand-written expectation.
  */
object CdmQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** The ETL scheduler's input: the CDM 5.4 FK dependency DAG resolved into
    * barrier levels (`etl_base.py:155-218`; shape documented at
    * `README.md:44-73`, updated for the FK patches + ERA edges).
    */
  val cdmLevels: Q = (s, _) => {
    import s.implicits._
    Cdm54.model.dependencyLevels(Cdm54.model.etlTables)
      .zipWithIndex
      .flatMap { case (tables, i) => tables.map(t => (i.toLong, t)) }
      .toDF("level", "table_name")
      .orderBy("level", "table_name")
  }

  /** P1+P3: metadata-driven projection — the SELECT list and the
    * required-FK `IFNULL(col, 0)` defaults are generated from the model
    * (`{omop_table}_merge.sql.jinja:22-67` + `:34-53`), not hand-written.
    */
  val cdmProjection: Q = (s, d) => {
    val m = TpchModel.model
    val t = "customer"
    val cols = m.columns(t).map { c =>
      if (m.fks(t).contains(c) && m.requiredColumns(t).contains(c))
        coalesce(col(c).cast("long"), lit(0L)).as(c)
      else col(c)
    }
    Tables.load(s, d, t).select(cols: _*).orderBy(m.pk(t).get)
  }

  /** D1: DDL-as-data — the generated schema rows for two CDM 5.4 tables,
    * pinned by a literal oracle (the full 39-table model is unit-tested in
    * CdmModelSpec; this entry proves the generator's output byte-for-byte).
    */
  val cdmDdlSchemas: Q = (s, _) => {
    import s.implicits._
    val m = Cdm54.model
    Seq("person", "observation_period")
      .flatMap { t =>
        m.columns(t).zipWithIndex.map { case (c, i) =>
          val f = m.fields.find(x => x.table == t && x.name == c).get
          (t, (i + 1).toLong, c, f.datatype, f.required)
        }
      }
      .toDF("table_name", "ordinal", "column_name", "data_type", "is_required")
      .orderBy("table_name", "ordinal")
  }

  /** D4: work-zone DDL-as-data — the generated WORK schema of two event
    * tables, where polymorphic event FK columns are retyped STRING because
    * they hold *source* keys until stage 2 rewrites them
    * (`{omop_work}_ddl.sql.jinja:3-25`). Pinned by a literal oracle like
    * [[cdmDdlSchemas]]; note `event_id` / `note_event_id` flip from the CDM
    * schema's int64 to string.
    */
  val cdmWorkDdl: Q = (s, _) => {
    import s.implicits._
    val m = Cdm54.model
    def typeName(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case org.apache.spark.sql.types.LongType      => "int64"
      case org.apache.spark.sql.types.DoubleType    => "float64"
      case org.apache.spark.sql.types.DateType      => "date"
      case org.apache.spark.sql.types.TimestampType => "datetime"
      case _                                        => "string"
    }
    Seq("episode_event", "note")
      .flatMap { t =>
        m.workSchema(t).fields.zipWithIndex.map { case (f, i) =>
          (t, (i + 1).toLong, f.name, typeName(f.dataType), !f.nullable)
        }
      }
      .toDF("table_name", "ordinal", "column_name", "data_type", "is_required")
      .orderBy("table_name", "ordinal")
  }

  /** The `--print-etl-flow` rendering (`etl_base.py:220-230`, shape
    * documented at `README.md:44-73`): the level tree as numbered lines,
    * pinned — like [[cdmLevels]] — by a hand-written literal oracle.
    */
  val etlFlowPrint: Q = (s, _) => {
    import s.implicits._
    graft.cli.GraftCli.printEtlFlow().linesIterator.toSeq.zipWithIndex
      .map { case (l, i) => ((i + 1).toLong, l) }
      .toDF("line_no", "line")
      .orderBy("line_no")
  }

  val defs: Seq[(String, Q)] = Seq(
    "cdm_levels" -> cdmLevels,
    "cdm_projection" -> cdmProjection,
    "cdm_ddl_schemas" -> cdmDdlSchemas,
    "cdm_work_ddl" -> cdmWorkDdl,
    "etl_flow_print" -> etlFlowPrint)

  val oracles: Seq[(String, String)] = Seq(
    "etl_flow_print" ->
      """SELECT CAST(line_no AS BIGINT) AS line_no, line FROM (VALUES
        |  (1,  '└──vocabulary'),
        |  (2,  '  ├──cdm_source'),
        |  (3,  '  ├──fact_relationship'),
        |  (4,  '  ├──location'),
        |  (5,  '  └──metadata'),
        |  (6,  '    └──care_site'),
        |  (7,  '      └──provider'),
        |  (8,  '        └──person'),
        |  (9,  '          ├──death'),
        |  (10, '          ├──episode'),
        |  (11, '          ├──observation_period'),
        |  (12, '          ├──payer_plan_period'),
        |  (13, '          ├──specimen'),
        |  (14, '          └──visit_occurrence'),
        |  (15, '            ├──cost'),
        |  (16, '            ├──episode_event'),
        |  (17, '            └──visit_detail'),
        |  (18, '              ├──condition_occurrence'),
        |  (19, '              ├──device_exposure'),
        |  (20, '              ├──drug_exposure'),
        |  (21, '              ├──measurement'),
        |  (22, '              ├──note'),
        |  (23, '              ├──observation'),
        |  (24, '              └──procedure_occurrence'),
        |  (25, '                ├──condition_era'),
        |  (26, '                ├──dose_era'),
        |  (27, '                ├──drug_era'),
        |  (28, '                └──note_nlp')
        |) AS t(line_no, line) ORDER BY line_no""".stripMargin,
    "cdm_levels" ->
      """SELECT CAST(level AS BIGINT) AS level, table_name FROM (VALUES
        |  (0, 'vocabulary'),
        |  (1, 'cdm_source'), (1, 'fact_relationship'), (1, 'location'), (1, 'metadata'),
        |  (2, 'care_site'),
        |  (3, 'provider'),
        |  (4, 'person'),
        |  (5, 'death'), (5, 'episode'), (5, 'observation_period'),
        |  (5, 'payer_plan_period'), (5, 'specimen'), (5, 'visit_occurrence'),
        |  (6, 'cost'), (6, 'episode_event'), (6, 'visit_detail'),
        |  (7, 'condition_occurrence'), (7, 'device_exposure'), (7, 'drug_exposure'),
        |  (7, 'measurement'), (7, 'note'), (7, 'observation'), (7, 'procedure_occurrence'),
        |  (8, 'condition_era'), (8, 'dose_era'), (8, 'drug_era'), (8, 'note_nlp')
        |) AS t(level, table_name) ORDER BY level, table_name""".stripMargin,
    "cdm_projection" ->
      """SELECT c_custkey, c_name, CAST(COALESCE(c_nationkey, 0) AS BIGINT) AS c_nationkey,
        |  c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "cdm_ddl_schemas" ->
      """SELECT table_name, CAST(ordinal AS BIGINT) AS ordinal, column_name, data_type, is_required
        |FROM (VALUES
        |  ('person', 1, 'person_id', 'int64', true),
        |  ('person', 2, 'gender_concept_id', 'int64', true),
        |  ('person', 3, 'year_of_birth', 'int64', true),
        |  ('person', 4, 'month_of_birth', 'int64', false),
        |  ('person', 5, 'day_of_birth', 'int64', false),
        |  ('person', 6, 'birth_datetime', 'datetime', false),
        |  ('person', 7, 'race_concept_id', 'int64', true),
        |  ('person', 8, 'ethnicity_concept_id', 'int64', true),
        |  ('person', 9, 'location_id', 'int64', false),
        |  ('person', 10, 'provider_id', 'int64', false),
        |  ('person', 11, 'care_site_id', 'int64', false),
        |  ('person', 12, 'person_source_value', 'string', false),
        |  ('person', 13, 'gender_source_value', 'string', false),
        |  ('person', 14, 'gender_source_concept_id', 'int64', false),
        |  ('person', 15, 'race_source_value', 'string', false),
        |  ('person', 16, 'race_source_concept_id', 'int64', false),
        |  ('person', 17, 'ethnicity_source_value', 'string', false),
        |  ('person', 18, 'ethnicity_source_concept_id', 'int64', false),
        |  ('observation_period', 1, 'observation_period_id', 'int64', true),
        |  ('observation_period', 2, 'person_id', 'int64', true),
        |  ('observation_period', 3, 'observation_period_start_date', 'date', true),
        |  ('observation_period', 4, 'observation_period_end_date', 'date', true),
        |  ('observation_period', 5, 'period_type_concept_id', 'int64', true)
        |) AS t(table_name, ordinal, column_name, data_type, is_required)
        |ORDER BY table_name, ordinal""".stripMargin,
    "cdm_work_ddl" ->
      """SELECT table_name, CAST(ordinal AS BIGINT) AS ordinal, column_name, data_type, is_required
        |FROM (VALUES
        |  ('episode_event', 1, 'episode_id', 'int64', true),
        |  ('episode_event', 2, 'event_id', 'string', true),
        |  ('episode_event', 3, 'episode_event_field_concept_id', 'int64', true),
        |  ('note', 1, 'note_id', 'int64', true),
        |  ('note', 2, 'person_id', 'int64', true),
        |  ('note', 3, 'note_date', 'date', true),
        |  ('note', 4, 'note_datetime', 'datetime', false),
        |  ('note', 5, 'note_type_concept_id', 'int64', true),
        |  ('note', 6, 'note_class_concept_id', 'int64', true),
        |  ('note', 7, 'note_title', 'string', false),
        |  ('note', 8, 'note_text', 'string', true),
        |  ('note', 9, 'encoding_concept_id', 'int64', true),
        |  ('note', 10, 'language_concept_id', 'int64', true),
        |  ('note', 11, 'provider_id', 'int64', false),
        |  ('note', 12, 'visit_occurrence_id', 'int64', false),
        |  ('note', 13, 'visit_detail_id', 'int64', false),
        |  ('note', 14, 'note_source_value', 'string', false),
        |  ('note', 15, 'note_event_id', 'string', false),
        |  ('note', 16, 'note_event_field_concept_id', 'int64', false)
        |) AS t(table_name, ordinal, column_name, data_type, is_required)
        |ORDER BY table_name, ordinal""".stripMargin)
}
