package graft.queries

import graft.Tables
import graft.io.Zones
import graft.model.TpchModel
import graft.operators.{Cleanup, Swap}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle + housekeeping queries: D5 cleanup cascade, P6 custom-concept
  * removal, D7 tombstoning and version stamping, S12 work-table listing,
  * and the config-driven DQD battery (P4/A7 over a check table, the
  * `data_quality.py:57-109` shape).
  */
object LifecycleQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** D5: targeted cleanup of `nation` — the cascade set is the target plus
    * every table in later dependency levels; cascaded tables are truncated
    * (0 rows), the rest keep their data.
    */
  val cleanupCascade: Q = (s, d) => {
    val m = TpchModel.model
    val cascade = Cleanup.cascadeTables(m, m.tables, "nation").toSet
    m.tables.sorted.map { tb =>
      val inCascade = cascade.contains(tb)
      t(s, d, tb)
        .agg(count(lit(1)).as("cnt"))
        .select(
          lit(tb).as("table_name"),
          lit(inCascade).as("in_cascade"),
          (if (inCascade) lit(0L) else col("cnt")).as("n_rows_after"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }

  /** P6 removal: standard concepts survive, RiaB-generated customs
    * (>= 2e9) are dropped.
    */
  val cleanupCustomConcepts: Q = (s, d) => {
    val standard = t(s, d, "nation").select(
      col("n_nationkey").cast("long").as("concept_id"),
      col("n_name").as("concept_name"))
    val custom = Swap.rankIds(
      t(s, d, "part").select(col("p_type")), "p_type",
      graft.operators.MergeOps.CustomConceptBase)
      .select(col("concept_id"), col("p_type").as("concept_name"))
    Cleanup.removeCustomConcepts(standard.unionByName(custom), "concept_id")
      .orderBy("concept_id")
  }

  /** D7: tombstone mappings older than the ETL start. */
  val s2cmTombstone: Q = (s, d) => {
    val s2cm = t(s, d, "orders").select(
      col("o_orderkey").as("source_code"),
      col("o_custkey").as("target_concept_id"),
      col("o_orderdate").cast("date").as("valid_start_date"),
      lit(null).cast("string").as("invalid_reason"))
    Cleanup.tombstoneStale(s2cm, lit("1995-06-01").cast("date"))
      .orderBy("source_code")
  }

  /** D7: the 1-row version-metadata record (deterministic "now"). */
  val metadataVersion: Q = (s, _) =>
    Cleanup.versionMetadata(
      s, "5.4", "0.1.0",
      java.sql.Date.valueOf("2026-01-01"),
      java.sql.Timestamp.valueOf("2026-01-01 12:00:00"))

  /** S12: work-zone table listing through the zone namespace (bounded
    * directory metadata, the INFORMATION_SCHEMA analogue).
    */
  val workTableListing: Q = (s, d) => {
    import s.implicits._
    val zones = Zones("/root/repo/target/graft_zones_s12")
    val nation = t(s, d, "nation").limit(1)
    zones.write(nation, "work", "person__upload__q1")
    zones.write(nation, "work", "person__gender_concept_id_usagi")
    zones.write(nation, "work", "person_id_swap")
    zones.listTables(s, "work").toDF("table_name").orderBy("table_name")
  }

  /** P4+A7 config-driven: the check battery comes from a CHECK CONFIG CSV —
    * staged, read back through a typed schema, and collected row-by-row to
    * drive one aggregate per check, exactly the reference's DQD shape
    * (check CSVs loaded at `data_quality.py:57-109`, per-row render+run
    * `:219-237`, per-check thresholds `:322-347`). The config is bounded
    * metadata; the data-side work is one unioned plan of 8 aggregates.
    */
  val dqdConfigDriven: Q = (s, d) => {
    import java.nio.file.{Files, Paths}
    val configCsv = Seq(
      "check_name,cdm_table,category,evaluation_filter,threshold",
      "completeness_priority,orders,Completeness,o_orderpriority IS NULL,0.05",
      "completeness_props,events,Completeness,props IS NULL,0.05",
      "conformance_linestatus,lineitem,Conformance,l_linestatus NOT IN ('O'; 'F'),0.0",
      "conformance_status,orders,Conformance,o_orderstatus NOT IN ('O'; 'F'; 'P'),0.0",
      "plausible_acctbal_range,customer,Plausibility,c_acctbal < -1000 OR c_acctbal > 10000,0.1",
      "plausible_price_pos,orders,Plausibility,o_totalprice <= 0,0.0",
      "plausible_qty_range,lineitem,Plausibility,l_quantity < 0 OR l_quantity > 50,0.02",
      "plausible_value_nonneg,events,Plausibility,value < 0,0.3")
    Files.createDirectories(Paths.get(SourceQueries.StageDir))
    Files.write(Paths.get(s"${SourceQueries.StageDir}/dqd_checks.csv"),
      configCsv.mkString("\n").getBytes("UTF-8"))
    // ';' stands in for ',' inside predicates so the config stays 1-line-per-row CSV
    val config = s.read.option("header", "true")
      .csv(s"${SourceQueries.StageDir}/dqd_checks.csv")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3).replace(";", ","), r.getString(4).toDouble))
    config.toSeq.map { case (name, table, category, predicate, threshold) =>
      t(s, d, table)
        .agg(
          count(when(expr(predicate), 1)).as("num_violated_rows"),
          count(lit(1)).as("num_denominator_rows"))
        .select(
          lit(name).as("check_name"),
          lit(category).as("category"),
          col("num_violated_rows"),
          col("num_denominator_rows"),
          round(col("num_violated_rows").cast("double") / col("num_denominator_rows"), 6)
            .as("pct_violated"),
          lit(threshold).as("threshold"))
    }.reduce(_ unionByName _)
      .withColumn("status",
        when(col("pct_violated") > col("threshold"), lit("FAIL")).otherwise(lit("PASS")))
      .orderBy("check_name")
  }

  /** Per-field plausible-value bounds for the generated battery — the
    * analogue of DQD's per-row threshold columns.
    */
  private val dqdBounds: graft.operators.DqdChecks.Bounds = Map(
    ("lineitem", "l_quantity") -> (Some(0.0), Some(60.0)),
    ("lineitem", "l_discount") -> (Some(0.0), Some(0.5)),
    ("orders", "o_totalprice") -> (Some(0.0), None),
    ("customer", "c_acctbal") -> (Some(-2000.0), Some(12000.0)),
    ("events", "value") -> (Some(0.0), Some(400.0)))

  /** The single cross-table temporal rule the test universe supports: a
    * lineitem must not ship before its order was placed.
    */
  private val dqdTemporal = Seq(
    graft.operators.DqdChecks.TemporalRule("lineitem", "l_shipdate", "l_orderkey", "o_orderdate"))

  /** fkDomain value lists for the test universe — the analogue of DQD's
    * fkDomain column. o_orderpriority's configured domain deliberately
    * omits '5-LOW' so the violation path is exercised on real data.
    */
  private val dqdDomains = Seq(
    graft.operators.DqdChecks.DomainRule("customer", "c_mktsegment",
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    graft.operators.DqdChecks.DomainRule("lineitem", "l_linestatus", Seq("F", "O")),
    graft.operators.DqdChecks.DomainRule("lineitem", "l_returnflag", Seq("A", "N", "R")),
    graft.operators.DqdChecks.DomainRule("orders", "o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED")),
    graft.operators.DqdChecks.DomainRule("orders", "o_orderstatus", Seq("F", "O", "P")),
    graft.operators.DqdChecks.DomainRule("events", "event_type",
      Seq("click", "error", "purchase", "signup", "view")))

  /** CONCEPT-level plausibility (DQD's Concept_Level.csv shape): per-
    * event-type plausible value ranges. purchase's [0, 300] upper bound is
    * genuinely exceeded in the data, exercising a concept-level failure;
    * click's [0, 500] passes.
    */
  private val dqdConcepts = Seq(
    graft.operators.DqdChecks.ConceptRule("events", "event_type", "click", "value",
      Some(0.0), Some(500.0)),
    graft.operators.DqdChecks.ConceptRule("events", "event_type", "purchase", "value",
      Some(0.0), Some(300.0)))

  /** measurePersonCompleteness over the test universe: customers with no
    * orders (TPC-H genuinely has them) and parts never shipped.
    */
  private val dqdCompleteness = Seq(
    graft.operators.DqdChecks.CompletenessRule("events", "user_id"),
    graft.operators.DqdChecks.CompletenessRule("lineitem", "l_partkey"),
    graft.operators.DqdChecks.CompletenessRule("orders", "o_custkey"))

  /** Per-check failure tolerances (DQD's `{checkName}Threshold` semantics,
    * `data_quality.py:322-347`): the configured o_orderpriority domain
    * knowingly omits '5-LOW' (~20% of rows) so a 25% tolerance makes that
    * check PASS, while ~49% of lineitems "ship" before their order date in
    * the synthetic data, so a 10% tolerance on the temporal check is
    * exceeded and it still FAILS — both threshold outcomes are exercised
    * on real data.
    */
  private val dqdThresholds: graft.operators.DqdChecks.Thresholds = Map(
    ("fkDomain", "orders", "o_orderpriority") -> 25.0,
    ("plausibleTemporalAfter", "lineitem", "l_shipdate") -> 10.0)

  /** The metadata-GENERATED check battery (TABLE-level cdmTable presence +
    * measurePersonCompleteness + FIELD-level cdmField / isRequired /
    * measureValueCompleteness / cdmDatatype / isPrimaryKey / isForeignKey /
    * plausibleValueLow/High / plausibleTemporalAfter / fkDomain derived
    * from the model, not hand-listed) — both sides of the oracle come from
    * [[graft.operators.DqdChecks]].
    */
  // one analyzed battery plan per (session, dir): dqd_field_level and
  // dqd_overview share the DataFrame OBJECT (plan + codegen'd classes),
  // never results — each action re-executes against the live tables
  private val batteryPlans =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def generatedBattery(s: SparkSession, d: String): DataFrame =
    batteryPlans.getOrElseUpdate((s, d),
      graft.operators.DqdChecks.fieldLevel(TpchModel.modelWithEvents, tb => t(s, d, tb), dqdBounds,
        dqdTemporal, domains = dqdDomains, completeness = dqdCompleteness,
        thresholds = dqdThresholds, concepts = dqdConcepts))

  val dqdFieldLevel: Q = (s, d) => generatedBattery(s, d).orderBy("check_id")

  /** The same generator at FULL CDM 5.4 breadth: 39 tables / ~1200 checks
    * instantiated from the vendored metadata and run against the empty
    * typed frames the DDL generator itself produces (no CDM test data
    * exists) — presence checks fail, field checks pass on denominator 0.
    */
  val dqdCdm54Battery: Q = (s, _) => {
    val m = graft.model.Cdm54.model
    // one shared empty relation per table (each is referenced by its own
    // aggregate AND as the parent of every FK edge pointing at it)
    val empty = m.tables.map { tb =>
      tb -> s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), m.sparkSchema(tb))
    }.toMap
    // start/end pairs and person-completeness rules are DERIVED from the
    // CDM 5.4 metadata (field-name convention / person_id FKs), the way
    // DQD instantiates those families over its Field_Level CSV
    graft.operators.DqdChecks.fieldLevel(m, empty(_),
      startEnd = graft.operators.DqdChecks.startEndRules(m),
      completeness = graft.operators.DqdChecks.personCompletenessRules(m))
      .orderBy("check_id")
  }

  /** Run-level Overview over the generated battery (`data_quality.py:
    * 280-320` — the numbers the reference's dashboard headline shows).
    */
  val dqdOverview: Q = (s, d) =>
    graft.operators.DqdChecks.overview(generatedBattery(s, d))

  val defs: Seq[(String, Q)] = Seq(
    "dqd_field_level" -> dqdFieldLevel,
    "dqd_overview" -> dqdOverview,
    "dqd_cdm54_battery" -> dqdCdm54Battery,
    "cleanup_cascade" -> cleanupCascade,
    "cleanup_custom_concepts" -> cleanupCustomConcepts,
    "s2cm_tombstone" -> s2cmTombstone,
    "metadata_version" -> metadataVersion,
    "work_table_listing" -> workTableListing,
    "dqd_config_driven" -> dqdConfigDriven)

  val oracles: Seq[(String, String)] = Seq(
    "dqd_field_level" -> graft.operators.DqdChecks.oracleSql(TpchModel.modelWithEvents, dqdBounds,
      dqdTemporal, domains = dqdDomains, completeness = dqdCompleteness,
      thresholds = dqdThresholds, concepts = dqdConcepts),
    "dqd_overview" -> graft.operators.DqdChecks.overviewOracleSql(
      graft.operators.DqdChecks.oracleSql(TpchModel.modelWithEvents, dqdBounds, dqdTemporal,
        domains = dqdDomains, completeness = dqdCompleteness, thresholds = dqdThresholds,
        concepts = dqdConcepts)),
    "dqd_cdm54_battery" ->
      graft.operators.DqdChecks.emptyUniverseOracleSql(graft.model.Cdm54.model,
        startEnd = graft.operators.DqdChecks.startEndRules(graft.model.Cdm54.model),
        completeness = graft.operators.DqdChecks.personCompletenessRules(graft.model.Cdm54.model)),
    "cleanup_cascade" ->
      """SELECT table_name, in_cascade, CAST(n_rows_after AS BIGINT) AS n_rows_after FROM (VALUES
        |  ('customer', true, 0),
        |  ('lineitem', true, 0),
        |  ('nation', true, 0),
        |  ('orders', true, 0),
        |  ('part', false, (SELECT count(*) FROM part)),
        |  ('region', false, (SELECT count(*) FROM region)),
        |  ('supplier', true, 0)
        |) AS t(table_name, in_cascade, n_rows_after) ORDER BY table_name""".stripMargin,
    "cleanup_custom_concepts" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS concept_id, n_name AS concept_name
        |FROM nation ORDER BY concept_id""".stripMargin,
    "s2cm_tombstone" ->
      """SELECT o_orderkey AS source_code, o_custkey AS target_concept_id,
        |  CAST(o_orderdate AS DATE) AS valid_start_date,
        |  CASE WHEN CAST(o_orderdate AS DATE) < DATE '1995-06-01' THEN 'D' ELSE NULL END AS invalid_reason
        |FROM orders ORDER BY source_code""".stripMargin,
    "metadata_version" ->
      """SELECT 'RIAB_VERSION' AS metadata_id,
        |  'RIAB_OMOPCDM5.4' AS metadata_concept_id,
        |  'RIAB_EHR' AS metadata_type_concept_id,
        |  'Rabbit-in-a-Blender version' AS name,
        |  '0.1.0' AS value_as_string,
        |  CAST(NULL AS VARCHAR) AS value_as_concept_id,
        |  CAST(NULL AS DOUBLE) AS value_as_number,
        |  DATE '2026-01-01' AS metadata_date,
        |  TIMESTAMP '2026-01-01 12:00:00' AS metadata_datetime""".stripMargin,
    "work_table_listing" ->
      """SELECT table_name FROM (VALUES
        |  ('person__gender_concept_id_usagi'), ('person__upload__q1'), ('person_id_swap')
        |) AS t(table_name) ORDER BY table_name""".stripMargin,
    "dqd_config_driven" ->
      """WITH checks AS (
        |  SELECT 'completeness_priority' AS check_name, 'Completeness' AS category,
        |    count(*) FILTER (WHERE o_orderpriority IS NULL) AS num_violated_rows,
        |    count(*) AS num_denominator_rows, 0.05 AS threshold FROM orders
        |  UNION ALL
        |  SELECT 'completeness_props', 'Completeness',
        |    count(*) FILTER (WHERE props IS NULL), count(*), 0.05 FROM events
        |  UNION ALL
        |  SELECT 'conformance_linestatus', 'Conformance',
        |    count(*) FILTER (WHERE l_linestatus NOT IN ('O', 'F')), count(*), 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'conformance_status', 'Conformance',
        |    count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')), count(*), 0.0 FROM orders
        |  UNION ALL
        |  SELECT 'plausible_acctbal_range', 'Plausibility',
        |    count(*) FILTER (WHERE c_acctbal < -1000 OR c_acctbal > 10000), count(*), 0.1 FROM customer
        |  UNION ALL
        |  SELECT 'plausible_price_pos', 'Plausibility',
        |    count(*) FILTER (WHERE o_totalprice <= 0), count(*), 0.0 FROM orders
        |  UNION ALL
        |  SELECT 'plausible_qty_range', 'Plausibility',
        |    count(*) FILTER (WHERE l_quantity < 0 OR l_quantity > 50), count(*), 0.02 FROM lineitem
        |  UNION ALL
        |  SELECT 'plausible_value_nonneg', 'Plausibility',
        |    count(*) FILTER (WHERE value < 0), count(*), 0.3 FROM events
        |)
        |SELECT check_name, category, num_violated_rows, num_denominator_rows,
        |  round(CAST(num_violated_rows AS DOUBLE) / num_denominator_rows, 6) AS pct_violated,
        |  CAST(threshold AS DOUBLE) AS threshold,
        |  CASE WHEN round(CAST(num_violated_rows AS DOUBLE) / num_denominator_rows, 6) > threshold
        |    THEN 'FAIL' ELSE 'PASS' END AS status
        |FROM checks ORDER BY check_name""".stripMargin)
}
