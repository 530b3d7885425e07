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
    val zones = Zones.forPurpose("s12")
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
          // micro-quantized pct + threshold: presentation and the FAIL
          // compare both read quantized LONGs (r10 cross-engine sweep)
          graft.ops.SimOps.quantMicro(
            col("num_violated_rows").cast("double") / col("num_denominator_rows"))
            .as("__pm"),
          lit(threshold).as("threshold"))
    }.reduce(_ unionByName _)
      .withColumn("pct_violated", col("__pm").cast("double") / lit(1e6))
      .withColumn("status",
        when(col("__pm") > graft.ops.SimOps.quantMicro(col("threshold")),
          lit("FAIL")).otherwise(lit("PASS")))
      .drop("__pm")
      .orderBy("check_name")
  }

  private val Dqd = graft.operators.DqdChecks

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
    Dqd.TemporalRule("lineitem", "l_shipdate", "l_orderkey", "o_orderdate"))

  /** withinVisitDates over the test universe: a lineitem must ship within
    * 90 days of its order (the "visit window" is [o_orderdate - 90,
    * o_orderdate + 90]) — genuinely violated by late-shipping lineitems,
    * exercising the window machinery on real data.
    */
  private val dqdWithinVisit = Seq(
    Dqd.WithinVisitRule("lineitem", "l_shipdate", "l_orderkey",
      "o_orderdate", "o_orderdate", slackDays = 90))

  /** Concept-attribute conformance over the test universe — nation plays
    * the vocabulary: isStandardValidConcept demands a customer's nation be
    * in "standard" regions {0,1,2} (~40% violated, 50% tolerance -> PASS);
    * fkClass demands a supplier's nation be of "class" regions {0..3}
    * (~20% violated, hard zero -> FAIL). Both threshold outcomes exercised.
    */
  private val dqdConceptAttrs = Seq(
    Dqd.ConceptAttrRule("isStandardValidConcept", "customer", "c_nationkey",
      "nation", "n_nationkey", "n_regionkey", Seq("0", "1", "2"), excludeZero = false),
    Dqd.ConceptAttrRule("fkClass", "supplier", "s_nationkey",
      "nation", "n_nationkey", "n_regionkey", Seq("0", "1", "2", "3"), excludeZero = false))

  /** Record/source completeness over the test universe: zero-valued l_tax /
    * l_discount play the unmapped-sentinel role, and returnflags
    * co-occurring with tax 0 play the source-values-mapped-to-0 role.
    */
  private val dqdRecordCompleteness = Seq(
    Dqd.RecordCompletenessRule("standardConceptRecordCompleteness", "lineitem", "l_tax"),
    Dqd.RecordCompletenessRule("sourceConceptRecordCompleteness", "lineitem", "l_discount"))
  private val dqdSourceValues = Seq(
    Dqd.SourceValueRule("lineitem", "l_returnflag", "l_tax"),
    Dqd.SourceValueRule("events", "event_type", "value"))

  /** measureConditionEraCompleteness shape on real data: customers that
    * placed orders (the "occurrence" sibling) but have no events row (the
    * derived "era" table).
    */
  private val dqdSiblings = Seq(
    Dqd.SiblingCompletenessRule("measureConditionEraCompleteness",
      "events", "user_id", "orders", "o_custkey"))

  /** plausibleGender over the test universe: purchase events may come from
    * any market segment (passes), signup events are "expected" from two
    * segments only (~60% violated, 75% tolerance -> PASS with violations).
    */
  private val dqdGenders = Seq(
    Dqd.GenderRule("events", "event_type", "purchase", "user_id", "c_mktsegment",
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    Dqd.GenderRule("events", "event_type", "signup", "user_id", "c_mktsegment",
      Seq("AUTOMOBILE", "BUILDING")))

  /** plausibleGenderUseDescendants over the test universe — `part` plays
    * the CONCEPT_ANCESTOR closure (brand -> its parts = the "subtree"):
    * lineitems of parts descending from Brand#13 are "expected" on
    * urgent/high/medium orders only (~40% violated on uniform priorities,
    * 50% tolerance -> PASS with violations — vs the hard-zero path the
    * plain plausibleGender signup rule exercises).
    */
  private val dqdGenderDesc = Seq(
    Dqd.GenderDescRule("lineitem", "l_partkey", "part", "p_brand", "p_partkey",
      "Brand#13", "l_orderkey", "o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM")))

  /** fkDomain value lists for the test universe — the analogue of DQD's
    * fkDomain column. o_orderpriority's configured domain deliberately
    * omits '5-LOW' so the violation path is exercised on real data.
    */
  private val dqdDomains = Seq(
    Dqd.DomainRule("customer", "c_mktsegment",
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    Dqd.DomainRule("lineitem", "l_linestatus", Seq("F", "O")),
    Dqd.DomainRule("lineitem", "l_returnflag", Seq("A", "N", "R")),
    Dqd.DomainRule("orders", "o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED")),
    Dqd.DomainRule("orders", "o_orderstatus", Seq("F", "O", "P")),
    Dqd.DomainRule("events", "event_type",
      Seq("click", "error", "purchase", "signup", "view")))

  /** CONCEPT-level plausibility (DQD's Concept_Level.csv shape): per-
    * event-type plausible value ranges. purchase's [0, 300] upper bound is
    * genuinely exceeded in the data, exercising a concept-level failure;
    * click's [0, 500] passes.
    */
  private val dqdConcepts = Seq(
    Dqd.ConceptRule("events", "event_type", "click", "value",
      Some(0.0), Some(500.0)),
    Dqd.ConceptRule("events", "event_type", "purchase", "value",
      Some(0.0), Some(300.0)))

  /** plausibleUnitConceptIds over the test universe — the status/priority
    * columns play the unit: returned lineitems may carry either linestatus
    * (PASS), while finished orders are "expected" urgent/high priority only
    * (~70% violated -> the concept-level failure path on real data).
    */
  private val dqdUnits = Seq(
    Dqd.UnitRule("lineitem", "l_returnflag", "R", "l_linestatus", Seq("F", "O")),
    Dqd.UnitRule("orders", "o_orderstatus", "F", "o_orderpriority",
      Seq("1-URGENT", "2-HIGH")))

  /** measurePersonCompleteness over the test universe: customers with no
    * orders (TPC-H genuinely has them) and parts never shipped.
    */
  private val dqdCompleteness = Seq(
    Dqd.CompletenessRule("events", "user_id"),
    Dqd.CompletenessRule("lineitem", "l_partkey"),
    Dqd.CompletenessRule("orders", "o_custkey"))

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
    ("plausibleTemporalAfter", "lineitem", "l_shipdate") -> 10.0,
    ("withinVisitDates", "lineitem", "l_shipdate") -> 10.0,
    ("isStandardValidConcept", "customer", "c_nationkey") -> 50.0,
    ("standardConceptRecordCompleteness", "lineitem", "l_tax") -> 15.0,
    ("sourceValueCompleteness", "lineitem", "l_returnflag") -> 100.0,
    ("sourceValueCompleteness", "events", "event_type") -> 100.0,
    ("plausibleGender", "events", "event_type") -> 75.0,
    ("plausibleGenderUseDescendants", "lineitem", "l_partkey") -> 50.0)

  /** The full TPC-H-universe rule configuration — every DQD family
    * instantiated over real data.
    */
  private val dqdRules = Dqd.RuleSet(
    bounds = dqdBounds,
    temporal = dqdTemporal,
    domains = dqdDomains,
    completeness = dqdCompleteness,
    thresholds = dqdThresholds,
    concepts = dqdConcepts,
    withinVisit = dqdWithinVisit,
    conceptAttrs = dqdConceptAttrs,
    recordCompleteness = dqdRecordCompleteness,
    sourceValues = dqdSourceValues,
    siblings = dqdSiblings,
    genders = dqdGenders,
    genderDesc = dqdGenderDesc,
    units = dqdUnits)

  /** The CDM 5.4 rule configuration: every derivable family instantiated
    * from the vendored metadata — start/end pairs, person completeness,
    * plausibleAfterBirth/DuringLife over person/death, visit windows,
    * standard-concept validity from the fkDomains concept fields, the DQD
    * drug-era fkClass rules, condition-era completeness, and two
    * illustrative gender-specific concept rules (DQD Concept_Level shape).
    */
  def cdm54Rules: graft.operators.DqdChecks.RuleSet = {
    val m = graft.model.Cdm54.model
    Dqd.RuleSet(
      startEnd = Dqd.startEndRules(m),
      completeness = Dqd.personCompletenessRules(m),
      // r11: the four check types the CDM 5.4 battery still lacked (each
      // already shipped in the events battery): plausibleValueLow/High
      // from published Field_Level bounds, fkDomain over the two standard
      // gender concepts, the deprecated plausibleTemporalAfter name
      // (`data_quality.py:116` — published batteries still carry it) on
      // the visit_detail -> visit_occurrence timeline, and
      // plausibleGenderUseDescendants through the CONCEPT_ANCESTOR closure
      bounds = Map(
        ("person", "year_of_birth") -> (Some(1850.0), None),
        ("drug_exposure", "refills") -> (Some(0.0), Some(24.0)),
        ("drug_exposure", "days_supply") -> (Some(0.0), Some(365.0))),
      domains = Seq(
        Dqd.DomainRule("person", "gender_concept_id", Seq("8507", "8532"))),
      temporal = Dqd.afterBirthRules(m) ++ Seq(
        Dqd.TemporalRule("visit_detail", "visit_detail_start_date",
          "visit_occurrence_id", "visit_start_date")),
      genderDesc = Seq(
        Dqd.GenderDescRule("condition_occurrence", "condition_concept_id",
          "concept_ancestor", "ancestor_concept_id", "descendant_concept_id",
          "4163261", "person_id", "gender_concept_id", Seq("8507"))),
      // both the deprecated name and DQD 2.6's plausibleBeforeDeath
      // reimplementation run (the reference's battery carries the modern
      // check id; data_quality.py:113)
      duringLife = Dqd.duringLifeRules(m) ++ Dqd.beforeDeathRules(m),
      withinVisit = Dqd.withinVisitRules(m),
      conceptAttrs = Dqd.standardConceptRules(m) ++ Seq(
        Dqd.ConceptAttrRule("fkClass", "drug_era", "drug_concept_id",
          "concept", "concept_id", "concept_class_id", Seq("Ingredient")),
        Dqd.ConceptAttrRule("fkClass", "dose_era", "drug_concept_id",
          "concept", "concept_id", "concept_class_id", Seq("Ingredient"))),
      recordCompleteness = Dqd.recordCompletenessRules(m),
      sourceValues = Dqd.sourceValueRules(m),
      siblings = Seq(Dqd.SiblingCompletenessRule("measureConditionEraCompleteness",
        "condition_era", "person_id", "condition_occurrence", "person_id")),
      genders = Seq(
        Dqd.GenderRule("condition_occurrence", "condition_concept_id", "4163261",
          "person_id", "gender_concept_id", Seq("8507")),
        Dqd.GenderRule("condition_occurrence", "condition_concept_id", "194997",
          "person_id", "gender_concept_id", Seq("8532"))),
      // DQD Concept_Level plausibleUnitConceptIds shape: body weight in
      // g/kg, body height in cm/inch (illustrative published unit lists)
      units = Seq(
        Dqd.UnitRule("measurement", "measurement_concept_id", "3025315",
          "unit_concept_id", Seq("8504", "9529")),
        Dqd.UnitRule("measurement", "measurement_concept_id", "3036277",
          "unit_concept_id", Seq("8582", "9327"))))
  }

  /** The metadata-GENERATED check battery (TABLE-level cdmTable presence +
    * measurePersonCompleteness + FIELD-level cdmField / isRequired /
    * measureValueCompleteness / cdmDatatype / isPrimaryKey / isForeignKey /
    * plausibleValueLow/High / plausibleTemporalAfter / fkDomain derived
    * from the model, not hand-listed) — both sides of the oracle come from
    * [[graft.operators.DqdChecks]].
    */
  // The reference RUNS the check battery once and STORES the rows in the
  // dqd results table; every report surface (the per-check listing, the
  // run-level Overview) then reads that table (`data_quality.py:239-247`
  // store, `:280-320` overview over the stored rows). Mirror that: the
  // first battery consumer materializes the results into the dqd zone
  // through the atomic-replace protocol; later consumers read the table.
  // (Round 4 shared only the plan OBJECT — each consumer re-executed all
  // ~40 branch aggregates and, because the bench GCs between queries,
  // re-COMPILED them: dqd_overview alone measured 16 s at sf0.1.)
  private val batteryResults =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def generatedBattery(s: SparkSession, d: String): DataFrame =
    batteryResults.getOrElseUpdate((s, d), {
      val zones = Zones.forPurpose("dqd")
      val table = s"dqd_results_${Zones.pathKey(d)}"
      zones.write(
        Dqd.fieldLevel(TpchModel.modelWithEvents, tb => t(s, d, tb), dqdRules),
        "dqd", table)
      zones.read(s, "dqd", table)
    })

  // battery output is bounded metadata (one row per check) at ANY data
  // scale, so the report sort is a single-partition sort — orderBy would
  // plan a RangePartitioning exchange whose sampling pass re-executes the
  // whole multi-branch union subtree when AQE is off
  private def sortReport(df: DataFrame): DataFrame =
    df.coalesce(1).sortWithinPartitions("check_id")

  val dqdFieldLevel: Q = (s, d) => sortReport(generatedBattery(s, d))

  /** The same generator at FULL CDM 5.4 breadth: 39 tables / ~1200 checks
    * instantiated from the vendored metadata and run against the empty
    * typed frames the DDL generator itself produces (no CDM test data
    * exists) — presence checks fail, field checks pass on denominator 0.
    */
  val dqdCdm54Battery: Q = (s, _) => {
    val m = graft.model.Cdm54.model
    // This battery is plan-heavy and data-FREE: ~1.4k generated checks over
    // statically-empty relations compile thousands of Janino classes that
    // each evaluate zero rows — profiled at ~80% of wall time. Execute it
    // interpreted — on a FORKED session (newSession: shared SparkContext,
    // ISOLATED SQLConf; builder-time confs inherit via SparkConf). ADVICE
    // r5: mutating the shared session's conf around the collect would race
    // concurrent queries and could leak the disabled-codegen state. The
    // real-data battery (dqd_field_level) keeps codegen — there the
    // compiled code earns its cost per row.
    val s2 = s.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    // one shared empty relation per table (each is referenced by its own
    // aggregate AND as the parent of every FK edge pointing at it), built
    // against the clone so the whole plan executes under its conf
    val empty = m.tables.map { tb =>
      tb -> s2.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), m.sparkSchema(tb))
    }.toMap
    // every rule family is DERIVED from the CDM 5.4 metadata (field-name
    // conventions / person and visit FKs / the fkDomains concept fields),
    // the way DQD instantiates its families over the Field_Level CSV.
    // coalesce(1) on the statically-empty inputs: CoalesceExec(1) reports
    // SinglePartition, so every branch's global aggregate plans WITHOUT an
    // Exchange — the whole 39-branch battery runs as one shuffle-free job
    // instead of ~54 empty shuffle stages of pure scheduler overhead
    val plan = sortReport(Dqd.fieldLevel(m, tb => empty(tb).coalesce(1), cdm54Rules))
    val rows = plan.collect()
    // hand the materialized bounded report back on the CALLER's session
    s.createDataFrame(java.util.Arrays.asList(rows: _*), plan.schema)
  }

  /** Run-level Overview over the generated battery (`data_quality.py:
    * 280-320` — the numbers the reference's dashboard headline shows).
    */
  val dqdOverview: Q = (s, d) =>
    graft.operators.DqdChecks.overview(generatedBattery(s, d))

  /** The `--data-quality --json` export row shape
    * (`data_quality.py:391-421`): the dashboard-consumed projection of the
    * stored results — lowercased checkid, the per-check counts, the pct at
    * the export's 4-decimal rounding, and the passed/failed pair from the
    * threshold evaluation.
    */
  val dqdJsonRows: Q = (s, d) =>
    generatedBattery(s, d).select(
      lower(col("check_id")).as("checkid"),
      col("check_name"), col("check_level"), col("category"),
      col("cdm_table_name"), col("cdm_field_name"),
      col("num_violated_rows"), col("num_denominator_rows"),
      graft.ops.SimOps.roundUnits(col("num_violated_rows").cast("double") /
        greatest(col("num_denominator_rows"), lit(1L)), 1e4).as("pct_violated_rows"),
      col("threshold_value"),
      col("failed"),
      (lit(1L) - col("failed")).as("passed"))
      .coalesce(1).sortWithinPartitions("checkid")

  /** The run-history listing (`dqd/get_last_dqd_runs.sql.jinja` LIMIT 15
    * + the run summary the dashboard's run selector reads): record the
    * generated battery twice into a FRESH temp zone (determinism must not
    * depend on warm state from earlier JVMs) and list newest-first.
    * Timestamps are wall-clock and therefore dropped from the gated shape
    * (the ohdsi_benchmark_rows convention).
    */
  val dqdLastRuns: Q = (s, d) => {
    val zones = Zones(
      java.nio.file.Files.createTempDirectory("graft_dqd_runs").toString)
    val battery = generatedBattery(s, d)
    graft.operators.DqdChecks.recordRun(s, zones, battery)
    graft.operators.DqdChecks.recordRun(s, zones, battery)
    graft.operators.DqdChecks.lastRuns(s, zones).drop("run_timestamp")
  }

  /** The warehouse's versioned-store family registry (r17): one entry per
    * cross-JVM run-once store, CURRENT generation read from the writer's
    * own constant — a generation bump updates that one constant and the
    * vacuum retires the old directories. Un-versioned purposes (dedup,
    * dqd, etl, stream scratch a live memo may point at) are never
    * registered, so [[graft.io.StoreVacuum]] cannot touch them.
    */
  def storeFamilies: Seq[graft.io.StoreVacuum.Family] = Seq(
    graft.io.StoreVacuum.Family("ohdsicdm", OhdsiCdmQueries.CdmStoreGen),
    graft.io.StoreVacuum.Family("ohdsires", OhdsiCdmQueries.ResStoreGen),
    graft.io.StoreVacuum.Family("bpe", LlmQueries.BpeStoreGen),
    graft.io.StoreVacuum.Family("bkt", EventQueries.BktStoreGen))

  /** Purposes safe to retire wholesale: soak scratch written only by the
    * standalone soak mains, plus (r19, VERDICT #2) the ANN serving-tier
    * scratch purposes — `ivfgrow_*` / `ivfcomp_*` / `annserve_*` are
    * rebuilt unconditionally at the START of every invocation of their
    * owning entry (no cross-invocation read precedes a write), so a
    * long-lived warehouse no longer accumulates one serving tier per
    * dataset forever. The per-JVM memoized index tables
    * (`ivf_index_*` in the `dedup` purpose) stay out: `dedup` is shared
    * unversioned scratch the vacuum must never touch.
    */
  def ephemeralPurposes: Seq[String] =
    Seq("compactsoak", "annsoak", "ivfgrow", "ivfcomp", "annserve")

  /** Artifact-store retention (r17, VERDICT "next round" #4): vacuum the
    * REAL warehouse — superseded generations of every registered family
    * drop, current stores and unregistered purposes survive untouched —
    * then prove the read-after-vacuum contract on a synthetic 3-generation
    * family built beside them: after the vacuum, exactly the current
    * generation's directory remains and its table reads back intact
    * (the oracle pins both the survivor listing and the payload rows).
    * Deterministic: re-running rebuilds the demo generations, drops the
    * same two, and returns the same frame; the real-family vacuum is
    * idempotent (a second pass finds nothing superseded).
    */
  val storeVacuum: Q = (s, d) => {
    import s.implicits._
    val key = Zones.pathKey(d)
    for (g <- 1 to 3) {
      val z = Zones.forPurpose(s"vacdemo${g}_$key")
      z.write((0L until 10L).map(i => (i, i * g)).toDF("id", "v"),
        "work", "payload")
    }
    val fams = storeFamilies :+
      graft.io.StoreVacuum.Family("vacdemo", "vacdemo3")
    graft.io.StoreVacuum.vacuum(s, Zones.defaultRoot, fams, ephemeralPurposes)
    // scope to THIS dataset's key: another dataset's current vacdemo3
    // store rightly survives the vacuum (per-dataset suffixes are all
    // current-generation) and must not leak into this gated listing
    val survivors = graft.io.StoreVacuum.listPurposes(s, Zones.defaultRoot)
      .filter(p => p.startsWith("vacdemo") && p.endsWith(s"_$key"))
      .map(_.stripSuffix(s"_$key"))
    val dirRows = survivors.map(g => ("dir", g, -1L, -1L))
      .toDF("kind", "gen", "id", "v")
    // read-after-vacuum: the CURRENT generation's content is intact
    val payload = Zones.forPurpose(s"vacdemo3_$key").read(s, "work", "payload")
      .select(lit("row").as("kind"), lit("payload").as("gen"),
        col("id"), col("v"))
    dirRows.unionByName(payload).orderBy("kind", "id")
  }

  val defs: Seq[(String, Q)] = Seq(
    "store_vacuum" -> storeVacuum,
    "dqd_last_runs" -> dqdLastRuns,
    "dqd_field_level" -> dqdFieldLevel,
    "dqd_overview" -> dqdOverview,
    "dqd_json_rows" -> dqdJsonRows,
    "dqd_cdm54_battery" -> dqdCdm54Battery,
    "cleanup_cascade" -> cleanupCascade,
    "cleanup_custom_concepts" -> cleanupCustomConcepts,
    "s2cm_tombstone" -> s2cmTombstone,
    "metadata_version" -> metadataVersion,
    "work_table_listing" -> workTableListing,
    "dqd_config_driven" -> dqdConfigDriven)

  val oracles: Seq[(String, String)] = Seq(
    "store_vacuum" ->
      """SELECT 'dir' AS kind, 'vacdemo3' AS gen,
        |  CAST(-1 AS BIGINT) AS id, CAST(-1 AS BIGINT) AS v
        |UNION ALL
        |SELECT 'row', 'payload', CAST(i AS BIGINT), CAST(i * 3 AS BIGINT)
        |FROM (SELECT unnest(generate_series(0, 9)) AS i)
        |ORDER BY kind, id""".stripMargin,
    "dqd_last_runs" -> {
      val ov = Dqd.overviewOracleSql(Dqd.oracleSql(TpchModel.modelWithEvents, dqdRules))
      s"""WITH ov AS (
         |$ov
         |)
         |SELECT CAST(2 AS BIGINT) AS run_id, ov.* FROM ov
         |UNION ALL
         |SELECT CAST(1 AS BIGINT) AS run_id, ov.* FROM ov
         |ORDER BY run_id DESC""".stripMargin
    },
    "dqd_field_level" -> Dqd.oracleSql(TpchModel.modelWithEvents, dqdRules),
    "dqd_overview" -> Dqd.overviewOracleSql(
      Dqd.oracleSql(TpchModel.modelWithEvents, dqdRules)),
    "dqd_json_rows" ->
      s"""WITH battery AS (
         |${Dqd.oracleSql(TpchModel.modelWithEvents, dqdRules)}
         |)
         |SELECT lower(check_id) AS checkid,
         |  check_name, check_level, category, cdm_table_name, cdm_field_name,
         |  num_violated_rows, num_denominator_rows,
         |  floor(CAST(num_violated_rows AS DOUBLE) / greatest(num_denominator_rows, 1) * 1e4 + 0.5) / 1e4
         |    AS pct_violated_rows,
         |  threshold_value, failed,
         |  CAST(1 - failed AS BIGINT) AS passed
         |FROM battery ORDER BY checkid""".stripMargin,
    "dqd_cdm54_battery" ->
      Dqd.emptyUniverseOracleSql(graft.model.Cdm54.model, cdm54Rules),
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
        |  floor(CAST(num_violated_rows AS DOUBLE) / num_denominator_rows * 1e6 + 0.5) / 1e6
        |    AS pct_violated,
        |  CAST(threshold AS DOUBLE) AS threshold,
        |  CASE WHEN floor(CAST(num_violated_rows AS DOUBLE) / num_denominator_rows * 1e6 + 0.5)
        |      > floor(CAST(threshold AS DOUBLE) * 1e6 + 0.5)
        |    THEN 'FAIL' ELSE 'PASS' END AS status
        |FROM checks ORDER BY check_name""".stripMargin)
}
