package graft.model

import org.apache.spark.sql.types._
import scala.io.Source

/** One field of a relational model table — the engine's schema-as-data unit
  * (the reference drives everything off the OMOP CDM Field_Level CSV,
  * `/root/reference/src/riab/etl/etl_base.py:82-96`).
  */
final case class CdmField(
    table: String,
    name: String,
    datatype: String,
    required: Boolean,
    isPk: Boolean,
    fkTable: Option[String],
    schema: String)

/** Metadata-driven model: column lists, PKs, FKs, required flags, FK
  * domains, polymorphic event columns, physical clustering — and the
  * FK-dependency DAG resolved into parallel-executable levels.
  *
  * Faithful re-expression of the reference's metadata layer
  * (`/root/reference/src/riab/etl/etl_base.py:56-347`): the accessors mirror
  * `_get_omop_column_names` (:232), `_get_required_omop_column_names`
  * (:246), `_is_pk_auto_numbering` (:260), `_get_pk` (:283), `_get_fks`
  * (:302, which excludes FKs to the concept table), `_get_fk_domains`
  * (:323), and [[dependencyLevels]] ports
  * `_build_fk_dependency_tree_of_tables` (:172-218) including the ERA-table
  * extra edges (:192-195) and the circular-reference error (:211-212).
  *
  * The class is generic over any table universe — [[Cdm54]] instantiates it
  * with the vendored OMOP CDM 5.4 metadata, [[TpchModel]] with the test
  * tables — so every metadata-driven operator (P1 projection, generated
  * merge plans, D1 DDL, D5 cascade) is exercised against real data.
  */
final case class CdmModel(
    fields: Seq[CdmField],
    eventFields: Map[String, Map[String, String]] = Map.empty,
    extraDeps: Map[String, Set[String]] = Map.empty,
    fkDomains: Map[String, Map[String, Seq[String]]] = Map.empty,
    clustering: Map[String, Seq[String]] = Map.empty) {

  private val byTable: Map[String, Seq[CdmField]] =
    fields.groupBy(_.table).view.mapValues(_.toSeq).toMap

  val tables: Seq[String] = fields.map(_.table).distinct

  /** schema == 'CDM' tables (`etl_base.py:68-73`). */
  val cdmTables: Seq[String] = tables.filter(t => byTable(t).head.schema == "CDM")

  /** The ETL-targeted universe: CDM tables + vocabulary
    * (`etl_base.py:75-80`, tree filter `:156-161` adds CDM_SOURCE which is
    * already schema CDM in 5.4).
    */
  val etlTables: Seq[String] = tables.filter(t =>
    byTable(t).head.schema == "CDM" || t == "vocabulary")

  def columns(table: String): Seq[String] = byTable(table).map(_.name)

  def requiredColumns(table: String): Seq[String] =
    byTable(table).filter(_.required).map(_.name)

  def pk(table: String): Option[String] = byTable(table).find(_.isPk).map(_.name)

  /** Auto-numbering PK = integer PK (`etl_base.py:260-281`): person_id is
    * swapped to a generated surrogate, vocabulary_id (string) is not.
    */
  def isPkAutoNumbering(table: String): Boolean =
    byTable(table).exists(f => f.isPk && f.datatype == "int64")

  /** FK columns -> target table, excluding FKs to `concept`
    * (`etl_base.py:302-321`).
    */
  def fks(table: String): Map[String, String] =
    byTable(table).collect {
      case f if f.fkTable.exists(_ != "concept") => f.name -> f.fkTable.get
    }.toMap

  /** The concept (mapping) columns of a table — FKs INTO `concept`, the
    * set `_get_fks` deliberately excludes: these get Usagi folders, usagi
    * uploads and concept-id swaps instead of plain FK swaps
    * (`create_cdm_folders.py:46`, `etl.py:177-242`). The vendored field
    * CSV carries concept FK targets only where dependency-relevant, so the
    * CDM `*_concept_id` int64 naming convention identifies the rest (the
    * same convention the DQD record-completeness family keys on).
    */
  def conceptFks(table: String): Seq[String] =
    byTable(table).collect {
      case f if f.fkTable.contains("concept") ||
        (f.name.endsWith("_concept_id") && f.datatype == "int64") => f.name
    }.toSeq.distinct.sorted

  /** Event (polymorphic-FK) columns of a table -> discriminator column
    * (`cdm_5.4_events.json`, loaded at `etl_base.py:135-142`).
    */
  def events(table: String): Map[String, String] =
    eventFields.getOrElse(table, Map.empty)

  /** The merge-dedup / duplicate-check natural key (W3/A2): the PK, except
    * for the four PK-less tables the reference special-cases
    * (`{omop_table}_merge.sql.jinja:117-128`,
    * `{omop_work_table}_merge_check_for_duplicate_rows.sql.jinja:17-30`).
    * Concept and event columns are appended by the caller, as in the
    * templates.
    */
  def naturalKey(table: String): Seq[String] = table match {
    case "fact_relationship" => Seq("fact_id_1", "fact_id_2")
    case "death"             => Seq("person_id")
    case "cdm_source"        => Seq("cdm_source_name")
    case "episode_event"     => Seq("episode_id")
    case t                   => pk(t).toSeq
  }

  private def sparkType(dt: String): DataType = dt match {
    case "int64"    => LongType
    case "float64"  => DoubleType
    case "date"     => DateType
    case "datetime" => TimestampType
    case "string"   => StringType
    case other      => throw new IllegalArgumentException(s"unknown cdm datatype: $other")
  }

  /** D1: the table's Spark schema, generated from metadata — the engine's
    * DDL (`OMOPCDM_bigquery_5.4_ddl.sql.jinja`). `nullable` mirrors
    * isRequired.
    */
  def sparkSchema(table: String): StructType =
    StructType(byTable(table).map(f =>
      StructField(f.name, sparkType(f.datatype), nullable = !f.required)))

  /** D4: work-zone variant — event columns are typed STRING because they
    * hold *source* keys until stage 2 rewrites them
    * (`{omop_work}_ddl.sql.jinja:3-25`, driver `bigquery/etl.py:555-581`).
    */
  def workSchema(table: String): StructType = {
    val ev = events(table).keySet
    StructType(sparkSchema(table).map(f =>
      if (ev.contains(f.name)) f.copy(dataType = StringType) else f))
  }

  /** The FK dependency DAG of `universe`, resolved into levels: every table
    * in level N only references tables in levels < N, so each level can run
    * fully in parallel with a barrier between levels (the reference's
    * "two-stage rocket" stage-1 scheduler, `etl.py:161-175`).
    *
    * Faithful port of `etl_base.py:172-218`: self-references dropped, ERA
    * extra edges added, `vocabulary` pinned as its own first level, and a
    * cycle raises (`:211-212`).
    */
  def dependencyLevels(universe: Seq[String]): Seq[Seq[String]] = {
    val inScope = universe.toSet
    var withFks: Map[String, Set[String]] = universe.map { t =>
      val deps = fks(t).values.toSet.intersect(inScope) - t
      val extra = extraDeps.getOrElse(t, Set.empty).intersect(inScope)
      t -> (deps ++ extra)
    }.toMap
    val noFks = withFks.filter(_._2.isEmpty).keySet
    val levels = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    levels += Seq("vocabulary").filter(inScope)
    levels += (noFks - "vocabulary").toSeq.sorted
    withFks = withFks.collect {
      case (k, v) if !noFks(k) => k -> (v -- noFks)
    }
    while (withFks.nonEmpty) {
      val ready = (withFks.values.flatten.toSet -- withFks.keySet) ++
        withFks.collect { case (k, v) if v.isEmpty => k }
      if (ready.isEmpty)
        throw new IllegalStateException("Circular reference in FKs dependency graph")
      levels += ready.toSeq.sorted
      // keep only not-yet-emitted tables; subtract the freshly-ready set
      withFks = withFks.collect { case (k, v) if !ready(k) => k -> (v -- ready) }
    }
    levels.filter(_.nonEmpty).toSeq
  }

  /** ASCII rendering of the level tree (`etl_base.py:220-230`). */
  def printTree(universe: Seq[String]): String = {
    val sb = new StringBuilder
    var spacer = 0
    dependencyLevels(universe).foreach { level =>
      level.zipWithIndex.foreach { case (t, i) =>
        val branch = if (i == level.size - 1) "└──" else "├──"
        sb.append(" " * spacer).append(branch).append(t).append('\n')
      }
      spacer += 2
    }
    sb.result()
  }
}

object CdmModel {

  /** Parse a vendored metadata CSV (header:
    * cdmTableName,cdmFieldName,cdmDatatype,isRequired,isPrimaryKey,fkTableName,schema).
    */
  def parseFieldsCsv(lines: Iterator[String]): Seq[CdmField] =
    lines.drop(1).filter(_.nonEmpty).map { line =>
      val c = line.split(",", -1)
      CdmField(c(0), c(1), c(2), c(3) == "Yes", c(4) == "Yes",
        Option(c(5)).filter(_.nonEmpty), c(6))
    }.toSeq

  private[model] def resourceLines(path: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    Source.fromInputStream(in, "UTF-8").getLines()
  }
}

/** The vendored OMOP CDM 5.4 instance: 39 tables / 432 fields from the
  * public OHDSI CDM 5.4 DDL
  * (`/root/reference/src/riab/etl/bigquery/templates/ddl/OMOPCDM_bigquery_5.4_ddl.sql.jinja:1-588`),
  * FK targets derived from the CDM naming convention plus the three
  * documented patches the reference applies to the upstream CSVs
  * (`etl_base.py:107-132`: NOTE_NLP.note_id -> NOTE #539,
  * EPISODE.episode_parent_id -> EPISODE #707,
  * COST.payer_plan_period_id -> PAYER_PLAN_PERIOD #714), the event-column
  * config (`cdm_5.4_events.json:1-21`), the ERA extra edges
  * (`etl_base.py:192-195`), FK domains for the usagi domain check
  * (`etl_base.py:323-347` semantics over public CDM fkDomain values), and
  * the physical clustering fields
  * (`OMOPCDM_bigquery_5.4_clustering_fields.json:1-198`).
  */
object Cdm54 {

  val model: CdmModel = CdmModel(
    fields = CdmModel.parseFieldsCsv(CdmModel.resourceLines("/cdm/cdm54_fields.csv")),
    eventFields = Map(
      "measurement" -> Map("measurement_event_id" -> "meas_event_field_concept_id"),
      "observation" -> Map("observation_event_id" -> "obs_event_field_concept_id"),
      "note" -> Map("note_event_id" -> "note_event_field_concept_id"),
      "fact_relationship" -> Map(
        "fact_id_1" -> "domain_concept_id_1",
        "fact_id_2" -> "domain_concept_id_2"),
      "episode_event" -> Map("event_id" -> "episode_event_field_concept_id"),
      "cost" -> Map("cost_event_id" -> "cost_type_concept_id")),
    extraDeps = Map(
      "condition_era" -> Set("condition_occurrence"),
      "drug_era" -> Set("drug_exposure"),
      "dose_era" -> Set("drug_exposure")),
    fkDomains = Map(
      "person" -> Map(
        "gender_concept_id" -> Seq("gender"),
        "race_concept_id" -> Seq("race"),
        "ethnicity_concept_id" -> Seq("ethnicity")),
      "visit_occurrence" -> Map("visit_concept_id" -> Seq("visit")),
      "visit_detail" -> Map("visit_detail_concept_id" -> Seq("visit")),
      "condition_occurrence" -> Map("condition_concept_id" -> Seq("condition")),
      "drug_exposure" -> Map("drug_concept_id" -> Seq("drug")),
      "device_exposure" -> Map("device_concept_id" -> Seq("device")),
      "measurement" -> Map("measurement_concept_id" -> Seq("measurement")),
      "observation" -> Map("observation_concept_id" -> Seq("observation")),
      "procedure_occurrence" -> Map("procedure_concept_id" -> Seq("procedure")),
      "specimen" -> Map("specimen_concept_id" -> Seq("specimen"))),
    clustering = CdmModel.resourceLines("/cdm/cdm54_clustering.csv")
      .drop(1).filter(_.nonEmpty).map { line =>
        val c = line.split(",", -1)
        c(0) -> c(1).split(";").toSeq
      }.toMap)

  /** D2: the RiaB-auxiliary tables that are not part of the CDM proper —
    * the source-id lineage map (`SOURCE_ID_TO_OMOP_ID_MAP_ddl.sql.jinja:3-13`,
    * clustered on (omop_table, omop_id)) and the core DQD results columns
    * (`DataQualityDashboard_ddl.sql.jinja:1-56`) — modeled with the same
    * CdmModel machinery so their DDL and layout come from metadata too.
    */
  val aux: CdmModel = {
    def f(t: String, n: String, dt: String, req: Boolean = false) =
      CdmField(t, n, dt, req, isPk = false, None, "AUX")
    CdmModel(
      fields = Seq(
        f("source_id_to_omop_id_map", "omop_table", "string", req = true),
        f("source_id_to_omop_id_map", "omop_id", "int64", req = true),
        f("source_id_to_omop_id_map", "source", "string"),
        f("source_id_to_omop_id_map", "source_id", "string", req = true),
        f("source_id_to_omop_id_map", "valid_start_date", "date", req = true),
        f("source_id_to_omop_id_map", "valid_end_date", "date", req = true),
        f("source_id_to_omop_id_map", "invalid_reason", "string"),
        f("dqd_results", "check_id", "string", req = true),
        f("dqd_results", "check_name", "string", req = true),
        f("dqd_results", "check_level", "string"),
        f("dqd_results", "category", "string"),
        f("dqd_results", "cdm_table_name", "string"),
        f("dqd_results", "cdm_field_name", "string"),
        f("dqd_results", "num_violated_rows", "int64"),
        f("dqd_results", "num_denominator_rows", "int64"),
        f("dqd_results", "pct_violated_rows", "float64"),
        f("dqd_results", "threshold_value", "float64"),
        f("dqd_results", "failed", "int64"),
        f("dqd_results", "execution_time", "string"),
        f("dqd_results", "query_text", "string"),
        f("dqd_results", "run_timestamp", "datetime")),
      clustering = Map(
        "source_id_to_omop_id_map" -> Seq("omop_table", "omop_id")))
  }
}

/** The driver-generated test tables described with the same metadata model,
  * so metadata-driven operators run (and oracle-check) against real data.
  * FK chain: region <- nation <- {customer, supplier};
  * customer <- orders; {orders, part, supplier} <- lineitem.
  */
object TpchModel {

  private def f(t: String, n: String, dt: String, req: Boolean = true,
      pk: Boolean = false, fk: Option[String] = None) =
    CdmField(t, n, dt, req, pk, fk, "CDM")

  val model: CdmModel = CdmModel(fields = Seq(
    f("region", "r_regionkey", "int64", pk = true),
    f("region", "r_name", "string"),
    f("nation", "n_nationkey", "int64", pk = true),
    f("nation", "n_name", "string"),
    f("nation", "n_regionkey", "int64", fk = Some("region")),
    f("customer", "c_custkey", "int64", pk = true),
    f("customer", "c_name", "string"),
    f("customer", "c_nationkey", "int64", fk = Some("nation")),
    f("customer", "c_acctbal", "float64", req = false),
    f("customer", "c_mktsegment", "string", req = false),
    f("supplier", "s_suppkey", "int64", pk = true),
    f("supplier", "s_name", "string"),
    f("supplier", "s_nationkey", "int64", fk = Some("nation")),
    f("supplier", "s_acctbal", "float64", req = false),
    f("part", "p_partkey", "int64", pk = true),
    f("part", "p_name", "string"),
    f("part", "p_brand", "string", req = false),
    f("part", "p_type", "string", req = false),
    f("part", "p_size", "int64", req = false),
    f("part", "p_retailprice", "float64", req = false),
    f("orders", "o_orderkey", "int64", pk = true),
    f("orders", "o_custkey", "int64", fk = Some("customer")),
    f("orders", "o_orderstatus", "string"),
    f("orders", "o_totalprice", "float64", req = false),
    f("orders", "o_orderdate", "datetime", req = false),
    f("orders", "o_orderpriority", "string", req = false),
    f("lineitem", "l_orderkey", "int64", fk = Some("orders")),
    f("lineitem", "l_partkey", "int64", fk = Some("part")),
    f("lineitem", "l_suppkey", "int64", fk = Some("supplier")),
    f("lineitem", "l_linenumber", "int64"),
    f("lineitem", "l_quantity", "float64", req = false),
    f("lineitem", "l_extendedprice", "float64", req = false),
    f("lineitem", "l_discount", "float64", req = false),
    f("lineitem", "l_tax", "float64", req = false),
    f("lineitem", "l_returnflag", "string", req = false),
    f("lineitem", "l_linestatus", "string", req = false),
    f("lineitem", "l_shipdate", "datetime", req = false)))

  /** The test universe plus the `events` fact table (high-cardinality date
    * axis, an FK to customer, a free-text props column) — used by the
    * GENERATED DQD/Achilles batteries so they exercise a real fact-table
    * shape. The ETL/merge/CDM queries keep [[model]]: their hand-written
    * oracles enumerate its exact table set.
    */
  val modelWithEvents: CdmModel = CdmModel(fields = model.fields ++ Seq(
    f("events", "event_id", "int64", pk = true),
    f("events", "ts", "datetime", req = false),
    f("events", "user_id", "int64", fk = Some("customer")),
    f("events", "event_type", "string"),
    f("events", "value", "float64", req = false),
    f("events", "props", "string", req = false)))
}
