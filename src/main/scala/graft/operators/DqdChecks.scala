package graft.operators

import graft.model.CdmModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metadata-GENERATED DQD battery: the check rows are not hand-written —
  * they are derived from the model's required/pk/fk/type flags, exactly how
  * the reference instantiates its check families over the OHDSI CSVs
  * (`/root/reference/src/riab/etl/data_quality.py:57-109` loads the config,
  * `:200-237` runs one rendered query per config row, `:322-347` applies
  * per-row thresholds; check SQL templates under
  * `libs/DataQualityDashboard/inst/sql`).
  *
  * Families generated per table/field (the reference's core set):
  *  - `cdmTable`          (TABLE, Conformance): table presence
  *  - `cdmField`          (FIELD, Conformance): column presence in the
  *     actually-loaded relation vs the spec (DQD checks the catalog the
  *     same way)
  *  - `isRequired`        (FIELD, Completeness): NULLs in a required field
  *  - `measureValueCompleteness` (FIELD, Completeness): NULL fraction of
  *     every non-required field (required ones are owned by `isRequired`)
  *  - `cdmDatatype`       (FIELD, Conformance): int64 fields whose value
  *     does not parse as an integer (the DQD regexp check)
  *  - `isPrimaryKey`      (FIELD, Conformance): duplicate PK values
  *  - `isForeignKey`      (FIELD, Conformance): orphaned FK values
  *  - `plausibleValueLow/High` (FIELD, Plausibility): out-of-bounds values,
  *     driven by a per-field bounds map (the analogue of DQD's per-row
  *     `{checkName}Threshold` columns)
  *  - `plausibleTemporalAfter` (FIELD, Plausibility): a child date that
  *     precedes its FK parent's date (DQD's temporal family, e.g. an event
  *     before birth), driven by [[TemporalRule]]s
  *
  * Scale shape: ALL of a table's checks — including every FK orphan check —
  * fold into ONE pass: the table is left-joined against each referenced
  * parent's distinct PKs (cardinality-preserving), then a single aggregate
  * computes every violated/denominator pair map-side, and the one result
  * row explodes into per-check rows. The whole battery is a union of
  * #tables small branches (not #checks), nothing is collected on the
  * driver, and each table is scanned exactly once.
  *
  * [[oracleSql]] renders the SAME battery as ANSI SQL from the SAME
  * metadata, so the correctness gate checks the generation logic, not a
  * transcribed check list; [[emptyUniverseOracleSql]] renders the expected
  * output over an all-empty universe, letting the generator run at full
  * CDM 5.4 breadth without CDM test data.
  */
object DqdChecks {

  private val IntRegex = "^-?[0-9]+$"

  /** Per-field value bounds for the plausibleValueLow/High families. */
  type Bounds = Map[(String, String), (Option[Double], Option[Double])]

  /** Per-check failure thresholds, keyed (checkName, table, field) with a
    * percent value in [0, 100] — the analogue of DQD's per-row
    * `{checkName}Threshold` CSV columns (`data_quality.py:322-347`): a
    * check FAILS only when its violated percentage exceeds the threshold,
    * so known-imperfect fields can carry a tolerance instead of a hard
    * zero. Checks without an entry keep threshold 0 (any violation fails).
    */
  type Thresholds = Map[(String, String, String), Double]

  /** A plausibleTemporalAfter rule: `table.field` must not precede the FK
    * parent's `parentField` (reached through `fkCol`).
    */
  final case class TemporalRule(table: String, field: String, fkCol: String, parentField: String)

  /** A plausibleStartBeforeEnd rule (DQD's same-row temporal family, the
    * reimplementation target of the deprecated plausibleTemporalAfter per
    * `data_quality.py:115-117`): `startField` must not exceed `endField` in
    * the same row. [[startEndRules]] derives these pairs from the model's
    * `_start_date`/`_end_date` field-name convention, the way DQD
    * instantiates the check over its Field_Level CSV.
    */
  final case class StartEndRule(table: String, startField: String, endField: String)

  /** An fkDomain rule (DQD's domain-conformance family): non-null values of
    * `table.field` must come from `allowed`. The config plays the role of
    * DQD's fkDomain column joined against the vocabulary DOMAIN table.
    */
  final case class DomainRule(table: String, field: String, allowed: Seq[String])

  /** A measurePersonCompleteness rule (TABLE-level Completeness): the
    * fraction of `fkCol`-parent rows (DQD: persons) with NO record in
    * `table`. [[personCompletenessRules]] derives one rule per table with a
    * `person_id` FK, exactly DQD's instantiation.
    */
  final case class CompletenessRule(table: String, fkCol: String)

  /** A CONCEPT-level plausibility rule (DQD's third check level,
    * Concept_Level.csv: per-concept plausible ranges such as "plausible
    * values for this measurement concept"): within the stratum
    * `strataCol = strataValue` of `table`, non-null `field` values must lie
    * in [lo, hi]. Rides the table's single aggregate pass like every
    * FIELD-level check — per-stratum FILTERed sums, no extra scan.
    */
  final case class ConceptRule(table: String, strataCol: String, strataValue: String,
      field: String, lo: Option[Double], hi: Option[Double])

  /** Derive plausibleStartBeforeEnd pairs from the model's field names:
    * every `X_start_date[time]` with a matching `X_end_date[time]` sibling.
    */
  def startEndRules(model: CdmModel): Seq[StartEndRule] =
    model.tables.flatMap { tb =>
      val cols = model.columns(tb).toSet
      model.columns(tb).collect {
        case f if f.contains("_start_date") && cols.contains(f.replace("_start_", "_end_")) =>
          StartEndRule(tb, f, f.replace("_start_", "_end_"))
      }
    }.sortBy(r => (r.table, r.startField))

  /** Derive measurePersonCompleteness rules: one per table holding an FK
    * named `person_id` (skipping the person table itself).
    */
  def personCompletenessRules(model: CdmModel): Seq[CompletenessRule] =
    model.tables.filter(t => t != "person" && model.fks(t).get("person_id").contains("person"))
      .sorted.map(CompletenessRule(_, "person_id"))

  /** One generated check: aggregate expressions for violated/denominator
    * (evaluated over the parent-joined table), plus the metadata needed to
    * render the oracle (`bound`, `parent`).
    */
  private final case class Check(
      name: String,
      level: String,
      category: String,
      table: String,
      field: String,
      violated: Column,
      denominator: Column,
      bound: Option[Double] = None,
      parent: Option[(String, String)] = None, // (parentTable, parentPk)
      fkCol: Option[String] = None,
      parentField: Option[String] = None,
      // plan-time-constant (violated, denominator): emitted as a local
      // relation instead of riding the aggregate (keeps ~2 codegen'd
      // aggregate expressions per field out of the CDM-wide battery)
      constValue: Option[(Long, Long)] = None,
      allowed: Option[Seq[String]] = None, // fkDomain value list
      endField: Option[String] = None,     // plausibleStartBeforeEnd pair
      stratum: Option[(String, String)] = None) { // CONCEPT-level (col, value)
    def id: String = level match {
      case "TABLE" => s"table_${name}_$table" + (if (field.nonEmpty) s"_$field" else "")
      case "CONCEPT" => s"concept_${name}_${table}_${field}_${stratum.get._2}"
      case _ => s"field_${name}_${table}_$field"
    }
  }

  /** Every check of one table, all expressible in a single aggregate pass.
    * FK checks reference the `__pk_<fkCol>` columns [[fieldLevel]] attaches
    * by left-joining the parents' distinct PKs.
    */
  private def tableChecks(model: CdmModel, table: String, bounds: Bounds,
      actualCols: Option[Set[String]] = None,
      temporal: Seq[TemporalRule] = Nil,
      startEnd: Seq[StartEndRule] = Nil,
      domains: Seq[DomainRule] = Nil,
      concepts: Seq[ConceptRule] = Nil): Seq[Check] = {
    val all = count(lit(1))
    // count(*)*0+1 instead of a bare literal: stays an aggregate expression
    // and still yields 1 on an empty table (where min/max would be NULL)
    val one = count(lit(1)) * lit(0L) + lit(1L)
    val presence = Seq(Check("cdmTable", "TABLE", "Conformance", table, "",
      when(count(lit(1)) === 0, lit(1L)).otherwise(lit(0L)), one))
    // cdmField inspects the ACTUAL relation's columns against the spec (the
    // catalog check); the oracle side renders the conforming expectation
    val fieldPresence = model.sparkSchema(table).fields.toSeq.map { sf =>
      val missing = actualCols.exists(cols => !cols.contains(sf.name))
      Check("cdmField", "FIELD", "Conformance", table, sf.name,
        lit(0L), lit(0L), constValue = Some((if (missing) 1L else 0L, 1L)))
    }
    val required = model.requiredColumns(table).map { f =>
      Check("isRequired", "FIELD", "Completeness", table, f,
        sum(when(col(f).isNull, 1L).otherwise(0L)), all)
    }
    val valueCompleteness =
      model.sparkSchema(table).fields.toSeq.collect {
        case sf if !model.requiredColumns(table).contains(sf.name) =>
          Check("measureValueCompleteness", "FIELD", "Completeness", table, sf.name,
            sum(when(col(sf.name).isNull, 1L).otherwise(0L)), all)
      }
    val datatype = model.sparkSchema(table).fields.collect {
      case sf if sf.dataType == org.apache.spark.sql.types.LongType =>
        Check("cdmDatatype", "FIELD", "Conformance", table, sf.name,
          sum(when(col(sf.name).isNotNull && !col(sf.name).cast("string").rlike(IntRegex),
            1L).otherwise(0L)),
          all)
    }.toSeq
    val pk = model.pk(table).toSeq.map { p =>
      Check("isPrimaryKey", "FIELD", "Conformance", table, p,
        count(lit(1)) - countDistinct(col(p)), all)
    }
    val fk = model.fks(table).toSeq.sortBy(_._1).map { case (fkCol, parent) =>
      val parentPk = model.pk(parent).getOrElse(
        throw new IllegalStateException(s"fk target $parent has no pk"))
      Check("isForeignKey", "FIELD", "Conformance", table, fkCol,
        sum(when(col(fkCol).isNotNull && col(s"__pk_$fkCol").isNull, 1L).otherwise(0L)),
        sum(when(col(fkCol).isNotNull, 1L).otherwise(0L)),
        parent = Some((parent, parentPk)))
    }
    val plausible = bounds.toSeq.sortBy(_._1).collect {
      case ((t, f), (lo, hi)) if t == table =>
        lo.toSeq.map(b =>
          Check("plausibleValueLow", "FIELD", "Plausibility", table, f,
            sum(when(col(f) < b, 1L).otherwise(0L)), all, Some(b))) ++
          hi.toSeq.map(b =>
            Check("plausibleValueHigh", "FIELD", "Plausibility", table, f,
              sum(when(col(f) > b, 1L).otherwise(0L)), all, Some(b)))
    }.flatten
    val temporalChecks = temporal.filter(_.table == table).sortBy(_.field).map { r =>
      val parent = model.fks(table)(r.fkCol)
      val parentPk = model.pk(parent).get
      val tp = col(s"__tp_${r.fkCol}_${r.parentField}")
      Check("plausibleTemporalAfter", "FIELD", "Plausibility", table, r.field,
        sum(when(col(r.field).isNotNull && tp.isNotNull && col(r.field) < tp, 1L).otherwise(0L)),
        sum(when(col(r.field).isNotNull && tp.isNotNull, 1L).otherwise(0L)),
        parent = Some((parent, parentPk)), fkCol = Some(r.fkCol), parentField = Some(r.parentField))
    }
    val startBeforeEnd = startEnd.filter(_.table == table).sortBy(_.startField).map { r =>
      val (s, e) = (col(r.startField), col(r.endField))
      Check("plausibleStartBeforeEnd", "FIELD", "Plausibility", table, r.startField,
        sum(when(s.isNotNull && e.isNotNull && s > e, 1L).otherwise(0L)),
        sum(when(s.isNotNull && e.isNotNull, 1L).otherwise(0L)),
        endField = Some(r.endField))
    }
    val domainChecks = domains.filter(_.table == table).sortBy(_.field).map { r =>
      Check("fkDomain", "FIELD", "Conformance", table, r.field,
        sum(when(col(r.field).isNotNull && !col(r.field).isin(r.allowed: _*), 1L).otherwise(0L)),
        sum(when(col(r.field).isNotNull, 1L).otherwise(0L)),
        allowed = Some(r.allowed))
    }
    val conceptChecks = concepts.filter(_.table == table)
      .sortBy(r => (r.field, r.strataValue)).flatMap { r =>
        val inStratum = col(r.strataCol) === r.strataValue && col(r.field).isNotNull
        def mk(name: String, cond: Column, b: Double) =
          Check(name, "CONCEPT", "Plausibility", table, r.field,
            sum(when(inStratum && cond, 1L).otherwise(0L)),
            sum(when(inStratum, 1L).otherwise(0L)),
            bound = Some(b), stratum = Some((r.strataCol, r.strataValue)))
        r.lo.toSeq.map(b => mk("plausibleValueLow", col(r.field) < b, b)) ++
          r.hi.toSeq.map(b => mk("plausibleValueHigh", col(r.field) > b, b))
      }
    presence ++ fieldPresence ++ required ++ valueCompleteness ++ datatype ++
      pk ++ fk ++ plausible ++ temporalChecks ++ startBeforeEnd ++ domainChecks ++
      conceptChecks
  }

  /** measurePersonCompleteness checks — separate from [[tableChecks]]
    * because their scan runs over the PARENT table (parents with no record
    * in the child), not the child itself.
    */
  private def completenessChecks(model: CdmModel, rules: Seq[CompletenessRule]): Seq[Check] =
    rules.sortBy(r => (r.table, r.fkCol)).map { r =>
      val parent = model.fks(r.table).getOrElse(r.fkCol,
        throw new IllegalArgumentException(s"${r.table}.${r.fkCol} is not an FK"))
      val parentPk = model.pk(parent).getOrElse(
        throw new IllegalStateException(s"completeness parent $parent has no pk"))
      Check("measurePersonCompleteness", "TABLE", "Completeness", r.table, r.fkCol,
        lit(0L), lit(0L), parent = Some((parent, parentPk)), fkCol = Some(r.fkCol))
    }

  /** The full generated battery as one DataFrame plan — one branch per
    * table, each scanning its table once.
    */
  def fieldLevel(model: CdmModel, load: String => DataFrame, bounds: Bounds = Map.empty,
      temporal: Seq[TemporalRule] = Nil,
      startEnd: Seq[StartEndRule] = Nil,
      domains: Seq[DomainRule] = Nil,
      completeness: Seq[CompletenessRule] = Nil,
      thresholds: Thresholds = Map.empty,
      concepts: Seq[ConceptRule] = Nil): DataFrame = {
    val byTable = model.tables.map { tb =>
      tb -> tableChecks(model, tb, bounds, Some(load(tb).columns.toSet), temporal, startEnd,
        domains, concepts)
    }
    val perTable = byTable.map { case (tb, allChecks) =>
      val checks = allChecks.filter(_.constValue.isEmpty)
      // attach each referenced parent's distinct PKs (left joins on a
      // unique key preserve cardinality, so the shared aggregate is exact);
      // temporal rules ride the same join, pulling the parent's date column
      val joined = model.fks(tb).toSeq.sortBy(_._1).foldLeft(load(tb)) {
        case (df, (fkCol, parent)) =>
          val parentPk = model.pk(parent).get
          val tpCols = temporal.filter(r => r.table == tb && r.fkCol == fkCol).map(r =>
            col(r.parentField).as(s"__tp_${fkCol}_${r.parentField}"))
          val p = load(parent)
            .select(col(parentPk).as(s"__pk_$fkCol") +: tpCols: _*).distinct()
          df.join(p, df(fkCol) === p(s"__pk_$fkCol"), "left")
      }
      val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
        Seq(c.violated.as(s"__v$i"), c.denominator.as(s"__d$i"))
      }
      joined
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(checks.zipWithIndex.map { case (c, i) =>
          struct(
            lit(c.id).as("check_id"),
            lit(c.name).as("check_name"),
            lit(c.level).as("check_level"),
            lit(c.category).as("category"),
            lit(c.table).as("cdm_table_name"),
            lit(c.field).as("cdm_field_name"),
            col(s"__v$i").cast("long").as("num_violated_rows"),
            col(s"__d$i").cast("long").as("num_denominator_rows"))
        }: _*)).as("c"))
        .select("c.*")
    }
    // the plan-time-constant checks land as ONE local relation
    val session = load(model.tables.head).sparkSession
    import session.implicits._
    val constDf = byTable.flatMap { case (_, allChecks) =>
      allChecks.collect { case c if c.constValue.isDefined =>
        val (v, dnm) = c.constValue.get
        (c.id, c.name, c.level, c.category, c.table, c.field, v, dnm)
      }
    }.toDF("check_id", "check_name", "check_level", "category",
      "cdm_table_name", "cdm_field_name", "num_violated_rows", "num_denominator_rows")
    // measurePersonCompleteness: one branch per rule, scanning the PARENT
    // left-joined to the child's distinct FK values — violated = parents
    // with no child row, denominator = all parents. One shuffle per rule,
    // both aggregates in the same pass.
    val completenessDfs = completenessChecks(model, completeness).map { c =>
      val (parent, parentPk) = c.parent.get
      val childFks = load(c.table)
        .select(col(c.fkCol.get).as("__fk")).where(col("__fk").isNotNull).distinct()
      load(parent).select(col(parentPk).as("__p"))
        .join(childFks, col("__p") === col("__fk"), "left")
        .agg(
          sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("num_violated_rows"),
          count(lit(1)).as("num_denominator_rows"))
        .select(
          lit(c.id).as("check_id"), lit(c.name).as("check_name"),
          lit(c.level).as("check_level"), lit(c.category).as("category"),
          lit(c.table).as("cdm_table_name"), lit(c.field).as("cdm_field_name"),
          col("num_violated_rows").cast("long"), col("num_denominator_rows").cast("long"))
    }
    // per-check thresholds ride a broadcast lookup keyed by check id (the
    // config is plan-time metadata, never a data-sized relation)
    val allCheckMeta = byTable.flatMap(_._2) ++ completenessChecks(model, completeness)
    val thrDf = {
      import session.implicits._
      allCheckMeta.map(c => (c.id, thresholds.getOrElse((c.name, c.table, c.field), 0.0)))
        .toDF("check_id", "threshold_value")
    }
    val viol = coalesce(col("num_violated_rows"), lit(0L))
    val denom = coalesce(col("num_denominator_rows"), lit(0L))
    val pct = viol.cast("double") / greatest(denom, lit(1L))
    graft.Unions.balanced(perTable ++ completenessDfs :+ constDf)
      .join(broadcast(thrDf), Seq("check_id"))
      .select(
        col("check_id"), col("check_name"), col("check_level"), col("category"),
        col("cdm_table_name"), col("cdm_field_name"),
        viol.as("num_violated_rows"),
        denom.as("num_denominator_rows"),
        round(pct, 6).as("pct_violated_rows"),
        col("threshold_value"),
        when(pct * 100 > col("threshold_value"), 1L).otherwise(0L).as("failed"))
  }

  /** The run-level Overview the reference computes from the check results
    * (`data_quality.py:280-320`): totals, failures, and per-category
    * splits, plus the headline percent-passed — one row per run.
    */
  def overview(results: DataFrame): DataFrame = {
    val total = count(lit(1))
    val failed = sum(col("failed"))
    def catTotal(c: String) = sum(when(col("category") === c, 1L).otherwise(0L))
    def catFailed(c: String) =
      sum(when(col("category") === c && col("failed") === 1, 1L).otherwise(0L))
    results.agg(
      total.as("count_total"),
      failed.as("count_overall_failed"),
      (total - failed).as("count_passed"),
      catTotal("Plausibility").as("count_total_plausibility"),
      catTotal("Conformance").as("count_total_conformance"),
      catTotal("Completeness").as("count_total_completeness"),
      catFailed("Plausibility").as("count_failed_plausibility"),
      catFailed("Conformance").as("count_failed_conformance"),
      catFailed("Completeness").as("count_failed_completeness"),
      round((total - failed) * lit(100.0) / total, 2).as("percent_passed"))
  }

  /** DuckDB rendering of [[overview]] over the rendered battery oracle. */
  def overviewOracleSql(batterySql: String): String =
    s"""WITH battery AS (
       |$batterySql
       |)
       |SELECT CAST(count(*) AS BIGINT) AS count_total,
       |  CAST(sum(failed) AS BIGINT) AS count_overall_failed,
       |  CAST(count(*) - sum(failed) AS BIGINT) AS count_passed,
       |  CAST(count(*) FILTER (WHERE category = 'Plausibility') AS BIGINT) AS count_total_plausibility,
       |  CAST(count(*) FILTER (WHERE category = 'Conformance') AS BIGINT) AS count_total_conformance,
       |  CAST(count(*) FILTER (WHERE category = 'Completeness') AS BIGINT) AS count_total_completeness,
       |  CAST(count(*) FILTER (WHERE category = 'Plausibility' AND failed = 1) AS BIGINT) AS count_failed_plausibility,
       |  CAST(count(*) FILTER (WHERE category = 'Conformance' AND failed = 1) AS BIGINT) AS count_failed_conformance,
       |  CAST(count(*) FILTER (WHERE category = 'Completeness' AND failed = 1) AS BIGINT) AS count_failed_completeness,
       |  round((count(*) - sum(failed)) * 100.0 / count(*), 2) AS percent_passed
       |FROM battery""".stripMargin

  /** The same battery rendered as DuckDB SQL from the same metadata. */
  def oracleSql(model: CdmModel, bounds: Bounds = Map.empty,
      temporal: Seq[TemporalRule] = Nil,
      startEnd: Seq[StartEndRule] = Nil,
      domains: Seq[DomainRule] = Nil,
      completeness: Seq[CompletenessRule] = Nil,
      thresholds: Thresholds = Map.empty,
      concepts: Seq[ConceptRule] = Nil): String = {
    val allChecks = model.tables.flatMap { tb =>
      tableChecks(model, tb, bounds, actualCols = None, temporal = temporal,
        startEnd = startEnd, domains = domains, concepts = concepts)
    } ++ completenessChecks(model, completeness)
    def thr(c: Check): Double = thresholds.getOrElse((c.name, c.table, c.field), 0.0)
    val selects = allChecks.map { c =>
        val (violSql, denomSql, fromSql) = c.name match {
          case "cdmTable" =>
            ("CASE WHEN count(*) = 0 THEN 1 ELSE 0 END", "1", c.table)
          case "cdmField" =>
            // the conforming expectation — the data-side check inspects the
            // actually-loaded relation's columns (a catalog lookup, like DQD)
            ("0", "1", "(SELECT 1) AS __dual")
          case "isRequired" | "measureValueCompleteness" =>
            (s"count(*) FILTER (WHERE ${c.field} IS NULL)", "count(*)", c.table)
          case "cdmDatatype" =>
            (s"count(*) FILTER (WHERE ${c.field} IS NOT NULL AND NOT regexp_matches(CAST(${c.field} AS VARCHAR), '$IntRegex'))",
              "count(*)", c.table)
          case "isPrimaryKey" =>
            (s"count(*) - count(DISTINCT ${c.field})", "count(*)", c.table)
          case "isForeignKey" =>
            val (parent, parentPk) = c.parent.get
            (s"count(*) FILTER (WHERE s.${c.field} IS NOT NULL AND p.__pk IS NULL)",
              s"count(*) FILTER (WHERE s.${c.field} IS NOT NULL)",
              s"${c.table} s LEFT JOIN (SELECT DISTINCT $parentPk AS __pk FROM $parent) p ON s.${c.field} = p.__pk")
          case "plausibleValueLow" if c.stratum.isDefined =>
            val (sc, sv) = c.stratum.get
            (s"count(*) FILTER (WHERE $sc = '$sv' AND ${c.field} IS NOT NULL AND ${c.field} < ${c.bound.get})",
              s"count(*) FILTER (WHERE $sc = '$sv' AND ${c.field} IS NOT NULL)", c.table)
          case "plausibleValueHigh" if c.stratum.isDefined =>
            val (sc, sv) = c.stratum.get
            (s"count(*) FILTER (WHERE $sc = '$sv' AND ${c.field} IS NOT NULL AND ${c.field} > ${c.bound.get})",
              s"count(*) FILTER (WHERE $sc = '$sv' AND ${c.field} IS NOT NULL)", c.table)
          case "plausibleValueLow" =>
            (s"count(*) FILTER (WHERE ${c.field} < ${c.bound.get})", "count(*)", c.table)
          case "plausibleValueHigh" =>
            (s"count(*) FILTER (WHERE ${c.field} > ${c.bound.get})", "count(*)", c.table)
          case "plausibleTemporalAfter" =>
            val (parent, parentPk) = c.parent.get
            (s"count(*) FILTER (WHERE s.${c.field} IS NOT NULL AND p.__tp IS NOT NULL AND s.${c.field} < p.__tp)",
              s"count(*) FILTER (WHERE s.${c.field} IS NOT NULL AND p.__tp IS NOT NULL)",
              s"${c.table} s LEFT JOIN (SELECT DISTINCT $parentPk AS __pk, ${c.parentField.get} AS __tp FROM $parent) p ON s.${c.fkCol.get} = p.__pk")
          case "plausibleStartBeforeEnd" =>
            val e = c.endField.get
            (s"count(*) FILTER (WHERE ${c.field} IS NOT NULL AND $e IS NOT NULL AND ${c.field} > $e)",
              s"count(*) FILTER (WHERE ${c.field} IS NOT NULL AND $e IS NOT NULL)", c.table)
          case "fkDomain" =>
            val list = c.allowed.get.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
            (s"count(*) FILTER (WHERE ${c.field} IS NOT NULL AND ${c.field} NOT IN ($list))",
              s"count(*) FILTER (WHERE ${c.field} IS NOT NULL)", c.table)
          case "measurePersonCompleteness" =>
            val (parent, parentPk) = c.parent.get
            ("count(*) FILTER (WHERE c.__fk IS NULL)", "count(*)",
              s"$parent p LEFT JOIN (SELECT DISTINCT ${c.fkCol.get} AS __fk FROM ${c.table} WHERE ${c.fkCol.get} IS NOT NULL) c ON p.$parentPk = c.__fk")
        }
        s"""SELECT '${c.id}' AS check_id, '${c.name}' AS check_name, '${c.level}' AS check_level,
           |  '${c.category}' AS category, '${c.table}' AS cdm_table_name, '${c.field}' AS cdm_field_name,
           |  CAST($violSql AS BIGINT) AS num_violated_rows,
           |  CAST($denomSql AS BIGINT) AS num_denominator_rows,
           |  CAST(${thr(c)} AS DOUBLE) AS threshold_value
           |FROM $fromSql""".stripMargin
    }
    s"""WITH checks AS (
       |${selects.mkString("\nUNION ALL\n")}
       |)
       |SELECT check_id, check_name, check_level, category, cdm_table_name, cdm_field_name,
       |  num_violated_rows, num_denominator_rows,
       |  round(CAST(num_violated_rows AS DOUBLE) / greatest(num_denominator_rows, 1), 6) AS pct_violated_rows,
       |  threshold_value,
       |  CAST(CASE WHEN CAST(num_violated_rows AS DOUBLE) / greatest(num_denominator_rows, 1) * 100
       |    > threshold_value THEN 1 ELSE 0 END AS BIGINT) AS failed
       |FROM checks ORDER BY check_id""".stripMargin
  }

  /** The expected battery output over an all-EMPTY table universe, rendered
    * as a VALUES oracle from the same metadata: every TABLE-level presence
    * check fails (violated=1 of denominator 1), every FIELD-level check
    * trivially passes with denominator 0.
    */
  def emptyUniverseOracleSql(model: CdmModel, bounds: Bounds = Map.empty,
      temporal: Seq[TemporalRule] = Nil,
      startEnd: Seq[StartEndRule] = Nil,
      domains: Seq[DomainRule] = Nil,
      completeness: Seq[CompletenessRule] = Nil,
      thresholds: Thresholds = Map.empty,
      concepts: Seq[ConceptRule] = Nil): String = {
    val allChecks = model.tables.flatMap { tb =>
      tableChecks(model, tb, bounds, actualCols = None, temporal = temporal,
        startEnd = startEnd, domains = domains, concepts = concepts)
    } ++ completenessChecks(model, completeness)
    val rows = allChecks.map { c =>
      val (viol, denom, pct) = c.name match {
        case "cdmTable" => (1, 1, "1.0")
        case "cdmField" => (0, 1, "0.0") // column exists even when empty
        case _          => (0, 0, "0.0")
      }
      val thr = thresholds.getOrElse((c.name, c.table, c.field), 0.0)
      val failed = if (viol * 100.0 / math.max(denom, 1) > thr) 1 else 0
      s"('${c.id}', '${c.name}', '${c.level}', '${c.category}', '${c.table}', '${c.field}', $viol, $denom, $pct, $thr, $failed)"
    }
    s"""SELECT check_id, check_name, check_level, category, cdm_table_name, cdm_field_name,
       |  CAST(num_violated_rows AS BIGINT) AS num_violated_rows,
       |  CAST(num_denominator_rows AS BIGINT) AS num_denominator_rows,
       |  CAST(pct_violated_rows AS DOUBLE) AS pct_violated_rows,
       |  CAST(threshold_value AS DOUBLE) AS threshold_value,
       |  CAST(failed AS BIGINT) AS failed
       |FROM (VALUES
       |${rows.mkString(",\n")}
       |) AS t(check_id, check_name, check_level, category, cdm_table_name, cdm_field_name,
       |  num_violated_rows, num_denominator_rows, pct_violated_rows, threshold_value, failed)
       |ORDER BY check_id""".stripMargin
  }
}
