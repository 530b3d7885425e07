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
  *  - `isRequired`        (FIELD, Completeness): NULLs in a required field
  *  - `cdmDatatype`       (FIELD, Conformance): int64 fields whose value
  *     does not parse as an integer (the DQD regexp check)
  *  - `isPrimaryKey`      (FIELD, Conformance): duplicate PK values
  *  - `isForeignKey`      (FIELD, Conformance): orphaned FK values
  *  - `plausibleValueLow/High` (FIELD, Plausibility): out-of-bounds values,
  *     driven by a per-field bounds map (the analogue of DQD's per-row
  *     `{checkName}Threshold` columns)
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
      parent: Option[(String, String)] = None) { // (parentTable, parentPk)
    def id: String =
      if (level == "TABLE") s"table_${name}_$table" else s"field_${name}_${table}_$field"
  }

  /** Every check of one table, all expressible in a single aggregate pass.
    * FK checks reference the `__pk_<fkCol>` columns [[fieldLevel]] attaches
    * by left-joining the parents' distinct PKs.
    */
  private def tableChecks(model: CdmModel, table: String, bounds: Bounds): Seq[Check] = {
    val all = count(lit(1))
    // count(*)*0+1 instead of a bare literal: stays an aggregate expression
    // and still yields 1 on an empty table (where min/max would be NULL)
    val one = count(lit(1)) * lit(0L) + lit(1L)
    val presence = Seq(Check("cdmTable", "TABLE", "Conformance", table, "",
      when(count(lit(1)) === 0, lit(1L)).otherwise(lit(0L)), one))
    val required = model.requiredColumns(table).map { f =>
      Check("isRequired", "FIELD", "Completeness", table, f,
        sum(when(col(f).isNull, 1L).otherwise(0L)), all)
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
    presence ++ required ++ datatype ++ pk ++ fk ++ plausible
  }

  /** The full generated battery as one DataFrame plan — one branch per
    * table, each scanning its table once.
    */
  def fieldLevel(model: CdmModel, load: String => DataFrame, bounds: Bounds = Map.empty): DataFrame = {
    val perTable = model.tables.map { tb =>
      val checks = tableChecks(model, tb, bounds)
      // attach each referenced parent's distinct PKs (left joins on a
      // unique key preserve cardinality, so the shared aggregate is exact)
      val joined = model.fks(tb).toSeq.sortBy(_._1).foldLeft(load(tb)) {
        case (df, (fkCol, parent)) =>
          val parentPk = model.pk(parent).get
          val p = load(parent).select(col(parentPk).as(s"__pk_$fkCol")).distinct()
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
    perTable.reduce(_ unionByName _)
      .select(
        col("check_id"), col("check_name"), col("check_level"), col("category"),
        col("cdm_table_name"), col("cdm_field_name"),
        coalesce(col("num_violated_rows"), lit(0L)).as("num_violated_rows"),
        coalesce(col("num_denominator_rows"), lit(0L)).as("num_denominator_rows"),
        round(coalesce(col("num_violated_rows"), lit(0L)).cast("double") /
          greatest(coalesce(col("num_denominator_rows"), lit(0L)), lit(1L)), 6)
          .as("pct_violated_rows"),
        lit(0.0).as("threshold_value"),
        when(coalesce(col("num_violated_rows"), lit(0L)) > 0, 1L).otherwise(0L).as("failed"))
  }

  /** The same battery rendered as DuckDB SQL from the same metadata. */
  def oracleSql(model: CdmModel, bounds: Bounds = Map.empty): String = {
    val selects = model.tables.flatMap { tb =>
      tableChecks(model, tb, bounds).map { c =>
        val (violSql, denomSql, fromSql) = c.name match {
          case "cdmTable" =>
            ("CASE WHEN count(*) = 0 THEN 1 ELSE 0 END", "1", c.table)
          case "isRequired" =>
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
          case "plausibleValueLow" =>
            (s"count(*) FILTER (WHERE ${c.field} < ${c.bound.get})", "count(*)", c.table)
          case "plausibleValueHigh" =>
            (s"count(*) FILTER (WHERE ${c.field} > ${c.bound.get})", "count(*)", c.table)
        }
        s"""SELECT '${c.id}' AS check_id, '${c.name}' AS check_name, '${c.level}' AS check_level,
           |  '${c.category}' AS category, '${c.table}' AS cdm_table_name, '${c.field}' AS cdm_field_name,
           |  CAST($violSql AS BIGINT) AS num_violated_rows,
           |  CAST($denomSql AS BIGINT) AS num_denominator_rows
           |FROM $fromSql""".stripMargin
      }
    }
    s"""WITH checks AS (
       |${selects.mkString("\nUNION ALL\n")}
       |)
       |SELECT check_id, check_name, check_level, category, cdm_table_name, cdm_field_name,
       |  num_violated_rows, num_denominator_rows,
       |  round(CAST(num_violated_rows AS DOUBLE) / greatest(num_denominator_rows, 1), 6) AS pct_violated_rows,
       |  CAST(0.0 AS DOUBLE) AS threshold_value,
       |  CAST(CASE WHEN num_violated_rows > 0 THEN 1 ELSE 0 END AS BIGINT) AS failed
       |FROM checks ORDER BY check_id""".stripMargin
  }

  /** The expected battery output over an all-EMPTY table universe, rendered
    * as a VALUES oracle from the same metadata: every TABLE-level presence
    * check fails (violated=1 of denominator 1), every FIELD-level check
    * trivially passes with denominator 0.
    */
  def emptyUniverseOracleSql(model: CdmModel, bounds: Bounds = Map.empty): String = {
    val rows = model.tables.flatMap { tb =>
      tableChecks(model, tb, bounds).map { c =>
        val (viol, denom, pct, failed) =
          if (c.name == "cdmTable") (1, 1, "1.0", 1) else (0, 0, "0.0", 0)
        s"('${c.id}', '${c.name}', '${c.level}', '${c.category}', '${c.table}', '${c.field}', $viol, $denom, $pct, 0.0, $failed)"
      }
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
