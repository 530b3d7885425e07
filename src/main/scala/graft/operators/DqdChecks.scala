package graft.operators

import graft.model.CdmModel
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-GENERATED field-level DQD battery: the check rows are not
  * hand-written — they are derived from the model's required/pk/fk/type
  * flags, exactly how the reference instantiates its check families over
  * the OHDSI Field_Level CSV (`/root/reference/src/riab/etl/data_quality.py:57-109`
  * loads the CSVs, `:200-237` runs one rendered query per config row,
  * `:322-347` applies per-row thresholds; the check SQL templates live in
  * `libs/DataQualityDashboard/inst/sql`).
  *
  * Families generated per field (the reference's core four):
  *  - `isRequired`   (Completeness): NULL rows in a required field
  *  - `cdmDatatype`  (Conformance): int64 fields whose value does not parse
  *     as an integer (the DQD regexp check)
  *  - `isPrimaryKey` (Conformance): duplicate PK values
  *  - `isForeignKey` (Conformance): non-null FK values with no parent row
  *
  * Scale shape: all non-join checks of one table fold into a SINGLE
  * aggregate pass over that table (map-side combinable — one row out per
  * table), then explode into per-check result rows; each FK edge is one
  * left join against the parent's distinct PKs + the same one-pass
  * aggregate. Nothing is collected on the driver; the result is one unioned
  * plan of #tables + #fk-edges tiny frames.
  *
  * [[oracleSql]] renders the SAME battery as ANSI SQL from the SAME
  * metadata, so the correctness gate checks the generation logic, not a
  * transcribed check list.
  */
object DqdChecks {

  private val IntRegex = "^-?[0-9]+$"

  /** One generated check: aggregate expressions for violated/denominator.
    * `bound` carries the plausible-value threshold for oracle rendering.
    */
  private final case class Check(
      name: String,
      category: String,
      table: String,
      field: String,
      violated: Column,
      denominator: Column,
      bound: Option[Double] = None) {
    def id: String = s"field_${name}_${table}_$field"
  }

  /** Per-field value bounds for the plausibleValueLow/High families — the
    * analogue of the threshold columns DQD's Concept_Level / Field_Level
    * CSVs carry per field (`data_quality.py:322-347` reads
    * `{checkName}Threshold` off the config row).
    */
  type Bounds = Map[(String, String), (Option[Double], Option[Double])]

  private def perTableChecks(model: CdmModel, table: String, bounds: Bounds): Seq[Check] = {
    val all = count(lit(1))
    val required = model.requiredColumns(table).map { f =>
      Check("isRequired", "Completeness", table, f,
        sum(when(col(f).isNull, 1L).otherwise(0L)), all)
    }
    val datatype = model.sparkSchema(table).fields.collect {
      case sf if sf.dataType == org.apache.spark.sql.types.LongType =>
        Check("cdmDatatype", "Conformance", table, sf.name,
          sum(when(col(sf.name).isNotNull && !col(sf.name).cast("string").rlike(IntRegex),
            1L).otherwise(0L)),
          all)
    }.toSeq
    val pk = model.pk(table).toSeq.map { p =>
      Check("isPrimaryKey", "Conformance", table, p,
        count(lit(1)) - countDistinct(col(p)), all)
    }
    val plausible = bounds.toSeq.sortBy(_._1).collect {
      case ((t, f), (lo, hi)) if t == table =>
        lo.toSeq.map(b =>
          Check("plausibleValueLow", "Plausibility", table, f,
            sum(when(col(f) < b, 1L).otherwise(0L)), all, Some(b))) ++
          hi.toSeq.map(b =>
            Check("plausibleValueHigh", "Plausibility", table, f,
              sum(when(col(f) > b, 1L).otherwise(0L)), all, Some(b)))
    }.flatten
    required ++ datatype ++ pk ++ plausible
  }

  private def resultRow(c: Check, viol: Column, denom: Column): Column =
    struct(
      lit(c.id).as("check_id"),
      lit(c.name).as("check_name"),
      lit("FIELD").as("check_level"),
      lit(c.category).as("category"),
      lit(c.table).as("cdm_table_name"),
      lit(c.field).as("cdm_field_name"),
      viol.cast("long").as("num_violated_rows"),
      denom.cast("long").as("num_denominator_rows"))

  /** The full generated battery as one DataFrame plan: the per-table
    * TABLE-level `cdmTable` presence check (the DQD table-level family)
    * plus every FIELD-level check family, all from metadata.
    */
  def fieldLevel(model: CdmModel, load: String => DataFrame, bounds: Bounds = Map.empty): DataFrame = {
    val tableLevel = model.tables.map { tb =>
      load(tb).agg(count(lit(1)).as("__n"))
        .select(
          lit(s"table_cdmTable_$tb").as("check_id"),
          lit("cdmTable").as("check_name"),
          lit("TABLE").as("check_level"),
          lit("Conformance").as("category"),
          lit(tb).as("cdm_table_name"),
          lit("").as("cdm_field_name"),
          when(col("__n") === 0, 1L).otherwise(0L).as("num_violated_rows"),
          lit(1L).as("num_denominator_rows"))
    }
    val perTable = model.tables.map { tb =>
      val checks = perTableChecks(model, tb, bounds)
      val aggs = checks.zipWithIndex.map { case (c, i) => c.violated.as(s"__v$i") } :+
        count(lit(1)).as("__n")
      load(tb)
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(checks.zipWithIndex.map { case (c, i) =>
          resultRow(c, col(s"__v$i"), col("__n"))
        }: _*)).as("c"))
        .select("c.*")
    }
    val perFk = model.tables.flatMap { tb =>
      model.fks(tb).toSeq.sortBy(_._1).map { case (fkCol, parent) =>
        val parentPk = model.pk(parent).getOrElse(
          throw new IllegalStateException(s"fk target $parent has no pk"))
        val c = Check("isForeignKey", "Conformance", tb, fkCol, lit(0L), lit(0L))
        load(tb)
          .filter(col(fkCol).isNotNull)
          .join(load(parent).select(col(parentPk).as("__pk")).distinct(),
            col(fkCol) === col("__pk"), "left")
          .agg(
            sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("__v"),
            count(lit(1)).as("__n"))
          .select(resultRow(c, col("__v"), col("__n")).as("c"))
          .select("c.*")
      }
    }
    (tableLevel ++ perTable ++ perFk).reduce(_ unionByName _)
      .select(
        col("check_id"), col("check_name"), col("check_level"), col("category"),
        col("cdm_table_name"), col("cdm_field_name"),
        coalesce(col("num_violated_rows"), lit(0L)).as("num_violated_rows"),
        col("num_denominator_rows"),
        round(coalesce(col("num_violated_rows"), lit(0L)).cast("double") /
          greatest(col("num_denominator_rows"), lit(1L)), 6).as("pct_violated_rows"),
        lit(0.0).as("threshold_value"),
        when(coalesce(col("num_violated_rows"), lit(0L)) > 0, 1L).otherwise(0L).as("failed"))
  }

  /** The expected battery output over an all-EMPTY table universe, rendered
    * as a VALUES oracle from the same metadata: every TABLE-level presence
    * check fails (violated=1 of denominator 1), every FIELD-level check
    * trivially passes with denominator 0 — letting the generator run at
    * full CDM 5.4 breadth (39 tables) without CDM test data, against the
    * schemas [[CdmModel.sparkSchema]] itself generates.
    */
  def emptyUniverseOracleSql(model: CdmModel, bounds: Bounds = Map.empty): String = {
    def row(id: String, name: String, level: String, cat: String, table: String,
        field: String, viol: Long, denom: Long) = {
      val pct = if (viol > 0) "1.0" else "0.0"
      val failed = if (viol > 0) 1 else 0
      s"('$id', '$name', '$level', '$cat', '$table', '$field', $viol, $denom, $pct, 0.0, $failed)"
    }
    val tableRows = model.tables.map(tb =>
      row(s"table_cdmTable_$tb", "cdmTable", "TABLE", "Conformance", tb, "", 1L, 1L))
    val fieldRows = model.tables.flatMap(tb =>
      perTableChecks(model, tb, bounds).map(c =>
        row(c.id, c.name, "FIELD", c.category, c.table, c.field, 0L, 0L)))
    val fkRows = model.tables.flatMap { tb =>
      model.fks(tb).toSeq.sortBy(_._1).map { case (fkCol, _) =>
        row(s"field_isForeignKey_${tb}_$fkCol", "isForeignKey", "FIELD", "Conformance",
          tb, fkCol, 0L, 0L)
      }
    }
    s"""SELECT check_id, check_name, check_level, category, cdm_table_name, cdm_field_name,
       |  CAST(num_violated_rows AS BIGINT) AS num_violated_rows,
       |  CAST(num_denominator_rows AS BIGINT) AS num_denominator_rows,
       |  CAST(pct_violated_rows AS DOUBLE) AS pct_violated_rows,
       |  CAST(threshold_value AS DOUBLE) AS threshold_value,
       |  CAST(failed AS BIGINT) AS failed
       |FROM (VALUES
       |${(tableRows ++ fieldRows ++ fkRows).mkString(",\n")}
       |) AS t(check_id, check_name, check_level, category, cdm_table_name, cdm_field_name,
       |  num_violated_rows, num_denominator_rows, pct_violated_rows, threshold_value, failed)
       |ORDER BY check_id""".stripMargin
  }

  /** The same battery rendered as DuckDB SQL from the same metadata. */
  def oracleSql(model: CdmModel, bounds: Bounds = Map.empty): String = {
    val tableLevel = model.tables.map { tb =>
      s"""SELECT 'table_cdmTable_$tb' AS check_id, 'cdmTable' AS check_name, 'TABLE' AS check_level,
         |  'Conformance' AS category, '$tb' AS cdm_table_name, '' AS cdm_field_name,
         |  CAST(CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS BIGINT) AS num_violated_rows,
         |  CAST(1 AS BIGINT) AS num_denominator_rows
         |FROM $tb""".stripMargin
    }
    val perTable = model.tables.flatMap { tb =>
      perTableChecks(model, tb, bounds).map { c =>
        val violSql = c.name match {
          case "isRequired" =>
            s"count(*) FILTER (WHERE ${c.field} IS NULL)"
          case "cdmDatatype" =>
            s"count(*) FILTER (WHERE ${c.field} IS NOT NULL AND NOT regexp_matches(CAST(${c.field} AS VARCHAR), '$IntRegex'))"
          case "isPrimaryKey" =>
            s"count(*) - count(DISTINCT ${c.field})"
          case "plausibleValueLow" =>
            s"count(*) FILTER (WHERE ${c.field} < ${c.bound.get})"
          case "plausibleValueHigh" =>
            s"count(*) FILTER (WHERE ${c.field} > ${c.bound.get})"
        }
        s"""SELECT '${c.id}' AS check_id, '${c.name}' AS check_name, 'FIELD' AS check_level,
           |  '${c.category}' AS category, '${c.table}' AS cdm_table_name, '${c.field}' AS cdm_field_name,
           |  CAST($violSql AS BIGINT) AS num_violated_rows,
           |  CAST(count(*) AS BIGINT) AS num_denominator_rows
           |FROM ${c.table}""".stripMargin
      }
    }
    val perFk = model.tables.flatMap { tb =>
      model.fks(tb).toSeq.sortBy(_._1).map { case (fkCol, parent) =>
        val parentPk = model.pk(parent).get
        s"""SELECT 'field_isForeignKey_${tb}_$fkCol' AS check_id, 'isForeignKey' AS check_name,
           |  'FIELD' AS check_level, 'Conformance' AS category,
           |  '$tb' AS cdm_table_name, '$fkCol' AS cdm_field_name,
           |  CAST(count(*) FILTER (WHERE p.__pk IS NULL) AS BIGINT) AS num_violated_rows,
           |  CAST(count(*) AS BIGINT) AS num_denominator_rows
           |FROM $tb s LEFT JOIN (SELECT DISTINCT $parentPk AS __pk FROM $parent) p
           |  ON s.$fkCol = p.__pk
           |WHERE s.$fkCol IS NOT NULL""".stripMargin
      }
    }
    val union = (tableLevel ++ perTable ++ perFk).mkString("\nUNION ALL\n")
    s"""WITH checks AS (
       |$union
       |)
       |SELECT check_id, check_name, check_level, category, cdm_table_name, cdm_field_name,
       |  num_violated_rows, num_denominator_rows,
       |  round(CAST(num_violated_rows AS DOUBLE) / greatest(num_denominator_rows, 1), 6) AS pct_violated_rows,
       |  CAST(0.0 AS DOUBLE) AS threshold_value,
       |  CAST(CASE WHEN num_violated_rows > 0 THEN 1 ELSE 0 END AS BIGINT) AS failed
       |FROM checks ORDER BY check_id""".stripMargin
  }
}
