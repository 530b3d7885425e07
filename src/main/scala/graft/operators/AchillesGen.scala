package graft.operators

import graft.model.CdmModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

/** Metadata-GENERATED Achilles analysis battery: the reference instantiates
  * its ~290 analyses from a config CSV over the CDM schema
  * (`/root/reference/src/riab/etl/achilles.py:54-227` builds the analysis
  * list, `:465-505` runs each as a scratch query, `:507-561` merges them
  * into `achilles_results`). This generator derives the same *families*
  * from the model's own metadata — so adding a table to the model grows the
  * battery with no code change:
  *
  *  - per table: total record count        (family 1/1xx "count of rows")
  *  - per string column: records by value  (the "by stratum" family)
  *  - per datetime column: records by year (the "by month/year" family)
  *  - per FK column: distinct referenced entities (the "N persons" shape)
  *
  * Every analysis lands in the standard `achilles_results` row shape
  * `(analysis_id, stratum_1, count_value)` with small-cell suppression
  * (counts <= 5, `achilles.py:27`). Analysis ids are assigned
  * deterministically from the model enumeration. [[oracleSql]] renders the
  * identical battery from the identical metadata.
  *
  * Scale shape: one aggregation per analysis, exactly like the reference's
  * scratch tables — each is a single groupBy (map-side combinable), merged
  * with UNION ALL; high-cardinality strata are real Achilles behavior and
  * the suppression filter prunes them after the partial aggregate.
  */
object AchillesGen {

  sealed private trait Kind
  private case object CountRows extends Kind
  private case object ByValue extends Kind
  private case object ByYear extends Kind
  private case object DistinctFk extends Kind

  private final case class Analysis(id: Long, kind: Kind, table: String, column: String)

  private def analyses(model: CdmModel): Seq[Analysis] = {
    val items = model.tables.flatMap { tb =>
      val fks = model.fks(tb).keySet
      Seq((CountRows: Kind, tb, "")) ++
        model.sparkSchema(tb).fields.collect {
          case f if f.dataType == StringType => (ByValue: Kind, tb, f.name)
          case f if f.dataType == TimestampType => (ByYear: Kind, tb, f.name)
        } ++
        model.sparkSchema(tb).fields.collect {
          case f if fks.contains(f.name) => (DistinctFk: Kind, tb, f.name)
        }
    }
    items.zipWithIndex.map { case ((k, t, c), i) => Analysis(1000L + i, k, t, c) }
  }

  def results(model: CdmModel, load: String => DataFrame): DataFrame =
    analyses(model).map { a =>
      val df = load(a.table)
      val shaped = a.kind match {
        case CountRows =>
          df.agg(count(lit(1)).as("count_value"))
            .select(lit(a.id).as("analysis_id"), lit("ALL").as("stratum_1"), col("count_value"))
        case ByValue =>
          df.groupBy(col(a.column).as("stratum_1"))
            .agg(count(lit(1)).as("count_value"))
            .select(lit(a.id).as("analysis_id"), col("stratum_1"), col("count_value"))
        case ByYear =>
          df.groupBy(year(col(a.column)).cast("string").as("stratum_1"))
            .agg(count(lit(1)).as("count_value"))
            .select(lit(a.id).as("analysis_id"), col("stratum_1"), col("count_value"))
        case DistinctFk =>
          df.agg(countDistinct(col(a.column)).as("count_value"))
            .select(lit(a.id).as("analysis_id"), lit("ALL").as("stratum_1"), col("count_value"))
      }
      shaped
    }.reduce(_ unionByName _)
      .filter(col("count_value") > 5)
      .orderBy("analysis_id", "stratum_1")

  def oracleSql(model: CdmModel): String = {
    val selects = analyses(model).map { a =>
      a.kind match {
        case CountRows =>
          s"SELECT CAST(${a.id} AS BIGINT) AS analysis_id, 'ALL' AS stratum_1, count(*) AS count_value FROM ${a.table}"
        case ByValue =>
          s"SELECT ${a.id}, ${a.column}, count(*) FROM ${a.table} GROUP BY 2"
        case ByYear =>
          s"SELECT ${a.id}, CAST(year(${a.column}) AS VARCHAR), count(*) FROM ${a.table} GROUP BY 2"
        case DistinctFk =>
          s"SELECT ${a.id}, 'ALL', count(DISTINCT ${a.column}) FROM ${a.table}"
      }
    }
    s"""WITH results AS (
       |${selects.mkString("\nUNION ALL\n")}
       |)
       |SELECT analysis_id, stratum_1, count_value FROM results
       |WHERE count_value > 5
       |ORDER BY analysis_id, stratum_1""".stripMargin
  }
}
