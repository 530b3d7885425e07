package graft.queries

import graft.Tables
import graft.model.{CdmField, CdmModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORACLE-GATED literal OHDSI Achilles batteries (round-7).
  *
  * The literal-id core batteries ([[graft.operators.OhdsiAchilles]]) were
  * previously exercised only by the CLI spec's CDM fixture — the driver's
  * DuckDB gate never replayed them, because the driver test tables are
  * TPC-H-shaped. These queries close that gap by DERIVING a deterministic
  * CDM universe from the TPC-H tables (person <- customer,
  * observation_period <- orders per customer, visit_occurrence <- orders,
  * condition_occurrence <- lineitem x orders — the multi-concept-per-person
  * domain) and running the real batteries over it; the oracle replays the same
  * derivation and the same analyses in DuckDB SQL, so every literal
  * analysis id is now rows+schema+hash checked at sf0.01 like any other
  * operator (`achilles.py:54-227` is the reference flow being mirrored;
  * concept ids are the public OMOP standard ones: gender 8507/8532,
  * ethnicity 38003563/38003564, visit 9201/9202/9203).
  */
object OhdsiCdmQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private def f(tb: String, n: String, dt: String, pk: Boolean = false) =
    CdmField(tb, n, dt, required = false, isPk = pk, None, "CDM")

  /** The derived universe's CDM model: exactly the tables/columns the
    * derivation below produces, so the batteries' `has` guards enable the
    * person + observation-period + visit families (and nothing else).
    */
  val derivedModel: CdmModel = CdmModel(fields = Seq(
    f("person", "person_id", "int64", pk = true),
    f("person", "gender_concept_id", "int64"),
    f("person", "year_of_birth", "int64"),
    f("person", "race_concept_id", "int64"),
    f("person", "ethnicity_concept_id", "int64"),
    f("observation_period", "person_id", "int64"),
    f("observation_period", "observation_period_start_date", "date"),
    f("observation_period", "observation_period_end_date", "date"),
    f("visit_occurrence", "visit_occurrence_id", "int64", pk = true),
    f("visit_occurrence", "person_id", "int64"),
    f("visit_occurrence", "visit_concept_id", "int64"),
    f("visit_occurrence", "visit_start_date", "date"),
    f("condition_occurrence", "person_id", "int64"),
    f("condition_occurrence", "condition_concept_id", "int64"),
    f("condition_occurrence", "condition_start_date", "date"),
    f("condition_occurrence", "condition_type_concept_id", "int64")))

  /** Deterministic CDM derivation from the TPC-H universe. Every rule is a
    * pure projection/aggregation the DuckDB oracle replays verbatim:
    *  - person: one per customer; gender/birth-year/race/ethnicity are
    *    arithmetic on c_custkey (public OMOP concept ids).
    *  - observation_period: one per customer WITH orders, spanning that
    *    customer's first..last order date.
    *  - visit_occurrence: one per order; visit kind maps from order status.
    */
  def derive(s: SparkSession, d: String)(table: String): DataFrame = table match {
    case "person" =>
      t(s, d, "customer").select(
        col("c_custkey").as("person_id"),
        when(col("c_custkey") % 2 === 0, 8532L).otherwise(8507L).as("gender_concept_id"),
        (lit(1940L) + col("c_custkey") % 60).as("year_of_birth"),
        (lit(8516L) + col("c_custkey") % 3).as("race_concept_id"),
        when(col("c_custkey") % 2 === 0, 38003563L).otherwise(38003564L)
          .as("ethnicity_concept_id"))
    case "observation_period" =>
      // o_orderdate is parquet timestamp[ms]; both engines work in DATE so
      // every datediff/month/year below is coercion-free
      t(s, d, "orders").groupBy(col("o_custkey").as("person_id"))
        .agg(min(to_date(col("o_orderdate"))).as("observation_period_start_date"),
          max(to_date(col("o_orderdate"))).as("observation_period_end_date"))
    case "visit_occurrence" =>
      t(s, d, "orders").select(
        col("o_orderkey").as("visit_occurrence_id"),
        col("o_custkey").as("person_id"),
        when(col("o_orderstatus") === "O", 9201L)
          .when(col("o_orderstatus") === "F", 9202L)
          .otherwise(9203L).as("visit_concept_id"),
        to_date(col("o_orderdate")).as("visit_start_date"))
    case "condition_occurrence" =>
      // one condition per order LINE: the multi-concept-per-person domain
      // the x03 (distinct concepts per person) and x05 (records by concept
      // by type) analyses need. Concepts are public SNOMED standard ids
      // (diabetes/hypertension/MI/COPD), types the public OMOP condition
      // type ids (EHR 32020 / EHR problem list 32840 / claim 32810).
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(
          col("o_custkey").as("person_id"),
          when(col("l_partkey") % 4 === 0, 201826L)
            .when(col("l_partkey") % 4 === 1, 316866L)
            .when(col("l_partkey") % 4 === 2, 4329847L)
            .otherwise(255573L).as("condition_concept_id"),
          to_date(col("l_shipdate")).as("condition_start_date"),
          when(col("l_returnflag") === "R", 32810L)
            .when(col("l_returnflag") === "A", 32840L)
            .otherwise(32020L).as("condition_type_concept_id"))
    case other => sys.error(s"derived CDM has no table '$other'")
  }

  /** The literal-id core COUNT battery over the derived CDM (analyses
    * 0-5, 101/102, 108-113, 200/201/202, 400/401/402/405 fire for this
    * model).
    */
  val ohdsiCoreCounts: Q = (s, d) =>
    graft.operators.OhdsiAchilles.cdmCoreResults(derivedModel, derive(s, d))
      .orderBy("analysis_id", "stratum_1", "stratum_2")

  /** The literal-id core DIST battery over the derived CDM (103-107,
    * 203, 403).
    */
  val ohdsiCoreDist: Q = (s, d) =>
    graft.operators.OhdsiAchilles.cdmCoreDistResults(derivedModel, derive(s, d))
      .orderBy("analysis_id", "stratum_1")

  val defs: Seq[(String, Q)] = Seq(
    "ohdsi_core_counts" -> ohdsiCoreCounts,
    "ohdsi_core_dist" -> ohdsiCoreDist)

  /** The derivation CTEs shared by both oracles. */
  private val deriveSql: String =
    """person AS (
      |  SELECT c_custkey AS person_id,
      |    CASE WHEN c_custkey % 2 = 0 THEN 8532 ELSE 8507 END AS gender_concept_id,
      |    1940 + c_custkey % 60 AS year_of_birth,
      |    8516 + c_custkey % 3 AS race_concept_id,
      |    CASE WHEN c_custkey % 2 = 0 THEN 38003563 ELSE 38003564 END AS ethnicity_concept_id
      |  FROM customer
      |), obs AS (
      |  SELECT o_custkey AS person_id,
      |    min(CAST(o_orderdate AS DATE)) AS op_start,
      |    max(CAST(o_orderdate AS DATE)) AS op_end
      |  FROM orders GROUP BY o_custkey
      |), visit AS (
      |  SELECT o_orderkey AS visit_occurrence_id, o_custkey AS person_id,
      |    CASE o_orderstatus WHEN 'O' THEN 9201 WHEN 'F' THEN 9202 ELSE 9203 END
      |      AS visit_concept_id,
      |    CAST(o_orderdate AS DATE) AS visit_start_date
      |  FROM orders
      |), cond AS (
      |  SELECT o_custkey AS person_id,
      |    CASE CAST(l_partkey % 4 AS INT)
      |      WHEN 0 THEN 201826 WHEN 1 THEN 316866 WHEN 2 THEN 4329847
      |      ELSE 255573 END AS condition_concept_id,
      |    CAST(l_shipdate AS DATE) AS condition_start_date,
      |    CASE l_returnflag WHEN 'R' THEN 32810 WHEN 'A' THEN 32840
      |      ELSE 32020 END AS condition_type_concept_id
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), first_obs AS (
      |  -- one period per person in this universe, so the "first period"
      |  -- of analyses 101-108 is the period itself
      |  SELECT p.person_id, p.gender_concept_id, o.op_start, o.op_end,
      |    year(o.op_start) - p.year_of_birth AS age
      |  FROM person p JOIN obs o ON p.person_id = o.person_id
      |)""".stripMargin

  val countsOracle: String =
    s"""WITH $deriveSql,
      |results AS (
      |  SELECT CAST(0 AS BIGINT) AS analysis_id, 'graft' AS stratum_1,
      |    CAST(NULL AS VARCHAR) AS stratum_2, CAST(1 AS BIGINT) AS count_value
      |  UNION ALL
      |  SELECT 1, 'ALL', NULL, count(*) FROM person
      |  UNION ALL
      |  SELECT 2, CAST(gender_concept_id AS VARCHAR), NULL, count(*)
      |  FROM person GROUP BY 2
      |  UNION ALL
      |  SELECT 3, CAST(year_of_birth AS VARCHAR), NULL, count(*) FROM person GROUP BY 2
      |  UNION ALL
      |  SELECT 4, CAST(race_concept_id AS VARCHAR), NULL, count(*) FROM person GROUP BY 2
      |  UNION ALL
      |  SELECT 5, CAST(ethnicity_concept_id AS VARCHAR), NULL, count(*) FROM person GROUP BY 2
      |  UNION ALL
      |  SELECT 101, CAST(age AS VARCHAR), NULL, count(*) FROM first_obs GROUP BY 2
      |  UNION ALL
      |  SELECT 102, CAST(gender_concept_id AS VARCHAR), CAST(age AS VARCHAR), count(*)
      |  FROM first_obs GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 108, CAST(CAST(floor(datediff('day', op_start, op_end) / 30) AS BIGINT) AS VARCHAR),
      |    NULL, count(*)
      |  FROM obs GROUP BY 2
      |  UNION ALL
      |  SELECT 109, CAST(y AS VARCHAR), NULL, count(DISTINCT person_id) FROM (
      |    SELECT person_id, op_start, op_end,
      |      unnest(generate_series(year(op_start), year(op_end))) AS y
      |    FROM obs
      |  ) WHERE op_start <= make_date(y, 1, 1) AND op_end >= make_date(y, 12, 31)
      |  GROUP BY 2
      |  UNION ALL
      |  SELECT 110, strftime(m, '%Y%m'), NULL, count(DISTINCT person_id) FROM (
      |    SELECT person_id, op_start, op_end,
      |      unnest(generate_series(
      |        CAST(date_trunc('month', op_start) AS DATE),
      |        CAST(date_trunc('month', op_end) AS DATE),
      |        INTERVAL 1 MONTH)) AS m
      |    FROM obs
      |  ) WHERE op_start <= m AND op_end >= last_day(CAST(m AS DATE))
      |  GROUP BY 2
      |  UNION ALL
      |  SELECT 111, strftime(op_start, '%Y%m'), NULL, count(DISTINCT person_id)
      |  FROM obs GROUP BY 2
      |  UNION ALL
      |  SELECT 112, strftime(op_end, '%Y%m'), NULL, count(DISTINCT person_id)
      |  FROM obs GROUP BY 2
      |  UNION ALL
      |  SELECT 113, '1', NULL, count(*) FROM obs
      |  UNION ALL
      |  SELECT 200, CAST(visit_concept_id AS VARCHAR), NULL, count(DISTINCT person_id)
      |  FROM visit GROUP BY 2
      |  UNION ALL
      |  SELECT 201, CAST(visit_concept_id AS VARCHAR), NULL, count(*) FROM visit GROUP BY 2
      |  UNION ALL
      |  SELECT 202, CAST(visit_concept_id AS VARCHAR), strftime(visit_start_date, '%Y%m'),
      |    count(DISTINCT person_id)
      |  FROM visit GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 400, CAST(condition_concept_id AS VARCHAR), NULL, count(DISTINCT person_id)
      |  FROM cond GROUP BY 2
      |  UNION ALL
      |  SELECT 401, CAST(condition_concept_id AS VARCHAR), NULL, count(*) FROM cond GROUP BY 2
      |  UNION ALL
      |  SELECT 402, CAST(condition_concept_id AS VARCHAR),
      |    strftime(condition_start_date, '%Y%m'), count(DISTINCT person_id)
      |  FROM cond GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 405, CAST(condition_concept_id AS VARCHAR),
      |    CAST(condition_type_concept_id AS VARCHAR), count(*)
      |  FROM cond GROUP BY 2, 3
      |)
      |SELECT analysis_id, stratum_1, stratum_2, count_value
      |FROM results WHERE count_value > 5 OR analysis_id = 0
      |ORDER BY analysis_id, stratum_1, stratum_2""".stripMargin

  val distOracle: String =
    s"""WITH $deriveSql,
      |d AS (
      |  SELECT CAST(103 AS BIGINT) AS analysis_id, 'ALL' AS stratum_1,
      |    CAST(age AS DOUBLE) AS v FROM first_obs
      |  UNION ALL
      |  SELECT 104, CAST(gender_concept_id AS VARCHAR), CAST(age AS DOUBLE) FROM first_obs
      |  UNION ALL
      |  SELECT 105, 'ALL', CAST(datediff('day', op_start, op_end) AS DOUBLE) FROM first_obs
      |  UNION ALL
      |  SELECT 106, CAST(gender_concept_id AS VARCHAR),
      |    CAST(datediff('day', op_start, op_end) AS DOUBLE) FROM first_obs
      |  UNION ALL
      |  SELECT 107, CAST(CAST(floor(age / 10) AS BIGINT) AS VARCHAR),
      |    CAST(datediff('day', op_start, op_end) AS DOUBLE) FROM first_obs
      |  UNION ALL
      |  SELECT 203, 'ALL', CAST(n AS DOUBLE) FROM (
      |    SELECT person_id, count(DISTINCT visit_concept_id) AS n FROM visit GROUP BY person_id
      |  )
      |  UNION ALL
      |  SELECT 403, 'ALL', CAST(n AS DOUBLE) FROM (
      |    SELECT person_id, count(DISTINCT condition_concept_id) AS n FROM cond GROUP BY person_id
      |  )
      |)
      |SELECT analysis_id, stratum_1, count(*) AS count_value,
      |  round(min(v), 4) AS min_value, round(max(v), 4) AS max_value,
      |  ${graft.operators.AchillesGen.MomentsSql}
      |  round(quantile_cont(v, 0.1), 4) AS p10_value,
      |  round(quantile_cont(v, 0.25), 4) AS p25_value,
      |  round(quantile_cont(v, 0.5), 4) AS median_value,
      |  round(quantile_cont(v, 0.75), 4) AS p75_value,
      |  round(quantile_cont(v, 0.9), 4) AS p90_value
      |FROM d
      |GROUP BY 1, 2 HAVING count(*) > 5
      |ORDER BY 1, 2""".stripMargin

  val oracles: Seq[(String, String)] = Seq(
    "ohdsi_core_counts" -> countsOracle,
    "ohdsi_core_dist" -> distOracle)
}
