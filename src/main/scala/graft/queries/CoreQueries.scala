package graft.queries

import graft.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RiaB-core operator queries: key-swap (J4/W1/W2/A5), merge pipeline
  * (J1-J3/W3/W5/U1/U2/P2/P3), validations (A1-A4/J6/J7/O2/O4), and the
  * MERGE-emulation family (J8-J11). Every entry has a DuckDB oracle in
  * [[oracles]] with byte-identical semantics (same aliases, same rounding,
  * same deterministic ORDER BY).
  */
object CoreQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // -- §2.12-4 key-swap core ------------------------------------------------

  /** W1: dense surrogate ids over distinct order custkeys (scale-safe
    * zipWithIndex formulation of ROW_NUMBER OVER (ORDER BY x)).
    */
  val swapDenseIds: Q = (s, d) =>
    Swap.denseIds(
      t(s, d, "orders").select(col("o_custkey").as("x")).distinct(),
      Seq("x"), 0L)
      .orderBy("x")

  /** J4: anti-join — candidate keys not yet in the swap. */
  val swapAppendAnti: Q = (s, d) => {
    val existing = t(s, d, "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("x")).distinct()
    val candidates = t(s, d, "orders").select(col("o_custkey").as("x")).distinct()
    Swap.newKeys(existing, candidates, Seq("x")).orderBy("x")
  }

  /** §2.12-4 composite: append-only swap merge (J4+A5+W1+J8). */
  val swapMergeAppend: Q = (s, d) => {
    val existing = Swap.denseIds(
      t(s, d, "customer").filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("x")).distinct(),
      Seq("x"), 0L)
    val candidates = t(s, d, "orders").select(col("o_custkey").as("x"))
    Swap.mergeAppend(existing, candidates, Seq("x")).orderBy("x")
  }

  /** W2+P6: custom-concept RANK ids over the 2e9 floor. */
  val conceptRankIds: Q = (s, d) =>
    Swap.rankIds(t(s, d, "part").select(col("p_type")), "p_type", MergeOps.CustomConceptBase)
      .select(col("p_type").as("concept_code"), col("concept_id"))
      .orderBy("concept_code")

  // -- §2.12-5 merge pipeline ----------------------------------------------

  /** W3: dedup-keep-first with the deterministic ORDER-BY-all-columns
    * tie-break.
    */
  val mergeDedupKeepFirst: Q = (s, d) =>
    MergeOps.dedupKeepFirst(t(s, d, "lineitem"), Seq("l_orderkey")).orderBy("l_orderkey")

  /** The skew-salted W3 variant, bit-identical to [[mergeDedupKeepFirst]]
    * by construction (two-phase keep-first over a row-hash salt) — the
    * same oracle certifies both, flipping the salted path from
    * property-tested-only to oracle-checked.
    */
  val mergeDedupSalted: Q = (s, d) =>
    MergeOps.dedupKeepFirstSalted(t(s, d, "lineitem"), Seq("l_orderkey"))
      .orderBy("l_orderkey")

  /** J1+J2+J3+P2+P3: the merge join stack — usagi concept swap (status
    * filter in the join condition), FK swap with required-column defaults.
    */
  val mergeUsagiSwap: Q = (s, d) => {
    val orders = t(s, d, "orders")
    val usagi = Swap.denseIds(
      orders.select(col("o_orderpriority").as("sourceCode")).distinct(),
      Seq("sourceCode"), 0L, "conceptId")
      .withColumn("mappingStatus",
        when(col("sourceCode").startsWith("5"), lit("FLAGGED")).otherwise(lit("APPROVED")))
    val custSwap = Swap.denseIds(
      orders.select(col("o_custkey").as("x")).distinct(), Seq("x"), 0L)
    MergeOps.usagiJoin(orders, usagi, "o_orderpriority")
      .withColumn("priority_concept_id", coalesce(col("conceptId"), lit(0L)))
      .transform(dfj => MergeOps.fkSwapJoin(dfj, custSwap, "o_custkey", required = true))
      .select(
        col("o_orderkey"),
        col("priority_concept_id"),
        col("o_custkey").as("customer_id"))
      .orderBy("o_orderkey")
  }

  /** U1+U2+A6: upload union, DISTINCT, and the preserved-rows union tail. */
  val mergeUnionPreserve: Q = (s, d) => {
    val orders = t(s, d, "orders")
    val merged = MergeOps.unionUploads(Seq(
      orders.filter(col("o_totalprice") > 150000)
        .select(col("o_orderkey"), col("o_orderstatus"), lit("merged").as("zone")),
      orders.filter(col("o_orderpriority").startsWith("1"))
        .select(col("o_orderkey"), col("o_orderstatus"), lit("merged").as("zone"))))
      .distinct()
    val existing = orders
      .select(col("o_orderkey"), col("o_orderstatus"), lit("preserved").as("zone"))
    MergeOps.unionPreserve(merged, existing, col("o_orderkey") % 7 === 0)
      .orderBy("o_orderkey", "zone")
  }

  /** W5: `_source_value` STRING_AGG across merged duplicates, 255-capped. */
  val straggSourceValues: Q = (s, d) =>
    MergeOps.sourceValueAgg(
      t(s, d, "lineitem").withColumn("src", col("l_linenumber").cast("string")),
      Seq("l_orderkey"), "src", "source_values")
      .orderBy("l_orderkey")

  // -- validations ----------------------------------------------------------

  /** A2+O2+O4: upload duplicate-row check with aggregated offender names. */
  val dupRowsCheck: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    Validate.duplicateUploadRows(
      Seq(
        li.filter(col("l_linenumber") <= 2)
          .select(col("l_orderkey"), col("l_returnflag"), lit("u1").as("upload_table")),
        li.filter(col("l_linenumber") >= 2)
          .select(col("l_orderkey"), col("l_returnflag"), lit("u2").as("upload_table"))),
      Seq("l_orderkey", "l_returnflag"), "upload_table")
  }

  /** A1+O4: duplicate usagi mappings, count-desc. */
  val usagiDupMappings: Q = (s, d) =>
    Validate.duplicateMappings(
      t(s, d, "lineitem").select(
        col("l_returnflag").as("source_code"),
        (col("l_partkey") % 10).as("concept_id")),
      "source_code", "concept_id")

  /** A3/A4+O2: grouped duplicate check raised as error. */
  val s2cmDupCheck: Q = (s, d) =>
    Validate.duplicateKeys(
      t(s, d, "orders").select(
        col("o_orderpriority").as("source_code"),
        col("o_orderstatus").as("target_concept_id")),
      Seq("source_code", "target_concept_id"))

  /** J6+O2: missing-dimension validation join (null-detect). */
  val customConceptValidate: Q = (s, d) =>
    Validate.missingDimension(
      t(s, d, "supplier"),
      t(s, d, "nation").filter(col("n_nationkey") < 15).select(col("n_nationkey")),
      "s_nationkey", "n_nationkey")
      .orderBy("s_suppkey")
      .limit(Validate.ViolationCap)

  /** J7+O2: usagi domain check — mapped concept outside the allowed set. */
  val usagiDomainCheck: Q = (s, d) => {
    val nation = t(s, d, "nation")
    // allowed set fetched driver-side exactly like the reference's
    // _get_fk_domains (etl_base.py:323-347) — a tiny dimension scan
    val allowed = nation.filter(col("n_regionkey") < 2)
      .select(lower(col("n_name"))).collect().map(_.getString(0)).toSeq
    Validate.domainViolations(
      t(s, d, "customer").select(
        col("c_custkey").as("row_id"), col("c_nationkey").as("concept_id")),
      nation.select(col("n_nationkey").as("concept_id"), col("n_name").as("domain_id")),
      "concept_id", "domain_id", allowed)
      .select(col("row_id"), col("concept_id"), col("domain_id"))
      .orderBy("row_id")
      .limit(Validate.ViolationCap)
  }

  /** J7 warn variant + O2: mappings resolving to non-standard concepts. */
  val usagiNonstandard: Q = (s, d) => {
    val concept = t(s, d, "nation").select(
      col("n_nationkey").as("concept_id"),
      // nations in regions 0-1 act as the "standard" concepts
      when(col("n_regionkey") < 2, lit("S")).otherwise(lit(null).cast("string"))
        .as("standard_concept"))
    Validate.nonStandardMappings(
      t(s, d, "customer").select(
        col("c_custkey").as("row_id"), col("c_nationkey").as("concept_id")),
      concept, "concept_id", "standard_concept")
      .select(col("row_id"), col("concept_id"))
      .orderBy("row_id")
      .limit(Validate.ViolationCap)
  }

  // -- MERGE-emulation family ----------------------------------------------

  /** J9: MERGE-DELETE as left-anti. */
  val mergeDeleteAnti: Q = (s, d) => {
    val orders = t(s, d, "orders")
    val target = orders.select(
      col("o_orderpriority").as("source_code"),
      col("o_orderstatus").as("target_concept")).distinct()
    val deletes = orders
      .filter(col("o_orderpriority").startsWith("1") || col("o_orderpriority").startsWith("3"))
      .select(col("o_orderpriority").as("source_code"))
    Upsert.mergeDelete(target, deletes, Seq("source_code"))
      .orderBy("source_code", "target_concept")
  }

  /** J10: UPDATE-from-join — stamp generated ids into unmapped rows. */
  val updateFromJoin: Q = (s, d) => {
    val orders = t(s, d, "orders")
    val target = orders.select(col("o_orderpriority").as("source_code")).distinct()
      .withColumn("concept_id", lit(-1L))
    val updates = Swap.rankIds(
      orders.filter(col("o_orderpriority").startsWith("1") || col("o_orderpriority").startsWith("2"))
        .select(col("o_orderpriority").as("source_code")),
      "source_code", MergeOps.CustomConceptBase, "new_concept_id")
    Upsert.updateFromJoin(target, updates, Seq("source_code"), "concept_id", "new_concept_id")
      .orderBy("source_code")
  }

  /** A5+J11: MAX-scalar attached via 1x1 cross join. */
  val maxScalarCrossjoin: Q = (s, d) =>
    Upsert.withScalar(
      t(s, d, "region"),
      t(s, d, "orders").agg(coalesce(max(col("o_orderkey")), lit(0L)).as("max_key")))
      .select(col("r_name"), col("max_key"))
      .orderBy("r_name")

  /** J8: full MERGE upsert — source wins on match, both sides survive. */
  val mergeUpsert: Q = (s, d) => {
    val cust = t(s, d, "customer")
    val target = cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("v"), lit("old").as("src"))
    val source = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("k"), round(col("c_acctbal") * 2, 2).as("v"), lit("new").as("src"))
    Upsert.merge(target, source, Seq("k")).orderBy("k")
  }

  /** Step 4 of the pk-swap composite: record every swap row in the durable
    * source_id_to_omop_id_map (J8 merge keyed on (omop_table, omop_id));
    * stale entries for re-swapped ids are overwritten, other tables' rows
    * survive untouched.
    */
  val sourceIdMapMerge: Q = (s, d) => {
    import s.implicits._
    val swap = Swap.denseIds(
      t(s, d, "orders").select(col("o_custkey").as("x")).distinct(), Seq("x"), 0L)
    val mapRows = Swap.toSourceIdMap(
      swap, "customer", "orders_upload", java.sql.Date.valueOf("2026-01-01"))
    val existing = Seq(
      ("customer", 1L, "stale", "stale-1",
        java.sql.Date.valueOf("2020-01-01"), java.sql.Date.valueOf("2099-12-31"), Some("D")),
      ("provider", 999L, "other", "prov-999",
        java.sql.Date.valueOf("2020-01-01"), java.sql.Date.valueOf("2099-12-31"), None: Option[String]))
      .toDF("omop_table", "omop_id", "source", "source_id",
        "valid_start_date", "valid_end_date", "invalid_reason")
    Upsert.merge(existing, mapRows, Seq("omop_table", "omop_id"))
      .orderBy("omop_table", "omop_id")
  }

  /** [[sourceIdMapMerge]] driven through the SqlRender-subset bridge as a
    * SQL Server `MERGE INTO` statement — the reference ETL's statement
    * class (`SOURCE_ID_TO_OMOP_ID_MAP_merge.sql.jinja` shape: USING
    * subquery, qualified-ON, WHEN MATCHED UPDATE SET cascade, WHEN NOT
    * MATCHED INSERT). Same inputs and the SAME oracle as the native
    * [[graft.operators.Upsert.merge]] path, pinning the bridge's MERGE
    * emulation to the native operator row-for-row.
    */
  val ohdsiSqlMergeFlow: Q = (s, d) => {
    import s.implicits._
    val swap = Swap.denseIds(
      t(s, d, "orders").select(col("o_custkey").as("x")).distinct(), Seq("x"), 0L)
    Swap.toSourceIdMap(
        swap, "customer", "orders_upload", java.sql.Date.valueOf("2026-01-01"))
      .createOrReplaceTempView("merge_flow_src")
    Seq(
      ("customer", 1L, "stale", "stale-1",
        java.sql.Date.valueOf("2020-01-01"), java.sql.Date.valueOf("2099-12-31"), Some("D")),
      ("provider", 999L, "other", "prov-999",
        java.sql.Date.valueOf("2020-01-01"), java.sql.Date.valueOf("2099-12-31"), None: Option[String]))
      .toDF("omop_table", "omop_id", "source", "source_id",
        "valid_start_date", "valid_end_date", "invalid_reason")
      .createOrReplaceTempView("tmp_ohdsi_s2omap")
    graft.sources.OhdsiSql.execute(s,
      """MERGE INTO #s2omap AS T
        |USING (
        |  SELECT omop_table, omop_id, source, source_id,
        |    valid_start_date, valid_end_date, invalid_reason
        |  FROM merge_flow_src
        |) AS S
        |ON S.omop_table = T.omop_table AND S.omop_id = T.omop_id
        |WHEN MATCHED THEN
        |  UPDATE SET T.source = S.source
        |    ,T.source_id = S.source_id
        |    ,T.valid_start_date = S.valid_start_date
        |    ,T.valid_end_date = S.valid_end_date
        |    ,T.invalid_reason = S.invalid_reason
        |WHEN NOT MATCHED THEN
        |  INSERT (omop_table, omop_id, source, source_id,
        |    valid_start_date, valid_end_date, invalid_reason)
        |  VALUES (S.omop_table, S.omop_id, S.source, S.source_id,
        |    S.valid_start_date, S.valid_end_date, S.invalid_reason);
        |SELECT omop_table, omop_id, source, source_id, valid_start_date,
        |  valid_end_date, invalid_reason
        |FROM #s2omap ORDER BY omop_table, omop_id""".stripMargin)
  }

  /** The reference's ETL MAINTENANCE SCRIPT pattern end-to-end through
    * the bridge — one multi-statement script composing every statement
    * class its template tree renders: UPDATE..FROM under a CTE (custom-
    * concept id injection, `..._usagi_update_custom_concepts.sql.jinja`),
    * MERGE INTO (the map upsert, `SOURCE_TO_CONCEPT_MAP_merge.sql
    * .jinja`), plain UPDATE (tombstoning,
    * `SOURCE_TO_CONCEPT_MAP_update_invalid_reason.sql.jinja`), and
    * DELETE (the cleanup class). The oracle replays the script's net
    * effect declaratively.
    */
  val ohdsiSqlEtlScript: Q = (s, d) => {
    import s.implicits._
    val codes = t(s, d, "orders")
      .select(col("o_orderpriority").as("sourceCode")).distinct()
    codes
      .withColumn("conceptId", lit(0L))
      .withColumn("mappingStatus",
        when(col("sourceCode").startsWith("5"), lit("FLAGGED"))
          .otherwise(lit("APPROVED")))
      .createOrReplaceTempView("tmp_ohdsi_usagi_scr")
    Swap.rankIds(codes, "sourceCode", MergeOps.CustomConceptBase)
      .select(col("sourceCode").as("concept_code"), col("concept_id"))
      .createOrReplaceTempView("usagi_scr_concepts")
    Seq(
      ("1-URGENT", 999L, java.sql.Date.valueOf("2020-01-01"),
        Option.empty[String]),
      ("0-ZOMBIE", 111L, java.sql.Date.valueOf("2020-01-01"),
        Option.empty[String]))
      .toDF("source_code", "target_concept_id", "valid_start_date", "invalid_reason")
      .createOrReplaceTempView("tmp_ohdsi_s2cm_scr")
    graft.sources.OhdsiSql.execute(s,
      """-- inject custom-concept ids into unmapped APPROVED usagi rows
        |WITH cte_custom_concepts AS (
        |  SELECT DISTINCT concept_code, concept_id FROM usagi_scr_concepts
        |)
        |UPDATE T
        |SET T.conceptId = c.concept_id
        |FROM #usagi_scr AS T
        |INNER JOIN cte_custom_concepts c ON T.sourceCode = c.concept_code
        |  AND T.mappingStatus = 'APPROVED'
        |  AND (T.conceptId IS NULL or T.conceptId = 0);
        |-- upsert the approved mappings into the map
        |MERGE INTO #s2cm_scr AS T
        |USING (
        |  SELECT sourceCode AS source_code, conceptId AS target_concept_id,
        |    CAST('2026-06-01' AS DATE) AS valid_start_date,
        |    NULL AS invalid_reason
        |  FROM #usagi_scr WHERE mappingStatus = 'APPROVED'
        |) AS S
        |ON S.source_code = T.source_code
        |WHEN MATCHED THEN
        |  UPDATE SET T.target_concept_id = S.target_concept_id
        |    ,T.valid_start_date = S.valid_start_date
        |    ,T.invalid_reason = S.invalid_reason
        |WHEN NOT MATCHED THEN
        |  INSERT (source_code, target_concept_id, valid_start_date, invalid_reason)
        |  VALUES (S.source_code, S.target_concept_id, S.valid_start_date,
        |    S.invalid_reason);
        |-- tombstone mappings not refreshed by this run
        |UPDATE #s2cm_scr SET invalid_reason = 'D'
        |WHERE valid_start_date < CAST('2026-01-01' AS DATE);
        |-- cleanup: drop the tombstoned rows
        |DELETE FROM #s2cm_scr WHERE invalid_reason = 'D';
        |SELECT source_code, target_concept_id, valid_start_date
        |FROM #s2cm_scr ORDER BY source_code""".stripMargin)
  }

  /** S9+S10+A6 (§2.12-1): arbitrary user SELECT over registered raw views,
    * DISTINCT'ed into an upload table.
    */
  val etlUserQuery: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT c_mktsegment AS segment, n_name AS nation
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin)
      .distinct()
      .orderBy("segment", "nation")
  }

  /** Shared by the native Upsert path and the bridge MERGE statement —
    * one oracle, two implementations pinned identical.
    */
  private lazy val sourceIdMapOracle: String =
    """WITH swap AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS y
        |  FROM (SELECT DISTINCT o_custkey AS x FROM orders)
        |), map_rows AS (
        |  SELECT DISTINCT 'customer' AS omop_table, y AS omop_id,
        |    'orders_upload' AS source, CAST(x AS VARCHAR) AS source_id,
        |    DATE '2026-01-01' AS valid_start_date, DATE '2099-12-31' AS valid_end_date,
        |    CAST(NULL AS VARCHAR) AS invalid_reason
        |  FROM swap
        |), existing AS (
        |  SELECT 'customer' AS omop_table, CAST(1 AS BIGINT) AS omop_id, 'stale' AS source,
        |    'stale-1' AS source_id, DATE '2020-01-01' AS valid_start_date,
        |    DATE '2099-12-31' AS valid_end_date, 'D' AS invalid_reason
        |  UNION ALL
        |  SELECT 'provider', 999, 'other', 'prov-999', DATE '2020-01-01',
        |    DATE '2099-12-31', NULL
        |)
        |SELECT COALESCE(t.omop_table, s.omop_table) AS omop_table,
        |  COALESCE(t.omop_id, s.omop_id) AS omop_id,
        |  CASE WHEN s.omop_id IS NOT NULL THEN s.source ELSE t.source END AS source,
        |  CASE WHEN s.omop_id IS NOT NULL THEN s.source_id ELSE t.source_id END AS source_id,
        |  CASE WHEN s.omop_id IS NOT NULL THEN s.valid_start_date ELSE t.valid_start_date END AS valid_start_date,
        |  CASE WHEN s.omop_id IS NOT NULL THEN s.valid_end_date ELSE t.valid_end_date END AS valid_end_date,
        |  CASE WHEN s.omop_id IS NOT NULL THEN s.invalid_reason ELSE t.invalid_reason END AS invalid_reason
        |FROM existing t FULL OUTER JOIN map_rows s
        |  ON t.omop_table = s.omop_table AND t.omop_id = s.omop_id
        |ORDER BY omop_table, omop_id""".stripMargin

  val defs: Seq[(String, Q)] = Seq(
    "swap_dense_ids" -> swapDenseIds,
    "swap_append_anti" -> swapAppendAnti,
    "swap_merge_append" -> swapMergeAppend,
    "concept_rank_ids" -> conceptRankIds,
    "merge_dedup_keep_first" -> mergeDedupKeepFirst,
    "merge_dedup_salted" -> mergeDedupSalted,
    "merge_usagi_swap" -> mergeUsagiSwap,
    "merge_union_preserve" -> mergeUnionPreserve,
    "stragg_source_values" -> straggSourceValues,
    "dup_rows_check" -> dupRowsCheck,
    "usagi_dup_mappings" -> usagiDupMappings,
    "s2cm_dup_check" -> s2cmDupCheck,
    "custom_concept_validate" -> customConceptValidate,
    "usagi_domain_check" -> usagiDomainCheck,
    "usagi_nonstandard" -> usagiNonstandard,
    "merge_delete_anti" -> mergeDeleteAnti,
    "update_from_join" -> updateFromJoin,
    "max_scalar_crossjoin" -> maxScalarCrossjoin,
    "merge_upsert" -> mergeUpsert,
    "source_id_map_merge" -> sourceIdMapMerge,
    "ohdsi_sql_merge_flow" -> ohdsiSqlMergeFlow,
    "ohdsi_sql_etl_script" -> ohdsiSqlEtlScript,
    "etl_user_query" -> etlUserQuery)

  val oracles: Seq[(String, String)] = Seq(
    "swap_dense_ids" ->
      """SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS y
        |FROM (SELECT DISTINCT o_custkey AS x FROM orders) ORDER BY x""".stripMargin,
    "swap_append_anti" ->
      """SELECT DISTINCT o_custkey AS x FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_custkey % 3 = 0)
        |ORDER BY x""".stripMargin,
    "swap_merge_append" ->
      """WITH existing AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS y
        |  FROM (SELECT DISTINCT c_custkey AS x FROM customer WHERE c_custkey % 3 = 0)
        |), newk AS (
        |  SELECT DISTINCT o_custkey AS x FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.x = o_custkey)
        |), mx AS (SELECT COALESCE(MAX(y), 0) AS m FROM existing)
        |SELECT x, y FROM existing
        |UNION ALL
        |SELECT x, CAST(row_number() OVER (ORDER BY x) + (SELECT m FROM mx) AS BIGINT) AS y
        |FROM newk
        |ORDER BY x""".stripMargin,
    "concept_rank_ids" ->
      """SELECT DISTINCT p_type AS concept_code,
        |  CAST(2000000000 + rank() OVER (ORDER BY p_type) AS BIGINT) AS concept_id
        |FROM part ORDER BY concept_code""".stripMargin,
    "merge_dedup_keep_first" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS rn
        |  FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "merge_dedup_salted" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS rn
        |  FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "merge_usagi_swap" ->
      """WITH usagi AS (
        |  SELECT sourceCode, CAST(row_number() OVER (ORDER BY sourceCode) AS BIGINT) AS conceptId,
        |    CASE WHEN sourceCode LIKE '5%' THEN 'FLAGGED' ELSE 'APPROVED' END AS mappingStatus
        |  FROM (SELECT DISTINCT o_orderpriority AS sourceCode FROM orders)
        |), cust_swap AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS y
        |  FROM (SELECT DISTINCT o_custkey AS x FROM orders)
        |)
        |SELECT o.o_orderkey,
        |  COALESCE(u.conceptId, 0) AS priority_concept_id,
        |  COALESCE(s.y, 0) AS customer_id
        |FROM orders o
        |LEFT JOIN usagi u ON o.o_orderpriority = u.sourceCode AND u.mappingStatus IN ('APPROVED')
        |LEFT JOIN cust_swap s ON o.o_custkey = s.x
        |ORDER BY o.o_orderkey""".stripMargin,
    "merge_union_preserve" ->
      """WITH merged AS (
        |  SELECT DISTINCT o_orderkey, o_orderstatus, 'merged' AS zone FROM (
        |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
        |    UNION ALL
        |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority LIKE '1%')
        |)
        |SELECT * FROM merged
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, 'preserved' AS zone FROM orders WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey, zone""".stripMargin,
    "stragg_source_values" ->
      """SELECT l_orderkey,
        |  substr(string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY CAST(l_linenumber AS VARCHAR)), 1, 255) AS source_values
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "dup_rows_check" ->
      """WITH all_up AS (
        |  SELECT l_orderkey, l_returnflag, 'u1' AS upload_table FROM lineitem WHERE l_linenumber <= 2
        |  UNION ALL
        |  SELECT l_orderkey, l_returnflag, 'u2' FROM lineitem WHERE l_linenumber >= 2
        |)
        |SELECT l_orderkey, l_returnflag, count(*) AS cnt,
        |  array_to_string(list_sort(list_distinct(list(upload_table))), ',') AS upload_tables
        |FROM all_up GROUP BY l_orderkey, l_returnflag HAVING count(*) > 1
        |ORDER BY cnt DESC, l_orderkey, l_returnflag LIMIT 100""".stripMargin,
    "usagi_dup_mappings" ->
      """SELECT l_returnflag AS source_code, l_partkey % 10 AS concept_id, count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY cnt DESC, source_code, concept_id LIMIT 100""".stripMargin,
    "s2cm_dup_check" ->
      """SELECT o_orderpriority AS source_code, o_orderstatus AS target_concept_id, count(*) AS cnt
        |FROM orders GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY cnt DESC, source_code, target_concept_id LIMIT 100""".stripMargin,
    "custom_concept_validate" ->
      """SELECT s.* FROM supplier s
        |LEFT JOIN (SELECT n_nationkey FROM nation WHERE n_nationkey < 15) d
        |  ON s.s_nationkey = d.n_nationkey
        |WHERE d.n_nationkey IS NULL ORDER BY s_suppkey LIMIT 100""".stripMargin,
    "usagi_domain_check" ->
      """SELECT u.row_id, u.concept_id, c.domain_id
        |FROM (SELECT c_custkey AS row_id, c_nationkey AS concept_id FROM customer) u
        |JOIN (SELECT n_nationkey AS ck, n_name AS domain_id FROM nation) c ON u.concept_id = c.ck
        |WHERE lower(c.domain_id) NOT IN (SELECT lower(n_name) FROM nation WHERE n_regionkey < 2)
        |ORDER BY row_id LIMIT 100""".stripMargin,
    "usagi_nonstandard" ->
      """SELECT u.row_id, u.concept_id
        |FROM (SELECT c_custkey AS row_id, c_nationkey AS concept_id FROM customer) u
        |JOIN (SELECT n_nationkey AS ck,
        |        CASE WHEN n_regionkey < 2 THEN 'S' ELSE NULL END AS standard_concept
        |      FROM nation) c ON u.concept_id = c.ck
        |WHERE c.standard_concept IS NULL OR c.standard_concept <> 'S'
        |ORDER BY row_id LIMIT 100""".stripMargin,
    "merge_delete_anti" ->
      """WITH t AS (SELECT DISTINCT o_orderpriority AS source_code, o_orderstatus AS target_concept FROM orders)
        |SELECT * FROM t WHERE source_code NOT IN (
        |  SELECT DISTINCT o_orderpriority FROM orders
        |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '3%')
        |ORDER BY source_code, target_concept""".stripMargin,
    "update_from_join" ->
      """WITH target AS (SELECT DISTINCT o_orderpriority AS source_code, CAST(-1 AS BIGINT) AS concept_id FROM orders),
        |upd AS (
        |  SELECT DISTINCT source_code,
        |    CAST(2000000000 + rank() OVER (ORDER BY source_code) AS BIGINT) AS new_concept_id
        |  FROM (SELECT o_orderpriority AS source_code FROM orders
        |        WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
        |)
        |SELECT t.source_code, COALESCE(u.new_concept_id, t.concept_id) AS concept_id
        |FROM target t LEFT JOIN upd u ON t.source_code = u.source_code
        |ORDER BY t.source_code""".stripMargin,
    "max_scalar_crossjoin" ->
      """SELECT r_name, (SELECT COALESCE(MAX(o_orderkey), 0) FROM orders) AS max_key
        |FROM region ORDER BY r_name""".stripMargin,
    "merge_upsert" ->
      """WITH target AS (
        |  SELECT c_custkey AS k, c_acctbal AS v, 'old' AS src FROM customer WHERE c_custkey % 2 = 0
        |), source AS (
        |  SELECT c_custkey AS k, round(c_acctbal * 2, 2) AS v, 'new' AS src FROM customer WHERE c_custkey % 3 = 0
        |)
        |SELECT COALESCE(t.k, s.k) AS k,
        |  CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v,
        |  CASE WHEN s.k IS NOT NULL THEN s.src ELSE t.src END AS src
        |FROM target t FULL OUTER JOIN source s ON t.k = s.k
        |ORDER BY k""".stripMargin,
    "source_id_map_merge" -> sourceIdMapOracle,
    "ohdsi_sql_merge_flow" -> sourceIdMapOracle,
    // the maintenance script's net effect: approved codes carry rank-based
    // custom ids and the refreshed date; flagged codes never merge; the
    // stale zombie row tombstones and is deleted
    "ohdsi_sql_etl_script" ->
      """WITH codes AS (SELECT DISTINCT o_orderpriority AS source_code FROM orders)
        |SELECT source_code,
        |  CAST(2000000000 + rank() OVER (ORDER BY source_code) AS BIGINT)
        |    AS target_concept_id,
        |  DATE '2026-06-01' AS valid_start_date
        |FROM codes WHERE source_code NOT LIKE '5%'
        |ORDER BY source_code""".stripMargin,
    "etl_user_query" ->
      """SELECT DISTINCT c_mktsegment AS segment, n_name AS nation
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY segment, nation""".stripMargin)
}
