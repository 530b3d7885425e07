package graft.queries

import graft.Tables
import graft.io.{AtomicWrite, Zones}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed §2.12 pipelines — every ingredient operator is green on its
  * own; these entries cook the dish end-to-end the way `_process_omop_table`
  * does (`/root/reference/src/riab/etl/etl.py:177-323`), including the
  * J2 PK-swap inner join with null-normalized compound keys that only
  * exists *composed* (`{omop_table}_merge.sql.jinja:81-95`).
  */
object PipelineQueries {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** §2.12-5 end to end: U1 -> J1 -> J2 -> J3 -> W5 -> W3 -> U2, finished
    * with the S11 atomic CTAS swap into the work zone (read back, so the
    * checked rows went through the real table-replace protocol).
    */
  val mergeFullPipeline: Q = (s, d) => {
    val orders = t(s, d, "orders")
    def upload(marker: String, filter: org.apache.spark.sql.Column) =
      orders.filter(filter).select(
        col("o_orderkey"), col("o_orderpriority"), col("o_custkey"),
        concat(lit(marker), col("o_orderstatus")).as("src_val"))
    val u1 = upload("u1:", col("o_totalprice") > 100000)
    val u2 = upload("u2:", col("o_orderpriority").startsWith("1") || col("o_orderpriority").startsWith("2"))

    val usagi = Swap.denseIds(
      orders.select(col("o_orderpriority").as("sourceCode")).distinct(),
      Seq("sourceCode"), 0L, "conceptId")
      .withColumn("mappingStatus",
        when(col("sourceCode").startsWith("5"), lit("FLAGGED")).otherwise(lit("APPROVED")))

    // pk swap built from the upload keys routed through the APPROVED usagi
    // mappings — the composite (x, concept) identity of {pk}_swap_merge
    val allUp = u1.distinct().unionByName(u2.distinct())
    val mapped = allUp.join(
      broadcast(usagi),
      allUp("o_orderpriority") === usagi("sourceCode") && usagi("mappingStatus") === "APPROVED",
      "left")
    val pkSwap = Swap.denseIds(
      mapped.select(col("o_orderkey").as("x"), col("conceptId").as("priority_concept_id")).distinct(),
      Seq("x", "priority_concept_id"), 0L)
    val custSwap = Swap.denseIds(
      allUp.select(col("o_custkey").as("x")).distinct(), Seq("x"), 0L)

    val preserved = orders.filter(col("o_orderkey") % 1000 === 0).select(
      (-col("o_orderkey")).as("order_id"),
      lit(0L).as("priority_concept_id"),
      lit(0L).as("o_custkey"),
      lit("preserved").as("source_values"))

    val merged = MergePipeline.run(
      uploads = Seq(u1, u2),
      pkCol = "o_orderkey",
      newPkName = "order_id",
      pkSwap = pkSwap,
      concepts = Seq(ConceptSwapSpec("o_orderpriority", "priority_concept_id", usagi)),
      fks = Seq(FkSwapSpec("o_custkey", custSwap, required = true)),
      sourceValue = Some(("src_val", "source_values")),
      preserved = Some(preserved))

    // S11: the reference's CREATE OR REPLACE CTAS — write through the
    // atomic swap protocol and read the promoted table back
    val zones = Zones.forPurpose("pipeline")
    val path = zones.tablePath("work", "orders_merge")
    AtomicWrite.replace(merged, path)
    AtomicWrite.readTable(s, path)
      .withColumnRenamed("o_custkey", "customer_id")
      .orderBy("order_id")
  }

  /** §2.12-6 end to end: U4 discovery -> generated J12 swap joins + CASE
    * discriminator mapping -> W4 collision re-keying (via the parallel
    * denseIds overflow renumbering), per
    * `{omop_table}_apply_event_columns.sql.jinja` + `bigquery/etl.py:498-553`.
    */
  val eventApplyColumns: Q = (s, d) => {
    val events = t(s, d, "events")
    // the stage-1 work table: event FK holds STRING source keys, the
    // discriminator holds the referenced table NAME (work DDL, D4)
    val refTable = Seq(
      "click" -> "person", "view" -> "visit_occurrence", "purchase" -> "drug_exposure",
      "signup" -> "measurement", "error" -> "observation")
      .foldLeft(lit(null).cast("string")) { case (acc, (evt, tbl)) =>
        when(col("event_type") === evt, lit(tbl)).otherwise(acc)
      }
    // the work table is consumed by discovery, swap building, mapping and
    // the max-pk scalar — persist it once, as the reference's materialized
    // work-zone table is
    val work = events.select(
      col("user_id").as("pk"),
      concat(lit("SRC-"), (col("event_id") % 500).cast("string")).as("target_event_id"),
      refTable.as("event_field_concept_id"),
      col("event_id"))
      .persist()

    // U4: data-dependent plan — which tables are actually referenced
    val discovered = EventOps.discoverEventTables(work, Seq("event_field_concept_id"))
    // J12 inputs: each referenced table's PK swap. Stage 1 materializes one
    // swap table per CDM table; here all of them come from ONE
    // window-partitioned plan (partitionBy table => parallel, spill-safe,
    // a single shuffle for every table's numbering) and per-table views.
    val perTableW = org.apache.spark.sql.expressions.Window
      .partitionBy("__t").orderBy("x")
    val allSwaps = work
      .filter(col("event_field_concept_id").isNotNull)
      .select(col("event_field_concept_id").as("__t"), col("target_event_id").as("x"))
      .distinct()
      .withColumn("y", row_number().over(perTableW).cast("long"))
      .persist()
    val swaps = discovered.map(tb => tb -> allSwaps.filter(col("__t") === tb).select("x", "y"))
    // mapped is consumed by both rekey branches (kept + overflow renumber);
    // cache it so the 5-join distinct plan runs once
    val mapped = EventOps.applyEventColumns(
      work, "target_event_id", "event_field_concept_id", swaps).persist()
    try {
      val maxPk = work.agg(coalesce(max(col("pk")), lit(0L))).head().getLong(0)
      val rekeyed = EventOps.rekeyCollisions(
        mapped, "pk", Seq("event_field_concept_id", "target_event_id", "event_id"), maxPk)
      // Materialize through the S11 atomic protocol (the reference's event
      // step writes the work-zone table too) so the cached inputs can be
      // released HERE instead of leaking into the rest of a shared-JVM run —
      // round 3's bench showed the leaked blocks taxing every later query.
      val zones = Zones.forPurpose("pipeline")
      val path = zones.tablePath("work", "events_apply")
      AtomicWrite.replace(rekeyed, path)
      AtomicWrite.readTable(s, path).orderBy("event_id")
    } finally {
      mapped.unpersist()
      allSwaps.unpersist()
      work.unpersist()
    }
  }

  /** §2.12-2 end to end: custom-concept CSV -> validations (J6/A4 as
    * fail-fast guards, `bigquery/etl.py:146-177`) -> W2 RANK ids over the
    * 2e9 floor with J5 anti-join against the existing concept_id_swap ->
    * J10 stamp -> J8 MERGE into CONCEPT alongside the standard rows
    * (`etl.py:427-442` composition).
    */
  val customConceptPipeline: Q = (s, d) => {
    import s.implicits._
    val concepts = SourceQueries.csvConceptsRead(s, d).drop("concept_id")
    // validations raise before any mutation, like the reference
    val domains = Seq("geography").toDF("domain_id")
    require(
      Validate.missingDimension(concepts, domains, "domain_id", "domain_id").isEmpty,
      "custom concepts reference unknown domains")
    require(
      Validate.duplicateKeys(concepts, Seq("concept_code")).isEmpty,
      "duplicate custom concept codes")
    // J5's exact computed identity: the swap keys on
    // `concat(concept_id_column, '__', concept_code)` so the same code
    // arriving via different concept columns gets distinct swap entries
    // (`CONCEPT_ID_swap_merge.sql.jinja:9-14`); the RANK id is still over
    // the bare code (`:9`) — with one constant column prefix the orders
    // coincide, so ranking the computed key preserves the template's ids.
    val conceptIdColumn = "nation_concept_id"
    def computedKey(df: DataFrame): DataFrame =
      df.withColumn("__x", concat_ws("__", lit(conceptIdColumn), col("concept_code")))
    // W2+J5+A5: append-only concept-id swap over the 2e9 floor
    val existingSwap = Swap.rankIds(
      computedKey(concepts.filter(col("concept_code").isin("NAT-0", "NAT-1", "NAT-2")))
        .select("__x"),
      "__x", MergeOps.CustomConceptBase)
    val maxY = Swap.maxId(existingSwap, "concept_id", MergeOps.CustomConceptBase)
    val numbered = Swap.rankIds(
      Swap.newKeys(existingSwap, computedKey(concepts).select("__x"), Seq("__x")),
      "__x", maxY)
    val swap = existingSwap.unionByName(numbered)
    // J10: stamp generated ids; J8: merge with the standard concept rows
    val stamped = computedKey(concepts).join(broadcast(swap), Seq("__x"))
      .select(col("concept_id"), col("concept_name"), col("concept_code"))
    val target = t(s, d, "nation").select(
      col("n_nationkey").cast("long").as("concept_id"),
      col("n_name").as("concept_name"),
      concat(lit("STD-"), col("n_nationkey")).as("concept_code"))
    Upsert.merge(target, stamped, Seq("concept_id")).orderBy("concept_id")
  }

  /** §2.12-3 end to end: usagi CSV -> A1 duplicate-mapping guard -> J7
    * domain check -> J10 custom-id stamping -> P2 status filter -> J8 MERGE
    * into SOURCE_TO_CONCEPT_MAP (`etl.py:560-625` composition).
    */
  val usagiPipeline: Q = (s, d) => {
    import s.implicits._
    val usagi = SourceQueries.csvUsagiRead(s, d)
    require(
      Validate.duplicateMappings(usagi, "sourceCode", "conceptId").isEmpty,
      "duplicate usagi mappings")
    val conceptDim = Seq((1L, "observation")).toDF("concept_id", "domain_id")
      .unionByName(usagi.select(col("conceptId").as("concept_id"), lit("observation").as("domain_id")))
      .distinct()
    require(
      Validate.domainViolations(usagi, conceptDim, "conceptId", "domain_id", Seq("observation"))
        .isEmpty,
      "usagi mapping outside the allowed FK domains")
    // J10: '1%' codes map to freshly generated custom concepts
    val updates = Swap.rankIds(
      usagi.filter(col("sourceCode").startsWith("1")).select("sourceCode").distinct(),
      "sourceCode", MergeOps.CustomConceptBase, "newId")
    val stamped = Upsert.updateFromJoin(usagi, updates, Seq("sourceCode"), "conceptId", "newId")
    // P2 + J8: APPROVED rows merge into the existing s2cm
    val source = stamped.filter(col("mappingStatus") === "APPROVED").select(
      col("sourceCode").as("source_code"),
      col("conceptId").as("target_concept_id"),
      lit("usagi").as("origin"))
    val target = t(s, d, "orders")
      .select(col("o_orderpriority").as("source_code")).distinct()
      .withColumn("target_concept_id", lit(-1L))
      .withColumn("origin", lit("existing"))
    Upsert.merge(target, source, Seq("source_code")).orderBy("source_code")
  }

  val defs: Seq[(String, Q)] = Seq(
    "merge_full_pipeline" -> mergeFullPipeline,
    "event_apply_columns" -> eventApplyColumns,
    "custom_concept_pipeline" -> customConceptPipeline,
    "usagi_pipeline" -> usagiPipeline)

  val oracles: Seq[(String, String)] = Seq(
    "merge_full_pipeline" ->
      """WITH u1 AS (
        |  SELECT DISTINCT o_orderkey, o_orderpriority, o_custkey, 'u1:' || o_orderstatus AS src_val
        |  FROM orders WHERE o_totalprice > 100000
        |), u2 AS (
        |  SELECT DISTINCT o_orderkey, o_orderpriority, o_custkey, 'u2:' || o_orderstatus AS src_val
        |  FROM orders WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
        |), uploads AS (
        |  SELECT * FROM u1 UNION ALL SELECT * FROM u2
        |), usagi AS (
        |  SELECT sourceCode, CAST(row_number() OVER (ORDER BY sourceCode) AS BIGINT) AS conceptId,
        |    CASE WHEN sourceCode LIKE '5%' THEN 'FLAGGED' ELSE 'APPROVED' END AS mappingStatus
        |  FROM (SELECT DISTINCT o_orderpriority AS sourceCode FROM orders)
        |), mapped AS (
        |  SELECT u.*, ci.conceptId FROM uploads u
        |  LEFT JOIN usagi ci ON ci.sourceCode = u.o_orderpriority AND ci.mappingStatus = 'APPROVED'
        |), pk_swap AS (
        |  SELECT x, priority_concept_id,
        |    CAST(row_number() OVER (ORDER BY x, priority_concept_id NULLS FIRST) AS BIGINT) AS y
        |  FROM (SELECT DISTINCT o_orderkey AS x, conceptId AS priority_concept_id FROM mapped)
        |), cust_swap AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS y
        |  FROM (SELECT DISTINCT o_custkey AS x FROM uploads)
        |), swapped AS (
        |  SELECT sp.y AS order_id,
        |    COALESCE(m.conceptId, 0) AS priority_concept_id,
        |    COALESCE(cs.y, 0) AS customer_id,
        |    m.src_val
        |  FROM mapped m
        |  JOIN pk_swap sp ON sp.x = m.o_orderkey
        |    AND COALESCE(sp.priority_concept_id, 0) = COALESCE(m.conceptId, 0)
        |  LEFT JOIN cust_swap cs ON cs.x = m.o_custkey
        |), merged AS (
        |  -- the W5 stragg window and W3 dedup share the (pk, concept)
        |  -- partition and every surviving column is constant inside it, so
        |  -- the window+keep-first pair collapses to this GROUP BY exactly
        |  SELECT order_id, priority_concept_id,
        |    MIN(customer_id) AS customer_id,
        |    substr(string_agg(src_val, ',' ORDER BY src_val), 1, 255) AS source_values
        |  FROM swapped GROUP BY 1, 2
        |)
        |SELECT * FROM merged
        |UNION ALL
        |SELECT CAST(-o_orderkey AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'preserved'
        |FROM orders WHERE o_orderkey % 1000 = 0
        |ORDER BY order_id""".stripMargin,
    "event_apply_columns" ->
      """WITH work AS (
        |  SELECT user_id AS pk,
        |    'SRC-' || CAST(event_id % 500 AS VARCHAR) AS target_event_id,
        |    CASE event_type WHEN 'click' THEN 'person' WHEN 'view' THEN 'visit_occurrence'
        |      WHEN 'purchase' THEN 'drug_exposure' WHEN 'signup' THEN 'measurement'
        |      WHEN 'error' THEN 'observation' END AS ref_table,
        |    event_id
        |  FROM events
        |), swaps AS (
        |  -- one PK swap per referenced table; the CASE-over-tables join fan
        |  -- is algebraically a join on (ref_table, x)
        |  SELECT ref_table, x, CAST(row_number() OVER (PARTITION BY ref_table ORDER BY x) AS BIGINT) AS y
        |  FROM (SELECT DISTINCT ref_table, target_event_id AS x FROM work)
        |), mapped AS (
        |  SELECT DISTINCT w.pk, s.y AS target_event_id,
        |    CAST(CASE w.ref_table WHEN 'person' THEN 1147026 WHEN 'visit_occurrence' THEN 1147070
        |      WHEN 'drug_exposure' THEN 1147094 WHEN 'measurement' THEN 1147138
        |      WHEN 'observation' THEN 1147165 END AS BIGINT) AS event_field_concept_id,
        |    w.event_id
        |  FROM work w
        |  LEFT JOIN swaps s ON s.ref_table = w.ref_table AND s.x = w.target_event_id
        |), mx AS (SELECT MAX(pk) AS m FROM work),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY pk
        |    ORDER BY event_field_concept_id, target_event_id, event_id) AS rn
        |  FROM mapped
        |)
        |SELECT pk, target_event_id, event_field_concept_id, event_id FROM ranked WHERE rn = 1
        |UNION ALL
        |SELECT (SELECT m FROM mx) + row_number() OVER (ORDER BY pk, event_field_concept_id, target_event_id, event_id) AS pk,
        |  target_event_id, event_field_concept_id, event_id
        |FROM ranked WHERE rn > 1
        |ORDER BY event_id""".stripMargin,
    "custom_concept_pipeline" ->
      s"""WITH concepts AS (
         |  SELECT concept_name, concept_code
         |  FROM read_csv('${SourceQueries.StageDir}/custom_concepts.csv', header=true, columns={
         |    'concept_id':'BIGINT','concept_name':'VARCHAR','domain_id':'VARCHAR',
         |    'vocabulary_id':'VARCHAR','concept_class_id':'VARCHAR','standard_concept':'VARCHAR',
         |    'concept_code':'VARCHAR','valid_start_date':'DATE','valid_end_date':'DATE',
         |    'invalid_reason':'VARCHAR'})
         |), keyed AS (
         |  -- J5's computed identity: concat(concept_id_column, '__', code)
         |  SELECT 'nation_concept_id__' || concept_code AS x, concept_name, concept_code
         |  FROM concepts
         |), existing AS (
         |  SELECT x, CAST(2000000000 + rank() OVER (ORDER BY x) AS BIGINT) AS concept_id
         |  FROM keyed WHERE concept_code IN ('NAT-0', 'NAT-1', 'NAT-2')
         |), mx AS (SELECT MAX(concept_id) AS m FROM existing),
         |newc AS (
         |  SELECT x FROM keyed WHERE x NOT IN (SELECT x FROM existing)
         |), numbered AS (
         |  SELECT x, CAST((SELECT m FROM mx) + rank() OVER (ORDER BY x) AS BIGINT) AS concept_id
         |  FROM newc
         |), swap AS (
         |  SELECT * FROM existing UNION ALL SELECT * FROM numbered
         |), stamped AS (
         |  SELECT s.concept_id, k.concept_name, k.concept_code
         |  FROM keyed k JOIN swap s USING (x)
         |), target AS (
         |  SELECT CAST(n_nationkey AS BIGINT) AS concept_id, n_name AS concept_name,
         |    'STD-' || n_nationkey AS concept_code
         |  FROM nation
         |)
         |SELECT * FROM target
         |UNION ALL
         |SELECT * FROM stamped
         |ORDER BY concept_id""".stripMargin,
    "usagi_pipeline" ->
      s"""WITH usagi AS (
         |  SELECT * FROM read_csv('${SourceQueries.StageDir}/usagi.csv', header=true, columns={
         |    'sourceCode':'VARCHAR','sourceName':'VARCHAR','mappingStatus':'VARCHAR',
         |    'conceptId':'BIGINT','conceptName':'VARCHAR','domainId':'VARCHAR'})
         |), upd AS (
         |  SELECT sourceCode,
         |    CAST(2000000000 + rank() OVER (ORDER BY sourceCode) AS BIGINT) AS newId
         |  FROM (SELECT DISTINCT sourceCode FROM usagi WHERE sourceCode LIKE '1%')
         |), stamped AS (
         |  SELECT u.sourceCode, COALESCE(p.newId, u.conceptId) AS conceptId, u.mappingStatus
         |  FROM usagi u LEFT JOIN upd p ON u.sourceCode = p.sourceCode
         |), src AS (
         |  SELECT sourceCode AS source_code, conceptId AS target_concept_id, 'usagi' AS origin
         |  FROM stamped WHERE mappingStatus = 'APPROVED'
         |), tgt AS (
         |  SELECT DISTINCT o_orderpriority AS source_code,
         |    CAST(-1 AS BIGINT) AS target_concept_id, 'existing' AS origin
         |  FROM orders
         |)
         |SELECT COALESCE(t.source_code, s.source_code) AS source_code,
         |  CASE WHEN s.source_code IS NOT NULL THEN s.target_concept_id
         |    ELSE t.target_concept_id END AS target_concept_id,
         |  CASE WHEN s.source_code IS NOT NULL THEN s.origin ELSE t.origin END AS origin
         |FROM tgt t FULL OUTER JOIN src s ON t.source_code = s.source_code
         |ORDER BY source_code""".stripMargin)
}
