package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-2 "event" step: polymorphic FK columns that can point to (almost)
  * any CDM table, discriminated by a sibling `*_field_concept_id` column
  * (`/root/reference/src/riab/etl/cdm_5.4_events.json:1-21`).
  *
  * Reference flow (`/root/reference/src/riab/etl/bigquery/etl.py:498-553`,
  * template `{omop_table}_apply_event_columns.sql.jinja`):
  *   1. U4 — discover which target tables the event columns actually
  *      reference (a data-dependent plan: the DISTINCT result decides which
  *      swap joins are generated).
  *   2. J12 — per (event column x referenced table): left join that table's
  *      PK swap to rewrite the source event value to its surrogate.
  *   3. CASE — stamp the discriminator concept-id for the referenced table
  *      (vendored constant map below, template lines 48-135).
  *   4. W4 — rows whose PK now collides (same pk, different event targets)
  *      are re-keyed: rn=1 keeps its pk, rn>1 gets `max(pk) + ROW_NUMBER()`.
  */
object EventOps {

  /** Table -> OMOP "CDM field concept id" discriminator constants, vendored
    * from `{omop_table}_apply_event_columns.sql.jinja:48-135`.
    */
  val tableConceptIds: Map[String, Long] = Map(
    "care_site" -> 1147195L, "cohort_definition" -> 1147004L,
    "concept" -> 1146945L, "concept_class" -> 1146963L,
    "condition_era" -> 1147295L, "condition_occurrence" -> 1147127L,
    "death" -> 1147064L, "device_exposure" -> 1147115L,
    "domain" -> 1146960L, "dose_era" -> 1147288L,
    "drug_era" -> 1147281L, "drug_exposure" -> 1147094L,
    "episode" -> 756290L, "location" -> 1147187L,
    "measurement" -> 1147138L, "metadata" -> 756314L,
    "note" -> 1147156L, "note_nlp" -> 1147589L,
    "observation" -> 1147165L, "observation_period" -> 1147044L,
    "payer_plan_period" -> 1147214L, "person" -> 1147026L,
    "procedure_occurrence" -> 1147082L, "provider" -> 1147201L,
    "relationship" -> 1146972L, "specimen" -> 1147049L,
    "visit_detail" -> 1147624L, "visit_occurrence" -> 1147070L,
    "vocabulary" -> 1146955L)

  /** U4: data-dependent discovery of referenced event tables —
    * `SELECT DISTINCT <event table col> FROM work...` per event column,
    * unioned (`{omop_table}_get_event_tables.sql.jinja:3-12`). The collect
    * is intentional and bounded: its cardinality is <= |CDM tables| (39),
    * and the result *shapes the plan* (which J12 joins exist), exactly like
    * the reference (`bigquery/etl.py:523-535`).
    */
  def discoverEventTables(work: DataFrame, eventTableCols: Seq[String]): Seq[String] =
    eventTableCols
      .map(c => work.select(col(c).as("t")).filter(col("t").isNotNull).distinct())
      .reduceOption(_ union _)
      .fold(Seq.empty[String]) { unioned =>
        unioned.distinct().collect().map(_.getString(0)).sorted.toSeq
      }

  /** CASE map: referenced-table name -> discriminator concept id, generated
    * as a `when` chain from [[tableConceptIds]] (never a UDF — stays inside
    * whole-stage codegen).
    */
  def tableConceptCase(tableCol: Column): Column =
    tableConceptIds.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (name, id)) => when(tableCol === name, lit(id)).otherwise(acc)
    }

  /** J12 + CASE (§2.12-6 core): rewrite a polymorphic event FK column from
    * source keys to surrogates, discriminated by the sibling table-name
    * column (`{omop_table}_apply_event_columns.sql.jinja:26-153`):
    *
    *   - one LEFT join per discovered referenced table's PK swap, each on
    *     `swap.x = t.eventCol` (the reference generates exactly this
    *     |event cols| x |tables| join fan);
    *   - the event column becomes `CASE disc WHEN <table> THEN swap_t.y
    *     ... ELSE 0` — the discriminator picks which joined swap wins;
    *   - the discriminator becomes the table's OMOP concept id
    *     ([[tableConceptCase]]);
    *   - SELECT DISTINCT, as in the template (`:26`).
    *
    * `swaps` comes from [[discoverEventTables]] — a data-dependent plan:
    * only referenced tables get a join. Swap maps can be fact-table sized,
    * so they are NOT broadcast; each join shuffles on the swap key and AQE
    * may still broadcast genuinely small ones.
    */
  def applyEventColumns(
      work: DataFrame,
      eventCol: String,
      discriminatorCol: String,
      swaps: Seq[(String, DataFrame)]): DataFrame = {
    val ordered = swaps.sortBy(_._1)
    val joined = ordered.zipWithIndex.foldLeft(work) { case (df, ((_, sw), i)) =>
      val s = sw.select(col("x").as(s"__x_$i"), col("y").as(s"__y_$i"))
      df.join(s, df(eventCol) === s(s"__x_$i"), "left")
    }
    val newEvent = ordered.zipWithIndex.foldLeft(lit(0L)) { case (acc, ((tb, _), i)) =>
      when(col(discriminatorCol) === tb, col(s"__y_$i")).otherwise(acc)
    }
    val dropCols = ordered.indices.flatMap(i => Seq(s"__x_$i", s"__y_$i"))
    joined
      .withColumn(eventCol, newEvent)
      .withColumn(discriminatorCol, tableConceptCase(col(discriminatorCol)))
      .drop(dropCols: _*)
      .distinct()
  }

  /** W4: re-key PK collisions created by event mapping. Per pk, rows are
    * ranked by the event columns (deterministic order); rank 1 keeps the pk,
    * ranks >1 receive `maxPk + ROW_NUMBER() OVER (ORDER BY pk, <event cols>)`
    * and the two sets are unioned
    * (`{omop_table}_apply_event_columns.sql.jinja:7-18,167-189`).
    *
    * The reference renumbers the overflow with a global-ORDER-BY window
    * (single partition); here the renumbering is [[Swap.denseIds]] over
    * `(pk, eventCols)` — identical ids, but range-partitioned and parallel,
    * so the operator survives degenerate inputs where most rows collide.
    * `(pkCol, eventCols)` must uniquely identify overflow rows (callers
    * include a tie-breaking column, as the deterministic-dedup contract
    * already requires).
    */
  def rekeyCollisions(df: DataFrame, pkCol: String, eventCols: Seq[String], maxPk: Long): DataFrame = {
    val orderCols = eventCols.map(col)
    val perPk = Window.partitionBy(col(pkCol)).orderBy(orderCols: _*)
    val ranked = df.withColumn("__rn", row_number().over(perPk))
    val kept = ranked.filter(col("__rn") === 1).drop("__rn")
    val rekeyed = Swap
      .denseIds(ranked.filter(col("__rn") > 1).drop("__rn"), pkCol +: eventCols, maxPk, "__newpk")
      .withColumn(pkCol, col("__newpk"))
      .drop("__newpk")
      .select(kept.columns.toIndexedSeq.map(col): _*)
    kept.unionByName(rekeyed)
  }
}
