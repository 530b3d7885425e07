package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OMOP era derivation — the published gaps-and-islands collapse of event
  * records into continuous eras (`drug_era` from `drug_exposure`,
  * `condition_era` from `condition_occurrence`): two records of the same
  * (person, concept) belong to one era when the later one starts within
  * `persistenceDays` of the running era end (the OHDSI "persistence
  * window", 30 days for both standard era tables).
  *
  * The reference ships the era tables as CDM DDL targets
  * (`/root/reference/src/riab/libs` CDM 5.4 table list) and Achilles
  * analyzes them (900/1000 series); the derivation itself is the public
  * OHDSI era-builder algorithm. Implementation is the classic two-window
  * gaps-and-islands: a running `max(end)` over strictly-preceding rows
  * flags era starts, a running sum of the flags numbers the islands, and
  * one aggregate per island emits the era. Both windows partition by
  * `(person, concept)` — a task is bounded by one person-concept pair's
  * records (inherently small: one patient's exposures to one drug), so the
  * plan holds at 100 TB; the island outcome is invariant to tie order
  * among equal start dates because the join predicate uses the running
  * max, not row adjacency.
  */
object EraOps {

  /** Collapse `(person, concept, start, end)` records into eras.
    *
    * @return one row per era: person, concept, `<prefix>_era_start_date`,
    *         `<prefix>_era_end_date`, `<prefix>_count` (records merged),
    *         `gap_days` (total uncovered days inside the era — the OMOP
    *         `gap_days` accounting for drug eras).
    */
  def buildEras(
      df: DataFrame,
      personCol: String, conceptCol: String,
      startCol: String, endCol: String,
      prefix: String,
      persistenceDays: Int = 30): DataFrame = {
    require(persistenceDays >= 0, s"persistenceDays must be >= 0, got $persistenceDays")
    val reserved = Set("__pmax", "__new", "__era", "__s", "__e")
    val bad = df.columns.toSet.intersect(reserved)
    require(bad.isEmpty, s"input uses reserved internal column names ${bad.mkString(", ")}")

    val keyed = df.select(
      col(personCol), col(conceptCol),
      col(startCol).as("__s"),
      // records with no end date are point events (the OHDSI builder's
      // COALESCE(end, start) convention)
      coalesce(col(endCol), col(startCol)).as("__e"))
      .filter(col(personCol).isNotNull && col(conceptCol).isNotNull && col("__s").isNotNull)

    val order = Seq(col("__s").asc, col("__e").asc)
    val wPrev = Window.partitionBy(col(personCol), col(conceptCol))
      .orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(personCol), col(conceptCol))
      .orderBy(order: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    keyed
      .withColumn("__pmax", max(col("__e")).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull ||
          col("__s") > date_add(col("__pmax"), persistenceDays), 1L).otherwise(0L))
      .withColumn("__era", sum(col("__new")).over(wRun))
      .groupBy(col(personCol), col(conceptCol), col("__era"))
      .agg(
        min(col("__s")).as(s"${prefix}_era_start_date"),
        max(col("__e")).as(s"${prefix}_era_end_date"),
        count(lit(1)).as(s"${prefix}_count"),
        // gap_days = era span minus covered days (the OMOP accounting).
        // Each record's NEW coverage under the running max is
        // max(0, e - max(s, pmax + 1) + 1): records swallowed by earlier
        // coverage add zero, partial overlaps add only their fresh days, and
        // the island's first record (s > pmax by construction) adds its full
        // length — so the sum is exactly the union-of-intervals size.
        (datediff(max(col("__e")), min(col("__s"))) + 1 -
          sum(greatest(lit(0),
            datediff(col("__e"),
              greatest(col("__s"), coalesce(date_add(col("__pmax"), 1), col("__s")))) + 1))
          ).cast("long").as("gap_days"))
      .drop("__era")
  }
}
