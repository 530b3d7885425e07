package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE emulation over immutable Parquet (J8-J10).
  *
  * The reference upserts its small work tables (swap maps, CONCEPT,
  * SOURCE_TO_CONCEPT_MAP, SOURCE_ID_TO_OMOP_ID_MAP) with warehouse `MERGE`
  * (`/root/reference/src/riab/etl/bigquery/templates/etl/{primary_key_column}_swap_merge.sql.jinja:74-84`,
  * `CONCEPT_merge.sql.jinja:3-22`, `SOURCE_TO_CONCEPT_MAP_merge.sql.jinja:3-34`).
  * Plain Parquet has no MERGE; the equivalent declarative plan is a
  * full-outer join with column-wise precedence, written back atomically
  * (graft.io.AtomicWrite). These tables are mapping metadata — orders of
  * magnitude smaller than the fact data — so read-modify-overwrite is the
  * right trade at 100 TB (the big tables use CTAS-swap, never MERGE).
  */
object Upsert {

  /** Small-table contract for [[merge]]: the full-outer rewrite re-shuffles
    * the ENTIRE target on every call, which is the wrong primitive for a
    * fact table (those use the CTAS atomic swap, never MERGE). The guard
    * uses Catalyst's plan statistics — free, no job — to refuse targets
    * whose estimated size says "fact table" before any work is scheduled.
    */
  val MaxMergeTargetBytes: Long = 8L << 30

  /** J8: WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT.
    * Warehouse MERGE semantics: on a key match the source row's values
    * replace the target's *unconditionally* — including NULL source values
    * (a column-wise `coalesce` would instead preserve the target under a
    * NULL source, which is NOT what the reference's swap/CONCEPT merges do).
    * Target rows without a source survive untouched.
    *
    * Only for mapping-metadata tables (swap maps, CONCEPT, the s2cm/lineage
    * maps) — see [[MaxMergeTargetBytes]].
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      maxTargetBytes: Long = MaxMergeTargetBytes): DataFrame = {
    val estBytes = target.queryExecution.optimizedPlan.stats.sizeInBytes
    require(estBytes <= maxTargetBytes,
      s"Upsert.merge target estimated at $estBytes bytes (> $maxTargetBytes): " +
        "this full-outer rewrite is for small mapping tables; use the atomic " +
        "CTAS swap (AtomicWrite.replace) for fact-sized tables, or raise " +
        "maxTargetBytes explicitly if the estimate is wrong")
    val valueCols = target.columns.filterNot(keyCols.contains).toSeq
    val t = valueCols.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"__t_$c"))
    val s = valueCols.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"__s_$c"))
      .withColumn("__s_present", lit(1))
    val joined = t.join(s, keyCols, "full_outer")
    val projected = valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, when(col("__s_present").isNotNull, col(s"__s_$c")).otherwise(col(s"__t_$c")))
    }
    projected.select((keyCols ++ valueCols).map(col): _*)
  }

  /** J9: MERGE ... WHEN MATCHED THEN DELETE — drop target rows whose key
    * appears in the delete set
    * (`cleanup/SOURCE_TO_CONCEPT_MAP_remove_concepts_by_{omop_table}__{concept_id_column}_usagi_table.sql.jinja:3-13`).
    */
  def mergeDelete(target: DataFrame, deletes: DataFrame, keyCols: Seq[String]): DataFrame =
    target.join(deletes.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")

  /** J10: UPDATE ... FROM join — stamp freshly generated custom-concept ids
    * back into usagi rows
    * (`{omop_table}__{concept_id_column}_usagi_update_custom_concepts.sql.jinja:3-17`):
    * matched rows take the joined value, unmatched keep their own.
    */
  def updateFromJoin(
      target: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      updateCol: String,
      newValueCol: String): DataFrame = {
    val u = updates.select((keyCols.map(col) :+ col(newValueCol).as("__new")): _*)
    target
      .join(broadcast(u), keyCols, "left")
      .withColumn(updateCol, when(col("__new").isNotNull, col("__new")).otherwise(col(updateCol)))
      .drop("__new")
  }

  /** J11: 1x1 cross join to attach a scalar aggregate to every row
    * (`{primary_key_column}_swap_merge.sql.jinja:73` `INNER JOIN cte_max ON TRUE`).
    * A 1-row broadcast, not a real shuffle.
    */
  def withScalar(df: DataFrame, scalar: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalar))
}
