package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Key-swap core: dense, stable, append-only surrogate-key maps.
  *
  * Re-expresses the reference's swap-table semantics
  * (`/root/reference/src/riab/etl/bigquery/templates/etl/{primary_key_column}_swap_merge.sql.jinja:35-84`):
  * a swap table maps a source key `x` (string/long) to a dense surrogate
  * integer `y`; re-runs only append *unseen* keys (anti-join, J4), numbering
  * them from `max(y)+1` (A5) in a deterministic total order (W1).
  *
  * The reference numbers new keys with `ROW_NUMBER() OVER (ORDER BY x, ...)`
  * — a single-partition global-sort window that does not survive 100 TB.
  * Here dense numbering is a *range-partitioned total sort* followed by
  * `zipWithIndex`: `repartitionByRange` gives a global order across partition
  * indices, `zipWithIndex` computes contiguous indices with one extra count
  * job, and every partition sorts/indexes in parallel. Result is bit-for-bit
  * identical to the window formulation (given a duplicate-free order key) at
  * any scale (SURVEY.md §7.5).
  */
object Swap {

  /** W1: assign dense ids `offset+1 .. offset+n` in ascending `orderCols`
    * order. `orderCols` must uniquely identify rows (callers pass distinct
    * source keys) so the total order — and therefore the ids — are
    * deterministic across runs and cluster layouts.
    */
  def denseIds(df: DataFrame, orderCols: Seq[String], offset: Long, idCol: String = "y"): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sorted = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val outSchema = StructType(sorted.schema.fields).add(idCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(indexed, outSchema)
  }

  /** A5: `IFNULL(MAX(y), base)` scalar — the numbering base of the next
    * append (`{primary_key_column}_swap_merge.sql.jinja:5-8`). A driver-side
    * scalar fetch of a 1-row aggregate, exactly like the reference's CTE.
    */
  def maxId(swap: DataFrame, idCol: String = "y", base: Long = 0L): Long =
    swap.agg(coalesce(max(col(idCol)), lit(base))).head().getLong(0)

  /** J4: candidates not yet in the swap — `LEFT JOIN swap ON swap.x = t.x
    * WHERE swap.x IS NULL` (`{primary_key_column}_swap_merge.sql.jinja:35-48`)
    * as a left-anti join. `candidates` should already be key-distinct.
    */
  def newKeys(swap: DataFrame, candidates: DataFrame, keyCols: Seq[String]): DataFrame =
    candidates.join(swap, keyCols, "left_anti")

  /** §2.12-4: append-only swap merge — unseen candidate keys get dense ids
    * starting after the current max. Existing rows are returned untouched
    * (append-only ⇒ ids are stable across re-runs; re-running with the same
    * candidates is a no-op — the idempotency property tested in SwapSpec).
    */
  def mergeAppend(swap: DataFrame, candidates: DataFrame, keyCols: Seq[String], idCol: String = "y"): DataFrame = {
    val fresh = newKeys(swap, candidates.select(keyCols.map(col): _*).distinct(), keyCols)
    val numbered = denseIds(fresh, keyCols, maxId(swap, idCol), idCol)
    swap.select((keyCols :+ idCol).map(col): _*).unionByName(numbered)
  }

  /** W2: custom-concept id assignment — `RANK() OVER (ORDER BY concept_code)
    * + 2e9` (`CONCEPT_ID_swap_merge.sql.jinja:9`): equal codes share an id,
    * and the id encodes the code's rank over the *raw* (non-distinct) input.
    *
    * Scale-safe formulation: RANK(code) = 1 + count of rows with a smaller
    * code, so aggregate counts per distinct code (map-side combinable), then
    * take a running sum over the distinct codes only. The remaining window
    * runs over |distinct codes| rows (custom concept codes are small by
    * nature), not over the data.
    */
  def rankIds(df: DataFrame, codeCol: String, base: Long, idCol: String = "concept_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(codeCol).agg(count(lit(1)).as("__cnt"))
    val w = Window.orderBy(codeCol).rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn(idCol, lit(base) + lit(1L) + coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .drop("__cnt")
  }
}
