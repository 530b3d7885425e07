package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Here dense numbering is a *range-partitioned total sort* plus
  * per-partition offsets, all inside ONE plan:
  *
  *   - `repartitionByRange` totally orders rows across partition indices;
  *   - `monotonically_increasing_id` encodes `(partition << 33) | localIdx`,
  *     so the within-partition index is free (no window);
  *   - per-partition row counts (<= #partitions rows) get exclusive prefix
  *     sums via a triangular self-join, and are broadcast back.
  *
  * Everything is a single query: Catalyst's exchange reuse evaluates the
  * range shuffle once, and — critically — the count subtree and the final
  * projection see the SAME sampled range boundaries. (A two-action
  * formulation is wrong: range boundaries are re-sampled per action, so
  * offsets collected in one job can disagree with the partitioning of the
  * next.) No RDD round-trip, no driver collect, no single-partition window
  * at any cardinality; ids are bit-for-bit those of the ROW_NUMBER
  * formulation given a duplicate-free order key (SURVEY.md §7.5).
  */
object Swap {

  /** Lower 33 bits of `monotonically_increasing_id` = row index within the
    * partition; upper bits = partition index (Spark contract).
    */
  private val MonoLocalMask = (1L << 33) - 1

  /** Range-sort `df` by `orderCols` and attach `__mono` / `__pid`. */
  private def rangeSorted(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val parts = math.max(
      1, df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    df.repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mono"), 33))
  }

  /** Exclusive prefix sums of `valueCol` across partition ids: a triangular
    * self-join over <= #partitions rows (bounded by cluster config, not
    * data) — deliberately NOT a global window, so no single-partition
    * WindowExec appears anywhere.
    */
  private def partitionOffsets(perPart: DataFrame, valueCol: String): DataFrame = {
    val lower = perPart.select(col("__pid").as("__pid2"), col(valueCol).as("__v2"))
    perPart.select(col("__pid"))
      .join(broadcast(lower), col("__pid2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__v2")), lit(0L)).as("__off"))
  }

  /** W1: assign dense ids `offset+1 .. offset+n` in ascending `orderCols`
    * order. `orderCols` must uniquely identify rows (callers pass distinct
    * source keys) so the total order — and therefore the ids — are
    * deterministic across runs and cluster layouts.
    */
  def denseIds(df: DataFrame, orderCols: Seq[String], offset: Long, idCol: String = "y"): DataFrame = {
    val sorted = rangeSorted(df, orderCols)
    val partCounts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    sorted
      .join(broadcast(partitionOffsets(partCounts, "__cnt")), Seq("__pid"))
      .withColumn(idCol,
        col("__off") + col("__mono").bitwiseAND(lit(MonoLocalMask)) + lit(1L + offset))
      .drop("__pid", "__off", "__mono")
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
    * code. Aggregate counts per distinct code (map-side combinable), then
    * exclusive-prefix-sum those counts in code order with the same
    * range-partition machinery as [[denseIds]]: the running sum inside each
    * partition is a *partitioned* window (sorts spill, partitions run in
    * parallel) plus broadcast per-partition offsets — no global window at
    * any cardinality.
    */
  def rankIds(df: DataFrame, codeCol: String, base: Long, idCol: String = "concept_id"): DataFrame = {
    val counts = df.groupBy(codeCol).agg(count(lit(1)).as("__cnt"))
    val sorted = rangeSorted(counts, Seq(codeCol))
    val partSums = sorted.groupBy(col("__pid")).agg(sum(col("__cnt")).as("__s"))
    val localW = Window.partitionBy(col("__pid")).orderBy(col("__mono"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted
      .withColumn("__local", coalesce(sum(col("__cnt")).over(localW), lit(0L)))
      .join(broadcast(partitionOffsets(partSums, "__s")), Seq("__pid"))
      .withColumn(idCol, lit(base) + lit(1L) + col("__off") + col("__local"))
      .drop("__cnt", "__mono", "__pid", "__off", "__local")
  }
}
