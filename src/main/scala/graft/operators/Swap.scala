package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * `zipWithIndex`: `repartitionByRange` gives a global order across
  * partition indices, and `zipWithIndex` turns per-partition indices into
  * contiguous global ones with one extra count job. Every partition sorts
  * and indexes in parallel — no single-partition window at any cardinality.
  *
  * Why an RDD hop instead of a pure-DataFrame
  * `monotonically_increasing_id` + per-partition-offset formulation: range
  * boundaries are SAMPLED. The RDD lineage pins the `RangePartitioner`
  * object once, so the count job and the assignment job — and any task
  * retry — see identical boundaries. A DataFrame formulation instantiates
  * the exchange per consumer and only Catalyst's exchange-reuse makes the
  * count and projection subtrees agree; that reuse is not guaranteed
  * (adding a `.persist()` upstream broke it in practice), and when it
  * fails the offsets silently mismatch the final partitioning by a few
  * rows at every partition edge. Correct-by-construction beats fast-by-
  * optimizer-courtesy; the Row-conversion constant is measured and small.
  */
object Swap {

  /** W1: assign dense ids `offset+1 .. offset+n` in ascending `orderCols`
    * order. `orderCols` must uniquely identify rows (callers pass distinct
    * source keys) so the total order — and therefore the ids — are
    * deterministic across runs and cluster layouts.
    */
  def denseIds(df: DataFrame, orderCols: Seq[String], offset: Long, idCol: String = "y"): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(
      1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
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

  /** Step 4 of the pk-swap composite (`etl.py:286-290`): every swap row is
    * recorded in `source_id_to_omop_id_map`
    * (`SOURCE_ID_TO_OMOP_ID_MAP_merge.sql.jinja:3-23`) — the durable
    * source-key -> surrogate lineage users query to trace ids back.
    * `now` is injected (the template uses CURRENT_DATE) for reproducible
    * re-runs. Merge the result with [[Upsert.merge]] on
    * `(omop_table, omop_id)`.
    */
  def toSourceIdMap(
      swap: DataFrame,
      omopTable: String,
      source: String,
      validStart: java.sql.Date): DataFrame =
    swap.select(
      lit(omopTable).as("omop_table"),
      col("y").as("omop_id"),
      lit(source).as("source"),
      col("x").cast("string").as("source_id"),
      lit(validStart).as("valid_start_date"),
      lit(java.sql.Date.valueOf("2099-12-31")).as("valid_end_date"),
      lit(null).cast("string").as("invalid_reason")).distinct()

  /** W2: custom-concept id assignment — `RANK() OVER (ORDER BY concept_code)
    * + 2e9` (`CONCEPT_ID_swap_merge.sql.jinja:9`): equal codes share an id,
    * and the id encodes the code's rank over the *raw* (non-distinct) input.
    *
    * Scale-safe formulation: RANK(code) = 1 + count of rows with a smaller
    * code. Aggregate counts per distinct code (map-side combinable), then
    * exclusive-prefix-sum those counts in code order: a range-partitioned
    * sort over the distinct codes, one bounded job collecting the
    * per-partition count sums (<= #partitions longs), and a parallel scan
    * adding the offsets — the classic distributed prefix-sum, sharing
    * [[denseIds]]'s pinned-partitioner determinism argument. No global
    * window at any cardinality.
    */
  def rankIds(df: DataFrame, codeCol: String, base: Long, idCol: String = "concept_id"): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(
      1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val counts = df.groupBy(codeCol).agg(count(lit(1)).as("__cnt"))
    val sorted = counts
      .repartitionByRange(parts, col(codeCol))
      .sortWithinPartitions(col(codeCol))
    val rdd = sorted.rdd // pins the RangePartitioner across both jobs
    val partSums = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.map(_.getLong(1)).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val o = acc
        acc += r.getLong(1)
        Row(r.get(0), base + 1L + o)
      }
    }
    spark.createDataFrame(out,
      StructType(Seq(sorted.schema.head, StructField(idCol, LongType, nullable = false))))
  }
}
