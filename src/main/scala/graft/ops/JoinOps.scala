package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval join operators Spark's built-in join set lacks,
  * re-expressed as shuffle-bounded compositions (SURVEY.md §7 beyond-parity
  * goals — the as-of and range joins every event/feature pipeline needs).
  *
  * Both avoid any per-row driver logic and any all-pairs plan shape: the
  * as-of join is one hash exchange + one in-partition sort over the unioned
  * inputs; the interval join is an equi-join on derived bucket keys. Each
  * survives a 100x scale-up because its only shuffles are on the join keys
  * themselves.
  */
object JoinOps {

  /** Exact floor division of an integral column by a positive width.
    * `floor(col / b)` routes through DOUBLE division, which can misplace
    * values with |v| >= 2^53 into the wrong bucket (silently dropping
    * qualifying pairs). Here every step is exact: `pmod` keeps the
    * subtraction in long arithmetic, and the decimal division divides a
    * proven multiple of `b`, so the quotient is an exactly-representable
    * integer before the final cast.
    */
  private def floorDiv(x: org.apache.spark.sql.Column, bw: Long): org.apache.spark.sql.Column = {
    val xl = x.cast("long")
    ((xl - pmod(xl, lit(bw))).cast("decimal(20,0)") / lit(bw)).cast("long")
  }

  /** Internal column names a caller's schema must not shadow: the
    * union-window machinery computes through these, so a collision would
    * silently corrupt results rather than fail. */
  private val asofReserved = Set("__k", "__t", "__tag", "__lv", "__rv", "__m")

  private def requireNoReserved(df: DataFrame, side: String, reserved: Set[String]): Unit = {
    val bad = df.columns.toSet.intersect(reserved)
    require(bad.isEmpty,
      s"$side input uses reserved internal column names ${bad.mkString(", ")} — rename them before joining")
  }

  /** Backward (inclusive) as-of join: each left row picks the single right
    * row with the LARGEST `rTime <= lTime` for its key — the classic
    * "latest observation at-or-before the event" lookup (DuckDB/kdb
    * `ASOF JOIN`, pandas `merge_asof`).
    *
    * Implementation is the union-window formulation, not a join: tag right
    * rows 0 and left rows 1, union them, and take
    * `last(payload, ignoreNulls)` over a per-key window ordered by
    * `(time, tag)` with a rows-frame ending at the current row. Right rows
    * sort before left rows at equal timestamps, which yields the inclusive
    * (`>=`) match semantics. ONE hash exchange on the key + one
    * in-partition sort — no range-join blowup, no broadcast requirement on
    * either side; a window never sees more than one key's rows.
    *
    * Requirements: right must be unique per `(rKey, rTime)` (pre-dedup it —
    * [[asofJoin]] would otherwise pick the last right row in `(time, tag)`
    * order nondeterministically), keys must be non-null, and right payload
    * column names must not collide with left columns. Unmatched left rows
    * keep null payload columns (left-join semantics).
    *
    * Hot-key bound: the per-key window means ONE key's rows serialize in
    * one task — the same bound as any `groupBy(key)` — so a pathological
    * key (10^8 rows under one key) is this plan's skew ceiling. Use
    * [[asofJoinBucketed]] there: it splits the window by fixed-width time
    * buckets and stitches across boundaries with a bucket-granular carry
    * pass, bounding tasks by bucket occupancy instead (the as-of analogue
    * of the salted IVF remedy in SimOps). Measured (round-7 sf1 soak,
    * 10x events with ~13% of the stream on ONE user, `BENCH_sf1.jsonl`):
    * worst task skew 2.0x here vs 1.6x bucketed, identical results.
    */
  def asofJoin(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == rKey || c == rTime).toSeq
    require(payloadCols.nonEmpty, "right side must carry at least one payload column")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")
    requireNoReserved(left, "left", asofReserved)
    requireNoReserved(right, "right", asofReserved)

    val l2 = left.select(
      col(lKey).as("__k"), col(lTime).as("__t"), lit(1).as("__tag"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lv"))
    val r2 = right.select(
      col(rKey).as("__k"), col(rTime).as("__t"), lit(0).as("__tag"),
      struct(payloadCols.map(col): _*).as("__rv"))
    val lvType = l2.schema("__lv").dataType
    val rvType = r2.schema("__rv").dataType

    val unioned = l2.withColumn("__rv", lit(null).cast(rvType))
      .unionByName(r2.withColumn("__lv", lit(null).cast(lvType)))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__lv.*") +: payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** [[asofJoin]] with the per-key window split by fixed-width time
    * buckets — the hot-key remedy. The plain as-of join's window is
    * bounded by ONE key's rows, so a pathological key (one user with 10^8
    * events) serializes in a single task. Here the main window partitions
    * by `(key, bucket)`, bounding every task by one BUCKET's occupancy,
    * and a second, bucket-granular as-of pass stitches matches across
    * bucket boundaries:
    *
    *   1. in-bucket: the union-window of [[asofJoin]] over
    *      `(key, floor(time / width))` — finds the latest right row
    *      at-or-before each left row WITHIN its bucket;
    *   2. carry: reduce the right side to one row per `(key, bucket)`
    *      (`max_by` — its last value), then a per-key window over the
    *      BUCKET-level rows (left buckets sort before right bucket-ends at
    *      equal bucket, so a left bucket sees strictly-earlier buckets
    *      only) computes the latest right value from any earlier bucket;
    *   3. stitch: each left row takes its in-bucket match if present —
    *      always at-or-later than any earlier bucket's value — else the
    *      carry, joined back on `(key, bucket)`, one row per pair.
    *
    * Task bounds: O(max rows per (key, bucket)) for step 1,
    * O(buckets per key) for step 2 — pick `bucketWidth` near the hot key's
    * time spread / desired parallelism. Same semantics as [[asofJoin]]
    * (backward inclusive, left-join, right unique per `(rKey, rTime)`);
    * both time columns must be integral (epoch seconds/micros — callers
    * convert first, keeping the bucket math exact like [[intervalJoin]]).
    */
  def asofJoinBucketed(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val payloadCols = right.columns.filterNot(c => c == rKey || c == rTime).toSeq
    require(payloadCols.nonEmpty, "right side must carry at least one payload column")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")
    val reserved = asofReserved ++ Set("__b", "__btag", "__c")
    requireNoReserved(left, "left", reserved)
    requireNoReserved(right, "right", reserved)

    val l2 = left.select(
      col(lKey).as("__k"), col(lTime).cast("long").as("__t"), lit(1).as("__tag"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lv"))
      .withColumn("__b", floorDiv(col("__t"), bucketWidth))
    val r2 = right.select(
      col(rKey).as("__k"), col(rTime).cast("long").as("__t"), lit(0).as("__tag"),
      struct(payloadCols.map(col): _*).as("__rv"))
      .withColumn("__b", floorDiv(col("__t"), bucketWidth))
    val lvType = l2.schema("__lv").dataType
    val rvType = r2.schema("__rv").dataType

    // 1. in-bucket match: window bounded by one bucket's rows, never a key's
    val unioned = l2.withColumn("__rv", lit(null).cast(rvType))
      .unionByName(r2.withColumn("__lv", lit(null).cast(lvType)))
    val wB = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(wB))
      .filter(col("__tag") === 1)

    // 2. carry: bucket-granular as-of — left buckets (tag 0) sort BEFORE
    // right bucket-ends (tag 1) at equal bucket, so the frame sees
    // strictly-earlier buckets only (same-bucket rights are step 1's job)
    val bucketEnds = r2.groupBy(col("__k"), col("__b"))
      .agg(max_by(col("__rv"), col("__t")).as("__rv"))
    val leftBuckets = l2.select(col("__k"), col("__b")).distinct()
    val carryU = leftBuckets
      .withColumn("__btag", lit(0)).withColumn("__rv", lit(null).cast(rvType))
      .unionByName(bucketEnds.withColumn("__btag", lit(1)))
    val wC = Window.partitionBy(col("__k"))
      .orderBy(col("__b").asc, col("__btag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = carryU
      .withColumn("__c", last(col("__rv"), ignoreNulls = true).over(wC))
      .filter(col("__btag") === 0)
      .select(col("__k"), col("__b"), col("__c"))

    // 3. stitch: exactly one carry row per left (key, bucket) — no fanout
    inBucket.join(carry, Seq("__k", "__b"), "left")
      .withColumn("__m", coalesce(col("__m"), col("__c")))
      .select(col("__lv.*") +: payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Interval (range) join: points against half-open intervals `[s, e)`,
    * WITHOUT an equi-key — the case where a naive plan degenerates to
    * `BroadcastNestedLoopJoin`/cartesian. Both sides map to fixed-width
    * buckets (intervals explode to every bucket they overlap; a point lands
    * in exactly one), the join becomes an equi-join on the bucket id, and a
    * residual filter applies the exact containment. Each qualifying
    * (point, interval) pair meets in exactly one bucket, so no dedup pass
    * is needed.
    *
    * All three columns must be integral (callers convert timestamps to
    * epoch days/seconds first — keeps the bucket math exact). Intervals
    * with `e <= s` are empty by the half-open contract and are dropped.
    * Cost scales with `len(interval)/bucketWidth` per interval; pick the
    * width near the typical interval length so most intervals explode to
    * 1-2 buckets.
    */
  def intervalJoin(points: DataFrame, pCol: String,
      intervals: DataFrame, sCol: String, eCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    requireNoReserved(points, "points", Set("__b"))
    requireNoReserved(intervals, "intervals", Set("__b"))
    val iv = intervals
      .filter(col(eCol) > col(sCol))
      .withColumn("__b", explode(sequence(
        floorDiv(col(sCol), bucketWidth), floorDiv(col(eCol) - 1, bucketWidth))))
    val pts = points.withColumn("__b", floorDiv(col(pCol), bucketWidth))
    pts.join(iv, Seq("__b"))
      .filter(col(sCol) <= col(pCol) && col(pCol) < col(eCol))
      .drop("__b")
  }
}
