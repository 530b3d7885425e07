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
