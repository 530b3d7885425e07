package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Beyond-parity streaming surface. The reference is strictly batch
  * (SURVEY.md §2.9 — no watermarks/windows/state anywhere in
  * `/root/reference/src/`); its incremental story is idempotent re-runs.
  * These operators extend the same semantics to a Structured Streaming
  * ingest of the raw zone: the transformations are plain DataFrame ops, so
  * they bind to `spark.readStream` sources unchanged, and state size is
  * bounded by the watermark (late data past it is dropped, state evicted).
  */
object StreamingOps {

  /** Windowed event counts with event-time watermarking — the streaming
    * analogue of the DQD per-run aggregates. Works on batch DataFrames too
    * (watermark is a no-op there), which is how the spec cross-checks it.
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(typeCol))
      .count()
      .select(col("w.start").as("window_start"), col(typeCol), col("count").as("n_events"))

  /** Event-time sessionization on a stream: Spark's native `session_window`
    * merges events within `gap` of each other per user — the streaming
    * counterpart of the batch running-sum sessionizer (EventQueries
    * .eventSessionize), with state bounded by the watermark. Declarative
    * (no custom `mapGroupsWithState`) because the built-in operator already
    * expresses the semantics.
    */
  def sessionCounts(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("s"), col(userCol))
      .count()
      .select(
        col("s.start").as("session_start"),
        col(userCol),
        col("count").as("n_events"))

  /** Streaming exact dedup: first occurrence of each key wins; state for a
    * key is dropped once the watermark passes it, so memory is bounded —
    * the streaming analogue of the A6/J4 append-only semantics.
    */
  def streamingDedup(events: DataFrame, tsCol: String, keyCols: Seq[String], watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)
}
