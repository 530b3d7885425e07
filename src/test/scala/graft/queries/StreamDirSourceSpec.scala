package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The empty-source drift fixture (round-8's streaming sibling of
  * TsEncodingSpec): an ENGINE-WRITTEN events dataset is a directory of
  * part files, and staging a symlink to it lists zero files — the sf1
  * streaming soaks silently timed an empty source until `eventsStream`
  * learned to stream directories directly. This pins both layouts: the
  * stream must drain the SAME row count the batch reader sees, whatever
  * shape `events.parquet` takes on disk.
  */
class StreamDirSourceSpec extends SparkSpec {

  private def fixture(n: Int) =
    spark.range(0, n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 60000000L).as("ts"),
      (col("id") % 7).as("user_id"),
      lit("click").as("event_type"),
      col("id").cast("double").as("value"),
      lit("{}").as("props"))

  test("eventsStream drains a directory-shaped events dataset completely") {
    val dir = java.nio.file.Files.createTempDirectory("evdir").toString
    fixture(100).repartition(4).write.parquet(s"$dir/events.parquet")
    val drained = EventQueries.drainToTable(
      EventQueries.eventsStream(spark, dir, "spec_ev_dir"),
      "spec_dir_sink", "append")
    assert(drained.count() === 100L,
      "directory-shaped events dataset not fully drained by the stream source")
    assert(spark.read.parquet(s"$dir/events.parquet").count() === 100L)
  }

  test("eventsStream drains a single-file events dataset completely") {
    val dir = java.nio.file.Files.createTempDirectory("evfile").toString
    // a single parquet FILE, the driver-testdata layout
    val staging = java.nio.file.Files.createTempDirectory("evtmp").toString
    fixture(50).coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val drained = EventQueries.drainToTable(
      EventQueries.eventsStream(spark, dir, "spec_ev_file"),
      "spec_file_sink", "append")
    assert(drained.count() === 50L,
      "single-file events dataset not fully drained by the stream source")
  }
}
