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

  test("graft.stream.shuffle sizes state-store partitioning; default is the session conf") {
    // r22: state-store instances per stateful operator = shuffle
    // partitions at FIRST start, pinned into the checkpoint. The knob
    // re-sizes ONLY the stream's state partitioning (production posture);
    // absent, the session default rules (the bench contract — no
    // local[32]-only tuning), and the session conf is restored either way.
    val dir = java.nio.file.Files.createTempDirectory("evknob").toString
    fixture(60).repartition(2).write.parquet(s"$dir/events.parquet")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def stateDirs(sink: String): Int = {
      val state = new java.io.File(
        s"${graft.io.Zones.defaultRoot}/stream_ckpt_$sink/state/0")
      Option(state.listFiles())
        .map(_.count(f => f.isDirectory && f.getName.forall(_.isDigit))).getOrElse(0)
    }
    def windowed(sinkTag: String) = graft.streaming.StreamingOps.windowedEventCounts(
      EventQueries.eventsStream(spark, dir, s"spec_ev_knob_$sinkTag"), "ts", "event_type")
    // default: state partitions = session shuffle partitions
    EventQueries.drainToTable(windowed("a"), "spec_knob_default_sink", "complete")
    assert(stateDirs("spec_knob_default_sink") === before.toInt,
      "default state partitioning must follow the session conf")
    // knob: state partitions = knob, conf restored after
    System.setProperty("graft.stream.shuffle", "3")
    try {
      EventQueries.drainToTable(windowed("b"), "spec_knob_sized_sink", "complete")
      assert(stateDirs("spec_knob_sized_sink") === 3,
        "graft.stream.shuffle must size the stream's state partitioning")
      assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
        "session conf must be restored after the drain")
    } finally System.clearProperty("graft.stream.shuffle")
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
