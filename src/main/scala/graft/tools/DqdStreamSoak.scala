package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flat-cost soak for the INCREMENTAL continuous-DQD shape (round-9
  * verdict "What's wrong" #3): feed the sf0.1 events table through
  * [[graft.operators.DqdChecks.incrementalBatch]] as 10 micro-batches and
  * print per-batch wall seconds. The r9 shape (full battery over the
  * rewritten accumulated table) grew linearly with coverage — O(n^2)
  * across the stream; the incremental shape's per-batch cost must stay
  * flat (the pk state merge grows with DISTINCT keys, a narrow two-column
  * frame). Run: `sbt "runMain graft.tools.DqdStreamSoak"`.
  */
object DqdStreamSoak {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val model = graft.model.CdmModel(fields = Seq(
      graft.model.CdmField("events", "event_id", "int64", false, true, None, "CDM"),
      graft.model.CdmField("events", "user_id", "int64", false, false, None, "CDM"),
      graft.model.CdmField("events", "event_type", "string", false, false, None, "CDM"),
      graft.model.CdmField("events", "value", "float64", false, false, None, "CDM")))
    val ev = graft.Tables.load(spark, src, "events")
      .select("event_id", "user_id", "event_type", "value")
      .localCheckpoint(true)
    val zones = graft.io.Zones("target/soak_dqd_stream")
    val root = new org.apache.hadoop.fs.Path(
      new java.io.File("target/soak_dqd_stream").getAbsolutePath)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    val thrDf = graft.operators.DqdChecks.batteryThresholds(model, _ => ev)
    val n = 10
    val times = (0 until n).map { b =>
      val slice = ev.filter(coalesce(pmod(col("event_id"), lit(n)), lit(0)) === b)
      val t0 = System.nanoTime()
      graft.operators.DqdChecks.incrementalBatch(spark, zones, model, thrDf, slice)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"batch":$b,"sec":$sec%.2f}""")
      sec
    }
    println(f"""{"first":${times.head}%.2f,"last":${times.last}%.2f,"ratio_last_first":${times.last / times.head}%.2f}""")
    spark.stop()
  }
}
