package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flat-cost soak for the CONTINUOUS-Achilles shape
  * (`stream_achilles_counts`): feed the sf0.1 events table through the
  * per-batch partials + bounded-merge flow as 10 micro-batches and print
  * per-batch wall seconds. Per-batch cost must stay flat — the merge is a
  * groupBy-sum over the bounded report key (strata count, not corpus
  * size), so batch 10 must not pay more than batch 1.
  * Run: `sbt "runMain graft.tools.AchStreamSoak"`.
  */
object AchStreamSoak {
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
      graft.model.CdmField("events", "value", "float64", false, false, None, "CDM"),
      graft.model.CdmField("events", "ts", "datetime", false, false, None, "CDM")))
    val ev = graft.Tables.load(spark, src, "events")
      .select("event_id", "user_id", "event_type", "value", "ts")
      .localCheckpoint(true)
    val zones = graft.io.Zones("target/soak_ach_stream")
    val root = new org.apache.hadoop.fs.Path(
      new java.io.File("target/soak_ach_stream").getAbsolutePath)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
    val n = 10
    val times = (0 until n).map { b =>
      val slice = ev.filter(coalesce(pmod(col("event_id"), lit(n)), lit(0)) === b)
      val t0 = System.nanoTime()
      val part = graft.operators.AchillesGen.partialCounts(model, _ => slice)
      val merged =
        if (zones.listTables(spark, "work").contains("ach_partials"))
          graft.operators.AchillesGen.mergePartialCounts(
            Seq(zones.read(spark, "work", "ach_partials"), part), -1L)
        else part
      zones.write(merged.coalesce(1), "work", "ach_partials")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"batch":$b,"sec":$sec%.2f}""")
      sec
    }
    println(f"""{"first":${times.head}%.2f,"last":${times.last}%.2f,"ratio_last_first":${times.last / times.head}%.2f}""")

    // dist tier (stream_achilles_dist): per-batch VALUE-HISTOGRAM partials
    // merged by one groupBy-sum on (analysis, stratum, value); the dist
    // aggregation itself runs once at the end (read-side cost). Flatness
    // contract is the same: the merge key is histogram cardinality, not
    // corpus size.
    val dtimes = (0 until n).map { b =>
      val slice = ev.filter(coalesce(pmod(col("event_id"), lit(n)), lit(0)) === b)
      val t0 = System.nanoTime()
      val part = graft.operators.AchillesGen.distValueCounts(model, _ => slice)
      val merged =
        if (zones.listTables(spark, "work").contains("ach_dist_partials"))
          zones.read(spark, "work", "ach_dist_partials").unionByName(part)
            .groupBy(col("analysis_id"), col("stratum_1"), col("__v"))
            .agg(sum(col("__cnt")).as("__cnt"))
        else part
      zones.write(merged.coalesce(1), "work", "ach_dist_partials")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dist_batch":$b,"sec":$sec%.2f}""")
      sec
    }
    val t0 = System.nanoTime()
    val nOut = graft.operators.AchillesGen.mergeDistPartials(
      Seq(zones.read(spark, "work", "ach_dist_partials"))).count()
    println(f"""{"dist_first":${dtimes.head}%.2f,"dist_last":${dtimes.last}%.2f,"dist_ratio":${dtimes.last / dtimes.head}%.2f,"read_agg_sec":${(System.nanoTime() - t0) / 1e9}%.2f,"dist_rows":$nOut}""")
    spark.stop()
  }
}
