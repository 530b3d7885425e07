package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clustering-parity benefit measurement (r16, SURVEY §1.3): the bridge
  * records the published BigQuery `CLUSTER BY` keys and re-sorts within
  * partitions on every write-back — this soak measures what that layout
  * buys a downstream key scan. It writes the SAME rows (orders replicated
  * to ~32x, keyed like the id map) once UNSORTED and once through the
  * clustered write path, then times a selective `omop_id` range scan and
  * a small key-set join on each — parquet row-group min/max stats prune
  * the sorted layout, and cannot prune the unsorted one. Run:
  * `sbt "runMain graft.tools.ClusterSoak [sfDir]"`.
  */
object ClusterSoak {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val orders = graft.Tables.load(spark, d, "orders")
    // ~32x replication: a plausible downstream id-map size without
    // synthesizing a new universe
    val rows = orders.crossJoin(spark.range(32).select(col("id").as("rep")))
      .select(
        (col("o_orderkey") * 32 + col("rep")).as("omop_id"),
        element_at(array(lit("person"), lit("provider"), lit("visit_occurrence")),
          (col("o_orderkey") % 3 + 1).cast("int")).as("omop_table"),
        col("o_custkey").as("source_ref"))
    val n = rows.count()
    println(s"""{"n_rows":$n}""")
    spark.sql("DROP TABLE IF EXISTS default.clsoak_unsorted")
    spark.sql("DROP TABLE IF EXISTS default.clsoak_clustered")
    // a LOCATION left by a previous JVM outlives the in-memory catalog
    // (the r15 trap) — clear both before the managed writes
    for (tb <- Seq("clsoak_unsorted", "clsoak_clustered")) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$tb")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    // unsorted: rows land in scan order (omop_id scattered per file)
    rows.write.mode("overwrite").saveAsTable("default.clsoak_unsorted")
    // clustered: the bridge's write-back layout (sort within partitions
    // by the recorded cluster keys)
    rows.sortWithinPartitions("omop_table", "omop_id")
      .write.mode("overwrite").saveAsTable("default.clsoak_clustered")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val maxId = n * 32
    val keys = spark.range(1000).select((col("id") * 97 % 10000).as("omop_id"))
      .distinct().localCheckpoint(true)
    for (tbl <- Seq("clsoak_unsorted", "clsoak_clustered")) {
      spark.catalog.clearCache()
      val (c1, t1) = time(spark.table(s"default.$tbl")
        .filter(col("omop_id").between(100000, 101000)).count())
      val (c2, t2) = time(spark.table(s"default.$tbl")
        .join(broadcast(keys), Seq("omop_id")).count())
      println(f"""{"table":"$tbl","range_rows":$c1,"range_sec":$t1%.3f,"join_rows":$c2,"join_sec":$t2%.3f}""")
    }
    spark.stop()
  }
}
