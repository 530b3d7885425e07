package graft.tools

import graft.queries.LifecycleQueries
import org.apache.spark.sql.SparkSession

/** Dev-only profiler for the generated DQD batteries: breaks the
  * dqd_cdm54_battery wall time into plan construction / analysis /
  * optimization / execution so driver-side Catalyst cost is measured, not
  * guessed. Run: sbt "Test/runMain graft.tools.ProfileBattery"
  */
object ProfileBattery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("profile-battery")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val q = LifecycleQueries.defs.toMap.apply("dqd_cdm54_battery")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def once(label: String): Unit = {
      println(label)
      val df = time("construct")(q(spark, "/root/testdata/sf0.001"))
      time("analyze")(df.queryExecution.assertAnalyzed())
      time("optimize")(df.queryExecution.optimizedPlan)
      time("physical")(df.queryExecution.executedPlan)
      time("execute")(df.collect().length)
    }
    once("run 1 (defaults)")
    once("run 2 (defaults, warm)")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    once("run 3 (no codegen)")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    once("run 4 (no codegen, no AQE)")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    once("run 5 (codegen, no AQE)")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    once("run 6 (no expr codegen either, no AQE)")
    spark.stop()
  }
}
