package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump the RAW `AchillesGen.mergedResults` plan (the battery the
  * achilles zone store materializes — the registered consumers read the
  * stored table, so PlanDump on them shows only the store read). Evidence
  * artifact for the r22 stage-2 pair/sum fusion.
  *
  * Usage: runMain graft.tools.AchPlanDump <sfDir> <outFile>
  */
object AchPlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.AchillesGen.mergedResults(
      graft.model.TpchModel.modelWithEvents,
      tb => graft.Tables.load(spark, sfDir, tb))
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.writeString(Paths.get(outFile), txt)
    System.err.println(s"[achplandump] wrote $outFile (" +
      txt.linesIterator.count(_.contains("Scan parquet")) + " scans)")
    spark.stop()
  }
}
