package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: scale-soak the published DATA-PATH templates (pk-swap
  * create+merge, `{omop_table}_merge`) verbatim over sf-scaled uploads.
  * Usage: `runMain graft.tools.TemplateSoak <sfDir>`; prints one line per
  * step: name, seconds, resulting row count.
  */
object TemplateSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-template-soak")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.OhdsiTemplateQueries.templateSoak(spark, sfDir).foreach {
      case (step, secs, rows) => println(f"$step%-26s $secs%8.2f s  $rows%10d rows")
    }
    // the BIGQUERY-dialect chain over the same uploads (r16)
    graft.queries.OhdsiTemplateQueries.templateSoakBq(spark, sfDir).foreach {
      case (step, secs, rows) => println(f"$step%-26s $secs%8.2f s  $rows%10d rows")
    }
    spark.stop()
  }
}
