package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Dump the BM25 scoring plan BEFORE the localCheckpoint boundary (the
  * registered query's own plan file shows only the checkpointed scan) —
  * r21 plan evidence for the window -> TopKPairs tail change.
  */
object BmPlanDump {
  def main(args: Array[String]): Unit = {
    val Array(d, out) = args.take(2)
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
    val docs = graft.Tables.load(spark, d, "documents")
    val queries = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(graft.ops.TextOps.tokens(col("text")), 1, 8)).as("qtext"))
    val (scored, _) = graft.ops.RankOps.bm25Plan(
      docs, "doc_id", "text", queries, "qid", "qtext", k1 = 1.2, b = 0.75, k = 10)
    Files.writeString(Paths.get(out), scored.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
