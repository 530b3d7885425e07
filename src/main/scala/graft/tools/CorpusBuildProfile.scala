package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time the corpus artifact-store build's components individually (r21
  * measurement aid): the store-build entry runs them concurrently, so the
  * bench number hides which scan owns the wall. Noop-sinks each component
  * (guide §1.4) with a job label (§1.5).
  */
object CorpusBuildProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, d, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    def time(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("jaccard_pairs")(noop(
      graft.ops.DedupOps.jaccardPairs(docs, "doc_id", "text", threshold = 0.2)))
    time("connected_components")(noop(graft.ops.DedupOps.connectedComponents(
      graft.ops.DedupOps.jaccardPairs(docs, "doc_id", "text", threshold = 0.2),
      "id_a", "id_b")))
    time("band_index")(noop(graft.ops.DedupOps.lshBandsFromSigArray(
      graft.ops.DedupOps.minhashSignatureArray(corpus, "doc_id", "text", k = 8, w = 3),
      "doc_id", k = 8, rows = 4)))
    time("gopher_gate")(noop(graft.ops.RepetitionOps.gopherGate(docs)))
    time("corpus_md5")(noop(
      corpus.select(md5(col("text")).as("__h")).distinct()))
    spark.stop()
  }
}
