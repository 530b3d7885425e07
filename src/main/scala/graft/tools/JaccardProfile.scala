package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the jaccardPairs path (r21 measurement aid). */
object JaccardProfile {
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
    import graft.ops.{DedupOps, TextOps}
    val docs = graft.Tables.load(spark, d, "documents")
    def time(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    println(s"[profile] docs=${docs.count()}")
    val sigs = DedupOps.minhashSignatureArray(docs, "doc_id", "text", k = 8, w = 3)
    time("signatures")(noop(sigs))
    val bands = DedupOps.lshBandsFromSigArray(sigs, "doc_id", k = 8, rows = 4)
    time("bands")(noop(bands))
    val candidates = bands.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
      .join(bands.select(col("doc_id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    println(s"[profile] candidates=${candidates.count()}")
    time("candidates")(noop(candidates))
    time("jaccard_full")(noop(
      DedupOps.jaccardPairs(docs, "doc_id", "text", threshold = 0.2)))
    val sets = docs.select(col("doc_id"),
      array_sort(array_distinct(TextOps.tokens(col("text")))).as("toks"))
    time("tok_sets")(noop(sets))
    time("verify_join")(noop(
      candidates
        .join(sets.select(col("doc_id").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
        .join(sets.select(col("doc_id").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
        .withColumn("jaccard",
          size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
        .filter(col("jaccard") >= 0.2)))
    spark.stop()
  }
}
