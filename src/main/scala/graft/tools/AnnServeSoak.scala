package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the ANN index build/serve split (r18): at 1x, 10x, and
  * 100x the sf0.1 embeddings (100x = 200k vectors x 64 dims), measure a
  * 20-query batch answered (a) INLINE (`SimOps.ivfTopK` — re-runs the
  * corpus-wide centroid assignment per batch) vs (b) from the STORED
  * index (`SimOps.ivfTopKServe` over a pre-built zone table). The
  * index BUILD cost is reported separately — it runs once per corpus
  * version and amortizes over every query batch, which is the split's
  * entire argument: inline cost grows with the corpus; serve cost grows
  * with the probed lists only. Result equality (same rows, same top-k
  * sum) is REQUIRED in-process at every scale. Replicas are id-shifted
  * so vector identity is preserved per replica and centroid sets stay
  * sqrt-N by the family rule. Run:
  * `sbt "runMain graft.tools.AnnServeSoak [sfDir]"` (default sf0.1).
  */
object AnnServeSoak {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (scale <- Seq(1, 10, 100)) {
      val OFF = 10000000L
      val corpus = (if (scale == 1) base
        else base.crossJoin(spark.range(0, scale).select(col("id").as("__rep")))
          .select((col("vec_id") + col("__rep") * OFF).as("vec_id"), col("embedding")))
        .localCheckpoint(true)
      val n = corpus.count()
      val stride = graft.ops.SimOps.sqrtStride(n)
      val cents = corpus.filter(col("vec_id") % stride === lit(25L % stride))
        .localCheckpoint(true)
      val queries = base.filter(col("vec_id") % 100 === 0).limit(20)
        .localCheckpoint(true)
      def topkStats(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), sum(col("item_id"))).head()
        (r.getLong(0), r.getLong(1))
      }
      // inline: the corpus-wide assignment re-runs inside the query
      val ((ri, si), tInline) = time(topkStats(graft.ops.SimOps.ivfTopK(
        corpus, queries, cents, "vec_id", "embedding", k = 5, nprobe = 2)))
      // split: build once (reported), serve from the stored table
      val zones = graft.io.Zones.forPurpose(s"annsoak_$scale")
      val (_, tBuild) = time(zones.write(
        graft.ops.SimOps.ivfIndex(corpus, cents, "vec_id", "embedding"),
        "work", "index"))
      val index = zones.read(spark, "work", "index")
      val ((rs, ss), tServe) = time(topkStats(graft.ops.SimOps.ivfTopKServe(
        index, cents, queries, "vec_id", "embedding", k = 5, nprobe = 2)))
      require(ri == rs && si == ss,
        s"serve diverged from inline at scale $scale: ($rs,$ss) vs ($ri,$si)")
      println(f"""{"scale":$scale,"n_vectors":$n,"n_centroids":${cents.count()},"inline_sec":$tInline%.2f,"index_build_sec":$tBuild%.2f,"serve_sec":$tServe%.2f,"topk_rows":$ri}""")
    }
    spark.stop()
  }
}
