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
    // ---- hot-centroid serve skew (r19, VERDICT #1) ----------------------
    // One centroid owns ~10% of the 100x corpus: every 10th vector is an
    // exact copy of one centroid direction (cosine is scale-invariant, so
    // the copies all assign there), giving a ~20k-row inverted list. The
    // serve join runs twice from the SAME stored index: through the
    // persisted __salt key (the r19 armor — the hot list splits into
    // ceil(20k/4096) bounded sub-lists and probes fan out), and through a
    // salt-STRIPPED copy (the r18 unsalted join — the whole hot list is
    // one task). Half the query batch probes the hot centroid. Result
    // equality REQUIRED; per-stage max/median task-duration skew reported
    // for both.
    locally {
      val OFF = 10000000L
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) durations.add((t.stageId, t.taskInfo.duration))
      })
      def worstSkew(): (Double, Int) = {
        import scala.jdk.CollectionConverters._
        val byStage = durations.asScala.toSeq.groupBy(_._1).view.mapValues(_.map(_._2))
        val candidates = byStage.filter { case (_, ds) => ds.size >= 8 && ds.max >= 200 }
        if (candidates.isEmpty) (1.0, -1)
        else {
          val (stage, ds) = candidates.maxBy { case (_, ds) =>
            val sorted = ds.sorted; ds.max.toDouble / math.max(sorted(ds.size / 2), 1L)
          }
          val sorted = ds.sorted
          (ds.max.toDouble / math.max(sorted(ds.size / 2), 1L), stage)
        }
      }
      /** Longest single task since the last clear — the DIRECT form of
        * the bounded-list claim (a compute-heavy hot partition is small
        * in BYTES, so AQE coalescing can leave its stage under the
        * ≥8-task skew filter while one task still owns the whole list).
        */
      def maxTaskMs(): Long = {
        import scala.jdk.CollectionConverters._
        val ds = durations.asScala.toSeq.map(_._2)
        if (ds.isEmpty) 0L else ds.max
      }
      val corpusRep = base.crossJoin(spark.range(0, 100).select(col("id").as("__rep")))
        .select((col("vec_id") + col("__rep") * OFF).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val stride = graft.ops.SimOps.sqrtStride(corpusRep.count())
      val hotVec = corpusRep.filter(col("vec_id") % stride === lit(25L % stride))
        .orderBy("vec_id").limit(1)
        .select(transform(col("embedding"), _.cast("double"))).head().getSeq[Double](0)
      val corpusHot = corpusRep.select(col("vec_id"),
        when(col("vec_id") % 10 === 5, lit(hotVec.toArray)).otherwise(
          transform(col("embedding"), _.cast("double"))).as("embedding"))
        .localCheckpoint(true)
      val cents = corpusHot.filter(col("vec_id") % stride === lit(25L % stride))
        .localCheckpoint(true)
      // 500 of the 510 queries probe the hot centroid: the unsalted join
      // concentrates 500 probes x the full hot list into ONE task (the
      // r7 skew shape); the salted join spreads them across the list's
      // ceil(size/4096) sub-lists
      val queries = base.filter(col("vec_id") % 100 === 0).limit(10)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
        .unionByName(spark.range(0, 500).select(
          (col("id") + 990000000L).as("vec_id"), lit(hotVec.toArray).as("embedding")))
        .localCheckpoint(true)
      val zones = graft.io.Zones.forPurpose("annsoak_hot")
      zones.write(graft.ops.SimOps.ivfIndex(corpusHot, cents, "vec_id", "embedding"),
        "work", "index")
      val index = zones.read(spark, "work", "index")
      val hotList = index.groupBy("centroid_id").count()
        .agg(max("count")).head().getLong(0)
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      def stats(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), sum(col("item_id"))).head()
        (r.getLong(0), r.getLong(1))
      }
      // the skew this armor exists for appears when the probe side
      // EXCEEDS the broadcast threshold (the r18 caveat: a 510-row batch
      // broadcasts and the index merely streams — no per-centroid task
      // concentration, both forms read skew 1.0). Disable broadcast for
      // the two serves to reproduce the production shuffle-join regime
      // at local scale; restore after.
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqeThresh = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        durations.clear()
        val ((rSalt, sSalt), tSalt) = time(stats(graft.ops.SimOps.ivfTopKServe(
          index, cents, queries, "vec_id", "embedding", k = 5, nprobe = 2)))
        val (skewSalt, stageSalt) = worstSkew()
        val maxSalt = maxTaskMs()
        durations.clear()
        val ((rFlat, sFlat), tFlat) = time(stats(graft.ops.SimOps.ivfTopKServe(
          index.drop("__salt", "__nsalt"), cents, queries,
          "vec_id", "embedding", k = 5, nprobe = 2)))
        val (skewFlat, stageFlat) = worstSkew()
        val maxFlat = maxTaskMs()
        require(rSalt == rFlat && sSalt == sFlat,
          s"salted serve diverged from unsalted: ($rSalt,$sSalt) vs ($rFlat,$sFlat)")
        println(f"""{"mode":"hot_centroid_100x","hot_list":$hotList,"salted_serve_sec":$tSalt%.2f,"salted_skew":$skewSalt%.1f,"salted_skew_stage":$stageSalt,"salted_max_task_ms":$maxSalt,"unsalted_serve_sec":$tFlat%.2f,"unsalted_skew":$skewFlat%.1f,"unsalted_skew_stage":$stageFlat,"unsalted_max_task_ms":$maxFlat,"topk_rows":$rSalt}""")
        // ---- IVF-PQ twin (r20, VERDICT #3): the PQ serve's salted
        // candidate join landed late in r19 and its hot-centroid behavior
        // was inferred from the IVF twin — measure it directly: same
        // stored index (centroid_id, item_id, __salt, __nsalt as the
        // inverted lists), same 17%-skew corpus, same broadcast-disabled
        // shuffle regime, result equality REQUIRED between the salted
        // lists and a salt-stripped copy.
        val inverted = index.select(
          col("centroid_id"), col("item_id"), col("__salt"), col("__nsalt"))
          .localCheckpoint(true)
        val cb = graft.ops.SimOps.pqCodebook(
          corpusHot, "vec_id", "embedding", dim = 64, m = 8)
          .localCheckpoint(true)
        val codes = graft.ops.SimOps.pqCodes(
          corpusHot, "vec_id", "embedding", cb, dim = 64, m = 8)
          .withColumnRenamed("vec_id", "item_id")
          .localCheckpoint(true)
        durations.clear()
        val ((rPq, sPq), tPq) = time(stats(graft.ops.SimOps.ivfPqServe(
          inverted, cb, codes, cents, corpusHot, queries,
          "vec_id", "embedding", dim = 64, m = 8, nprobe = 2,
          pool = 100, k = 5)))
        val (skewPq, stagePq) = worstSkew()
        val maxPq = maxTaskMs()
        durations.clear()
        val ((rPqF, sPqF), tPqF) = time(stats(graft.ops.SimOps.ivfPqServe(
          inverted.drop("__salt", "__nsalt"), cb, codes, cents, corpusHot,
          queries, "vec_id", "embedding", dim = 64, m = 8, nprobe = 2,
          pool = 100, k = 5)))
        val (skewPqF, stagePqF) = worstSkew()
        val maxPqF = maxTaskMs()
        require(rPq == rPqF && sPq == sPqF,
          s"salted PQ serve diverged from unsalted: ($rPq,$sPq) vs ($rPqF,$sPqF)")
        println(f"""{"mode":"hot_centroid_100x_ivfpq","hot_list":$hotList,"salted_serve_sec":$tPq%.2f,"salted_skew":$skewPq%.1f,"salted_skew_stage":$stagePq,"salted_max_task_ms":$maxPq,"unsalted_serve_sec":$tPqF%.2f,"unsalted_skew":$skewPqF%.1f,"unsalted_skew_stage":$stagePqF,"unsalted_max_task_ms":$maxPqF,"topk_rows":$rPq}""")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        prevAqeThresh.foreach(
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      }
    }
    spark.stop()
  }
}
