package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-soak of the dedup/ANN/corpus family (round-5 verdict "Next
  * round" #6): generate a 10x `documents`/`embeddings` dataset (the
  * driver's testdata tops out at sf0.1 and is read-only), run the family at
  * sf0.1 and sf1, and report per-query wall times plus the worst task-time
  * skew observed — the two signals PlanAuditSpec's static shuffle bounds
  * cannot see.
  *
  * Dataset construction (deterministic, seedless): 10 copies of the sf0.1
  * tables with shifted ids. Copy 0 is verbatim; for copies c>0, documents
  * with `id % 3 == 0` keep IDENTICAL text (exact duplicates across copies)
  * and the rest get a `copy<c>` head token (near-duplicates — high Jaccard
  * for long docs). Embeddings perturb one id-dependent dimension by
  * 0.001*c (near-identical vectors). This is DENSER near-dup structure
  * than an organic 10x corpus — deliberately, to stress the candidate
  * joins and cluster formation with hot buckets.
  */
object Soak {

  private val Families = Seq("dedup_", "sim_", "corpus_", "text_", "embed_", "doc_", "join_")

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = "target/soak_sf1"
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

    // ---- generate (idempotent) ------------------------------------------
    val docsPath = s"$out/documents.parquet"
    if (!new java.io.File(docsPath).exists()) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val nDocs = docs.count()
      val copies = spark.range(0, 10).select(col("id").as("__copy"))
      docs.crossJoin(copies)
        .select(
          (col("doc_id") + col("__copy") * nDocs).as("doc_id"),
          when(col("__copy") === 0 || col("doc_id") % 3 === 0, col("text"))
            .otherwise(concat(lit("copy"), col("__copy"), lit(" "), col("text"))).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(docsPath)

      val embs = spark.read.parquet(s"$src/embeddings.parquet")
      val nEmbs = embs.count()
      embs.crossJoin(copies)
        .select(
          (col("vec_id") + col("__copy") * nEmbs).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === col("vec_id") % size(col("embedding")),
              x + col("__copy").cast("float") * lit(0.001f)).otherwise(x)).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
      println(s"generated $out: ${nDocs * 10} docs, ${nEmbs * 10} vectors")
    }

    // ---- events at 10x with a deliberately HOT key ----------------------
    // The as-of join family's scale hazard is one pathological key
    // serializing a per-key window; copies c>0 remap every 7th user's
    // events onto user 1, so ~13% of the 10x stream lands on ONE key —
    // the condition join_asof's skew ceiling and join_asof_bucketed's
    // remedy are supposed to differ under. ts stays raw nanos (the
    // Tables.load events contract).
    val evPath = s"$out/events.parquet"
    if (!new java.io.File(evPath).exists()) {
      val ev = spark.read.parquet(s"$src/events.parquet")
      val nEv = ev.count()
      val copies = spark.range(0, 10).select(col("id").as("__copy"))
      ev.crossJoin(copies)
        .select(
          (col("event_id") + col("__copy") * nEv).as("event_id"),
          col("ts"),
          when(col("__copy") > 0 && col("user_id") % 7 === 0, lit(1L))
            .otherwise(col("user_id")).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(evPath)
      // the as-of right side: sf0.1 orders verbatim (right-side size is
      // irrelevant to the hot-key question)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/orders.parquet"),
        java.nio.file.Paths.get(s"$out/orders.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"generated $evPath: ${nEv * 10} events (hot user 1)")
    }

    // ---- task-skew listener ---------------------------------------------
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) durations.add((t.stageId, t.taskInfo.duration))
    })

    /** Worst per-stage max/median task-duration ratio (stages with >= 8
      * tasks and a non-trivial max, so scheduler noise on empty stages
      * doesn't read as skew).
      */
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

    // ---- SemDeDup hot-centroid soak (round-8 verdict #4) ----------------
    // Mirrors the r7 hot-user as-of soak: ~9% of a 10x embedding corpus
    // collapses onto ONE direction (copies c>0 remap every 10th vector to
    // near-vector-0), so one centroid's cluster holds ~29k members. The
    // blocked plan (default maxCluster 4096) must bound the widest task
    // where the single-block plan concentrates the whole
    // occupancy-squared comparison; verdicts are pinned identical by
    // SemDedupSpec and the shared oracle.
    if (sys.env.contains("SPARK_GRAFT_SOAK_SEMDEDUP")) {
      val hotPath = s"$out/embeddings_hotsem.parquet"
      if (!new java.io.File(hotPath).exists()) {
        val embs = spark.read.parquet(s"$src/embeddings.parquet")
        val nEmbs = embs.count()
        val copies = spark.range(0, 10).select(col("id").as("__copy"))
        val v0 = embs.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1)
        val v0lit = array(v0.map(x => lit(x)): _*)
        embs.crossJoin(copies).select(
            (col("vec_id") + col("__copy") * nEmbs).as("vec_id"),
            when(col("__copy") > 0 && col("vec_id") % 10 === 0,
              transform(v0lit, x =>
                x + (col("vec_id") % 97).cast("float") * lit(1e-6f)))
              .otherwise(col("embedding")).as("embedding"),
            col("label"))
          .repartition(32)
          .write.mode(SaveMode.Overwrite).parquet(hotPath)
        println(s"generated $hotPath (hot direction ~9% of corpus)")
      }
      val hot = spark.read.parquet(hotPath)
      // the family's sqrt-N stride rule (r18), same pick as the entries
      val hotStride = graft.ops.SimOps.sqrtStride(hot.count())
      val centroids = hot.filter(col("vec_id") % hotStride === lit(25L % hotStride))
      // untimed warmup: the first plan over this dataset absorbs ~9 s of
      // parquet-footer IO + JIT + codegen that would otherwise be charged
      // to whichever variant runs first (measured: the ordering flipped
      // the comparison entirely)
      graft.ops.SimOps.semDedup(hot, centroids, "vec_id", "embedding", 0.95)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      System.gc()
      val sbSem = new StringBuilder
      for ((tag, mc) <- Seq(("blocked", 4096), ("single_block", 1 << 30))) {
        durations.clear()
        val t0 = System.nanoTime()
        graft.ops.SimOps
          .semDedup(hot, centroids, "vec_id", "embedding", 0.95, maxCluster = mc)
          .write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0) / 1e9
        val (skew, stage) = worstSkew()
        sbSem.append(f"""{"sf":"sf1_hotsem","query":"dedup_semantic_$tag","sec":$secs%.3f,"worst_skew":$skew%.1f,"skew_stage":$stage}%n""")
        println(f"[sf1_hotsem] dedup_semantic_$tag%-24s $secs%7.2fs  skew $skew%5.1fx")
        spark.catalog.clearCache()
        System.gc()
      }
      // ---- routed vs flat assignment at a LARGE centroid set ----------
      // The adaptive cutover's motivating regime: 8k centroids over 40k
      // vectors (flat scan = 320M dots + a 320M-row rank window; routed =
      // sqrt-sized coarse probes + triangle-pruned cells). Same results by
      // construction — this measures the assignment cost only.
      val bigCents = hot.filter(col("vec_id") % 5 === 1)
      for ((tag, thr) <- Seq(("assign_flat_8k", Long.MaxValue), ("assign_routed_8k", 0L))) {
        durations.clear()
        val t0b = System.nanoTime()
        graft.ops.SimOps
          .semDedup(hot, bigCents, "vec_id", "embedding", 0.95, routeThreshold = thr)
          .write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0b) / 1e9
        val (skew, stage) = worstSkew()
        sbSem.append(f"""{"sf":"sf1_hotsem","query":"dedup_semantic_$tag","sec":$secs%.3f,"worst_skew":$skew%.1f,"skew_stage":$stage}%n""")
        println(f"[sf1_hotsem] dedup_semantic_$tag%-24s $secs%7.2fs  skew $skew%5.1fx")
        spark.catalog.clearCache()
        System.gc()
      }
      // ---- in-engine k-means at 10x: per-step cost is one crossJoin
      // against the k-row broadcast + two map-side-combinable aggregates,
      // so wall should scale ~linearly in rows and steps ----------------
      {
        durations.clear()
        val t0k = System.nanoTime()
        graft.ops.SimOps.kmeans(hot, "vec_id", "embedding", k = 64, iters = 3)
          .write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0k) / 1e9
        val (skew, stage) = worstSkew()
        sbSem.append(f"""{"sf":"sf1_hotsem","query":"embed_kmeans_64x3","sec":$secs%.3f,"worst_skew":$skew%.1f,"skew_stage":$stage}%n""")
        println(f"[sf1_hotsem] embed_kmeans_64x3          $secs%7.2fs  skew $skew%5.1fx")
        spark.catalog.clearCache()
        System.gc()
      }

      // ---- clustered universe: the regime IVF routing assumes ----------
      // Real embedding spaces cluster (that is SemDeDup's own premise);
      // uniform-random 64-dim data defeats ANY exact pruning (cell radii
      // ~ sqrt(2) — the curse of dimensionality), which is why the flat
      // scan wins the synthetic soak above and the cutover is adaptive.
      // Here: 8k centroids in 128 tight direction groups, corpus =
      // jittered centroids — compact LSH cells, so the triangle bound
      // actually bites.
      def vec(id: org.apache.spark.sql.Column, jitterScale: Double, grpMod: Int) =
        transform(sequence(lit(0), lit(63)), i =>
          ((((id % grpMod % 128) * 31 + i * 7) % 13 - 6).cast("double")
            + (((id % grpMod) * 11 + i * 3) % 7 - 3).cast("double") * lit(0.02)
            + ((id * 13 + i * 5) % 11 - 5).cast("double") * lit(jitterScale))
            .cast("float"))
      val cents2 = spark.range(8000).select(col("id").as("vec_id"),
        vec(col("id"), 0.0, 8000).as("embedding"))
      val corp2 = spark.range(40000).select(col("id").as("vec_id"),
        vec(col("id"), 0.005, 8000).as("embedding"))
      corp2.write.mode("overwrite").parquet(s"$out/emb_clustered.parquet")
      cents2.write.mode("overwrite").parquet(s"$out/cent_clustered.parquet")
      val corpC = spark.read.parquet(s"$out/emb_clustered.parquet")
      val centC = spark.read.parquet(s"$out/cent_clustered.parquet")
      for ((tag, thr) <- Seq(("assign_flat_8k_clustered", Long.MaxValue),
          ("assign_routed_8k_clustered", 0L))) {
        durations.clear()
        val t0c = System.nanoTime()
        graft.ops.SimOps
          .semDedup(corpC, centC, "vec_id", "embedding", 0.95, routeThreshold = thr)
          .write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0c) / 1e9
        val (skew, stage) = worstSkew()
        sbSem.append(f"""{"sf":"sf1_hotsem","query":"dedup_semantic_$tag","sec":$secs%.3f,"worst_skew":$skew%.1f,"skew_stage":$stage}%n""")
        println(f"[sf1_hotsem] dedup_semantic_$tag%-28s $secs%7.2fs  skew $skew%5.1fx")
        spark.catalog.clearCache()
        System.gc()
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_sf1_semdedup.jsonl"), sbSem.result())
      spark.stop()
      return
    }

    // ---- OHDSI battery soak: a 10x TPC-H universe -----------------------
    // The literal batteries' scale story is argued from plan shape (two
    // grouping-sets passes per domain table); this measures it: 10 copies
    // of the sf0.1 relational tables with shifted keys (order keys are
    // SPARSE in TPC-H, so shifts use max+1, not count), nation/region
    // verbatim — the derived universe's fk moduli are data-dependent and
    // follow the 10x supplier count automatically. The first query pays
    // the (parallel) 19-table materialization, exactly like the driver's
    // fresh checkout; the warm re-run isolates the battery itself.
    if (sys.env.contains("SPARK_GRAFT_SOAK_OHDSI")) {
      val dir = s"$out/ohdsi"
      if (!new java.io.File(s"$dir/lineitem.parquet").exists()) {
        new java.io.File(dir).mkdirs()
        val copies = spark.range(0, 10).select(col("id").as("__copy"))
        val nC = spark.read.parquet(s"$src/customer.parquet").count()
        val nS = spark.read.parquet(s"$src/supplier.parquet").count()
        val maxO = spark.read.parquet(s"$src/orders.parquet")
          .agg(max("o_orderkey")).head().getLong(0) + 1
        val maxP = spark.read.parquet(s"$src/part.parquet")
          .agg(max("p_partkey")).head().getLong(0) + 1
        def gen(tb: String)(
            f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit =
          f(spark.read.parquet(s"$src/$tb.parquet").crossJoin(copies))
            .drop("__copy").repartition(32)
            .write.mode(SaveMode.Overwrite).parquet(s"$dir/$tb.parquet")
        val c = col("__copy")
        gen("customer")(_.withColumn("c_custkey", col("c_custkey") + c * nC))
        gen("supplier")(_.withColumn("s_suppkey", col("s_suppkey") + c * nS))
        gen("orders")(_
          .withColumn("o_orderkey", col("o_orderkey") + c * maxO)
          .withColumn("o_custkey", col("o_custkey") + c * nC))
        gen("lineitem")(_
          .withColumn("l_orderkey", col("l_orderkey") + c * maxO)
          .withColumn("l_suppkey", col("l_suppkey") + c * nS)
          .withColumn("l_partkey", col("l_partkey") + c * maxP))
        for (tb <- Seq("nation", "region", "part"))
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(s"$src/$tb.parquet"),
            java.nio.file.Paths.get(s"$dir/$tb.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        println(s"generated $dir: 10x TPC-H universe")
      }
      val sbO = new StringBuilder
      for (name <- Seq("ohdsi_core_counts", "ohdsi_core_dist",
          "ohdsi_core_counts_warm", "ohdsi_heel_results", "ohdsi_concept_counts")) {
        val q = name.stripSuffix("_warm")
        durations.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0) / 1e9
        val (skew, stage) = worstSkew()
        sbO.append(f"""{"sf":"sf1_ohdsi","query":"$name","sec":$secs%.3f,"worst_skew":$skew%.1f,"skew_stage":$stage}%n""")
        println(f"[sf1_ohdsi] $name%-26s $secs%7.2fs  skew $skew%5.1fx")
        spark.catalog.clearCache()
        System.gc()
      }
      // ---- bucketed co-located join at 10x: the layout's payoff is the
      // recurring join; the one-time bucketed write is reported separately
      // as the amortized investment ----------------------------------
      {
        val orders = spark.read.parquet(s"$dir/orders.parquet")
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .withColumnRenamed("l_orderkey", "o_orderkey")
        // materialize the JOINED ROWS (no aggregate): the layout's payoff
        // is the join's exchange+sort of both fact sides, which an
        // aggregate-dominated probe would mask
        val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          def one(tag: String)(body: => Unit): Unit = {
            durations.clear()
            val t0 = System.nanoTime()
            body
            val secs = (System.nanoTime() - t0) / 1e9
            val (skew, stage) = worstSkew()
            sbO.append(f"""{"sf":"sf1_ohdsi","query":"$tag","sec":$secs%.3f,"worst_skew":$skew%.1f,"skew_stage":$stage}%n""")
            println(f"[sf1_ohdsi] $tag%-26s $secs%7.2fs  skew $skew%5.1fx")
            spark.catalog.clearCache(); System.gc()
          }
          one("join_plain_10x") {
            orders.join(li, "o_orderkey")
              .write.mode("overwrite").format("noop").save()
          }
          val z = graft.io.Zones(s"$dir/zones")
          var ot = ""; var lt = ""
          one("bucketed_write_10x") {
            ot = z.writeBucketed(orders, "o_orderkey", 32, "work", "orders10x")
            lt = z.writeBucketed(li, "o_orderkey", 32, "work", "lineitem10x")
          }
          one("join_bucketed_10x") {
            spark.table(ot).join(spark.table(lt), "o_orderkey")
              .write.mode("overwrite").format("noop").save()
          }
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_sf1_ohdsi.jsonl"), sbO.result())
      spark.stop()
      return
    }

    // SPARK_GRAFT_ONLY=q1,q2 restricts the soak (same contract as
    // Verify/Bench); SPARK_GRAFT_SOAK_SF=sf1 restricts the scales
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.fold(Families.exists(n.startsWith))(_.contains(n)) }
    val sb = new StringBuilder
    val scales = sys.env.get("SPARK_GRAFT_SOAK_SF") match {
      case Some("sf1") => Seq(out)
      case Some("sf0.1") => Seq(src)
      case _ => Seq(src, out)
    }
    // a restricted run must not clobber the full-soak record
    val outFile =
      if (only.isDefined || scales.size < 2) "BENCH_sf1_partial.jsonl" else "BENCH_sf1.jsonl"
    for (dir <- scales) {
      val tag = if (dir == src) "sf0.1" else "sf1"
      queries.foreach { case (name, fn) =>
        durations.clear()
        val t0 = System.nanoTime()
        try {
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          val secs = (System.nanoTime() - t0) / 1e9
          val (skew, stage) = worstSkew()
          sb.append(f"""{"sf":"$tag","query":"$name","sec":$secs%.3f,"worst_skew":$skew%.1f,"skew_stage":$stage}%n""")
          println(f"[$tag] $name%-28s $secs%7.2fs  skew $skew%5.1fx")
        } catch {
          // r20: a query whose input table the scaled dir does not carry
          // (the generator ships documents/embeddings/events/orders only)
          // is SKIPPED with a recorded line, not a soak abort — r19's
          // join_bucketed_colocated (lineitem) killed the whole sweep at
          // the second-to-last sf1 entry with nothing flushed. Any other
          // failure class still aborts loudly.
          // (r21, ADVICE) only the MISSING-INPUT condition classes skip —
          // any other AnalysisException is a real analysis regression and
          // must abort the sweep, not be recorded as benign; getCondition
          // can be null on legacy exceptions (guarded)
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition).exists(c =>
                c.startsWith("TABLE_OR_VIEW_NOT_FOUND") ||
                  c.startsWith("PATH_NOT_FOUND") ||
                  c.startsWith("UNRESOLVED_ROUTINE")) =>
            sb.append(s"""{"sf":"$tag","query":"$name","skipped":"${e.getCondition}"}""" + "\n")
            println(f"[$tag] $name%-28s SKIPPED (${e.getCondition})")
        }
        // flush the record incrementally — a late abort must not lose the sweep
        java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.result())
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    spark.stop()
  }
}
