package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Segment-count soak for the admission index's delta-compaction path
  * (r16): probe the SAME incoming batch against base ∪ N delta segments
  * for growing N, then against the COMPACTED base — the evidence that
  * (a) probe cost degrades with accumulated segments (why production
  * compacts at all) or stays flat at this scale, and (b) compaction
  * restores the single-table probe cost while the verdicts stay
  * IDENTICAL (count + admitted sum printed per mode). r18 adds the
  * per-segment BLOOM shield beside each unshielded probe
  * (`*_segments_bloom` lines; base ∪ segment filters bit_or-folded at
  * the base's recorded size) — the delta-growth admission paths'
  * production shape — with verdict equality REQUIRED in-process; the
  * compacted re-probe is bloom-shielded too. Run:
  * `sbt "runMain graft.tools.CompactSoak [sfDir]"` (default sf0.1).
  */
object CompactSoak {
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
    val docs = graft.Tables.load(spark, d, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val b1 = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
    val b2 = docs.filter(col("doc_id") % 20 === 10).select("doc_id", "text")
      .localCheckpoint(true)
    val q = graft.queries.LlmQueries
    val baseMd5 = q.corpusMd5(spark, d)
    val baseIdx = q.bandIndex(spark, d)
    val admitted1 = b1.join(
      q.admissionVerdicts(spark, d, b1).filter(col("admitted") === 1L)
        .select("doc_id"), "doc_id").localCheckpoint(true)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def verdictStats(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum("admitted")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (baseBloom, bloomWords) = q.corpusBloom(spark, d)
    for (n <- Seq(1, 8, 32)) {
      // n segments per structure, written as real parquet tables (the
      // production shape: each probe lists and reads n+1 tables)
      val zones = graft.io.Zones.forPurpose(s"compactsoak_$n")
      val segs = (0 until n).map { i =>
        val part = admitted1.filter(pmod(col("doc_id"), lit(n)) === i)
        zones.write(part.select(md5(col("text")).as("__h")).distinct(),
          "work", s"md5_$i")
        zones.write(
          graft.ops.DedupOps.lshBandsFromSigArray(
            graft.ops.DedupOps.minhashSignatureArray(
              part, "doc_id", "text", k = 8, w = 3),
            "doc_id", k = 8, rows = 4),
          "work", s"band_$i")
        zones.write(part, "work", s"docs_$i")
        // (r18) per-segment Bloom at the base's recorded word count
        zones.write(graft.ops.SketchOps.bloomBits(
            zones.read(spark, "work", s"md5_$i"), col("__h"), words = bloomWords),
          "work", s"bloom_$i")
        i
      }
      val idxCols = baseIdx.columns
      val md5All = (baseMd5 +: segs.map(i => zones.read(spark, "work", s"md5_$i")))
        .reduce(_ unionByName _)
      val idxAll = (baseIdx +: segs.map(i =>
        zones.read(spark, "work", s"band_$i").select(idxCols.map(col): _*)))
        .reduce(_ unionByName _)
      val corpusAll = (corpus +: segs.map(i => zones.read(spark, "work", s"docs_$i")))
        .reduce(_ unionByName _)
      val ((rows, adm), t) = time(verdictStats(
        q.admissionVerdictsAgainst(corpusAll, md5All, idxAll, b2)))
      println(f"""{"mode":"base_plus_${n}_segments","rows":$rows,"admitted":$adm,"sec":$t%.2f}""")
      // (r18) the SHIELDED probe: base ∪ per-segment filters bit_or-folded
      // — the delta-growth admission paths' production shape; verdicts
      // must be identical (the filter has no false negatives)
      val bloomAll = q.mergeBloomStates(
        baseBloom +: segs.map(i => zones.read(spark, "work", s"bloom_$i")))
      val ((rb, ab), tb) = time(verdictStats(
        q.admissionVerdictsAgainst(corpusAll, md5All, idxAll, b2,
          bloomFilter = Some(graft.ops.SketchOps.bloomServingFilter(
            spark, bloomAll, bloomWords, "__h",
            reuseKey = Some(s"compactsoak_seg_$n"))))))
      require(rb == rows && ab == adm,
        s"bloom-shielded verdicts diverged: ($rb,$ab) vs ($rows,$adm)")
      println(f"""{"mode":"base_plus_${n}_segments_bloom","rows":$rb,"admitted":$ab,"sec":$tb%.2f}""")
      if (n == 32) {
        // compact the 32-segment state and re-probe: cost back to the
        // single-table shape, verdicts identical; the Bloom folds by
        // bit_or, the same way the tables fold by union (r18)
        zones.write(md5All, "work", "md5_compacted")
        zones.write(idxAll, "work", "band_compacted")
        zones.write(corpusAll, "work", "docs_compacted")
        zones.write(bloomAll, "work", "bloom_compacted")
        val ((r2, a2), t2) = time(verdictStats(q.admissionVerdictsAgainst(
          zones.read(spark, "work", "docs_compacted"),
          zones.read(spark, "work", "md5_compacted"),
          zones.read(spark, "work", "band_compacted"), b2,
          bloomFilter = Some(graft.ops.SketchOps.bloomServingFilter(
            spark, zones.read(spark, "work", "bloom_compacted"), bloomWords, "__h",
            reuseKey = Some("compactsoak_compacted"))))))
        require(r2 == rows && a2 == adm,
          s"compacted verdicts diverged: ($r2,$a2) vs ($rows,$adm)")
        println(f"""{"mode":"compacted_from_32","rows":$r2,"admitted":$a2,"sec":$t2%.2f}""")
      }
    }
    // EXACT-STAGE isolation in the shield's actual regime (r18). The
    // full-pipeline lines above probe a ~3k-doc batch against a ~60k-hash
    // corpus: BOTH sides broadcastable, so the semi-join never shuffles
    // and the bloom can only add plan overhead there (the segment climb
    // is owned by the band/docs stages). Production is a MILLIONS-row
    // batch against a BILLIONS-row hash set — neither side broadcasts,
    // the unshielded semi-join is a full two-sided shuffle + sort-merge.
    // This block reproduces that regime at local scale: a 20M-hash
    // corpus (not broadcastable) × a 1M-probe batch (not broadcastable)
    // with ~6k true members planted. Unshielded: SMJ shuffles 21M rows.
    // Shielded: the STORED filter (built once, excluded from probe
    // timing like every stored artifact) reduces the batch to the
    // positive band before the join — the band broadcasts, the corpus
    // streams, no shuffle. Dup-count equality REQUIRED.
    locally {
      val bigCorpus = spark.range(0, 20000000L)
        .select(md5(concat(lit("corp_"), col("id"))).as("__h"))
        .localCheckpoint(true)
      val members = spark.range(0, 6000)
        .select((col("id") + 5000000L).as("doc_id"),
          md5(concat(lit("corp_"), col("id") * 3000L)).as("__h"))
      val bigBatch = spark.range(0, 1000000)
        .select(col("id").as("doc_id"),
          md5(concat(lit("probe_"), col("id"))).as("__h"))
        .unionByName(members)
        .localCheckpoint(true)
      val bigWords = graft.ops.SketchOps.bloomWordsFor(20000000L)
      val bigBloom = graft.ops.SketchOps.bloomBits(
        bigCorpus, col("__h"), words = bigWords).localCheckpoint(true)
      // the serving-form resolution (collect + broadcast) is the stored
      // artifact's once-per-filter cost, reported separately from probes
      def timeIt[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      val (shield, tResolve) = timeIt(graft.ops.SketchOps.bloomServingFilter(
        spark, bigBloom, bigWords, "__h",
        reuseKey = Some("compactsoak_bigstage")))
      val (cNo, tNo) = timeIt(
        bigBatch.join(bigCorpus, Seq("__h"), "left_semi").count())
      val (cB, tB) = timeIt(
        bigBatch.filter(shield)
          .join(bigCorpus, Seq("__h"), "left_semi").count())
      require(cNo == cB, s"exact-stage verdicts diverged: $cB vs $cNo")
      println(f"""{"mode":"exact_stage_20m_corpus_1m_batch_noshield","dups":$cNo,"words":$bigWords,"sec":$tNo%.2f}""")
      println(f"""{"mode":"exact_stage_20m_corpus_1m_batch_bloom","dups":$cB,"words":$bigWords,"resolve_sec":$tResolve%.2f,"sec":$tB%.2f}""")
    }
    spark.stop()
  }
}
