package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-engine-exact HLL: estimator accuracy in its operating regime,
  * exact-integer sketch state, and the generated-oracle parity seams.
  */
class SketchOpsSpec extends SparkSpec {

  import spark.implicits._

  test("estimate lands within the published error envelope at n >> m") {
    // 100k distinct values, p=10 (m=1024): the raw estimator's relative
    // standard error is 1.04/sqrt(1024) ~ 3.25%; 4 sigma is a safe gate
    val df = spark.range(100000L).select(col("id"), lit("g").as("g"))
    val row = SketchOps.hllDistinct(df, Seq("g"), col("id")).collect()(0)
    val est = row.getAs[Long]("est_milli") / 1000.0
    assert(math.abs(est / 100000.0 - 1.0) < 0.13, s"estimate $est too far from 100000")
  }

  test("the sketch is deterministic and mergeable (partitioning-independent)") {
    val df = spark.range(5000L).select(col("id"), (col("id") % 3).as("g"))
    val a = SketchOps.hllDistinct(df.repartition(32), Seq("g"), col("id"))
      .orderBy("g").collect().toSeq
    val b = SketchOps.hllDistinct(df.coalesce(1), Seq("g"), col("id"))
      .orderBy("g").collect().toSeq
    assert(a == b, "register maxima must not depend on partitioning")
  }

  test("sketch state stays exact integers; empty buckets carry 2^32") {
    // one value -> one bucket present; the other 1023 buckets contribute
    // 4294967296 each, and the present bucket 2^(32 - rho)
    val df = Seq(("g", 42L)).toDF("g", "x")
    val row = SketchOps.hllDistinct(df, Seq("g"), col("x")).collect()(0)
    assert(row.getAs[Long]("n_buckets") == 1L)
    val scaled = row.getAs[Long]("scaled_sum")
    val present = scaled - 1023L * 4294967296L
    // present = 2^(32 - rho) for a single register: a power of two in
    // [2^9, 2^31] (rho in [1, 23])
    assert(present > 0 && (present & (present - 1)) == 0L, s"not a power of two: $present")
    assert(present >= (1L << 9) && present <= (1L << 31))
  }

  test("count-min never underestimates and is exact without collisions") {
    import org.apache.spark.sql.functions.{col, explode, expr, lit}
    // 20 items with known frequencies 1..20 in a wide sketch: estimates
    // must be >= exact always, and == exact when slots don't collide
    val df = spark.range(1L, 21L)
      .select(col("id"), explode(expr("sequence(1, id)")).as("rep"))
      .select(col("id"))
    val exact = df.groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    val counters = SketchOps.cmsCounters(df, col("id"), depth = 4, width = 1024)
    val got = SketchOps.cmsEstimate(counters, exact, "id", depth = 4, width = 1024)
      .join(exact, "id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n"), r.getAs[Long]("n_cms")))
    assert(got.length == 20)
    got.foreach { case (id, n, est) =>
      assert(est >= n, s"CMS underestimated item $id: $est < $n")
      assert(n == id, s"fixture broke: item $id has count $n")
    }
    // at 20 items in 4x1024 slots collisions are overwhelmingly unlikely;
    // min-over-depth removes any single collision anyway
    assert(got.count { case (_, n, est) => est == n } >= 18)
  }

  test("count-min counter matrices merge by addition") {
    import org.apache.spark.sql.functions.{col, sum}
    val a = spark.range(0L, 500L).select((col("id") % 50).as("v"))
    val b = spark.range(500L, 1000L).select((col("id") % 50).as("v"))
    val whole = SketchOps.cmsCounters(a.unionAll(b), col("v"))
    val merged = SketchOps.cmsCounters(a, col("v"))
      .unionByName(SketchOps.cmsCounters(b, col("v")))
      .groupBy("dpt", "slot").agg(sum("cnt").as("cnt"))
    val diff = whole.join(merged, Seq("dpt", "slot"))
      .filter(whole("cnt") =!= merged("cnt")).count()
    assert(diff == 0L, "merged counter matrix differs from the whole-stream matrix")
    assert(whole.count() == merged.count())
  }

  test("oracle SQL embeds the same constants the Spark side folds") {
    val sql = SketchOps.hllSql(Seq("g"), "x", "t")
    assert(sql.contains(java.lang.Double.toString(SketchOps.numerator(10))))
    assert(sql.contains("% 4194304"))   // 2^22 remainder split at p=10
    assert(sql.contains("// 4194304"))  // bucket = top bits
    assert(sql.contains("WHEN v >= 2097152 THEN 1")) // ladder top rung
    assert(sql.contains("WHEN v = 0 THEN 23"))
  }

  // ---- the r16 Bloom filter ----

  test("bloom probe has NO false negatives; positives verify; states merge by bit_or") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = spark.range(0, 2000).select(concat(lit("doc_"), col("id")).as("v"))
    val bloom = SketchOps.bloomBits(corpus, col("v"))
    assert(bloom.count() <= 2048, "bloom state must stay <= words rows")
    // members: every probe positive (no false negatives — the contract)
    val members = spark.range(0, 2000, 7)
      .select(col("id"), concat(lit("doc_"), col("id")).as("v"))
    val posM = SketchOps.bloomProbe(members, "id", col("v"), bloom)
    assert(posM.filter(col("bloom_positive") =!= 1L).count() == 0L,
      "a member probed negative — false negative")
    // non-members: false-positive BAND is bounded (m=65536 bits, n=2000*4
    // inserts -> ~11.5% load; FP ~ load^4 ~ 0.02% — assert a loose 2%)
    val nonMembers = spark.range(100000, 102000)
      .select(col("id"), concat(lit("nope_"), col("id")).as("v"))
    val fp = SketchOps.bloomProbe(nonMembers, "id", col("v"), bloom)
      .filter(col("bloom_positive") === 1L).count()
    assert(fp <= 40, s"false-positive band too wide: $fp of 2000")
    // mergeability: per-shard filters bit_or into the whole-stream filter
    val shard1 = SketchOps.bloomBits(corpus.filter(expr("v < 'doc_5'")), col("v"))
    val shard2 = SketchOps.bloomBits(corpus.filter(expr("v >= 'doc_5'")), col("v"))
    val merged = shard1.unionByName(shard2)
      .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
    val diff = bloom.alias("a").join(merged.alias("b"), Seq("word"), "full")
      .filter(coalesce(col("a.bits"), lit(0L)) =!= coalesce(col("b.bits"), lit(0L)))
      .count()
    assert(diff == 0L, "merged shard filters differ from the whole-stream filter")
  }

  test("adaptive bloom sizing: integer formula, pow2 ladder, clamp, SQL twin constants") {
    // m >= 1.6*n*k (FP band <= 4.7% at k=4 at the worst pow2 boundary):
    // words = next pow2 of n*k/20 + 1, clamped to [2^6, 2^24]
    assert(SketchOps.bloomWordsFor(1) == 64)
    assert(SketchOps.bloomWordsFor(0) == 64)          // empty corpus: floor
    assert(SketchOps.bloomWordsFor(4500) == 1024)     // sf0.1 corpus
    assert(SketchOps.bloomWordsFor(45000) == 16384)   // 10x soak corpus
    assert(SketchOps.bloomWordsFor(450000) == 131072) // 100x
    assert(SketchOps.bloomWordsFor(Long.MaxValue / 8) == (1 << 24)) // clamp
    // the sized filter keeps m above the guaranteed-band budget for every n
    for (n <- Seq(1L, 100L, 10000L, 1000000L)) {
      val m = SketchOps.bloomWordsFor(n) * 32L
      assert(m >= n * 4 * 8 / 5 || m == (1L << 24) * 32,
        s"undersized filter at n=$n")
    }
    // SQL twin embeds the IDENTICAL integer constants (the hllSql pattern)
    val twin = SketchOps.bloomWordsSql("(SELECT count(*) FROM bloom_vals)")
    assert(twin.contains("* 4 // 20 + 1"))
    assert(twin.contains("generate_series(6, 24)"))
    assert(twin.contains("CAST(1 AS BIGINT) << 24")) // same clamp
    val adaptive = SketchOps.bloomSqlAdaptive("SELECT 'x' AS v", "SELECT 1 AS id, 'x' AS v", "id")
    assert(adaptive.contains("bloom_size AS ("))
    assert(adaptive.contains("% ((SELECT m FROM bloom_size))"))
  }

  test("cap-saturation flag fires exactly where the uncapped formula passes 2^24 (r18)") {
    // capacity at k=4: largest n with n*4/20+1 <= 2^24, i.e. ~83.9M
    assert(!SketchOps.bloomSaturated(83000000L))
    assert(SketchOps.bloomSaturated(84000000L))
    assert(SketchOps.bloomSaturated(Long.MaxValue))
    assert(!SketchOps.bloomSaturated(0L) && !SketchOps.bloomSaturated(1L))
    // boundary: the flag flips at the first n whose demand exceeds the cap
    val cap = 1L << 24
    val lastFits = (cap - 1L) * 20L / 4L   // n*4/20+1 <= cap
    assert(!SketchOps.bloomSaturated(lastFits))
    assert(SketchOps.bloomSaturated(lastFits + 5L))
    // SQL twin carries the identical constants
    val twin = SketchOps.bloomSaturatedSql("(SELECT count(*) FROM bloom_vals)")
    assert(twin.contains("* 4 // 20 + 1"))
    assert(twin.contains("CAST(1 AS BIGINT) << 24"))
  }

  test("routed probes: shard-local no-false-negatives; band tightens; merge == flat (r18)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = spark.range(0, 2000).select(concat(lit("doc_"), col("id")).as("v"))
    val routed = SketchOps.bloomBitsRouted(corpus, col("v"), nShards = 4)
    // members: positive through their own shard only (the routing contract)
    val members = spark.range(0, 2000, 7)
      .select(col("id"), concat(lit("doc_"), col("id")).as("v"))
    val posM = SketchOps.bloomProbeRouted(members, "id", col("v"), routed, nShards = 4)
    assert(posM.filter(col("bloom_positive") =!= 1L).count() == 0L,
      "a member probed negative through its shard — routing broke the contract")
    // non-members: the routed band is never wider than the flat filter's
    // (each shard holds ~1/4 of the inserts at the same size)
    val nonMembers = spark.range(100000, 104000)
      .select(col("id"), concat(lit("nope_"), col("id")).as("v"))
    val flat = SketchOps.bloomBits(corpus, col("v"))
    val fpFlat = SketchOps.bloomProbe(nonMembers, "id", col("v"), flat)
      .filter(col("bloom_positive") === 1L).count()
    val fpRouted = SketchOps.bloomProbeRouted(nonMembers, "id", col("v"), routed, nShards = 4)
      .filter(col("bloom_positive") === 1L).count()
    assert(fpRouted <= fpFlat,
      s"routed band wider than flat: $fpRouted > $fpFlat")
    // dropping the shard key and bit_or-folding recovers the flat filter
    val folded = routed.groupBy("word").agg(expr("bit_or(bits)").as("bits"))
    val diff = flat.alias("a").join(folded.alias("b"), Seq("word"), "full")
      .filter(coalesce(col("a.bits"), lit(0L)) =!= coalesce(col("b.bits"), lit(0L)))
      .count()
    assert(diff == 0L, "folded shard filters differ from the flat filter")
  }

  test("serving-path bloom_might_contain is bit-identical to the join probe (r18)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = 512
    val corpus = spark.range(0, 3000).select(concat(lit("doc_"), col("id")).as("v"))
    val state = SketchOps.bloomBits(corpus, col("v"), words = words)
    // probe a mix of members and non-members — at this deliberately tight
    // size (512 words / 12k inserts, fill ~0.52) the FP band is wide
    // enough that serving/join equality is tested on REAL positives,
    // negatives, AND false positives, row for row
    val probes = spark.range(0, 3000, 3)
      .select(col("id"), concat(lit("doc_"), col("id")).as("v"))
      .unionByName(spark.range(50000, 53000)
        .select(col("id"), concat(lit("nope_"), col("id")).as("v")))
    val joinVerdicts = SketchOps.bloomProbe(probes, "id", col("v"), state, words = words)
    val serving = probes.withColumn("fast",
      SketchOps.bloomServingFilter(spark, state, words, "v").cast("long"))
    val diff = joinVerdicts.join(serving, Seq("id"))
      .filter(col("bloom_positive") =!= col("fast")).count()
    assert(diff == 0L, s"serving probe diverged from the join probe on $diff rows")
    // and the interpreted path agrees with codegen: evaluate the helper
    // directly against the collected array for a sample
    val arr = SketchOps.bloomStateArray(state, words)
    val sample = serving.limit(200).collect()
    sample.foreach { r =>
      val expected = graft.functions.BloomMightContain.contains(
        arr, 4, 1, org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
      assert((r.getLong(2) == 1L) == expected,
        s"interpreted helper diverged on ${r.getString(1)}")
    }
  }

  test("sharded serving filter matches the routed join probe row for row") {
    import org.apache.spark.sql.functions._
    // tight sizing on purpose (see the flat serving/join test): the FP
    // band is wide, so equality is exercised on true positives,
    // negatives, AND false positives — and the routed FP pattern differs
    // from the flat filter's (sparser per-shard slices), so only a
    // bit-faithful shard-slice replay passes
    val words = 256
    val nShards = 4
    val corpus = spark.range(0, 3000).select(concat(lit("doc_"), col("id")).as("v"))
    val state = SketchOps.bloomBitsRouted(corpus, col("v"), nShards, words = words)
    val probes = spark.range(0, 3000, 3)
      .select(col("id"), concat(lit("doc_"), col("id")).as("v"))
      .unionByName(spark.range(50000, 53000)
        .select(col("id"), concat(lit("nope_"), col("id")).as("v")))
    val joinVerdicts = SketchOps.bloomProbeRouted(
      probes, "id", col("v"), state, nShards, words = words)
    val serving = probes.withColumn("fast",
      SketchOps.bloomServingFilterRouted(spark, state, nShards, words, "v",
        reuseKey = Some("spec_routed")).cast("long"))
    val diff = joinVerdicts.join(serving, Seq("id"))
      .filter(col("bloom_positive") =!= col("fast")).count()
    assert(diff == 0L, s"sharded serving probe diverged from the routed join probe on $diff rows")
    // no false negatives shard-locally: every member probes positive
    val memberMiss = serving.filter(col("v").startsWith("doc_") && col("fast") === 0L).count()
    assert(memberMiss == 0L, s"$memberMiss members probed negative through the sharded serving filter")
    graft.functions.BloomMightContain.release("spec_routed")
  }

  test("serving-filter reuseKey retires with a one-generation lag and release() drops the entry") {
    import org.apache.spark.sql.functions._
    val corpus = spark.range(0, 100).select(concat(lit("doc_"), col("id")).as("v"))
    val state = SketchOps.bloomBits(corpus, col("v"), words = 64)
    SketchOps.bloomServingFilter(spark, state, 64, "v", reuseKey = Some("spec_reuse"))
    val g1 = graft.functions.BloomMightContain.handle("spec_reuse")
    val f2 = SketchOps.bloomServingFilter(spark, state, 64, "v", reuseKey = Some("spec_reuse"))
    val g2 = graft.functions.BloomMightContain.handle("spec_reuse")
    assert(g1 ne g2, "re-registration must replace the handle")
    // r19 (VERDICT #7): the SUPERSEDED generation is unpersisted, NOT
    // destroyed — a zombie task retry straddling the registration can
    // still refetch the value from the driver
    assert(g1.bits.value.length == 64,
      "one-generation retirement: the superseded broadcast must stay readable")
    // ...and only the generation before that destroys on the NEXT replace
    SketchOps.bloomServingFilter(spark, state, 64, "v", reuseKey = Some("spec_reuse"))
    intercept[org.apache.spark.SparkException](g1.bits.value)
    assert(g2.bits.value.length == 64, "the immediately-superseded generation survives")
    // the replacement handle still serves
    assert(corpus.filter(f2).count() == 100L, "members must all probe positive")
    // release() drops the registry entry (r19, ADVICE: no more
    // forever-pinned auto keys); the handle keeps working for plans that
    // captured it — only the registry lookup dies
    graft.functions.BloomMightContain.release("spec_reuse")
    intercept[IllegalArgumentException](
      graft.functions.BloomMightContain.handle("spec_reuse"))
  }

  test("adaptive sizing keeps the FP band bounded where the fixed size saturates") {
    import org.apache.spark.sql.functions._
    // 60k distinct values (the sf0.1 corpus scale): the r16 fixed state
    // (2048 words = 65,536 bits, k=4 -> 240k inserts, fill ~0.97) probes
    // ~90% of NON-members positive; the adaptive state (16,384 words =
    // 524k bits, fill ~0.37) keeps the FP band under 2%
    val n = 60000L
    val corpus = spark.range(0, n).select(concat(lit("doc_"), col("id")).as("v"))
    val negatives = spark.range(0, 4000)
      .select(col("id"), concat(lit("nope_"), col("id")).as("v"))
    def fpCount(words: Int): Long = {
      val bloom = SketchOps.bloomBits(corpus, col("v"), words = words)
      SketchOps.bloomProbe(negatives, "id", col("v"), bloom, words = words)
        .filter(col("bloom_positive") === 1L).count()
    }
    val fixedFp = fpCount(2048)
    val adaptiveWords = SketchOps.bloomWordsFor(n)
    val adaptiveFp = fpCount(adaptiveWords)
    assert(fixedFp > 3000, s"expected the fixed filter near-saturated, fp=$fixedFp/4000")
    assert(adaptiveFp < 400, s"adaptive FP band too wide: $adaptiveFp/4000 at words=$adaptiveWords")
  }

  test("centroid stride: sqrt-N while small, hard-capped at 1024 centroids") {
    import graft.ops.SimOps
    assert(SimOps.sqrtStride(1) == 1)
    assert(SimOps.sqrtStride(2) == 2)
    assert(SimOps.sqrtStride(500) == 32)    // sf0.001/sf0.01 embeddings
    assert(SimOps.sqrtStride(2000) == 64)   // sf0.1 embeddings
    assert(SimOps.sqrtStride(1000000) == 1024)
    // past n = 2^20 the 1024-cap term dominates: the collected model
    // (mapSideAssign's per-centroid plan structs) stays bounded at ANY n
    assert(SimOps.sqrtStride(100000000L) == 131072) // 10^8 -> 763 centroids
    for (n <- Seq(1L, 100L, 12345L, 1L << 20, 100000000L, 1L << 45)) {
      val p = SimOps.sqrtStride(n)
      val nc = n.min(1L << 40)
      assert(p * p >= nc && p * 1024L >= nc, s"under-strided at n=$n: $p")
      assert(nc / p <= 1024L, s"model over the compile bound at n=$n: ${nc / p}")
      assert(p == 1 || (p / 2) * (p / 2) < nc || (p / 2) * 1024L < nc,
        s"not the smallest qualifying pow2 at n=$n: $p")
    }
    val twin = SimOps.sqrtStrideSql("SELECT count(*) FROM embeddings")
    assert(twin.contains("generate_series(0, 30)"))
    assert(twin.contains("p * p >= least((SELECT count(*) FROM embeddings)"))
    assert(twin.contains("p * 1024 >= least((SELECT count(*) FROM embeddings)"))
  }
}
