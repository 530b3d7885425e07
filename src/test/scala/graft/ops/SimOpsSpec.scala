package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity search: vector math correctness, brute-force top-k ordering,
  * LSH bucket determinism.
  */
class SimOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),  // close to 1
    (3L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to 1
    (4L, Seq(-1.0f, 0.0f, 0.0f))) // opposite of 1
    .toDF("id", "vec")

  test("quantUnits/meanOfQuantUnits: exact integer-domain round-half-up mean") {
    // rhu is half-toward-+inf in every engine (floorDiv(2S+n, 2n)):
    // mean(1,2) = 1.5 -> 2; mean(-1,-2) = -1.5 -> -1; exact thirds floor
    val df = Seq((0L, 1.0), (0L, 2.0), (1L, -1.0), (1L, -2.0),
      (2L, 0.0), (2L, 0.0), (2L, 1.0)).toDF("g", "x")
    val out = df.groupBy("g")
      .agg(sum(SimOps.quantUnits(col("x"), 1.0)).as("s"), count(lit(1)).as("n"))
      .select(col("g"), SimOps.meanOfQuantUnits(col("s"), col("n"), 1.0).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(0L -> 2.0, 1L -> -1.0, 2L -> 0.0))
    // at 1e9 units the mean of exactly-representable doubles is exact
    val nano = Seq((0L, -0.25), (0L, -0.5)).toDF("g", "x").groupBy("g")
      .agg(sum(SimOps.quantUnits(col("x"), 1e9)).as("s"), count(lit(1)).as("n"))
      .select(SimOps.meanOfQuantUnits(col("s"), col("n"), 1e9)).head().getDouble(0)
    assert(nano === -0.375)
  }

  test("meanOfQuantUnits matches independent long floorDiv(2S+n, 2n) everywhere") {
    // the decimal-domain plan must agree with plain Long arithmetic across
    // signs, zero, and large magnitudes (verifies the pmod/cast chain)
    val cases = Seq((3L, 2L), (1L, 3L), (-3L, 2L), (-1L, 3L), (0L, 5L),
      (123456789012345L, 7L), (-987654321098765L, 11L), (7L, 2L), (-7L, 2L))
    val out = cases.toDF("s", "n")
      .select(col("s"), col("n"),
        SimOps.meanOfQuantUnits(col("s").cast("decimal(38,0)"), col("n"), 1.0).as("m"))
      .collect()
    out.foreach { r =>
      val (s, n, m) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(m === Math.floorDiv(2 * s + n, 2 * n).toDouble,
        s"rhu($s / $n) mismatch: got $m")
    }
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0))).toDF("a", "b")
    val out = df.select(SimOps.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(math.abs(out(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by similarity desc, excludes self") {
    val q = vecs.filter($"id" === 1L)
    val out = SimOps.bruteForceTopK(vecs, q, "id", "vec", k = 3)
      .orderBy("rk").select("item_id").as[Long].collect()
    assert(out.toSeq == Seq(2L, 3L, 4L)) // by decreasing cosine to [1,0,0]
  }

  test("lshBuckets: identical vectors land in the same bucket, opposite in different") {
    val dup = Seq((10L, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val buckets = SimOps.lshBuckets(vecs.union(dup), "id", "vec", nPlanes = 8, dim = 3)
      .as[(Long, Long)].collect().toMap
    assert(buckets(1L) == buckets(10L))
    assert(buckets(1L) != buckets(4L))
  }

  test("lshTopK only scores candidates within the query's bucket") {
    val q = vecs.filter($"id" === 1L)
    val out = SimOps.lshTopK(vecs, q, "id", "vec", k = 5, nPlanes = 8, dim = 3)
    val items = out.select("item_id").as[Long].collect().toSet
    // bucket of [1,0,0] contains near-dup 2 but not orthogonal/opposite vectors
    assert(items.contains(2L) && !items.contains(4L))
  }

  test("assignNearestInlined at the full 4096-centroid bound: codegen survives, picks match the crossJoin argmax") {
    // r19 (VERDICT #5): the r18 greatest() fold was only soak-measured
    // to 400 centroids, and at 1024 literal struct terms Janino REFUSED
    // the whole-stage processNext() outright (measured in this spec's
    // first version) — silent interpreted fallback, forfeiting exactly
    // the win the fold existed for. The native expression that replaced
    // it has count-independent generated code; this plans the FULL
    // (r19-raised) 4096 bound, compiles the generated code, and asserts
    // (a) the projection sits inside WholeStageCodegen, (b) no generated
    // method reaches the hugeMethodLimit fallback threshold, (c) the
    // picks are identical to the crossJoin argmax.
    val dim = 64
    val cents: Seq[(Long, Seq[Double])] = (0 until 4096).map { c =>
      (c.toLong, (0 until dim).map(j => math.sin(c * 0.37 + j * 1.13) + 1.5))
    }
    val corpus = spark.range(0, 50).select(col("id"),
      array((0 until dim).map(j =>
        sin(col("id") * lit(0.71) + lit(j * 0.29)) + lit(1.5)): _*).as("vec"))
    val assigned = SimOps.assignNearestInlined(
      corpus, cents, "id", "vec", "item_id", "item_vec")
    val planStr = assigned.queryExecution.executedPlan.toString
    assert(raw"\*\(\d+\) Project".r.findFirstIn(planStr).isDefined,
      s"the inlined argmax projection fell out of whole-stage codegen:\n$planStr")
    val stats = org.apache.spark.sql.execution.debug
      .codegenStringSeq(assigned.queryExecution.executedPlan)
    assert(stats.nonEmpty, "no whole-stage codegen subtree compiled")
    stats.foreach { case (subtree, _, st) =>
      // WholeStageCodegenExec falls back to interpreted execution when
      // the largest compiled method reaches spark.sql.codegen.
      // hugeMethodLimit (default 65535 — the JVM hard cap)
      assert(st.maxMethodCodeSize > 0 && st.maxMethodCodeSize < 65535,
        s"generated method size ${st.maxMethodCodeSize} would trip the " +
          s"huge-method fallback in subtree:\n$subtree")
    }
    // bit-identity of the picks vs the materialized crossJoin argmax
    val centDf = cents.toDF("centroid_id", "cvec")
    val ref = corpus.crossJoin(broadcast(centDf))
      .withColumn("__csim", SimOps.cosine(col("vec"), col("cvec")))
      .groupBy(col("id"))
      .agg(max(struct(col("__csim").as("s"), (-col("centroid_id")).as("nc"))).as("b"))
      .select(col("id").as("item_id"), (-col("b.nc")).as("ref_centroid"))
    val diff = assigned.join(ref, "item_id")
      .filter(col("centroid_id") =!= col("ref_centroid")).count()
    assert(diff == 0L, s"inlined picks diverged from the crossJoin argmax on $diff rows")
  }

  test("native nprobe probe assignment matches the crossJoin window, ties included") {
    // r19: serve-side probes route through nearest_centroids_k — the
    // ranked nprobe ids in one projection. Pins the probe SET against
    // the crossJoin + row_number form on a model with DUPLICATE
    // directions (scaled copies cosine-tie exactly; the id tie-break is
    // load-bearing)
    val dim = 8
    val base = (0 until 40).map { c =>
      (c.toLong, (0 until dim).map(j => math.sin(c % 5 * 0.9 + j * 0.37)))
    }
    // scaled copies of the same 5 directions => 8-way exact score ties
    val cents = base.map { case (id, v) =>
      (id, v.map(_ * (1.0 + (id % 3).toDouble)))
    }
    val centDf = cents.toDF("id", "vec")
    val queries = spark.range(100, 130).select(col("id"),
      array((0 until dim).map(j =>
        sin(col("id") * lit(0.51) + lit(j * 0.23))): _*).as("vec"))
    val served = SimOps.ivfTopKServe(
      SimOps.ivfIndex(queries, centDf, "id", "vec"), // any salted index
      centDf, queries, "id", "vec", k = 3, nprobe = 4)
    val ref = SimOps.ivfTopKUnsalted(queries, queries, centDf,
      "id", "vec", k = 3, nprobe = 4).collect().toSeq
    val got = served.collect().toSeq
    assert(got.toSet == ref.toSet && got.size == ref.size,
      "native-probe serve diverged from the crossJoin-probe reference")
  }

  test("salted serve with ENGAGED fan-out matches the unsalted reference; resalt preserves results") {
    // r19: at the gated entries' data scales the default maxList keeps
    // every __nsalt at 1 (the join key carries __salt but fans to one
    // sub-list) — this builds an index whose hot lists ACTUALLY split
    // (maxList = 16 on a 300-vector corpus) and pins serve results
    // against ivfTopKUnsalted, then re-salts at a different width and
    // pins again (salting/resalting shape tasks, never results)
    val dim = 8
    val corpus = spark.range(0, 300).select(col("id"),
      array((0 until dim).map(j =>
        sin(col("id") % 7 * lit(0.9) + lit(j * 0.37))): _*).as("vec"))
    val cents = corpus.filter(col("id") % 50 === 3)
    val queries = corpus.filter(col("id") % 30 === 1)
    val index = SimOps.ivfIndex(corpus, cents, "id", "vec",
      maxList = 16, sizeSampleRate = 1.0)
    val widths = index.select("centroid_id", "__nsalt").distinct()
      .as[(Long, Int)].collect().toMap
    assert(widths.values.exists(_ > 1),
      s"fixture failed to engage salting: widths=$widths")
    val ref = SimOps.ivfTopKUnsalted(corpus, queries, cents, "id", "vec",
      k = 3, nprobe = 2).collect().toSeq
    val served = SimOps.ivfTopKServe(index, cents, queries, "id", "vec",
      k = 3, nprobe = 2).collect().toSeq
    assert(served.toSet == ref.toSet && served.size == ref.size,
      "engaged-salt serve diverged from the unsalted reference")
    val resalted = SimOps.resaltIndex(index, maxList = 40)
    val served2 = SimOps.ivfTopKServe(resalted, cents, queries, "id", "vec",
      k = 3, nprobe = 2).collect().toSeq
    assert(served2.toSet == ref.toSet && served2.size == ref.size,
      "re-salted serve diverged from the unsalted reference")
  }

  test("stale salt sidecar fails LOUDLY on both serve paths; a published-correct one passes (r20, ADVICE)") {
    // a sidecar claiming narrower widths than the index persists would fan
    // probes short and silently drop sub-lists — the serves now prove the
    // claim against each matched row's own __nsalt and raise; the
    // publish-time validateSaltSidecar catches the same staleness (and
    // missing centroids) from the aggregate side
    val dim = 8
    val corpus = spark.range(0, 300).select(col("id"),
      array((0 until dim).map(j =>
        sin(col("id") % 7 * lit(0.9) + lit(j * 0.37))): _*).as("vec"))
    val cents = corpus.filter(col("id") % 50 === 3)
    val queries = corpus.filter(col("id") % 30 === 1)
    val index = SimOps.ivfIndex(corpus, cents, "id", "vec",
      maxList = 16, sizeSampleRate = 1.0)
    assert(index.select("__nsalt").as[Int].collect().exists(_ > 1),
      "fixture failed to engage salting")
    val goodSidecar = index.groupBy("centroid_id")
      .agg(max(col("__nsalt")).as("__nsalt"))
    val staleSidecar = goodSidecar.select(col("centroid_id"),
      lit(1).cast("int").as("__nsalt"))
    val ref = SimOps.ivfTopKServe(index, cents, queries, "id", "vec",
      k = 3, nprobe = 2).collect().toSeq
    // correct sidecar: guard present, never fires, results identical
    val viaGood = SimOps.ivfTopKServe(index, cents, queries, "id", "vec",
      k = 3, nprobe = 2, salts = Some(goodSidecar)).collect().toSeq
    assert(viaGood.toSet == ref.toSet && viaGood.size == ref.size)
    // stale sidecar: the IVF serve raises instead of shrinking the top-k
    val e1 = intercept[Exception] {
      SimOps.ivfTopKServe(index, cents, queries, "id", "vec",
        k = 3, nprobe = 2, salts = Some(staleSidecar)).collect()
    }
    assert(exceptionChain(e1).exists(_.getMessage != null) &&
      exceptionChain(e1).exists(m => Option(m.getMessage).exists(_.contains("stale salt sidecar"))),
      s"expected the stale-sidecar raise, got: $e1")
    // stale sidecar: the PQ serve raises too (same guard on its candidate join)
    val inverted = index.select("centroid_id", "item_id", "__salt", "__nsalt")
    val cb = SimOps.pqCodebook(corpus, "id", "vec", dim = dim, m = 2, ksub = 4)
    val codes = SimOps.pqCodes(corpus, "id", "vec", cb, dim = dim, m = 2)
      .withColumnRenamed("id", "item_id")
    val e2 = intercept[Exception] {
      SimOps.ivfPqServe(inverted, cb, codes, cents, corpus, queries,
        "id", "vec", dim = dim, m = 2, nprobe = 2, pool = 10, k = 3,
        salts = Some(staleSidecar)).collect()
    }
    assert(exceptionChain(e2).exists(m => Option(m.getMessage).exists(_.contains("stale salt sidecar"))),
      s"expected the PQ stale-sidecar raise, got: $e2")
    // publish-time gate: clean sidecar passes; narrow and missing rows fail
    SimOps.validateSaltSidecar(index, goodSidecar)
    val e3 = intercept[IllegalArgumentException] {
      SimOps.validateSaltSidecar(index, staleSidecar)
    }
    assert(e3.getMessage.contains("stale"))
    val e4 = intercept[IllegalArgumentException] {
      SimOps.validateSaltSidecar(index, goodSidecar.limit(0))
    }
    assert(e4.getMessage.contains("stale"))
  }

  private def exceptionChain(e: Throwable): List[Throwable] =
    e :: Option(e.getCause).map(exceptionChain).getOrElse(Nil)

  test("mapSideAssign at the full 4096-centroid bound: codegen survives, picks match the quantized crossJoin argmax") {
    // the exact-kernel twin of the test above (r19): the SemDeDup-family
    // fold had the same linear-codegen failure class at the bound
    val dim = 64
    val cents: Seq[(Long, Seq[Double])] = (0 until 4096).map { c =>
      (c.toLong, (0 until dim).map(j => math.sin(c * 0.53 + j * 0.91)))
    }
    val corpus = spark.range(0, 50).select(col("id"),
      array((0 until dim).map(j =>
        sin(col("id") * lit(0.37) + lit(j * 0.61))): _*).as("vec"))
    val assigned = SimOps.mapSideAssign(corpus, cents, "vec")
    val planStr = assigned.queryExecution.executedPlan.toString
    assert(raw"\*\(\d+\) Project".r.findFirstIn(planStr).isDefined,
      s"the quantized argmax projection fell out of whole-stage codegen:\n$planStr")
    val stats = org.apache.spark.sql.execution.debug
      .codegenStringSeq(assigned.queryExecution.executedPlan)
    assert(stats.nonEmpty, "no whole-stage codegen subtree compiled")
    stats.foreach { case (subtree, _, st) =>
      assert(st.maxMethodCodeSize > 0 && st.maxMethodCodeSize < 65535,
        s"generated method size ${st.maxMethodCodeSize} would trip the " +
          s"huge-method fallback in subtree:\n$subtree")
    }
    val centDf = cents.toDF("cid", "cvec")
    val ref = corpus.crossJoin(broadcast(centDf))
      .withColumn("__k", SimOps.quantMicro(
        SimOps.qdot(col("vec"), col("cvec")).cast("double") /
          (sqrt(SimOps.qdot(col("vec"), col("vec")).cast("double")) *
            sqrt(SimOps.qdot(col("cvec"), col("cvec")).cast("double")))))
      .groupBy(col("id"))
      .agg(max(struct(col("__k"), (-col("cid")).as("nc"))).as("b"))
      .select(col("id"), (-col("b.nc")).as("ref_centroid"))
    val diff = assigned.join(ref, "id")
      .filter(col("centroid_id") =!= col("ref_centroid")).count()
    assert(diff == 0L, s"quantized picks diverged from the crossJoin argmax on $diff rows")
  }
}
