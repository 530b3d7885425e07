package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: deterministic codebook shape, exact-L2 encoding,
  * and the ADC compressed-domain scan.
  */
class SimOpsPqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of 4, ksub=4 codebook from ids 0..3
  private def vecs = Seq(
    (0L, Seq(0f, 0f, 0f, 0f, 9f, 9f, 9f, 9f)),
    (1L, Seq(1f, 1f, 1f, 1f, 8f, 8f, 8f, 8f)),
    (2L, Seq(5f, 5f, 5f, 5f, 2f, 2f, 2f, 2f)),
    (3L, Seq(7f, 7f, 7f, 7f, 0f, 0f, 0f, 0f)),
    (10L, Seq(1.1f, 1.1f, 0.9f, 1.0f, 7.9f, 8.1f, 8f, 8f)), // ~vector 1
    (11L, Seq(6.9f, 7f, 7.1f, 7f, 0.1f, 0f, 0f, 0.2f))      // ~vector 3
  ).toDF("vec_id", "embedding")

  private def codebook = SimOps.pqCodebook(vecs, "vec_id", "embedding", dim = 8, m = 2, ksub = 4)

  test("pqCodebook emits m*ksub subvector centroids with dense codes") {
    val cb = codebook.collect()
    assert(cb.length == 8) // 2 subs x 4 codes
    assert(codebook.select("code").distinct().count() == 4)
    assert(codebook.select("sub").distinct().count() == 2)
    val c2sub0 = codebook.filter($"sub" === 0 && $"code" === 2)
      .select("cvec").as[Seq[Double]].head()
    assert(c2sub0 == Seq(5.0, 5.0, 5.0, 5.0)) // vector 2's first subvector
  }

  test("pqCodes: training vectors encode to themselves; near vectors to their neighbor") {
    val codes = SimOps.pqCodes(vecs, "vec_id", "embedding", codebook, dim = 8, m = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    for (id <- 0L to 3L; sub <- 0L to 1L)
      assert(codes((id, sub)) == id, s"training vector $id sub $sub")
    for (sub <- 0L to 1L) {
      assert(codes((10L, sub)) == 1L) // 10 is a perturbation of vector 1
      assert(codes((11L, sub)) == 3L)
    }
  }

  test("pqTopK ranks by ADC distance, excludes self, caps at k") {
    val out = SimOps.pqTopK(vecs, vecs.filter($"vec_id" === 10L), codebook,
      "vec_id", "embedding", dim = 8, m = 2, k = 3)
      .orderBy("rk").as[(Long, Long, Double, Int)].collect()
    assert(out.length == 3)
    assert(out.forall(_._1 == 10L) && out.forall(_._2 != 10L))
    // vector 10 encodes as (1,1): zero ADC distance to items 1 AND 10; with
    // 10 excluded, item 1 must rank first
    assert(out.head._2 == 1L)
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq) // ascending distance
  }

  test("lloydIteration moves centroids to exact cluster means and drops empty clusters") {
    val vs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(2f, 0f)),   // cluster around +x
      (3L, Seq(0f, 4f)), (4L, Seq(0f, 6f)),   // cluster around +y
      (5L, Seq(1f, 0f))                        // centroid seed, also +x
    ).toDF("vec_id", "embedding")
    val seeds = Seq(
      (100L, Seq(1f, 0.01f)),   // near +x
      (200L, Seq(0.01f, 1f)),   // near +y
      (300L, Seq(-1f, -1f))     // attracts nothing (cosine < others everywhere)
    ).toDF("vec_id", "embedding")
    val out = SimOps.lloydIteration(vs, seeds, "vec_id", "embedding")
      .as[(Long, Seq[Double])].collect().toMap
    assert(out.keySet == Set(100L, 200L)) // empty cluster 300 dropped
    assert(out(100L) == Seq(1.333333, 0.0)) // exact mean 4/3, rounded to 6dp by contract
    assert(out(200L) == Seq(0.0, 5.0))
  }

  test("ivfTopKSalted returns exactly the unsalted results while bounding list width") {
    val s = spark
    // clustered corpus: 40 vectors near +x (one hot centroid), 4 near +y
    val corpus = ((1L to 40L).map(i => (i, Seq(10f + i * 0.01f, 1f))) ++
      (41L to 44L).map(i => (i, Seq(1f, 10f + i * 0.01f)))).toDF("vec_id", "embedding")
    val centroids = Seq((900L, Seq(1f, 0.1f)), (901L, Seq(0.1f, 1f))).toDF("vec_id", "embedding")
    val queries = Seq((500L, Seq(5f, 1f))).toDF("vec_id", "embedding")
    val plain = SimOps.ivfTopKUnsalted(corpus, queries, centroids,
      "vec_id", "embedding", k = 5, nprobe = 1)
      .select("query_id", "item_id", "sim", "rk").as[(Long, Long, Double, Int)].collect().toSet
    val salted = SimOps.ivfTopKSalted(corpus, queries, centroids,
      "vec_id", "embedding", k = 5, nprobe = 1, maxList = 8, sizeSampleRate = 1.0)
      .select("query_id", "item_id", "sim", "rk").as[(Long, Long, Double, Int)].collect().toSet
    // identical results: the hot 40-item list (nsalt = ceil(40/8) = 5)
    // must re-assemble across its salted sub-lists without loss or dups
    assert(salted == plain && plain.size == 5)
    // the sampled-width path (the production default) must also
    // re-assemble exactly — salt counts shape task sizes, never results
    val sampledSalted = SimOps.ivfTopKSalted(corpus, queries, centroids,
      "vec_id", "embedding", k = 5, nprobe = 1, maxList = 8, sizeSampleRate = 0.25)
      .select("query_id", "item_id", "sim", "rk").as[(Long, Long, Double, Int)].collect().toSet
    assert(sampledSalted == plain)
  }

  test("pqCodebook rejects a non-integral id column up front") {
    val stringIds = vecs.withColumn("vec_id", concat(lit("doc-"), $"vec_id"))
    val err = intercept[IllegalArgumentException] {
      SimOps.pqCodebook(stringIds, "vec_id", "embedding", dim = 8, m = 2, ksub = 4)
    }
    assert(err.getMessage.contains("must be integral"))
  }

  test("pq scan: native adc_dist projection, broadcast-bounded joins, no sort-merge") {
    // r20: the ADC sum is ONE adc_dist projection per (item, query) pair —
    // the only non-equi join is the broadcast cross against the BOUNDED
    // query-id frame (the bruteForceTopK pattern); the old m-way
    // (sub, code) expansion join and its (query, item) exchange are gone
    val df = SimOps.pqTopK(vecs, vecs.filter($"vec_id" === 10L), codebook,
      "vec_id", "embedding", dim = 8, m = 2, k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"unbounded cartesian:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"codebook/table joins must broadcast:\n$plan")
    assert(plan.contains("adc_dist"), s"ADC must project through the native expression:\n$plan")
    // the adc_dist subtree must COMPILE — a companion-method name clash
    // (or any Janino failure) silently falls back to interpreted eval,
    // which is exactly the perf the expression exists to deliver. AQE
    // inserts WholeStageCodegen per materialized stage, so execute first
    // and inspect the FINAL adaptive plan.
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val stats = org.apache.spark.sql.execution.debug.codegenStringSeq(finalPlan)
    val adcSubtrees = stats.filter(_._1.contains("adc_dist"))
    assert(adcSubtrees.nonEmpty,
      s"adc_dist landed outside whole-stage codegen:\n$finalPlan")
    adcSubtrees.foreach { case (subtree, _, st) =>
      assert(st.maxMethodCodeSize > 0 && st.maxMethodCodeSize < 65535,
        s"adc_dist subtree failed to compile (maxMethodCodeSize " +
          s"${st.maxMethodCodeSize}):\n$subtree")
    }
  }

  test("pqCodebook assigns codes via a broadcast join, not a when-chain") {
    // ADVICE r8 / verdict item 5: the old foldLeft produced a ksub-deep
    // CaseWhen evaluated per training row. The plan must carry a
    // BroadcastHashJoin and no CaseWhen at all.
    val plan = codebook.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CASE WHEN"), "code assignment regressed to a when-chain")
  }
}
