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
}
