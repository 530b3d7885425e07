package graft.functions

import java.io.{ByteArrayOutputStream, ObjectOutputStream}

import graft.SparkSpec
import graft.ops.SimOps
import org.apache.spark.sql.functions._

/** r20 (VERDICT #1): the native centroid expressions carry a broadcast
  * HANDLE, not the matrix — the serialized plan stays small at the 4096
  * model budget, content-identical models share one Broadcast across
  * plan builds (the micro-batch re-plan case), and eviction past the
  * registry window unpersists without breaking straddling plans.
  */
class CentroidBroadcastsSpec extends SparkSpec {
  import spark.implicits._

  private def cents(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { c =>
      (c.toLong, (0 until dim).map(j => math.sin((c + seed) * 0.9 + j * 0.37)))
    }

  private def javaSize(o: AnyRef): Int = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(o)
    oos.close()
    bos.size()
  }

  test("content-identical models resolve to the SAME Broadcast; distinct content does not") {
    val a = CentroidBroadcasts.handleFor(spark, cents(64, 16, seed = 1))
    val b = CentroidBroadcasts.handleFor(spark, cents(64, 16, seed = 1))
    val c = CentroidBroadcasts.handleFor(spark, cents(64, 16, seed = 2))
    assert(a.bc eq b.bc, "re-resolving the same centroid set must reuse the broadcast")
    assert(!(a.bc eq c.bc), "distinct content must not collide")
    val qa = CentroidBroadcasts.qhandleFor(spark, cents(64, 16, seed = 1))
    val qb = CentroidBroadcasts.qhandleFor(spark, cents(64, 16, seed = 1))
    assert(qa.bc eq qb.bc)
  }

  test("the plan ships a handle, not the matrix: expression serializes small at the 4096 bound") {
    // 4096 x 64 doubles = ~2 MB of model; the serialized EXPRESSION —
    // what every task closure and every stream_ann_serve micro-batch
    // re-plan carries — must stay orders of magnitude under that
    val big = cents(4096, 64, seed = 7)
    val df = SimOps.assignNearestInlined(
      spark.range(0, 10).select(col("id"),
        array((0 until 64).map(j => sin(col("id") + lit(j * 0.1))): _*).as("vec")),
      big, "id", "vec", "item_id", "item_vec")
    val exprs = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case n: NearestCentroid => n })
    assert(exprs.nonEmpty, "optimized plan lost the native argmax expression")
    val h = exprs.head.handle
    assert(h.n == 4096)
    assert(h.bc.value.vecs.length == 4096 && h.bc.value.vecs.head.length == 64)
    val exprBytes = javaSize(exprs.head)
    val modelBytes = javaSize(h.bc.value)
    assert(modelBytes > (1 << 20),
      s"fixture model unexpectedly small: $modelBytes bytes")
    assert(exprBytes < (64 << 10),
      s"expression still embeds the matrix: $exprBytes bytes serialized " +
        s"(model is $modelBytes)")
  }

  test("eviction past the registry window unpersists but keeps evicted handles usable") {
    CentroidBroadcasts.clear()
    val first = CentroidBroadcasts.handleFor(spark, cents(8, 4, seed = 100))
    // push MaxEntries further distinct models through: `first` evicts
    (1 to CentroidBroadcasts.MaxEntries).foreach { s =>
      CentroidBroadcasts.handleFor(spark, cents(8, 4, seed = 100 + s))
    }
    assert(CentroidBroadcasts.size <= CentroidBroadcasts.MaxEntries)
    // a plan still holding the evicted handle refetches from the driver —
    // unpersist (never destroy) keeps the value resolvable
    assert(first.bc.value.ids.length == 8)
    // and re-resolving the evicted content mints a FRESH broadcast
    val again = CentroidBroadcasts.handleFor(spark, cents(8, 4, seed = 100))
    assert(!(again.bc eq first.bc))
    CentroidBroadcasts.clear()
  }

  test("assignment through the broadcast handle matches the crossJoin argmax") {
    // small end-to-end result pin (the 4096-bound equivalences live in
    // SimOpsSpec); ties included via duplicated directions
    val vecs = spark.range(0, 200).select(col("id"),
      array((0 until 8).map(j => sin(col("id") % 9 * lit(0.7) + lit(j * 0.3))): _*).as("vec"))
    val cs = (0 until 24).map { c =>
      (c.toLong, (0 until 8).map(j => math.sin(c % 6 * 0.7 + j * 0.3) * (1.0 + c % 2)))
    }
    val centDf = cs.toDF("id", "vec")
      .select(col("id").as("centroid_id"),
        transform(col("vec"), _.cast("double")).as("centroid_vec"))
    val viaHandle = SimOps.assignNearestInlined(vecs, cs, "id", "vec", "item_id", "item_vec")
      .select("item_id", "centroid_id").as[(Long, Long)].collect().toMap
    val viaCross = vecs
      .select(col("id").as("item_id"),
        transform(col("vec"), _.cast("double")).as("item_vec"))
      .crossJoin(broadcast(centDf))
      .withColumn("__s", SimOps.cosine(col("item_vec"), col("centroid_vec")))
      .groupBy("item_id")
      .agg(max(struct(col("__s"), (-col("centroid_id")).as("__nc"))).as("__b"))
      .select(col("item_id"), (-col("__b.__nc")).as("centroid_id"))
      .as[(Long, Long)].collect().toMap
    assert(viaHandle == viaCross)
  }
}
