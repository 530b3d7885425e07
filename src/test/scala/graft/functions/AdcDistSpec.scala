package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.functions._

/** r20: the native ADC projection vs the join formulation it replaced —
  * identical micro-unit LONG sums on every (item, query) pair, plus the
  * broadcast-registry lifecycle and the degenerate-input contract.
  */
class AdcDistSpec extends SparkSpec {
  import spark.implicits._

  private val m = 3
  private val ksub = 4

  // deterministic dense table: every (q, sub, code) cell filled
  private def qdRows: Seq[(Long, Long, Long, Long)] =
    for {
      q <- 100L to 104L
      sub <- 0L until m.toLong
      code <- 0L until ksub.toLong
    } yield (q, sub, code, q * 1000 + sub * 100 + code * 7)

  private def codesRows: Seq[(Long, Long, Long)] =
    for {
      item <- 0L to 19L
      sub <- 0L until m.toLong
    } yield (item, sub, (item + sub * 2) % ksub)

  private def buildHandle(): AdcHandle = {
    val qids = qdRows.map(_._1).distinct.sorted.toArray
    val idx = qids.zipWithIndex.toMap
    val flat = new Array[Long](qids.length * m * ksub)
    qdRows.foreach { case (q, s, c, v) =>
      flat(idx(q) * m * ksub + s.toInt * ksub + c.toInt) = v
    }
    AdcBroadcasts.handleFor(spark, AdcModel(qids, flat, m, ksub))
  }

  private def adc(handle: AdcHandle) = GraftExpressionBridge.column(AdcDist(
    GraftExpressionBridge.expression(col("query_id")),
    GraftExpressionBridge.expression(col("__codes")), handle))

  test("matches the (sub, code) expansion join + groupBy sum on every pair") {
    val qd = qdRows.toDF("query_id", "sub", "code", "qdl")
    val codes = codesRows.toDF("item_id", "sub", "code")
    val viaJoin = codes.join(broadcast(qd), Seq("sub", "code"))
      .groupBy(col("query_id"), col("item_id"))
      .agg(sum(col("qdl")).as("dl"))
      .as[(Long, Long, Long)].collect().toSet
    val codesArr = codes.groupBy(col("item_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        sc => sc.getField("code")).as("__codes"))
    val handle = buildHandle()
    val viaExpr = codesArr
      .crossJoin(broadcast(qdRows.map(_._1).distinct.toDF("query_id")))
      .withColumn("dl", adc(handle))
      .select(col("query_id"), col("item_id"), col("dl"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaExpr == viaJoin,
      "native ADC projection diverged from the expansion-join sum")
    assert(viaJoin.size == 20 * 5)
  }

  test("degenerate inputs null out (and the k-tail would drop them), never mis-rank") {
    val handle = buildHandle()
    val rows = Seq(
      (999L, Seq(0L, 1L, 2L)),        // query not in the table
      (100L, Seq(0L, 1L)),            // wrong-length codes
      (100L, Seq(0L, 1L, 99L)),       // code out of [0, ksub)
      (100L, Seq(0L, 1L, 2L))         // valid
    ).toDF("query_id", "__codes")
    val out = rows.withColumn("dl", adc(handle))
      .select(col("dl")).collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).isEmpty && out(1).isEmpty && out(2).isEmpty)
    assert(out(3).contains(100L * 1000 + 0 * 100 + 0 * 7
      + 100L * 1000 + 1 * 100 + 1 * 7
      + 100L * 1000 + 2 * 100 + 2 * 7))
  }

  test("content-identical tables share one Broadcast; the cell budget is enforced") {
    val a = buildHandle()
    val b = buildHandle()
    assert(a.bc eq b.bc, "re-resolving the same table must reuse the broadcast")
    val e = intercept[IllegalArgumentException] {
      AdcBroadcasts.handleFor(spark, AdcModel(
        Array.tabulate(1 << 16)(_.toLong), Array.emptyLongArray, 64, 256))
    }
    assert(e.getMessage.contains("budget"))
  }
}
