package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The k-bounded top-k aggregate vs the row_number window it replaces:
  * identical output on ties (equal scores break to the smaller id),
  * k-truncation, and map-side merges across many partitions.
  */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def topk(k: Int) = GraftExpressionBridge.column(
    TopKPairs(
      GraftExpressionBridge.expression(col("sim")),
      GraftExpressionBridge.expression(col("item_id")), k)
      .toAggregateExpression())

  test("matches the row_number window on ties, truncation, and partition merges") {
    // 40 groups x 500 candidates over 32 partitions; scores COLLIDE by
    // construction (sim = (item_id % 25) / 25.0) so every group has ~20-way
    // ties at each score level — the (sim desc, id asc) tie-break is load-bearing
    val scored = spark.range(0, 20000).repartition(32)
      .select((col("id") % 40).as("query_id"), col("id").as("item_id"),
        ((col("id") % 25).cast("double") / 25.0).as("sim"))
    val k = 7
    val viaAgg = scored.groupBy("query_id").agg(topk(k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__i", "__e")))
      .select(col("query_id"), col("__e.item_id").as("item_id"),
        col("__e.sim").as("sim"), (col("__i") + 1).cast("int").as("rk"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), col("item_id"))
    val viaWindow = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("item_id"), col("sim"), col("rk"))
    assert(viaAgg.count() == 40L * k)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "aggregate top-k diverged from the window top-k")
  }

  test("k cap is the serving regime (r20): 4096 accepted, 4097 refused") {
    // boundary spec for the r20 hardening — the 2^20 cap let a caller
    // allocate gigabytes of per-group state under ObjectHashAggregate
    TopKPairs(
      GraftExpressionBridge.expression(col("sim")),
      GraftExpressionBridge.expression(col("item_id")), 4096)
    val e = intercept[IllegalArgumentException] {
      TopKPairs(
        GraftExpressionBridge.expression(col("sim")),
        GraftExpressionBridge.expression(col("item_id")), 4097)
    }
    assert(e.getMessage.contains("serving regime"))
  }

  test("lazy buffer growth (r20): k past the 16-slot seed still matches the window") {
    // k = 100 forces the buffer through multiple capacity doublings
    // (16 -> 32 -> 64 -> 100) on BOTH the update and the merge/deserialize
    // paths (32 partitions -> partial buffers of varied fill)
    val scored = spark.range(0, 20000).repartition(32)
      .select((col("id") % 10).as("query_id"), col("id").as("item_id"),
        ((col("id") % 40).cast("double") / 40.0).as("sim"))
    val k = 100
    val viaAgg = scored.groupBy("query_id").agg(topk(k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__i", "__e")))
      .select(col("query_id"), col("__e.item_id").as("item_id"),
        col("__e.sim").as("sim"), (col("__i") + 1).cast("int").as("rk"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), col("item_id"))
    val viaWindow = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("item_id"), col("sim"), col("rk"))
    assert(viaAgg.count() == 10L * k)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "aggregate top-k diverged from the window top-k at grown capacity")
  }

  test("groups smaller than k emit all their rows in rank order; null scores are ignored") {
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9),
      (2L, 20L, 0.1)).toDF("query_id", "item_id", "sim")
      .unionByName(Seq((2L, 21L)).toDF("query_id", "item_id")
        .withColumn("sim", lit(null).cast("double")))
    val out = scored.groupBy("query_id").agg(topk(5).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__i", "__e")))
      .select(col("query_id"), col("__e.item_id"), (col("__i") + 1).as("rk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 11L, 1L), (1L, 12L, 2L), (1L, 10L, 3L), (2L, 20L, 1L)))
  }
}
