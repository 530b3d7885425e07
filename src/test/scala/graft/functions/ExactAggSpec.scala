package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExactAgg's contract: the long-scaled partial-sum formulation equals the
  * all-decimal(38,6) accumulation bit for bit, at any grouping/partitioning.
  */
class ExactAggSpec extends SparkSpec {

  test("long-scaled partial sums equal decimal(38,6) accumulation exactly") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // fixed-point non-negative money values: cents, 4-decimal products,
    // 6-decimal rates — the exact shapes the hardened queries sum
    val valGen = for {
      units <- Gen.choose(0L, 200000L)
      scale <- Gen.oneOf(100.0, 10000.0, 1000000.0)
    } yield units / scale
    val prop = Prop.forAll(Gen.nonEmptyListOf(valGen)) { vals: List[Double] =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong % 3, v) }
        .toDF("g", "v").repartition(7) // deliberately odd partitioning
      val viaDecimal = df.groupBy("g")
        .agg(round(sum(col("v").cast("decimal(38,6)")).cast("double"), 2).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaLong = df
        .groupBy(col("g"), spark_partition_id().as("__pid"))
        .agg(sum(ExactAgg.scaled6(col("v"))).as("p"))
        .groupBy("g")
        .agg(ExactAgg.exactSum6(col("p"), 2).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      viaLong == viaDecimal
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }
}
