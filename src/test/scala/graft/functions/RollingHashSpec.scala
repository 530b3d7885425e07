package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst rolling-hash expression: codegen, interpreted, and SQL
  * registration paths must all agree with the reference fold.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31L + (b & 0xff)) % 1000000007L)

  test("codegen path (whole-stage) matches the reference fold") {
    val in = Seq("", "a", "abc", "The quick brown fox", "x" * 5000)
    val out = in.toDF("s")
      .select(expr("rolling_hash(s)"))
      .as[Long].collect().toSeq
    assert(out == in.map(reference))
  }

  test("interpreted eval matches codegen") {
    for (s <- Seq("", "abc", "hello world"))
      assert(RollingHash(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
        .eval(null) == reference(s))
  }

  test("null input yields null, non-string input is rejected at analysis") {
    val out = Seq(Some("abc"), None).toDF("s")
      .select(expr("rolling_hash(s)")).as[Option[Long]].collect()
    assert(out.toSet == Set(Some(reference("abc")), None))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("n").select(expr("rolling_hash(n)")).collect()
    }
  }

  test("stays inside whole-stage codegen (no UDF/row boundary)") {
    // a local literal would constant-fold to a LocalTableScan; range() gives
    // a real codegen pipeline to fuse into
    val df = spark.range(3).select(expr("rolling_hash(cast(id AS string))").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // '*' prefixes mark operators fused into a WholeStageCodegen span; a
    // non-codegen expression would force the Project out of the span
    assert(plan.contains("*(1) Project [rolling_hash("))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(df.as[Long].collect().toSeq == Seq("0", "1", "2").map(reference))
  }
}
