package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** vec_dot / vec_l2sq: bit-equality with the interpreted fold they
  * replaced, null semantics, and whole-stage-codegen placement.
  */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  private def foldDot = aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _)
  private def foldL2 =
    aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  test("property: bit-identical to the zip_with/aggregate fold") {
    val genVec = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1e6, 1e6).map(v => math.rint(v * 256) / 256)))
    val prop = Prop.forAll(genVec) { xs =>
      val ys = xs.map(v => v * 0.7 - 3.25) // same length, different values
      val df = Seq((xs, ys)).toDF("a", "b")
      val row = df.select(
        call_function("vec_dot", col("a"), col("b")),
        foldDot,
        call_function("vec_l2sq", col("a"), col("b")),
        foldL2).collect().head
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)) &&
        java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(row.getDouble(3))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("length mismatch and null elements yield null, like the fold") {
    val df = Seq(
      (Seq(Some(1.0), Some(2.0)), Seq(Some(1.0))),
      (Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))
    ).toDF("a", "b")
    val out = df.select(call_function("vec_dot", col("a"), col("b")).as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    assert(df.select(call_function("vec_dot", col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("vec_qdot: exact quantized-integer dot, order-independent by type") {
    // reference: exact BigInt arithmetic over the same quantization
    val genVec = Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1.0, 1.0)))
    val prop = Prop.forAll(genVec) { xs =>
      val ys = xs.map(v => 0.5 - v * 0.9)
      val want = xs.zip(ys).map { case (x, y) =>
        BigInt(math.floor(x * 1e6 + 0.5).toLong) *
          BigInt(math.floor(y * 1e6 + 0.5).toLong)
      }.sum
      val got = Seq((xs, ys)).toDF("a", "b")
        .select(call_function("vec_qdot", col("a"), col("b"))).collect().head.getLong(0)
      BigInt(got) == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("vec_qdot: length mismatch and null elements yield null; LONG type") {
    val df = Seq(
      (Seq(Some(1.0), Some(2.0)), Seq(Some(1.0))),
      (Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))
    ).toDF("a", "b")
    val out = df.select(call_function("vec_qdot", col("a"), col("b")).as("d"))
    assert(out.schema("d").dataType == org.apache.spark.sql.types.LongType)
    assert(out.collect().forall(_.isNullAt(0)))
  }

  test("qcosine: a fixed correctly-rounded DAG over the exact integers") {
    // replay the DAG in plain scala; must be BIT-identical (this is the
    // cross-engine exactness contract the SemDeDup family rides on)
    val xs = Seq(0.1234567, -0.9876, 0.5, 0.0001)
    val ys = Seq(0.5, 0.25, -0.125, 0.75)
    def q(v: Seq[Double]) = v.map(x => math.floor(x * 1e6 + 0.5).toLong)
    def qd(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val want = qd(q(xs), q(ys)).toDouble /
      (math.sqrt(qd(q(xs), q(xs)).toDouble) * math.sqrt(qd(q(ys), q(ys)).toDouble))
    val got = Seq((xs, ys)).toDF("a", "b")
      .select(graft.ops.SimOps.qcosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(want), s"$got != $want")
  }

  test("the projection stays inside whole-stage codegen") {
    // a non-local source, so ConvertToLocalRelation can't fold the project
    val df = spark.range(4).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array((col("id") + 1).cast("double"), lit(4.0)).as("b"))
    val plan = df.select(call_function("vec_dot", col("a"), col("b")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("vec_dot"), plan)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"vec_dot projection not codegen'd:\n$plan")
  }
}
