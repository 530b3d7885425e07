package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class WordShinglesSpec extends SparkSpec {

  test("word_shingles matches the higher-order-function formulation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps",
      "a b c",
      "a b",       // fewer than w tokens -> empty
      "",          // split("") = [""] -> 1 token -> empty
      "one  two   three four" // multi-space separators
    ).toDF("text")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val hof = when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(3)),
        i => array_join(slice(toks, i + 1, lit(3)), " ")))
    val rows = docs
      .select(
        graft.ops.TextOps.shingles(col("text"), 3).as("native"),
        hof.as("reference"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (native, ref) => assert(native === ref) }
  }

  test("property: codegen and interpreted evaluation agree on random token counts") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(Gen.choose(0, 12)) { count: Int =>
      val text = (1 to count).map(i => s"t$i").mkString(" ")
      val expected =
        if (count < 3) Seq.empty
        else (0 to count - 3).map(i => s"t${i + 1} t${i + 2} t${i + 3}")
      val fromCodegen = Seq(text).toDF("text")
        .select(graft.ops.TextOps.shingles(col("text"), 3))
        .as[Seq[String]].head()
      // the interpreted path: eval the expression directly
      val e = WordShingles(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          (if (text.isEmpty) Seq("") else text.split("\\s+").toSeq),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        3)
      val interp = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toSeq[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString)
      fromCodegen == expected && interp == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("null text yields null, and the expression stays in codegen") {
    val s = spark
    import s.implicits._
    val out = Seq[Option[String]](None, Some("x y z w"))
      .toDF("text")
      .select(graft.ops.TextOps.shingles(col("text")).as("sh"))
      .as[Option[Seq[String]]].collect()
    assert(out.toSet === Set(None, Some(Seq("x y z", "y z w"))))
    // a non-local source so ConvertToLocalRelation cannot pre-evaluate:
    // the shingle expression must sit inside a WholeStageCodegen Project
    val plan = spark.range(3)
      .select(concat(col("id").cast("string"), lit(" a b c")).as("text"))
      .select(graft.ops.TextOps.shingles(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [word_shingles("), plan)
  }
}
