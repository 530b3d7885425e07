package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class WinnowHashesSpec extends SparkSpec {

  /** The reference semantics in plain Scala: Horner hash per shingle,
    * then the min of each w-window of consecutive hashes.
    */
  private def reference(shingles: Seq[String], w: Int): Seq[Long] = {
    val hs = shingles.map(_.getBytes("UTF-8").foldLeft(0L)((acc, b) =>
      (acc * 31L + (b & 0xff)) % 1000000007L))
    if (hs.length < w) Seq.empty
    else (0 to hs.length - w).map(j => hs.slice(j, j + w).min)
  }

  test("winnow_hashes matches the brute-force reference, and each window hash equals rolling_hash") {
    val s = spark
    import s.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val toks = text.split(" ").toSeq
    val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq
    val got = Seq(text).toDF("text")
      .select(expr("winnow_hashes(word_shingles(split(text, ' '), 3), 4)"))
      .as[Seq[Long]].head()
    assert(got == reference(shingles, 4))
    // cross-check the per-shingle hash against the registered rolling_hash
    val rh = shingles.toDF("s").select(expr("rolling_hash(s)")).as[Long].collect().toSeq
    assert(got.head == rh.take(4).min)
  }

  test("fewer shingles than the window yields an empty fingerprint array") {
    val s = spark
    import s.implicits._
    val out = Seq("a b c d e", "one two").toDF("text") // 3 shingles < w=4; 0 shingles
      .select(graft.ops.TextOps.winnowFingerprints(col("text")))
      .as[Seq[Long]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("property: codegen and interpreted evaluation agree on random inputs") {
    val s = spark
    import s.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "longword")
    val prop = Prop.forAll(Gen.listOfN(10, word), Gen.choose(1, 5)) {
      (ws: List[String], w: Int) =>
        val shingles = if (ws.length < 3) Seq.empty
          else ws.sliding(3).map(_.mkString(" ")).toSeq
        val expected = reference(shingles, w)
        val fromCodegen = Seq(ws.mkString(" ")).toDF("text")
          .select(expr(s"winnow_hashes(word_shingles(split(text, ' '), 3), $w)"))
          .as[Seq[Long]].head()
        val e = WinnowHashes(
          org.apache.spark.sql.catalyst.expressions.Literal.create(shingles,
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
          w)
        val interp = e.eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSeq
        fromCodegen == expected && interp == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("winnowing guarantee: every window selects, so coverage has no gaps") {
    val s = spark
    import s.implicits._
    // any two docs sharing >= w + shingleW - 1 = 6 consecutive tokens must
    // share at least one fingerprint
    val shared = "common run of six tokens here"
    val a = s"unique alpha prefix words $shared and alpha tail"
    val b = s"totally different beta start $shared plus other beta ending"
    val fps = Seq(a, b).toDF("text")
      .select(graft.ops.TextOps.winnowFingerprints(col("text")))
      .as[Seq[Long]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty)
  }

  test("a null shingle element raises a clear error in both eval paths") {
    val s = spark
    import s.implicits._
    // codegen path: the SQL-registered function with an explicit NULL element
    val viaSql = intercept[Exception] {
      Seq(1).toDF("i").select(expr("winnow_hashes(array('a', cast(null as string), 'b'), 2)"))
        .collect()
    }
    assert(viaSql.toString.contains("null shingle") ||
      Option(viaSql.getCause).exists(_.toString.contains("null shingle")), viaSql.toString)
    // interpreted path
    val e = WinnowHashes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq("a", null, "b"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      2)
    val interp = intercept[IllegalArgumentException] { e.eval(null) }
    assert(interp.getMessage.contains("null shingle"))
  }

  test("the expression stays inside whole-stage codegen") {
    val plan = spark.range(3)
      .select(concat(col("id").cast("string"), lit(" a b c d e f")).as("text"))
      .select(graft.ops.TextOps.winnowFingerprints(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("winnow_hashes(word_shingles("), plan)
    assert(plan.contains("*(1) Project"), plan)
  }
}
