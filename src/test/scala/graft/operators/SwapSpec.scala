package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Key-swap core invariants (SURVEY.md §7.5 — the hardest semantic):
  * dense, stable, append-only surrogate keys.
  */
class SwapSpec extends SparkSpec {
  import spark.implicits._

  test("denseIds assigns contiguous ids in order-key order from offset+1") {
    val df = Seq("d", "a", "c", "b").toDF("x")
    val out = Swap.denseIds(df, Seq("x"), offset = 10L).orderBy("y")
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 11L), ("b", 12L), ("c", 13L), ("d", 14L)))
  }

  test("denseIds is deterministic across partitionings of the same data") {
    val data = (1 to 500).map(i => f"k$i%04d")
    val a = Swap.denseIds(data.toDF("x").repartition(7), Seq("x"), 0L)
    val b = Swap.denseIds(scala.util.Random.shuffle(data).toDF("x").repartition(2), Seq("x"), 0L)
    assert(a.orderBy("y").collect().toSeq == b.orderBy("y").collect().toSeq)
  }

  test("maxId returns base on empty swap and max(y) otherwise") {
    val empty = Seq.empty[(String, Long)].toDF("x", "y")
    assert(Swap.maxId(empty) == 0L)
    assert(Swap.maxId(empty, base = 2000000000L) == 2000000000L)
    assert(Swap.maxId(Seq(("a", 5L), ("b", 9L)).toDF("x", "y")) == 9L)
  }

  test("newKeys (J4) keeps only unseen keys") {
    val swap = Seq(("a", 1L), ("b", 2L)).toDF("x", "y")
    val cands = Seq("b", "c", "d").toDF("x")
    assert(Swap.newKeys(swap, cands, Seq("x")).as[String].collect().sorted.toSeq == Seq("c", "d"))
  }

  test("mergeAppend is append-only: existing ids never change") {
    val swap = Seq(("b", 1L), ("a", 2L)).toDF("x", "y")
    val out = Swap.mergeAppend(swap, Seq("c", "a", "d").toDF("x"), Seq("x"))
      .as[(String, Long)].collect().toMap
    assert(out("b") == 1L && out("a") == 2L) // untouched
    assert(out("c") == 3L && out("d") == 4L) // new keys numbered after max
  }

  test("mergeAppend is idempotent: re-run with same candidates is a no-op") {
    val swap0 = Seq.empty[(String, Long)].toDF("x", "y")
    val cands = Seq("q", "p", "r", "p").toDF("x") // dup candidate rows collapse
    val once = Swap.mergeAppend(swap0, cands, Seq("x"))
    val twice = Swap.mergeAppend(once, cands, Seq("x"))
    assert(once.orderBy("x").collect().toSeq == twice.orderBy("x").collect().toSeq)
  }

  test("property: swap ids are a dense bijection for any key set") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) {
      keys: List[String] =>
        val distinctKeys = keys.distinct
        val out = Swap.mergeAppend(
          Seq.empty[(String, Long)].toDF("x", "y"), distinctKeys.toDF("x"), Seq("x"))
          .as[(String, Long)].collect()
        val ids = out.map(_._2).sorted
        ids.toSeq == (1L to distinctKeys.length.toLong) &&  // dense from 1
          out.map(_._1).distinct.length == out.length       // bijection
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: denseIds equals sorted-zipWithIndex for any unique key set") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))) {
      keys: List[Long] =>
        val uniq = keys.distinct
        val out = Swap.denseIds(uniq.toDF("x"), Seq("x"), offset = 7L)
          .as[(Long, Long)].collect().toMap
        val expected = uniq.sorted.zipWithIndex.map { case (k, i) => k -> (i + 8L) }.toMap
        out == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: rankIds equals the reference RANK-over-raw-rows fold") {
    val codeGen = Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "c", "dd", "e", "f", "zz"))
    val prop = Prop.forAll(codeGen) { codes: List[String] =>
      val out = Swap.rankIds(codes.toDF("code"), "code", base = 100L)
        .as[(String, Long)].collect().toMap
      val expected = codes.distinct
        .map(c => c -> (100L + 1L + codes.count(_ < c))).toMap
      out == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("rankIds (W2): equal codes share an id; id = rank over raw rows + base") {
    // raw rows: a,a,b,d,d,d,e -> rank(a)=1, rank(b)=3, rank(d)=4, rank(e)=7
    val df = Seq("d", "a", "b", "d", "a", "e", "d").toDF("code")
    val out = Swap.rankIds(df, "code", base = 2000000000L)
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "a" -> 2000000001L, "b" -> 2000000003L, "d" -> 2000000004L, "e" -> 2000000007L))
  }
}
