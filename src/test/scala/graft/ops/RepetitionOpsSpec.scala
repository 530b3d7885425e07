package graft.ops

import graft.SparkSpec

/** Gopher repetition filters: hand-computed window/ngram micros and the
  * composite gate on constructed fixtures.
  */
class RepetitionOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // two identical 8-token lines -> every line occurrence is a duplicate
    (1L, "a b c d e f g h a b c d e f g h"),
    // 64 distinct tokens -> eight lines, nothing repeats, and no single
    // n-gram is heavy enough to trip a top-gram rule (the published rules
    // assume real-length documents; a 16-token doc fails top-4 at 0.28
    // with ZERO repetition, which is faithful to the reproduction)
    (2L, (1 to 64).map(i => s"t$i").mkString(" ")),
    // "x y" six times -> top 2-gram mass 6*3 of 23 chars (and long enough
    // to carry a line, so the gate sees it)
    (3L, "x y x y x y x y x y x y"),
    // one repeated 5-gram -> dup mass 2*9 of 19 chars
    (4L, "a b c d e a b c d e")
  ).toDF("doc_id", "text")

  test("duplicate-line profile: full dup doc = 1e6, distinct doc = 0") {
    val m = RepetitionOps.lineParagraphProfile(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(1L) == ((2L, 1000000L, 1000000L, 0L))) // 2 lines, all dup, no paras
    assert(m(2L) == ((8L, 0L, 0L, 2L))) // 8 lines, 2 paragraphs, no dups
  }

  test("top n-gram char mass: floor(18e6/23) for the x-y doc at n=2") {
    val m = RepetitionOps.topGramMass(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((3L, 2L)) == 18000000L / 23L) // "x y" cnt=6, len=3, total=23
    // distinct-token doc: every 2-gram unique, mass = len(gram)/total
    assert(m((2L, 2L)) < 150000L)
  }

  test("duplicated n-gram char mass: floor(18e6/19) for the repeated 5-gram") {
    val m = RepetitionOps.dupGramMass(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((4L, 5L)) == 18000000L / 19L)
    assert(m((2L, 5L)) == 0L)
    // fully periodic doc 1: every 5-gram repeats -> capped at 1e6
    assert(m((1L, 5L)) == 1000000L)
  }

  test("gopher gate: repetitive docs fail, the distinct doc is kept") {
    val m = RepetitionOps.gopherGate(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L)._1 > 0 && m(1L)._2 == 0L)
    assert(m(2L) == ((0L, 1L)))
    assert(m(3L)._1 > 0 && m(3L)._2 == 0L) // top 2-gram 0.81 > 0.20
  }

  test("microRatio is exact integer floor division at LONG-overflow scale") {
    // 1e13 * 1e6 = 1e19 > Long.MaxValue (~9.22e18): the numerator really
    // does leave the LONG domain, so this exercises the decimal-domain
    // protection (ADVICE r11 — the previous 3e12 operand stayed inside)
    val out = Seq((1L, 3L)).toDF("a", "b")
      .select(RepetitionOps.microRatio(
        org.apache.spark.sql.functions.lit(10000000000000L),
        org.apache.spark.sql.functions.lit(70000000000000L)))
      .as[Long].head()
    assert(out == 142857L) // floor(1e6 * 1e13 / 7e13)
  }
}
