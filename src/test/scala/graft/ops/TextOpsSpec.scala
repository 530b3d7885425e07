package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Text-analysis primitives: portable hash, tokenization, shingles,
  * language ID, fingerprint invariance.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash32 equals the first 8 hex chars of md5, parsed base 16") {
    val out = Seq("hello").toDF("s").select(TextOps.hash32($"s")).as[Long].head()
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    assert(out == expected)
  }

  test("tokens lower-cases, trims and splits on whitespace runs") {
    val out = Seq("  Foo   BAR\tbaz ").toDF("s")
      .select(TextOps.tokens($"s")).as[Seq[String]].head()
    assert(out == Seq("foo", "bar", "baz"))
  }

  test("shingles emits n-w+1 overlapping windows; short docs emit none") {
    val out = Seq("a b c d").toDF("s").select(TextOps.shingles($"s", 3)).as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("s").select(TextOps.shingles($"s", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("langId picks the language with most marker hits, 'und' when none") {
    val rows = Seq(
      "the cat is in the house and happy",
      "der hund ist ein guter freund von mir",
      "xyzzy plugh 12345").toDF("s")
      .select(TextOps.langId($"s")).as[String].collect()
    assert(rows.toSeq == Seq("en", "de", "und"))
  }

  test("qualityScore stays within [0,1]") {
    val scores = Seq("", "short", "the " * 200, "!!!???;;;")
      .toDF("s").select(TextOps.qualityScore($"s")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("property: fingerprint is invariant to token order and duplication") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
    val prop = Prop.forAll(Gen.nonEmptyListOf(word)) { ws: List[String] =>
      val doc1 = ws.mkString(" ")
      val doc2 = (scala.util.Random.shuffle(ws) ++ ws.headOption).mkString(" ")
      val fps = Seq(doc1, doc2).toDF("s").select(TextOps.fingerprint($"s")).as[String].collect()
      fps(0) == fps(1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("subwordCount splits letter/digit boundaries") {
    val out = Seq("abc123def x1").toDF("s").select(TextOps.subwordCount($"s")).as[Int].head()
    assert(out == 5) // abc|123|def + x|1
  }

  test("scrubPii redacts emails, IPv4s, and phones; leaves clean text alone") {
    val out = Seq(
      "mail a.b-c+tag@sub.example.org now",
      "from 192.168.0.1 and 10.2.3.44 twice",
      "call +32 472 1234 today",
      "no pii in this sentence at all",
      "version 1.2 is not an ip, nor is 1.2.3 alone").toDF("s")
      .select(TextOps.scrubPii($"s")).as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "from <IP> and <IP> twice")
    assert(out(2) == "call <PHONE> today")
    assert(out(3) == "no pii in this sentence at all")
    assert(out(4) == "version 1.2 is not an ip, nor is 1.2.3 alone")
  }

  test("pii counts via regexp_count match the number of redactions") {
    val s = "a@b.co c@d.org 1.2.3.4 +1 555 0000"
    val row = Seq(s).toDF("s").select(
      regexp_count($"s", lit(TextOps.EmailRe)),
      regexp_count($"s", lit(TextOps.Ipv4Re)),
      regexp_count($"s", lit(TextOps.PhoneRe))).as[(Int, Int, Int)].head()
    assert(row == ((2, 1, 1)))
  }
}
