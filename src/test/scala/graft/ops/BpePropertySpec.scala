package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check: the relational window formulation of the greedy BPE
  * merge (running-max run anchor + parity) agrees with a direct
  * in-memory left-to-right scan on arbitrary token sequences — the
  * textbook implementation the published algorithm describes.
  */
class BpePropertySpec extends SparkSpec {

  import spark.implicits._

  /** Reference semantics: scan left to right, merge the pair wherever it
    * matches, skip past each merge (a merged token cannot participate in
    * another merge this round).
    */
  private def referenceMerge(toks: List[String], lhs: String, rhs: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == lhs && toks(i + 1) == rhs) {
        out += (lhs + rhs); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toList
  }

  test("property: applyMerge equals the textbook greedy scan") {
    val tokGen = Gen.oneOf("a", "b", "ab", "c")
    val seqGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, tokGen))
    // a batch of random words per case keeps the Spark job count low
    val prop = Prop.forAll(Gen.listOfN(24, seqGen), tokGen, tokGen) {
      (words: List[List[String]], lhs: String, rhs: String) =>
        val df = words.zipWithIndex
          .map { case (ts, i) => (s"w$i", 1L, ts.mkString(" ")) }
          .toDF("w", "cnt", "sym")
        val best = Seq((lhs, rhs, lhs + rhs)).toDF("__lhs", "__rhs", "__merged")
        val got = BpeOps.applyMerge(df, best)
          .collect().map(r => r.getString(0) -> r.getString(2)).toMap
        words.zipWithIndex.forall { case (ts, i) =>
          got(s"w$i") == referenceMerge(ts, lhs, rhs).mkString(" ")
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
