package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** BPE merge learning: greedy left-to-right application semantics,
  * character-level initialization, deterministic training on a known tiny
  * corpus, and the plan-shape bound (one window exchange + one rebuild
  * aggregate per round).
  */
class BpeOpsSpec extends SparkSpec {

  import spark.implicits._

  private def words(rows: (String, Long, String)*): DataFrame =
    rows.toSeq.toDF("w", "cnt", "sym")

  private def best(lhs: String, rhs: String): DataFrame =
    Seq((lhs, rhs, lhs + rhs)).toDF("__lhs", "__rhs", "__merged")

  private def applied(ws: DataFrame, lhs: String, rhs: String): Map[String, String] =
    BpeOps.applyMerge(ws, best(lhs, rhs))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap

  test("greedy merge applies left-to-right, every other in a run") {
    val ws = words(
      ("aaa", 1L, "a a a </w>"),
      ("aaaa", 1L, "a a a a </w>"),
      ("ab", 1L, "a b </w>"))
    val got = applied(ws, "a", "a")
    // "a a a" -> leftmost pair merges, third a survives
    assert(got("aaa") == "aa a </w>")
    // "a a a a" -> both disjoint pairs merge in one step
    assert(got("aaaa") == "aa aa </w>")
    // untouched word passes through
    assert(got("ab") == "a b </w>")
  }

  test("merge respects token boundaries, not substrings") {
    val ws = words(("xaby", 1L, "x a b y </w>"), ("ab", 1L, "ab </w>"))
    val got = applied(ws, "a", "b")
    assert(got("xaby") == "x ab y </w>")
    // the already-merged single token "ab" is not a pair (a, b)
    assert(got("ab") == "ab </w>")
  }

  test("wordFreq initializes character symbols with the end marker") {
    val docs = Seq((1L, "The cat the"), (2L, "cat")).toDF("doc_id", "text")
    val got = BpeOps.wordFreq(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      ("the", 2L, "t h e </w>"),
      ("cat", 2L, "c a t </w>")))
  }

  test("training on a known corpus learns the expected first merges") {
    val docs = Seq((1L, "aa aa aa ab")).toDF("doc_id", "text")
    val zones = graft.io.Zones(
      java.nio.file.Files.createTempDirectory("bpe_spec").toString)
    BpeOps.train(spark, zones, docs, "text", steps = 2)
    val merges = zones.read(spark, "work", "merges_2")
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    // pairs in "a a </w>"x3 + "a b </w>": (a,a)x3, (a,</w>)x3, (a,b)x1,
    // (b,</w>)x1 -> ties between "a a" and "a </w>" break lexicographically
    // ("a </w>" < "a a")
    assert(merges(0) == ((0L, "a", "</w>", 3L)))
    // after merging: "a a</w>"x3, "a b </w>"x1 -> best is (a, a</w>) x3
    assert(merges(1) == ((1L, "a", "a</w>", 3L)))
    val seg = zones.read(spark, "work", "words_2")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seg("aa") == "aa</w>")
    assert(seg("ab") == "a b </w>")
  }

  test("one merge round costs one window exchange plus the rebuild aggregate") {
    val ws = words(("abc", 2L, "a b c </w>"))
    val p = BpeOps.applyMerge(ws, best("a", "b"))
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("- Exchange"))
    // window partition-by-w exchange + groupBy(w, cnt) aggregate exchange
    assert(exchanges <= 2, s"expected <=2 shuffles per merge round, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), "merge application has a cartesian")
  }
}
