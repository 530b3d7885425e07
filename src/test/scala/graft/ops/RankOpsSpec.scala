package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 semantics: idf discrimination, length normalization, self-retrieval
  * on a tiny corpus, and the broadcast-only plan shape.
  */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple apple banana"),
    (3L, "durian elderberry fig grape honeydew kiwi lemon mango"),
    (4L, "apple durian"),
    (5L, "the the the the the the the the the the")
  ).toDF("doc_id", "text")

  test("rarer terms outscore common ones and tf saturates") {
    val out = RankOps.bm25TopK(docs, "doc_id", "text",
        Seq((100L, "durian")).toDF("qid", "qtext"), "qid", "qtext", k = 10)
      .orderBy("rk").collect()
    // only the two durian docs match; the shorter one scores higher
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 3L))
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("multi-term queries sum per-term contributions; top-k caps output") {
    val out = RankOps.bm25TopK(docs, "doc_id", "text",
        Seq((100L, "apple banana")).toDF("qid", "qtext"), "qid", "qtext", k = 2)
      .orderBy("rk").collect()
    assert(out.length == 2)
    // docs 1 and 2 carry both terms; doc 4 only apple
    assert(out.map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L)))
  }

  test("queries with no corpus terms produce no rows") {
    val out = RankOps.bm25TopK(docs, "doc_id", "text",
      Seq((100L, "zzz qqq")).toDF("qid", "qtext"), "qid", "qtext")
    assert(out.count() == 0)
  }

  test("plan: query terms and document frequencies broadcast; no term-keyed wide join") {
    val q = Seq((100L, "apple banana"), (200L, "durian")).toDF("qid", "qtext")
    // inspect the lazy plan (bm25TopK materializes its bounded result so it
    // can release the postings cache deterministically)
    val p = RankOps.bm25Plan(docs, "doc_id", "text", q, "qid", "qtext",
        k1 = 1.2, b = 0.75, k = 10)._1
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"no broadcast joins in bm25 plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"term-keyed wide join in bm25 plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in bm25 plan:\n$p")
  }
}
