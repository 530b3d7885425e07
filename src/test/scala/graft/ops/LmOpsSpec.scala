package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bigram-LM perplexity filter: add-one smoothing against
  * hand-computed values, backoff tiers, and the salted-join plan shape.
  */
class LmOpsSpec extends SparkSpec {

  // target (docs 1-2): uni a:3 b:2 c:1 x:1 -> V=4; bi "a b":3 "b a":1
  // "b c":1 "b x":1. doc 3 is scored out-of-domain.
  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "z z a q"))
      .toDF("doc_id", "text")
  }
  private val target = col("doc_id") <= 2

  test("topBigrams carries add-one-smoothed log-probs") {
    val top = LmOps.topBigrams(docs, "text", target, 10).collect()
    assert(top.head.getString(0) === "a b")
    assert(top.head.getLong(1) === 3L)
    // ln((3+1)/(3+4)) = -0.5596158 -> micro-quantized -0.559616
    assert(top.head.getDouble(2) === -0.559616)
    assert(top.length === 4)
  }

  test("perplexityFilter scores all three backoff tiers exactly") {
    val r = LmOps.perplexityFilter(docs, "doc_id", "text", target, 10)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // doc1: 2*q(ln(4/7)) + q(ln(2/7)) + q(ln(2/7)) over 4 bigrams
    // (uni counts a:3 b:3 c:1 x:1, V=4)
    assert(r(1L) === ((4L, 0.9062)))
    // doc3: unseen-history z twice (ln(1/4)) + unseen bigram after a
    // (ln(1/(3+4))) over 3 bigrams
    assert(r(3L) === ((3L, 1.5728)))
    // the filter ranks in-domain docs ahead of the out-of-domain one
    val ranked = LmOps.perplexityFilter(docs, "doc_id", "text", target, 10)
      .collect().map(_.getLong(0))
    assert(ranked.last === 3L)
  }

  test("the LM join is salted and cartesian-free") {
    val plan = LmOps.perplexityPlan(docs, "doc_id", "text", target, 10)
      ._1.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt key missing from the LM join")
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop is the broadcast of the 1x1 vocab scalar
    val bnl = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnl <= 1, s"unexpected nested loops ($bnl)")
  }
}
