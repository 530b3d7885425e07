package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The trainable quality classifier: convergence on a separable fixture,
  * deterministic (quantized) training trajectories, serving shape.
  */
class ClassifyOpsSpec extends SparkSpec {

  // long stopword-rich docs (label 1 under the quality heuristic) vs short
  // stopword-free fragments (label 0) — linearly separable by construction
  private lazy val docs = {
    import spark.implicits._
    val good = (1 to 40).map(i =>
      (i.toLong, ("the quick data of a table to scan in full is " * 12) + i))
    val bad = (41 to 80).map(i => (i.toLong, s"frag$i xyz"))
    (good ++ bad).toDF("doc_id", "text")
  }

  test("training converges on a separable corpus") {
    val eval = ClassifyOps.qualityLrEval(docs, "text",
      ClassifyOps.label(col("text"))).head()
    assert(eval.getLong(0) === 80L)
    assert(eval.getDouble(1) === 0.5) // half good, half bad
    assert(eval.getDouble(2) >= 0.95, s"train accuracy ${eval.getDouble(2)}")
  }

  test("the quantized trajectory is deterministic across runs") {
    val w1 = ClassifyOps.trainQualityLr(docs, "text", ClassifyOps.label(col("text")))
    val w2 = ClassifyOps.trainQualityLr(docs, "text", ClassifyOps.label(col("text")))
    assert(w1.toSeq === w2.toSeq)
    // weights carry at most 12 decimals (the per-step re-quantization)
    w1.foreach { w =>
      assert(BigDecimal(w).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble === w)
    }
  }

  test("serving keeps the top k with the id tiebreak") {
    val top = ClassifyOps.qualityLrTopK(docs, "doc_id", "text",
      ClassifyOps.label(col("text")), 10).collect()
    assert(top.length === 10)
    // the separable fixture's top ranks are all "good" docs (ids 1-40)
    assert(top.forall(_.getLong(0) <= 40L))
    val scores = top.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_.doubleValue)))
  }

  test("the per-iteration aggregate plans a single global aggregate, no row shuffle") {
    val f = docs.select(ClassifyOps.label(col("text")).cast("double").as("__y") +:
      ClassifyOps.features(col("text")).zipWithIndex
        .map { case (c, j) => c.as(s"__x$j") }: _*)
    val plan = f.agg(sum(col("__x1")).as("s")).queryExecution.executedPlan.toString
    // partial -> exchange(single partition) -> final: exactly one exchange
    assert(plan.linesIterator.count(_.contains("Exchange")) === 1, plan)
  }
}
