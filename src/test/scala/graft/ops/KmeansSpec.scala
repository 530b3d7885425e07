package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lloyd k-means: convergence on separable data, the deterministic
  * lowest-id initialization, the (distance, id) tie-break, and the
  * empty-cluster-keeps-its-centroid rule.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups on orthogonal axes; ids 0 and 1 (the init seeds) sit
  // one in each group, so two steps converge exactly
  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(1.1f, -0.1f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 0.1f, 0.9f, 0.0f)),
    (5L, Seq(0.0f, -0.1f, 1.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("separable groups converge to their member means") {
    val out = SimOps.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(out.keySet === Set(0L, 1L))
    assert(out(0L)._2 === 3L && out(1L)._2 === 3L)
    // centroid 0 = mean of vectors 0/2/3 (9dp rounding)
    assert(out(0L)._1.head === 1.0 && math.abs(out(0L)._1(1)) < 1e-9)
    assert(out(1L)._1(2) === 1.0)
  }

  test("zero iterations returns the lowest-id seeds verbatim") {
    val out = SimOps.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 0)
      .orderBy("centroid_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(out(0).getSeq[Double](1) === Seq(1.0, 0.0, 0.0, 0.0))
    assert(out(1).getSeq[Double](1) === Seq(0.0, 0.0, 1.0, 0.0))
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L)) // never assigned
  }

  test("an emptied cluster keeps its previous centroid") {
    // k=3: seed 2 (0.9, 0.1, ...) loses every member to seed 0 by the
    // first update's pull toward the group mean, then stays frozen
    val allNearA = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(1.01f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(0.99f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = SimOps.kmeans(allNearA, "vec_id", "embedding", k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(out.size === 3)
    val empties = out.filter(_._2._2 == 0L)
    // any emptied cluster still reports a well-formed centroid vector
    empties.values.foreach { case (cv, _) => assert(cv.length === 4) }
    assert(out.values.map(_._2).sum === 5L) // every vector assigned once
  }

  test("per-step state is bounded: the plan joins a k-row broadcast") {
    val plan = SimOps.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 1)
      .queryExecution.executedPlan.toString
    // the returned frame is a local k-row relation joined to the bounded
    // member counts — no corpus-sized subtree survives into the result
    assert(!plan.contains("Exchange hashpartitioning(vec_id"), plan)
  }
}
