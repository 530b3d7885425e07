package graft.functions

import graft.SparkSpec
import graft.ops.SimOps
import org.apache.spark.sql.functions._

/** r20: the native PQ encode vs the explode + broadcast-join +
  * min(struct) formulation it replaced — identical picks on ties,
  * short vectors, and null elements; registry reuse; codegen compiles.
  */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  // dim 8, m 2, dsub 4; codebook with a DUPLICATED subvector per
  // subspace (codes 1 and 2 identical) so distance ties exercise the
  // code-asc tie-break
  private def codebook = Seq(
    (0L, 0L, Seq(0.0, 0.0, 0.0, 0.0)),
    (0L, 1L, Seq(1.0, 1.0, 1.0, 1.0)),
    (0L, 2L, Seq(1.0, 1.0, 1.0, 1.0)),
    (0L, 3L, Seq(5.0, 5.0, 5.0, 5.0)),
    (1L, 0L, Seq(9.0, 9.0, 9.0, 9.0)),
    (1L, 1L, Seq(2.0, 2.0, 2.0, 2.0)),
    (1L, 2L, Seq(2.0, 2.0, 2.0, 2.0)),
    (1L, 3L, Seq(0.0, 0.0, 0.0, 0.0))
  ).toDF("sub", "code", "cvec")

  private def vecs = Seq(
    (1L, Seq[java.lang.Double](0.9, 1.1, 1.0, 1.0, 2.1, 1.9, 2.0, 2.0)), // ties codes 1/2 both subs
    (2L, Seq[java.lang.Double](0.1, 0.0, 0.0, 0.0, 8.8, 9.1, 9.0, 9.0)),
    (3L, Seq[java.lang.Double](5.0, 5.0, 4.9, 5.1, 0.2, 0.0, 0.0, 0.0)),
    (4L, Seq[java.lang.Double](1.0, 1.0, 1.0)),                          // SHORT: both slices mismatch
    (5L, Seq[java.lang.Double](1.0, 1.0, 1.0, 1.0, 2.0, null, 2.0, 2.0)) // null element in sub 1
  ).toDF("vec_id", "embedding")

  private def joinForm = {
    val dsub = 4
    val sv = vecs
      .select(col("vec_id"), explode(array((0 until 2).map { s =>
        struct(lit(s.toLong).as("sub"),
          slice(transform(col("embedding"), _.cast("double")), s * dsub + 1, dsub).as("sv"))
      }: _*)).as("__s"))
      .select(col("vec_id"), col("__s.sub").as("sub"), col("__s.sv").as("sv"))
    sv.join(broadcast(codebook), Seq("sub"))
      .withColumn("__dist", SimOps.l2sq(col("sv"), col("cvec")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("__dist"), col("code"))).as("__best"))
      .select(col("vec_id"), col("sub"), col("__best.code").as("code"))
  }

  test("picks identical to the explode + min(struct) join on ties, short vectors, null elements") {
    val viaJoin = joinForm.as[(Long, Long, Long)].collect().toSet
    val viaExpr = SimOps.pqCodes(vecs, "vec_id", "embedding", codebook, dim = 8, m = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaExpr == viaJoin,
      s"native encode diverged:\n  expr: $viaExpr\n  join: $viaJoin")
    // the tie rows really tie to the LOWER code, and degenerate slices
    // pick code 0 (null dist ranks first, code asc) — pin the fixture
    assert(viaJoin((1L, 0L, 1L)) && viaJoin((1L, 1L, 1L)))
    assert(viaJoin((4L, 0L, 0L)) && viaJoin((4L, 1L, 0L)))
    assert(viaJoin((5L, 1L, 0L)))
  }

  test("pq_encode compiles in the final plan and the registry reuses content") {
    val df = SimOps.pqCodes(vecs, "vec_id", "embedding", codebook, dim = 8, m = 2)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val stats = org.apache.spark.sql.execution.debug.codegenStringSeq(finalPlan)
    val subtrees = stats.filter(_._1.contains("pq_encode"))
    assert(subtrees.nonEmpty, s"pq_encode landed outside whole-stage codegen:\n$finalPlan")
    subtrees.foreach { case (subtree, _, st) =>
      assert(st.maxMethodCodeSize > 0 && st.maxMethodCodeSize < 65535,
        s"pq_encode subtree failed to compile:\n$subtree")
    }
    val before = PqBroadcasts.size
    SimOps.pqCodes(vecs, "vec_id", "embedding", codebook, dim = 8, m = 2).collect()
    assert(PqBroadcasts.size == before, "re-encoding the same codebook minted a new broadcast")
  }
}
