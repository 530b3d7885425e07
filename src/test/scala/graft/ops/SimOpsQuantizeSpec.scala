package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimOpsQuantizeSpec extends SparkSpec {

  test("int8 quantization maps min->0, max->255, everything in range") {
    val s = spark
    import s.implicits._
    val embs = Seq(
      (1L, Array(0.0f, -1.0f, 5.0f)),
      (2L, Array(1.0f, 1.0f, 5.0f)),
      (3L, Array(0.5f, 3.0f, 5.0f))).toDF("vec_id", "embedding")
    val out = SimOps.quantizeUint8(embs, "vec_id", "embedding")
      .select("vec_id", "pos", "q").as[(Long, Long, Long)].collect()
    assert(out.forall { case (_, _, q) => q >= 0 && q <= 255 })
    val byPos = out.groupBy(_._2)
    // dim 0: min 0.0 (vec 1) -> 0, max 1.0 (vec 2) -> 255, 0.5 -> 128
    assert(byPos(0L).map(t => t._1 -> t._3).toMap === Map(1L -> 0L, 2L -> 255L, 3L -> 128L))
    // dim 2 is constant -> quantizes to 0 everywhere
    assert(byPos(2L).forall(_._3 == 0L))
  }
}
