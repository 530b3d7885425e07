package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** §2.12-5 composed merge pipeline, incl. the J2 null-normalized compound
  * key that only exists composed.
  */
class MergePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("J2 conflates NULL with the 0 default on both sides (IFNULL join semantics)") {
    // upload k2's code is unmapped (usagi row FLAGGED) -> conceptId NULL;
    // the swap stores concept 0 for k2 — IFNULL equality MUST match them
    // (null-safe <=> would not), reproducing merge.sql.jinja:86-94.
    val uploads = Seq(
      ("k1", "a", 10L, "s1"),
      ("k2", "z", 20L, "s2")).toDF("pk", "code", "fkv", "src")
    val usagi = Seq(
      ("a", 100L, "APPROVED"),
      ("z", 900L, "FLAGGED")).toDF("sourceCode", "conceptId", "mappingStatus")
    val pkSwap = Seq(
      ("k1", Some(100L), 1L),
      ("k2", Some(0L), 2L)).toDF("x", "code_concept_id", "y")
    val fkSwap = Seq((10L, 7L)).toDF("x", "y")

    val out = MergePipeline.run(
      uploads = Seq(uploads),
      pkCol = "pk",
      newPkName = "id",
      pkSwap = pkSwap,
      concepts = Seq(ConceptSwapSpec("code", "code_concept_id", usagi)),
      fks = Seq(FkSwapSpec("fkv", fkSwap, required = true)),
      sourceValue = Some(("src", "source_values")),
      preserved = None)
      .select("id", "code_concept_id", "fkv", "source_values")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(out(1L) == ((100L, 7L, "s1")))  // mapped concept, fk swapped
    assert(out(2L) == ((0L, 0L, "s2")))    // NULL concept == swap's 0; fk miss -> 0
  }

  test("duplicate uploads collapse to one row with aggregated source values") {
    val u1 = Seq(("k1", "a", 1L, "from_u1")).toDF("pk", "code", "fkv", "src")
    val u2 = Seq(("k1", "a", 1L, "from_u2")).toDF("pk", "code", "fkv", "src")
    val usagi = Seq(("a", 100L, "APPROVED")).toDF("sourceCode", "conceptId", "mappingStatus")
    val pkSwap = Seq(("k1", Some(100L), 1L)).toDF("x", "code_concept_id", "y")
    val out = MergePipeline.run(
      Seq(u1, u2), "pk", "id", pkSwap,
      Seq(ConceptSwapSpec("code", "code_concept_id", usagi)),
      Seq(FkSwapSpec("fkv", Seq((1L, 5L)).toDF("x", "y"), required = true)),
      Some(("src", "source_values")), None)
    assert(out.count() == 1)
    assert(out.select("source_values").as[String].head() == "from_u1,from_u2")
  }

  test("preserved rows union through untouched (U2 vocabulary tail)") {
    val u = Seq(("k1", "a", 1L, "s")).toDF("pk", "code", "fkv", "src")
    val usagi = Seq(("a", 100L, "APPROVED")).toDF("sourceCode", "conceptId", "mappingStatus")
    val pkSwap = Seq(("k1", Some(100L), 1L)).toDF("x", "code_concept_id", "y")
    val preserved = Seq((-5L, 0L, 0L, "preserved")).toDF("id", "code_concept_id", "fkv", "source_values")
    val out = MergePipeline.run(
      Seq(u), "pk", "id", pkSwap,
      Seq(ConceptSwapSpec("code", "code_concept_id", usagi)),
      Seq(FkSwapSpec("fkv", Seq((1L, 5L)).toDF("x", "y"), required = true)),
      Some(("src", "source_values")), Some(preserved))
    assert(out.count() == 2)
    assert(out.filter(col("id") === -5L).select("source_values").as[String].head() == "preserved")
  }
}
