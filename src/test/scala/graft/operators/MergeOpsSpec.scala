package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-pipeline semantics (§2.12-5): usagi/FK swap joins, null-normalized
  * keys, deterministic dedup, source_value aggregation, union-preserve.
  */
class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("usagiJoin (J1) maps only APPROVED rows; unmapped rows survive with nulls") {
    val upload = Seq(("s1", 10L), ("s2", 20L), ("s3", 30L)).toDF("code", "v")
    val usagi = Seq(
      ("s1", 101L, "APPROVED"),
      ("s2", 102L, "FLAGGED"),
      ("s9", 109L, "APPROVED")).toDF("sourceCode", "conceptId", "mappingStatus")
    val out = MergeOps.usagiJoin(upload, usagi, "code")
      .select($"code", $"conceptId").as[(String, Option[Long])].collect().toMap
    assert(out == Map("s1" -> Some(101L), "s2" -> None, "s3" -> None))
  }

  test("usagiJoin honors SEMI-APPROVED when enabled (P2)") {
    val upload = Seq(Tuple1("s2")).toDF("code")
    val usagi = Seq(("s2", 102L, "SEMI-APPROVED")).toDF("sourceCode", "conceptId", "mappingStatus")
    val strict = MergeOps.usagiJoin(upload, usagi, "code")
    val lax = MergeOps.usagiJoin(upload, usagi, "code", Seq("APPROVED", "SEMI-APPROVED"))
    assert(strict.filter($"conceptId".isNotNull).count() == 0)
    assert(lax.filter($"conceptId".isNotNull).count() == 1)
  }

  test("fkSwapJoin (J3/P3): required FK defaults to 0, optional keeps null") {
    val df = Seq(("r1", "k1"), ("r2", "k2"), ("r3", null)).toDF("id", "fk")
    val swap = Seq(("k1", 11L)).toDF("x", "y")
    val req = MergeOps.fkSwapJoin(df, swap, "fk", required = true)
      .select($"id", $"fk").as[(String, Long)].collect().toMap
    assert(req == Map("r1" -> 11L, "r2" -> 0L, "r3" -> 0L))
    val opt = MergeOps.fkSwapJoin(df, swap, "fk", required = false)
      .select($"id", $"fk").as[(String, Option[Long])].collect().toMap
    assert(opt == Map("r1" -> Some(11L), "r2" -> None, "r3" -> None))
  }

  test("nullNormEq conflates NULL with the default like the reference IFNULL join") {
    val df = Seq((Some(0L), None: Option[Long]), (Some(1L), Some(1L)), (Some(1L), Some(2L)))
      .toDF("a", "b")
    val out = df.select(MergeOps.nullNormEq($"a", $"b", lit(0L)).as("eq")).as[Boolean].collect()
    assert(out.toSeq == Seq(true, true, false)) // NULL==0 under IFNULL semantics
  }

  test("dedupKeepFirst (W3) keeps exactly one deterministic row per natural key") {
    val df = Seq((1L, "b", 2.0), (1L, "a", 1.0), (2L, "z", 9.0)).toDF("pk", "s", "v")
    val out = MergeOps.dedupKeepFirst(df, Seq("pk"))
    assert(out.count() == 2)
    // survivor = smallest by the ORDER BY over all non-key columns (T-SQL variant)
    assert(out.filter($"pk" === 1L).select($"s").as[String].head() == "a")
  }

  test("property: dedupKeepFirstSalted is bit-identical to dedupKeepFirst under skew") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // heavily skewed: most rows share one hot key
    val rowGen = for {
      pk <- Gen.frequency(8 -> Gen.const(42L), 2 -> Gen.chooseNum(1L, 5L))
      s <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.chooseNum(0, 1000)
    } yield (pk, s, v)
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows: List[(Long, String, Int)] =>
      val df = rows.toDF("pk", "s", "v")
      val plain = MergeOps.dedupKeepFirst(df, Seq("pk"))
        .as[(Long, String, Int)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
      val salted = MergeOps.dedupKeepFirstSalted(df, Seq("pk"), salts = 4)
        .as[(Long, String, Int)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
      plain == salted
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("sourceValueAgg (W5) aggregates sorted source values capped at 255 chars") {
    val df = Seq((1L, "bb"), (1L, "aa"), (2L, "x" * 300)).toDF("pk", "src")
    val out = MergeOps.sourceValueAgg(df, Seq("pk"), "src", "source_value")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "aa,bb")
    assert(out(2L).length == 255)
  }

  test("unionPreserve (U2/P6) keeps standard-vocabulary rows, replaces custom") {
    val merged = Seq((2000000001L, "new")).toDF("concept_id", "name")
    val existing = Seq((5L, "std"), (2000000007L, "old-custom")).toDF("concept_id", "name")
    val out = MergeOps.unionPreserve(
      merged, existing, !MergeOps.isCustomConcept($"concept_id"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(2000000001L -> "new", 5L -> "std"))
  }

  test("unionUploads (U1) unions by name across column orders") {
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq(("y", 2L)).toDF("s", "id")
    val out = MergeOps.unionUploads(Seq(a, b)).select($"id", $"s")
    assert(out.as[(Long, String)].collect().toSet == Set((1L, "x"), (2L, "y")))
  }
}
