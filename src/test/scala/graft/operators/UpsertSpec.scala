package graft.operators

import graft.SparkSpec

/** MERGE-emulation semantics (J8-J11) over immutable Parquet. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge (J8): source wins on match, unmatched target survives, new rows insert") {
    val target = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val source = Seq(("b", 20L), ("c", 30L)).toDF("k", "v")
    val out = Upsert.merge(target, source, Seq("k")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1L, "b" -> 20L, "c" -> 30L))
  }

  test("merge overwrites with NULL source values on match (warehouse MERGE semantics)") {
    // WHEN MATCHED THEN UPDATE replaces the whole row with the source row,
    // NULLs included — the reference's swap/CONCEPT merge templates rely on
    // this (a coalesce would silently keep stale target values).
    val target = Seq(("a", Some(1L)), ("b", Some(2L))).toDF("k", "v")
    val source = Seq(("a", None: Option[Long])).toDF("k", "v")
    val out = Upsert.merge(target, source, Seq("k")).as[(String, Option[Long])].collect().toMap
    assert(out("a").isEmpty)
    assert(out("b").contains(2L))
  }

  test("mergeDelete (J9) removes matching keys only") {
    val target = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    val deletes = Seq(Tuple1("b"), Tuple1("z")).toDF("k")
    val out = Upsert.mergeDelete(target, deletes, Seq("k")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1L, "c" -> 3L))
  }

  test("updateFromJoin (J10): matched rows take the new value, unmatched keep their own") {
    val target = Seq(("a", 1L), ("b", 2L)).toDF("k", "conceptId")
    val updates = Seq(("a", 100L)).toDF("k", "newId")
    val out = Upsert.updateFromJoin(target, updates, Seq("k"), "conceptId", "newId")
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 100L, "b" -> 2L))
  }

  test("withScalar (J11) attaches a 1-row aggregate to every row") {
    val df = Seq("a", "b", "c").toDF("k")
    val scalar = Seq(Tuple1(42L)).toDF("max_y")
    val out = Upsert.withScalar(df, scalar)
    assert(out.count() == 3)
    assert(out.select("max_y").distinct().as[Long].head() == 42L)
  }

  test("merge refuses a fact-sized target (small-table contract, via plan stats)") {
    // spark.range carries exact Catalyst statistics — ~16 GiB here — so the
    // guard trips before any job is scheduled
    val fact = spark.range(2000000000L).toDF("k")
      .withColumn("v", org.apache.spark.sql.functions.col("k"))
    val src = Seq((1L, 10L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(fact, src, Seq("k"))
    }
    assert(e.getMessage.contains("CTAS"))
    // raising the cap explicitly is the documented escape hatch
    assert(Upsert.merge(fact.limit(3), src, Seq("k")).columns.sameElements(Array("k", "v")))
  }
}
