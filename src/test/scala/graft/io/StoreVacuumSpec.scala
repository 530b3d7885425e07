package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Warehouse retention ([[StoreVacuum]]): superseded generations drop,
  * current generations and unregistered purposes survive, ephemeral
  * scratch retires wholesale, and the registry derives from the writers'
  * own constants.
  */
class StoreVacuumSpec extends SparkSpec {
  import StoreVacuum.Family

  test("plan keeps current generations and unregistered purposes, drops the rest") {
    val purposes = Seq(
      "ohdsicdm8_aaa", "ohdsicdm9_aaa", "ohdsicdm9_bbb", // two datasets, one stale
      "ohdsires8_285_aaa", "ohdsires9_288_aaa",
      "bpe1_aaa", "bkt1_aaa",
      "dedup", "dqd", "etl", "stream_ckpt_x",            // unregistered: untouched
      "compactsoak_1", "compactsoak_32")                  // ephemeral scratch
    val fams = Seq(
      Family("ohdsicdm", "ohdsicdm9"), Family("ohdsires", "ohdsires9_288"),
      Family("bpe", "bpe1"), Family("bkt", "bkt1"))
    val doomed = StoreVacuum.plan(purposes, fams, Seq("compactsoak"))
    assert(doomed == Seq("compactsoak_1", "compactsoak_32",
      "ohdsicdm8_aaa", "ohdsires8_285_aaa"))
  }

  test("generation matching is exact: a 2-digit version never shadows a prefix") {
    val f = Family("vac", "vac3")
    assert(f.owns("vac30_x") && !f.isCurrent("vac30_x"),
      "vac30 is a DIFFERENT (superseded) generation, not current vac3")
    assert(f.isCurrent("vac3") && f.isCurrent("vac3_x"))
    assert(!f.owns("vacuum_x"), "non-digit after prefix is not this family")
    intercept[IllegalArgumentException](Family("vac", "other1"))
  }

  test("owns requires the digits to end the purpose or be followed by '_' (ADVICE r17)") {
    val f = Family("bpe", "bpe2")
    assert(f.owns("bpe1") && f.owns("bpe1_key") && f.owns("bpe12_key"))
    // a FUTURE unrelated purpose that merely starts with prefix+digit
    // must never be claimed (it would be silently deleted as superseded)
    assert(!f.owns("bpe2json_x"), "prefix+digit+letters is NOT a generation")
    assert(!f.owns("bpe1k"), "digits must be the whole version segment")
  }

  test("keepPriorGens retains each family's N newest superseded generations") {
    val purposes = Seq("vac1_k", "vac2_k", "vac3_k", "vac4_k", "vac4_j",
      "other1_k", "compactsoak_8")
    val fams = Seq(Family("vac", "vac4"))
    // keep 1 prior generation: vac3 survives this cycle, vac1/vac2 retire
    assert(StoreVacuum.plan(purposes, fams, Seq("compactsoak"), keepPriorGens = 1) ==
      Seq("compactsoak_8", "vac1_k", "vac2_k"))
    // keep 2: vac2 and vac3 survive
    assert(StoreVacuum.plan(purposes, fams, Seq("compactsoak"), keepPriorGens = 2) ==
      Seq("compactsoak_8", "vac1_k"))
    // default 0 = immediate retire (the r17 behavior, oracle unchanged)
    assert(StoreVacuum.plan(purposes, fams, Seq("compactsoak")) ==
      Seq("compactsoak_8", "vac1_k", "vac2_k", "vac3_k"))
    // the window is per-GENERATION, not per-directory: both vac4 dataset
    // suffixes are current and never counted against the window
    assert(!StoreVacuum.plan(purposes, fams, Nil, keepPriorGens = 3).exists(_.startsWith("vac4")))
  }

  test("vacuum drops superseded zone roots on disk and is idempotent; current reads back") {
    val root = s"${Zones.defaultRoot}/vacspec_${System.nanoTime()}"
    import spark.implicits._
    for (g <- 1 to 3) {
      val z = Zones(s"$root/graft_zones_spec${g}_k")
      z.write(Seq((1L, g.toLong)).toDF("id", "v"), "work", "t")
    }
    // an unregistered neighbor must survive
    Zones(s"$root/graft_zones_scratch").write(Seq(1L).toDF("x"), "work", "t")
    val fams = Seq(Family("spec", "spec3"))
    val dropped = StoreVacuum.vacuum(spark, root, fams)
    assert(dropped == Seq("spec1_k", "spec2_k"))
    assert(StoreVacuum.listPurposes(spark, root) == Seq("scratch", "spec3_k"))
    // read-after-vacuum: the current generation's content is intact
    val v = Zones(s"$root/graft_zones_spec3_k").read(spark, "work", "t")
      .select(col("v")).head().getLong(0)
    assert(v == 3L)
    assert(StoreVacuum.vacuum(spark, root, fams).isEmpty, "second pass drops nothing")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("the registry reads the writers' current constants") {
    val fams = graft.queries.LifecycleQueries.storeFamilies
    assert(fams.map(_.prefix) == Seq("ohdsicdm", "ohdsires", "bpe", "bkt"))
    // the current generations are the ones the writers stamp today; the
    // assertion is on SHAPE (prefix + digit), not the literal version, so
    // a bump does not break this spec
    fams.foreach(f => assert(f.owns(f.current + "_somekey")))
    assert(fams.find(_.prefix == "ohdsires").get.current
      .matches(raw"ohdsires\d+_\d+"), "results store carries the catalog size")
  }
}
