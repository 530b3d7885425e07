package graft.tools

import org.apache.spark.sql.SparkSession

/** Generation-churn soak for the warehouse vacuum (r17): simulate N
  * store-key bumps of a synthetic versioned family (each generation = 3
  * zone tables, the derived-CDM store shape) and vacuum after every
  * bump — the evidence that the warehouse file count stays FLAT across
  * generations instead of growing linearly (the log-structured store's
  * production failure mode the vacuum exists to close). r18 adds the
  * retention-window check: two further bumps run with keepPriorGens = 1
  * and the soak REQUIRES the newest prior generation to survive exactly
  * one cycle and retire on the next. Also reports what the vacuum
  * retires from the REAL warehouse's registered families, current
  * stores untouched. Run:
  * `sbt "runMain graft.tools.VacuumSoak"`.
  */
object VacuumSoak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = graft.io.Zones.defaultRoot
    val fam = (g: Int) => graft.io.StoreVacuum.Family("vacsoak", s"vacsoak$g")
    for (g <- 1 to 8) {
      val z = graft.io.Zones.forPurpose(s"vacsoak$g")
      for (t <- Seq("alpha", "beta", "gamma"))
        z.write(spark.range(0, 1000).select(
          (org.apache.spark.sql.functions.col("id") * g).as("v")), "work", t)
      val dropped = graft.io.StoreVacuum.vacuum(spark, root, Seq(fam(g)))
      val after = graft.io.StoreVacuum.familyFileCount(spark, root, fam(g))
      // every generation writes the identical shape, so the no-vacuum
      // counterfactual is exactly g * per-generation files
      println(f"""{"gen":$g,"dropped_dirs":${dropped.size},"files_after_vacuum":$after,"files_without_vacuum":${g * after}}""")
    }
    // (r18) the RETENTION WINDOW: with keepPriorGens = 1 the newest prior
    // generation survives exactly one cycle after a bump and retires on
    // the next — the concurrent-reader grace period. Generations 9 and 10
    // bump with --keep 1 semantics; after the gen-10 vacuum, gen 9 must
    // survive and gen 8 must be gone.
    for (g <- 9 to 10) {
      val z = graft.io.Zones.forPurpose(s"vacsoak$g")
      z.write(spark.range(0, 100).select(
        (org.apache.spark.sql.functions.col("id") * g).as("v")), "work", "alpha")
      val dropped = graft.io.StoreVacuum.vacuum(spark, root, Seq(fam(g)),
        keepPriorGens = 1)
      val live = graft.io.StoreVacuum.listPurposes(spark, root)
        .filter(_.startsWith("vacsoak"))
      println(s"""{"gen":$g,"keep":1,"dropped":[${dropped.map("\"" + _ + "\"").mkString(",")}],"live":[${live.map("\"" + _ + "\"").mkString(",")}]}""")
      if (g == 10) {
        require(live.contains("vacsoak9") && !live.contains("vacsoak8"),
          s"retention window broken: $live")
      }
    }
    // retire the soak family: vacuum at a generation that owns nothing on
    // disk, so every written generation is superseded
    graft.io.StoreVacuum.vacuum(spark, root, Seq(fam(11)))
    // (r19, VERDICT #2) the ANN serving-tier purposes are DECLARED
    // ephemeral (rebuilt unconditionally at each owning entry's start):
    // stage one zone dir per serving purpose plus a `dedup`-purpose
    // table beside them, vacuum with the real registry, and REQUIRE the
    // serving dirs retired while the shared unversioned `dedup` scratch
    // (which hosts the per-JVM memoized ivf_index tables) survives
    locally {
      for (p <- Seq("ivfgrow_soak", "ivfcomp_soak", "annserve_soak"))
        graft.io.Zones.forPurpose(p).write(
          spark.range(0, 10).toDF("v"), "work", "probe")
      graft.io.Zones.forPurpose("dedup").write(
        spark.range(0, 10).toDF("v"), "work", "vacsoak_probe")
      val dropped = graft.io.StoreVacuum.vacuum(spark, root,
        graft.queries.LifecycleQueries.storeFamilies,
        graft.queries.LifecycleQueries.ephemeralPurposes)
      val live = graft.io.StoreVacuum.listPurposes(spark, root)
      require(Seq("ivfgrow_soak", "ivfcomp_soak", "annserve_soak")
          .forall(p => dropped.contains(p) && !live.contains(p)),
        s"serving-tier ephemeral purposes not retired: dropped=$dropped live=$live")
      require(live.contains("dedup"),
        s"the shared dedup scratch must survive the vacuum: $live")
      println(s"""{"mode":"serving_tier_ephemeral","dropped":[${dropped.map("\"" + _ + "\"").mkString(",")}],"dedup_survives":true}""")
    }
    // the REAL warehouse: retire superseded generations of the registered
    // families (dry-run listing printed, then applied)
    val fams = graft.queries.LifecycleQueries.storeFamilies
    val eph = graft.queries.LifecycleQueries.ephemeralPurposes
    val all = graft.io.StoreVacuum.listPurposes(spark, root)
    val doomed = graft.io.StoreVacuum.plan(all, fams, eph)
    val droppedReal = graft.io.StoreVacuum.vacuum(spark, root, fams, eph)
    val kept = graft.io.StoreVacuum.listPurposes(spark, root)
    println(s"""{"real_purposes_before":${all.size},"superseded_dropped":${droppedReal.size},"purposes_after":${kept.size},"plan_matched_drop":${doomed == droppedReal}}""")
    println(s"""{"dropped":[${droppedReal.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
  }
}
