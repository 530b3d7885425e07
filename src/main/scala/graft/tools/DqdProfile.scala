package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase profile of the data-free `dqd_cdm54_battery` (guide §1: measure
  * before touching): rule generation, plan construction, analysis,
  * optimization, physical planning, and execution are timed separately on
  * the same forked interpreted session the registered query uses.
  *
  * Usage: runMain graft.tools.DqdProfile <sfDir>
  */
object DqdProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.out.println(f"[dqdprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      System.out.println(s"[dqdprofile] --- round $round ---")
      val m = graft.model.Cdm54.model
      val rules = ms("cdm54Rules")(graft.queries.LifecycleQueries.cdm54Rules)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.codegen.wholeStage", "false")
      s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      val empty = m.tables.map { tb =>
        tb -> s2.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), m.sparkSchema(tb))
      }.toMap
      val plan = ms("build (DataFrame construction + analysis)")(
        graft.operators.DqdChecks.fieldLevel(m, tb => empty(tb).coalesce(1), rules)
          .coalesce(1).sortWithinPartitions("check_id"))
      val qe = plan.queryExecution
      ms("optimizedPlan")(qe.optimizedPlan)
      ms("executedPlan")(qe.executedPlan)
      val rows = ms("collect")(plan.collect())
      System.out.println(s"[dqdprofile] rows=${rows.length}")
      if (round == 2) {
        // per-rule cumulative time over the warm round — names the
        // analyzer/optimizer rules the battery actually pays for
        System.out.println(
          org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
            .linesIterator.take(30).mkString("\n"))
      } else
        org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    }
    spark.stop()
  }
}
