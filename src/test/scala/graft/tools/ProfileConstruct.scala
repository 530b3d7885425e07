package graft.tools

import graft.model.Cdm54
import graft.operators.DqdChecks
import org.apache.spark.sql.{Row, SparkSession}

/** Dev-only: split dqd_cdm54_battery CONSTRUCT time between the FK-join
  * folds (+ join-derived families) and the wide aggregate/explode branches.
  * Run: sbt "Test/runMain graft.tools.ProfileConstruct"
  */
object ProfileConstruct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("profile-construct")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val m = Cdm54.model
    val mNoFk = m.copy(fields = m.fields.map(_.copy(fkTable = None)))
    def empty(model: graft.model.CdmModel) = model.tables.map { tb =>
      tb -> spark.createDataFrame(
        java.util.Collections.emptyList[Row](), model.sparkSchema(tb))
    }.toMap
    def rules(model: graft.model.CdmModel) = DqdChecks.RuleSet(
      startEnd = DqdChecks.startEndRules(model),
      completeness = DqdChecks.personCompletenessRules(model),
      temporal = DqdChecks.afterBirthRules(model),
      duringLife = DqdChecks.duringLifeRules(model),
      withinVisit = DqdChecks.withinVisitRules(model),
      conceptAttrs = DqdChecks.standardConceptRules(model))
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 3).foreach { i =>
      println(s"round $i")
      val eFull = empty(m)
      val eNoFk = empty(mNoFk)
      time("full (joins + families)")(DqdChecks.fieldLevel(m, eFull(_), rules(m)))
      time("no FKs (agg/explode only)")(DqdChecks.fieldLevel(mNoFk, eNoFk(_), rules(mNoFk)))
    }
    spark.stop()
  }
}
