package graft.operators

import graft.SparkSpec
import graft.model.TpchModel
import org.apache.spark.sql.functions._

/** D5 cascade semantics + D7 tombstoning. */
class CleanupSpec extends SparkSpec {
  import spark.implicits._

  test("cascadeTables = target plus every table in later dependency levels") {
    val m = TpchModel.model
    assert(Cleanup.cascadeTables(m, m.tables, "nation") ==
      Seq("nation", "customer", "supplier", "orders", "lineitem"))
    assert(Cleanup.cascadeTables(m, m.tables, "orders") == Seq("orders", "lineitem"))
    assert(Cleanup.cascadeTables(m, m.tables, "lineitem") == Seq("lineitem"))
    // cleaning a level-0 table takes everything after it
    assert(Cleanup.cascadeTables(m, m.tables, "region").head == "region")
    assert(Cleanup.cascadeTables(m, m.tables, "region").size == m.tables.size - 1) // part shares level 0
  }

  test("removeCustomConcepts drops ids >= 2e9 only") {
    val df = Seq(1L, 1999999999L, 2000000000L, 2000000005L).toDF("concept_id")
    assert(Cleanup.removeCustomConcepts(df, "concept_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1999999999L))
  }

  test("tombstoneStale marks only pre-etl-start rows as deleted") {
    val s2cm = Seq(
      ("a", java.sql.Date.valueOf("1994-01-01"), Some("X")),
      ("b", java.sql.Date.valueOf("1996-01-01"), None: Option[String]))
      .toDF("source_code", "valid_start_date", "invalid_reason")
    val out = Cleanup.tombstoneStale(s2cm, lit("1995-06-01").cast("date"))
      .select("source_code", "invalid_reason")
      .as[(String, Option[String])].collect().toMap
    assert(out("a").contains("D"))  // stale: overwritten with 'D'
    assert(out("b").isEmpty)        // fresh: untouched
  }
}
