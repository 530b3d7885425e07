package graft.operators

import graft.SparkSpec

/** The Achilles Heel rule corpus over hand-built results/dist report
  * fixtures: each rule family fires exactly where its predicate holds and
  * stays silent where it doesn't, with the published message shape.
  */
class OhdsiHeelSpec extends SparkSpec {

  import spark.implicits._

  private def nullS = null.asInstanceOf[String]

  // results fixture: (analysis_id, stratum_1, stratum_2, count_value)
  //  - 207 (invalid person fk) present -> rule 1 ERROR
  //  - 209 (end before start) present -> rule 2 ERROR
  //  - 801 with 3 of 20 records unmapped (15% > 10%) -> rule 5 WARNING
  //  - 401 with 1 of 20 unmapped (5% < 10%) -> NO rule 5 row
  //  - 201 (plain records-by-concept, no zero stratum) -> silent
  private lazy val results = Seq(
    (207L, "ALL", nullS, 42L),
    (209L, "ALL", nullS, 7L),
    (801L, "0", nullS, 3L),
    (801L, "40766929", nullS, 17L),
    (401L, "0", nullS, 1L),
    (401L, "201826", nullS, 19L),
    (201L, "9201", nullS, 100L)
  ).toDF("analysis_id", "stratum_1", "stratum_2", "count_value")

  // dist fixture: only the columns the rules touch matter; the battery
  // schema carries more (moments, percentiles) — heel must not depend on
  // them, so the fixture includes a decoy extra column
  //  - 103 max age 190 -> rule 6; 104 max age 88 -> silent
  //  - 506 max 130 -> rule 7 (two violating strata -> record_count 2)
  //  - 211 min -3 -> rule 9
  //  - no row with min > max -> rule 8 silent
  private lazy val dists = Seq(
    (103L, "ALL", nullS, 10L, 5.0, 190.0, 1.0),
    (104L, "8507", nullS, 10L, 5.0, 88.0, 1.0),
    (506L, "8507", nullS, 10L, 60.0, 130.0, 1.0),
    (506L, "8532", nullS, 10L, 60.0, 121.0, 1.0),
    (211L, "9201", nullS, 10L, -3.0, 9.0, 1.0)
  ).toDF("analysis_id", "stratum_1", "stratum_2", "count_value",
    "min_value", "max_value", "median_value")

  private lazy val heel =
    OhdsiAchilles.heelResults(spark, results, dists)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._3, t._1))

  test("count rules fire with the published message shape") {
    val r1 = heel.filter(_._3 == 1L)
    assert(r1.map(t => (t._1, t._4)).toSeq == Seq((207L, 42L)))
    assert(r1.head._2 ==
      "ERROR: 207 - Number of visit occurrence records with invalid person_id; " +
        "count (n=42) should not be > 0 (invalid foreign key)")
    assert(heel.filter(_._3 == 2L).map(t => (t._1, t._4)).toSeq == Seq((209L, 7L)))
  }

  test("unmapped rule respects the 10% threshold") {
    val r5 = heel.filter(_._3 == 5L)
    // 801 at 15% fires with the unmapped count; 401 at 5% and 201 with no
    // zero stratum stay silent
    assert(r5.map(t => (t._1, t._4)).toSeq == Seq((801L, 3L)))
    assert(r5.head._2.contains("unmapped (concept_id = 0) records exceed 10%"))
  }

  test("dist rules count violating strata only") {
    assert(heel.filter(_._3 == 6L).map(t => (t._1, t._4)).toSeq == Seq((103L, 1L)))
    assert(heel.filter(_._3 == 7L).map(t => (t._1, t._4)).toSeq == Seq((506L, 2L)))
    assert(heel.filter(_._3 == 8L).isEmpty) // min <= max everywhere
    assert(heel.filter(_._3 == 9L).map(t => (t._1, t._4)).toSeq == Seq((211L, 1L)))
  }

  test("concept counts roll descendants up through the closure") {
    // x00 (400) person counts and x01 (401) record counts for two
    // condition concepts; 441840 is their closure ancestor with no rows
    // of its own
    val res = Seq(
      (400L, "201826", nullS, 10L),
      (400L, "316866", nullS, 7L),
      (401L, "201826", nullS, 100L),
      (401L, "316866", nullS, 70L)
    ).toDF("analysis_id", "stratum_1", "stratum_2", "count_value")
    val got = OhdsiAchilles.resultConceptCounts(spark, res)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (201826L, 100L, 100L, 10L, 10L),
      (316866L, 70L, 70L, 7L, 7L),
      (441840L, 0L, 170L, 0L, 17L)))
  }

  test("rule/oracle sides are generated from one rule table") {
    // the oracle embeds every rule id and the exact suffix text the Spark
    // side renders — spot-check a few load-bearing fragments
    val o = graft.queries.OhdsiCdmQueries.heelOracle
    OhdsiAchilles.Heel.countRules.foreach { r =>
      assert(o.contains(r.suffix), s"oracle misses suffix of rule ${r.ruleId}")
    }
    OhdsiAchilles.Heel.distRules.foreach { r =>
      assert(o.contains(r.predicate) && o.contains(r.suffix))
    }
    assert(o.contains(OhdsiAchilles.Heel.UnmappedSuffix))
  }
}
