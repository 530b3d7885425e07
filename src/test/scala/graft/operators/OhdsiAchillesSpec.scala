package graft.operators

import graft.SparkSpec
import graft.model.{CdmField, CdmModel}
import org.apache.spark.sql.DataFrame

/** The literal OHDSI Achilles id layer over small CDM fixtures: catalog
  * shape, core count battery ids/values, core dist battery moments.
  */
class OhdsiAchillesSpec extends SparkSpec {

  private def f(t: String, n: String, dt: String) =
    CdmField(t, n, dt, required = false, isPk = false, None, "CDM")

  private lazy val model = CdmModel(fields = Seq(
    f("person", "person_id", "int64"), f("person", "gender_concept_id", "int64"),
    f("person", "year_of_birth", "int64"), f("person", "race_concept_id", "int64"),
    f("person", "ethnicity_concept_id", "int64"),
    f("observation_period", "person_id", "int64"),
    f("observation_period", "observation_period_start_date", "date"),
    f("observation_period", "observation_period_end_date", "date"),
    f("visit_occurrence", "person_id", "int64"),
    f("visit_occurrence", "visit_concept_id", "int64"),
    f("condition_occurrence", "person_id", "int64"),
    f("condition_occurrence", "condition_concept_id", "int64"),
    f("condition_occurrence", "condition_type_concept_id", "int64")))

  private def d(s: String) = java.sql.Date.valueOf(s)

  private lazy val tables: Map[String, DataFrame] = {
    import spark.implicits._
    val person = (1L to 8L).map(i =>
        (i, if (i <= 7) 8507L else 8532L, if (i == 8) 1990L else 1980L, 8527L, 38003564L))
      .toDF("person_id", "gender_concept_id", "year_of_birth",
        "race_concept_id", "ethnicity_concept_id")
    // person 1 has a SECOND, later period (999 days) — 113 counts it, and
    // the "first period" dist analyses must ignore it (min_by start)
    val obs = ((1L to 8L).map(i => (i, d("2010-01-01"),
        new java.sql.Date(d("2010-01-01").getTime + (if (i == 1) 50 else 10 * i) * 86400000L))) :+
      ((1L, d("2015-01-01"), new java.sql.Date(d("2015-01-01").getTime + 999 * 86400000L))))
      .toDF("person_id", "observation_period_start_date", "observation_period_end_date")
    // persons 1-3 also get an ER visit (9203) so the 203 distinct-concept
    // dist has a non-degenerate value set {1, 2}
    val visits = ((1L to 8L).flatMap(i => Seq.fill(i.toInt)((i, 9201L))) ++
      (1L to 3L).map(i => (i, 9203L)))
      .toDF("person_id", "visit_concept_id")
    // person 1 carries a SECOND condition concept (403 distinct count 2);
    // types split 32020 (EHR, persons 1-4) / 32840 (problem list, 5-6)
    val conditions = ((1L to 6L).map(i =>
        (i, 201826L, if (i <= 4L) 32020L else 32840L)) :+ ((1L, 316866L, 32020L)))
      .toDF("person_id", "condition_concept_id", "condition_type_concept_id")
    Map("person" -> person, "observation_period" -> obs,
      "visit_occurrence" -> visits, "condition_occurrence" -> conditions)
  }

  private def resultMap(df: DataFrame): Map[(Long, String, String), Long] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse("")) -> r.getLong(3)).toMap

  /** Three-strata view (the 116 family). */
  private def resultMap3(df: DataFrame): Map[(Long, String, String, String), Long] =
    df.select("analysis_id", "stratum_1", "stratum_2", "stratum_3", "count_value")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse(""),
          Option(r.getString(3)).getOrElse("")) -> r.getLong(4)).toMap

  test("analysisCatalog carries the literal core id set") {
    val cat = OhdsiAchilles.analysisCatalog(spark).collect()
    assert(cat.length === 288)
    val ids = cat.map(_.getLong(0))
    assert(ids.sorted.toSeq === ids.toSeq) // ordered by analysis_id
    for (core <- Seq(1L, 2L, 101L, 105L, 108L, 109L, 110L, 111L, 114L, 115L,
        117L, 119L, 201L, 202L, 204L, 207L, 220L, 401L, 402L, 404L, 405L, 407L,
        420L, 701L, 704L, 705L, 707L, 720L, 904L, 1004L, 1801L, 1802L, 1804L,
        1807L, 1820L, 2105L, 2107L, 2120L,
        // the care-network tier
        7L, 8L, 9L, 300L, 301L, 1100L, 1101L, 1102L, 1103L, 1200L, 1201L,
        1202L, 1408L, 1409L, 1410L, 1411L, 1412L, 1413L, 1700L, 1701L, 1814L, 1818L, 1819L,
        2000L, 2001L, 2002L, 2200L, 2201L,
        // the specimen tier
        2400L, 2401L, 2402L, 2403L, 2404L, 2405L, 2406L,
        // the visit_detail tier (published 2500 block)
        2500L, 2501L, 2502L, 2504L, 2505L, 2507L, 2508L, 2509L, 2520L,
        // the round-10 additions
        291L, 491L, 691L, 504L, 509L, 510L, 511L, 512L, 513L, 514L,
        // the round-9 parity additions
        10L, 12L, 118L, 505L, 715L, 716L, 717L, 791L, 814L, 815L, 891L, 1891L, 2004L,
        // the round-11 additions: dose_era 1300 block, era month series,
        // Mx&Rx treemap member, device / visit_detail at-least-x
        1300L, 1301L, 1302L, 1304L, 1320L, 920L, 1020L, 2003L, 2191L, 2591L,
        // the round-11 type/end-date additions
        205L, 2109L,
        // the round-11 payer_source_value series
        1400L, 1401L, 1402L, 1403L,
        // the round-12 era validity family (x08 invalid person / x09
        // outside observation period / x10 end < start)
        908L, 909L, 910L, 1008L, 1009L, 1010L, 1308L, 1309L, 1310L,
        // the round-14 additions: condition end-before-start + the era
        // at-least-x cumulative series
        409L, 991L, 1091L, 1391L,
        // the round-15 additions: visit care-site validity + concept-free
        // density (210/212), the full note series, the specimen validity
        // slots, the payer mirrors, the cost completion, the x93/x94
        // density dists, the note/specimen at-least-x
        210L, 212L, 2202L, 2203L, 2204L, 2206L, 2207L, 2208L, 2220L,
        2407L, 2408L, 2420L, 1414L, 1415L, 1417L, 1418L,
        1501L, 1509L, 1510L, 1511L, 1601L, 1610L, 2291L, 2491L,
        293L, 294L, 493L, 494L, 693L, 694L, 793L, 794L, 893L, 894L,
        993L, 994L, 1093L, 1094L, 1393L, 1394L, 1893L, 1894L,
        2193L, 2194L, 2293L, 2294L, 2493L, 2494L, 2593L, 2594L))
      assert(ids.contains(core), s"missing core id $core")
    // x04 carries the published four strata names
    val a404 = cat.find(_.getLong(0) == 404L).get
    assert(a404.getString(2) === "condition_concept_id")
    assert(a404.getString(3) === "calendar_year")
    assert(a404.getString(4) === "gender_concept_id")
    assert(a404.getString(5) === "age_decile")
    // 504 is now the published age-at-death dist (r10), not an x04 slot.
    // era validity rides the SHIFTED x08/x09/x10 slots (r12) — the
    // occurrence-table x07 slot is their era-length dist, so 907/1007/1307
    // stay dists and no era x05/x07-count ids exist
    for (absent <- Seq(507L, 520L, 905L, 1305L, 1311L, 911L))
      assert(!ids.contains(absent), s"unexpected id $absent")
    val dists = cat.filter(_.getLong(6) == 1L).map(_.getLong(0)).toSet
    assert(dists === Set(103L, 104L, 105L, 106L, 107L,
      203L, 403L, 603L, 703L, 803L, 903L, 1003L, 1803L, 2103L, 2403L,
      206L, 406L, 606L, 706L, 806L, 906L, 1006L, 1806L, 2106L, 2406L,
      211L, 506L, 907L, 1007L, 1303L, 1306L, 1307L, 1815L, 1816L, 1817L,
      504L, 511L, 512L, 513L, 514L, 1403L, 1406L, 1407L,
      2503L, 2506L,
      715L, 716L, 717L, 815L) ++
      // the cost amount dist blocks (1502-1507 drug, 1602-1607 procedure)
      (2L to 7L).flatMap(off => Seq(1500L + off, 1600L + off)).toSet ++
      // r15: the note series dists, the extra drug-cost money dists, and
      // the x93/x94 per-person density block (every series except death)
      Set(2203L, 2206L, 1509L, 1510L, 1511L, 2511L) ++
      OhdsiAchilles.DomainSeries.filter(_.table != "death")
        .flatMap(d => Seq(d.base + 93, d.base + 94)).toSet)
  }

  test("cdmCoreResults carries literal ids with correct counts") {
    val r = resultMap(OhdsiAchilles.cdmCoreResults(model, tables(_), smallCellCount = 0L)
      .select("analysis_id", "stratum_1", "stratum_2", "count_value"))
    assert(r((0L, "graft", "")) === 1L)            // source name
    assert(r((1L, "ALL", "")) === 8L)              // persons
    assert(r((2L, "8507", "")) === 7L)             // by gender
    assert(r((2L, "8532", "")) === 1L)
    assert(r((3L, "1980", "")) === 7L)             // by year of birth
    assert(r((3L, "1990", "")) === 1L)
    assert(r((4L, "8527", "")) === 8L)             // race / ethnicity
    assert(r((5L, "38003564", "")) === 8L)
    assert(r((101L, "30", "")) === 7L)             // by age at first obs
    assert(r((101L, "20", "")) === 1L)
    assert(r((102L, "8507", "30")) === 7L)         // by gender by age
    assert(r((102L, "8532", "20")) === 1L)
    // 109: only person 1's SECOND period (2015-01-01 + 999d) covers whole
    // years — 2015 and 2016; no 2010 period reaches 2010-12-31
    assert(r((109L, "2015", "")) === 1L)
    assert(r((109L, "2016", "")) === 1L)
    assert(!r.keySet.exists { case (id, s, _) => id == 109L && s == "2010" })
    // 110: months fully covered by some period — Jan 2010 needs length
    // >= 30d (p1,p3..p8), Feb 2010 only the 60/70/80-day periods reach
    // Feb 28 (p6,p7,p8); p1's 2015 period covers 201501..201708 alone
    assert(r((110L, "201001", "")) === 7L)
    assert(r((110L, "201002", "")) === 3L)
    assert(r((110L, "201501", "")) === 1L)
    assert(r((110L, "201708", "")) === 1L)
    assert(!r.keySet.exists { case (id, s, _) => id == 110L && s == "201709" })
    // 108: first-period length in 30d increments — p2 (20d) -> 0,
    // p1/p3/p4/p5 (50/30/40/50) -> 1, p6/p7/p8 (60/70/80) -> 2
    assert(r((108L, "0", "")) === 1L)
    assert(r((108L, "1", "")) === 4L)
    assert(r((108L, "2", "")) === 3L)
    assert(r((111L, "201001", "")) === 8L)         // obs start month (persons)
    assert(r((111L, "201501", "")) === 1L)
    assert(r((113L, "1", "")) === 7L)              // persons by #periods
    assert(r((113L, "2", "")) === 1L)
    // 114/115: clean fixture -> zero-count rows are dropped even at
    // smallCellCount=0 (the > filter)
    assert(!r.keySet.exists { case (id, _, _) => id == 114L || id == 115L })
    // 117: observed-day months need NO whole-month cover — all 8 persons
    // touch Jan 2010; only the 60/70/80-day periods (p6-p8) reach March
    assert(r((117L, "201001", "")) === 8L)
    assert(r((117L, "201003", "")) === 3L)
    // 116: yearly sibling with gender + age-decile strata (persons 1-7:
    // male, born 1980 -> decile 3 in 2010; person 8: female, decile 2)
    val r116 = resultMap3(OhdsiAchilles.cdmCoreResults(model, tables(_), smallCellCount = 0L))
    assert(r116((116L, "2010", "8507", "3")) === 7L)
    assert(r116((116L, "2010", "8532", "2")) === 1L)
    assert(r116((116L, "2015", "8507", "3")) === 1L)
    // x07 invalid-person counts are zero here (every event row resolves)
    assert(!r.keySet.exists { case (id, _, _) => id == 207L || id == 407L })
    assert(r((200L, "9201", "")) === 8L)           // persons with a visit
    assert(r((200L, "9203", "")) === 3L)
    assert(r((201L, "9201", "")) === 36L)          // visit records
    assert(r((201L, "9203", "")) === 3L)
    assert(r((400L, "201826", "")) === 6L)         // persons with condition
    assert(r((400L, "316866", "")) === 1L)
    assert(r((401L, "201826", "")) === 6L)         // condition records
    assert(r((401L, "316866", "")) === 1L)
    // 405: records by concept by TYPE concept (x05 family)
    assert(r((405L, "201826", "32020")) === 4L)
    assert(r((405L, "201826", "32840")) === 2L)
    assert(r((405L, "316866", "32020")) === 1L)
    // default suppression drops small cells, exactly like the reference —
    // except analysis 0, which the reference always stores
    val suppressed = resultMap(OhdsiAchilles.cdmCoreResults(model, tables(_))
      .select("analysis_id", "stratum_1", "stratum_2", "count_value"))
    assert(!suppressed.contains((2L, "8532", "")))  // 1 <= 5 suppressed
    assert(suppressed.contains((0L, "graft", "")))
    assert(suppressed((201L, "9201", "")) === 36L)
  }

  test("cdmCoreDistResults computes the 103/104/105/203 dist family") {
    val rows = OhdsiAchilles.cdmCoreDistResults(model, tables(_))
      .select("analysis_id", "stratum_1", "count_value", "min_value", "max_value",
        "avg_value", "median_value")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // 103: ages at first obs period — seven 30s, one 20
    assert(rows((103L, "ALL")) === ((8L, 20.0, 30.0, 28.75, 30.0)))
    // 104: by gender — male stratum (7 ages of 30) survives suppression,
    // the 1-person female stratum is suppressed
    assert(rows((104L, "8507")) === ((7L, 30.0, 30.0, 30.0, 30.0)))
    assert(!rows.contains((104L, "8532")))
    // 105: first-period lengths — person 1's 999-day SECOND period ignored
    assert(rows((105L, "ALL")) === ((8L, 20.0, 80.0, 50.0, 50.0)))
    // 106/107: the same first-period lengths by gender / by age decile.
    // Males = p1..p7, lengths {20,30,40,50,50,60,70}: avg 320/7, median 50;
    // identical membership for age decile 3 (all seven are age 30). The
    // single-person female / decile-2 strata are suppressed.
    assert(rows((106L, "8507")) === ((7L, 20.0, 70.0, 45.7143, 50.0)))
    assert(!rows.contains((106L, "8532")))
    assert(rows((107L, "3")) === ((7L, 20.0, 70.0, 45.7143, 50.0)))
    assert(!rows.contains((107L, "2")))
    // 203 (x03): DISTINCT visit concepts per person — persons 1-3 have
    // {9201, 9203}, persons 4-8 only 9201
    assert(rows((203L, "ALL")) === ((8L, 1.0, 2.0, 1.375, 1.0)))
    // 403: distinct condition concepts per person — person 1 has two
    // concepts, persons 2-6 one
    assert(rows((403L, "ALL")) === ((6L, 1.0, 2.0, 1.1667, 1.0)))
  }
}
