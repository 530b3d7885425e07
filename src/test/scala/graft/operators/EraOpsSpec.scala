package graft.operators

import graft.SparkSpec
import java.sql.Date
import java.time.LocalDate
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The OMOP era builder: persistence-window merge semantics, gap_days
  * accounting, and a scalacheck equivalence against a naive in-memory
  * interval-merge reference.
  */
class EraOpsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  private def build(rows: Seq[(Long, Long, Date, Date)], persistence: Int = 30) =
    EraOps.buildEras(
      rows.toDF("person_id", "concept_id", "s", "e"),
      "person_id", "concept_id", "s", "e", "x", persistence)

  test("merges exposures within the persistence window into one era") {
    val out = build(Seq(
      (1L, 10L, d("2020-01-01"), d("2020-01-10")),
      (1L, 10L, d("2020-02-05"), d("2020-02-08")), // 26d gap -> same era
      (1L, 10L, d("2020-06-01"), d("2020-06-02")), // far -> new era
      (1L, 20L, d("2020-01-05"), d("2020-01-06")), // other concept
      (2L, 10L, d("2020-01-01"), d("2020-01-01"))  // other person
    )).collect().map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toString,
      r.getDate(3).toString, r.getLong(4))).toSet
    assert(out == Set(
      (1L, 10L, "2020-01-01", "2020-02-08", 2L),
      (1L, 10L, "2020-06-01", "2020-06-02", 1L),
      (1L, 20L, "2020-01-05", "2020-01-06", 1L),
      (2L, 10L, "2020-01-01", "2020-01-01", 1L)))
  }

  test("gap_days counts exactly the uncovered days inside an era") {
    // era spans 01-01..02-08 (39 days); covered = 10 + 4; gaps = 25
    val out = build(Seq(
      (1L, 10L, d("2020-01-01"), d("2020-01-10")),
      (1L, 10L, d("2020-02-05"), d("2020-02-08")),
      // a record swallowed by the first one must add nothing
      (1L, 10L, d("2020-01-03"), d("2020-01-07"))
    )).select("gap_days").as[Long].collect().toSeq
    assert(out == Seq(25L))
  }

  test("null end dates become point events; null keys drop") {
    val out = EraOps.buildEras(
      Seq(
        (Some(1L), Some(10L), Some(d("2020-01-01")), None: Option[Date]),
        (None, Some(10L), Some(d("2020-01-01")), None),
        (Some(1L), None, Some(d("2020-01-01")), None)
      ).toDF("person_id", "concept_id", "s", "e"),
      "person_id", "concept_id", "s", "e", "x")
      .collect()
    assert(out.length == 1)
    assert(out.head.getDate(2) == d("2020-01-01") && out.head.getDate(3) == d("2020-01-01"))
  }

  test("rejects reserved internal column names") {
    intercept[IllegalArgumentException] {
      EraOps.buildEras(
        Seq((1L, 1L, d("2020-01-01"), d("2020-01-02"), 0L))
          .toDF("person_id", "concept_id", "s", "e", "__era"),
        "person_id", "concept_id", "s", "e", "x")
    }
  }

  /** Naive reference: sort one key's intervals, sweep, merge when
    * start <= runningEnd + persistence. Returns (start, end, count, gaps).
    */
  private def naiveEras(ivs: Seq[(LocalDate, LocalDate)], persistence: Int)
      : Seq[(LocalDate, LocalDate, Long, Long)] = {
    val sorted = ivs.map { case (s, e) => (s, if (e.isBefore(s)) s else e) }
      .sortBy(t => (t._1.toEpochDay, t._2.toEpochDay))
    val eras = Seq.newBuilder[(LocalDate, LocalDate, Long, Long)]
    var cur: Option[(LocalDate, LocalDate, Long, Long)] = None
    var covered = 0L // covered days of the current era
    for ((s, e) <- sorted) cur match {
      case Some((cs, ce, n, _)) if !s.isAfter(ce.plusDays(persistence)) =>
        val newEnd = if (e.isAfter(ce)) e else ce
        covered += math.max(0L,
          e.toEpochDay - math.max(s.toEpochDay, ce.toEpochDay + 1) + 1)
        val span = newEnd.toEpochDay - cs.toEpochDay + 1
        cur = Some((cs, newEnd, n + 1, span - covered))
      case other =>
        other.foreach(eras += _)
        covered = e.toEpochDay - s.toEpochDay + 1
        cur = Some((s, e, 1L, e.toEpochDay - s.toEpochDay + 1 - covered))
    }
    cur.foreach(eras += _)
    eras.result()
  }

  test("property: matches the naive interval-merge on random inputs") {
    val genIv = for {
      s <- Gen.choose(0L, 120L)
      len <- Gen.choose(0L, 40L)
    } yield (LocalDate.of(2020, 1, 1).plusDays(s),
      LocalDate.of(2020, 1, 1).plusDays(s + len))
    val genCase = for {
      n <- Gen.choose(1, 12)
      ivs <- Gen.listOfN(n, genIv)
      persistence <- Gen.oneOf(0, 7, 30)
    } yield (ivs, persistence)
    val prop = Prop.forAll(genCase) { case (ivs, persistence) =>
      val df = ivs.map { case (s, e) => (1L, 1L, Date.valueOf(s), Date.valueOf(e)) }
      val got = build(df, persistence).collect()
        .map(r => (r.getDate(2).toLocalDate, r.getDate(3).toLocalDate,
          r.getLong(4), r.getLong(5))).toSet
      got == naiveEras(ivs, persistence).toSet
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("a struct concept key separates eras by dose (the dose_era contract)") {
    // same person, same drug, overlapping windows — but two DOSE buckets:
    // drug_era would merge all three rows into one era; keying the
    // collapse by struct(drug, dose) must keep the dose-5 row apart
    val rows = Seq(
      (1L, 10L, 1.0, d("2020-01-01"), d("2020-01-10")),
      (1L, 10L, 1.0, d("2020-01-15"), d("2020-01-20")), // within 30d: merges
      (1L, 10L, 5.0, d("2020-01-05"), d("2020-01-08"))) // other dose: separate
      .toDF("person_id", "drug_concept_id", "dose_value", "s", "e")
      .withColumn("__k", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.col("drug_concept_id"),
        org.apache.spark.sql.functions.col("dose_value")))
    val eras = EraOps.buildEras(rows, "person_id", "__k", "s", "e", "dose")
      .select("__k.drug_concept_id", "__k.dose_value",
        "dose_era_start_date", "dose_era_end_date")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getDate(2).toString, r.getDate(3).toString)).toSet
    assert(eras === Set(
      (10L, 1.0, "2020-01-01", "2020-01-20"),
      (10L, 5.0, "2020-01-05", "2020-01-08")))
  }
}
