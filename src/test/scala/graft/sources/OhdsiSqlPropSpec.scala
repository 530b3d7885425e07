package graft.sources

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the bridge's hand-rolled statement scanners:
  * whatever comments, quoted semicolons, and whitespace a script carries,
  * [[OhdsiSql.translateScript]] must recover exactly the real statements.
  */
class OhdsiSqlPropSpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  // noise that must be INVISIBLE to the splitter: line comments carrying
  // apostrophes/semicolons/keywords, (nested) block comments ditto
  // every comment body carries the ZZNOISE marker: stripped comments are
  // then detectable as the marker's absence, without forbidding the
  // comment MARKERS themselves (a quoted '/*' in a literal must survive)
  private val genLineComment: Gen[String] = Gen.oneOf(
    "-- ZZNOISE don't; SELECT none",
    "-- ZZNOISE header; INSERT INTO nothing",
    "--ZZNOISE",
    "-- ZZNOISE rule's edge; DROP TABLE ghost")
  private val genBlockComment: Gen[String] = Gen.oneOf(
    "/* ZZNOISE it's; a block */",
    "/* ZZNOISE outer /* nested; 'quote */ still */",
    "/********\nZZNOISE PARAM manifest; don't dispatch\n********/",
    "/* ZZNOISE SELECT 1; */")
  private val genNoise: Gen[String] =
    Gen.listOf(Gen.oneOf(genLineComment, genBlockComment))
      .map(ns => if (ns.isEmpty) "" else ns.mkString("\n", "\n", "\n"))

  // a real statement whose literal content must SURVIVE verbatim —
  // including quoted semicolons, doubled quotes, and comment markers
  private val genLiteral: Gen[String] = Gen.oneOf(
    "plain", "it''s fine; really", "a -- not a comment",
    "b /* not a block */", "semi;colon", "q''q;''")
  private val genStmt: Gen[(String, String)] =
    for {
      n <- Gen.choose(1, 999)
      lit <- genLiteral
    } yield (s"SELECT $n AS a, '$lit' AS b", lit)

  test("property: comment/quote noise never changes the statement split") {
    val gen = for {
      stmts <- Gen.nonEmptyListOf(genStmt)
      noises <- Gen.listOfN(stmts.length + 1, genNoise)
    } yield (stmts, noises)
    check(Prop.forAll(gen) { case (stmts, noises) =>
      val script = noises.head + stmts.zip(noises.tail).map {
        case ((sql, _), nz) => sql + ";" + nz
      }.mkString("\n")
      val out = OhdsiSql.translateScript(script)
      out.length == stmts.length &&
        out.zip(stmts).forall { case (got, (_, lit)) =>
          got.contains(s"'$lit'") && !got.contains("ZZNOISE")
        }
    })
  }

  test("property: every statement still runs end-to-end through execute") {
    val gen = for {
      stmts <- Gen.listOfN(3, genStmt)
      noises <- Gen.listOfN(4, genNoise)
    } yield (stmts, noises)
    check(Prop.forAll(gen) { case (stmts, noises) =>
      val script = noises.head + stmts.zip(noises.tail).map {
        case ((sql, _), nz) => sql + ";" + nz
      }.mkString("\n")
      // the LAST statement's frame is returned; its literal round-trips
      // through render -> strip -> split -> translate -> spark.sql
      val row = OhdsiSql.execute(spark, script).collect().head
      row.getString(1) == stmts.last._2.replace("''", "'")
    })
  }

  // ---- the r15 datepart widening ----

  private val dateaddUnits = Seq("day", "dd", "d", "week", "wk", "ww",
    "month", "mm", "m", "quarter", "qq", "q", "year", "yy", "yyyy",
    "hour", "hh", "minute", "mi", "n", "second", "ss", "s", "millisecond", "ms")
  private val datediffUnits = Seq("day", "dd", "d", "month", "mm", "m",
    "quarter", "qq", "q", "year", "yy", "yyyy", "week", "wk", "ww",
    "hour", "hh", "minute", "mi", "n", "second", "ss", "s", "millisecond", "ms")
  private val datepartUnits = Seq("year", "yy", "yyyy", "quarter", "qq", "q",
    "month", "mm", "m", "day", "dd", "d", "hour", "hh", "minute", "mi", "n",
    "second", "ss", "s", "weekday", "dw", "dayofyear", "dy",
    "millisecond", "ms", "week", "wk", "ww")

  test("property: every supported datepart synonym translates; unknown dateparts refuse by name") {
    val genCase = for {
      (fn, units) <- Gen.oneOf(
        ("DATEADD", dateaddUnits), ("DATEDIFF", datediffUnits),
        ("DATEPART", datepartUnits))
      unit <- Gen.oneOf(units)
      colA <- Gen.oneOf("start_ts", "visit_end_date", "MIN(ts)")
    } yield (fn, unit, colA)
    check(Prop.forAll(genCase) { case (fn, unit, colA) =>
      val sql = fn match {
        case "DATEADD" => s"SELECT DATEADD($unit, 3, $colA) AS v FROM t"
        case "DATEDIFF" => s"SELECT DATEDIFF($unit, $colA, other_ts) AS v FROM t"
        case _ => s"SELECT DATEPART($unit, $colA) AS v FROM t"
      }
      val out = OhdsiSql.translate(sql)
      // translated: the SQL Server datepart-first form is gone (for day
      // units the output legitimately contains Spark's own two-arg
      // datediff, so the check is on the datepart-keyword form)
      raw"(?is)\b$fn\s*\(\s*$unit\b".r.findFirstIn(out).isEmpty
    })
    // unknown units name both the construct and the offending datepart
    for ((fn, call) <- Seq(
        "DATEADD" -> "DATEADD(fortnight, 3, a)",
        "DATEDIFF" -> "DATEDIFF(fortnight, a, b)",
        "DATEPART" -> "DATEPART(fortnight, a)")) {
      val e = intercept[IllegalArgumentException](OhdsiSql.translate(
        s"SELECT $call FROM t"))
      assert(e.getMessage.contains(fn) && e.getMessage.contains("fortnight"))
    }
  }

  test("property: sub-day DATEDIFF counts boundary crossings (SQL Server semantics)") {
    // SQL Server's DATEDIFF is the number of unit BOUNDARIES crossed —
    // DATEDIFF(hour, 10:59:59, 11:00:00) = 1 — never elapsed full units.
    // The oracle-side mirror (DuckDB date_diff) has the same contract.
    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    def lit(e: Long) = java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochSecond(e), zone).format(fmt)
    val gen = for {
      a <- Gen.choose(946684800L, 946684800L + 100000000L) // y2000 +/- ~3y
      delta <- Gen.choose(-100000L, 100000L)
      unit <- Gen.oneOf("hour" -> 3600L, "minute" -> 60L, "second" -> 1L)
    } yield (a, a + delta, unit)
    check(Prop.forAll(gen) { case (ae, be, (unit, div)) =>
      val sql = OhdsiSql.translate(
        s"SELECT DATEDIFF($unit, TIMESTAMP '${lit(ae)}', TIMESTAMP '${lit(be)}') AS v")
      val got = spark.sql(sql).head().getLong(0)
      got == Math.floorDiv(be, div) - Math.floorDiv(ae, div)
    })
  }

  // ---- the r16 long-tail widening: weekday/dayofyear/millisecond/week ----

  test("property: DATEPART weekday/dayofyear/week match SQL Server DATEFIRST-7 semantics") {
    val gen = Gen.choose(-7000L, 29000L) // epoch days, ~1950..2049
    check(Prop.forAll(gen) { epochDay =>
      val d = java.time.LocalDate.ofEpochDay(epochDay)
      val litD = s"DATE '$d'"
      // SQL Server weekday (DATEFIRST 7): Sunday=1..Saturday=7; java.time
      // numbers Monday=1..Sunday=7
      val expWeekday = d.getDayOfWeek.getValue % 7 + 1
      val expDoy = d.getDayOfYear
      // SQL Server week-of-year = 1 + Sunday boundaries since Jan 1
      val jan1 = d.withDayOfYear(1)
      val sundayAnchor = 3L // 1970-01-04 is a Sunday
      def weeksSinceAnchor(x: java.time.LocalDate): Long =
        Math.floorDiv(x.toEpochDay - sundayAnchor, 7L)
      val expWeek = 1 + (weeksSinceAnchor(d) - weeksSinceAnchor(jan1)).toInt
      val sql = OhdsiSql.translate(
        s"SELECT DATEPART(weekday, $litD) AS a, DATEPART(dayofyear, $litD) AS b, " +
          s"DATEPART(week, $litD) AS c")
      val r = spark.sql(sql).head()
      r.getInt(0) == expWeekday && r.getInt(1) == expDoy && r.getInt(2) == expWeek
    })
  }

  test("property: DATEDIFF week/millisecond count boundary crossings") {
    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val genDays = for {
      a <- Gen.choose(-7000L, 29000L)
      b <- Gen.choose(-7000L, 29000L)
    } yield (a, b)
    check(Prop.forAll(genDays) { case (ad, bd) =>
      val (a, b) = (java.time.LocalDate.ofEpochDay(ad), java.time.LocalDate.ofEpochDay(bd))
      val exp = Math.floorDiv(bd - 3L, 7L) - Math.floorDiv(ad - 3L, 7L)
      val sql = OhdsiSql.translate(s"SELECT DATEDIFF(week, DATE '$a', DATE '$b') AS v")
      spark.sql(sql).head().getLong(0) == exp
    })
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
    val genMs = for {
      a <- Gen.choose(946684800000L, 946684800000L + 10000000000L)
      delta <- Gen.choose(-100000L, 100000L)
    } yield (a, a + delta)
    check(Prop.forAll(genMs) { case (ae, be) =>
      def lit(e: Long) = java.time.LocalDateTime
        .ofInstant(java.time.Instant.ofEpochMilli(e), zone).format(fmt)
      val sql = OhdsiSql.translate(
        s"SELECT DATEDIFF(millisecond, TIMESTAMP '${lit(ae)}', TIMESTAMP '${lit(be)}') AS v, " +
          s"DATEPART(millisecond, TIMESTAMP '${lit(be)}') AS p, " +
          s"DATEADD(millisecond, 7, TIMESTAMP '${lit(ae)}') AS t")
      val r = spark.sql(sql).head()
      r.getLong(0) == be - ae && r.getInt(1) == (be % 1000 + 1000) % 1000 &&
        r.getTimestamp(2).getTime == ae + 7L
    })
  }
}
