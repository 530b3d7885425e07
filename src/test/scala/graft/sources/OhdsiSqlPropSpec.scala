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
}
