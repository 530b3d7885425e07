package graft.operators

import graft.{SparkSpec, Tables}
import graft.model.TpchModel
import org.apache.spark.sql.Row

/** The generated Achilles batteries: enumeration is deterministic (the
  * oracle SQL is rendered from the same walk, so any instability would
  * desync Spark from DuckDB), the dist battery covers every non-key numeric
  * column, and the dist aggregation reproduces brute-force quantile_cont
  * values exactly.
  */
class AchillesGenSpec extends SparkSpec {
  private val Sf = "/root/testdata/sf0.001"
  private val model = TpchModel.model
  private def load(tb: String) = Tables.load(spark, Sf, tb)

  test("dist battery enumerates one analysis per non-key numeric column") {
    val rows = AchillesGen.distResults(model, load).collect()
    val ids = rows.map(_.getLong(0)).distinct.sorted
    // TpchModel measures: c_acctbal, s_acctbal, p_size, p_retailprice,
    // o_totalprice, l_linenumber, l_quantity, l_extendedprice, l_discount,
    // l_tax = 10 analyses (suppression can only drop strata, and every
    // sf0.001 table is > 5 rows in at least one stratum)
    assert(ids.length == 10, s"expected 10 analyses, got ${ids.mkString(",")}")
    assert(ids.head == AchillesGen.GeneratedBase + 2000L && ids.forall(_ < AchillesGen.GeneratedBase + 2010L))
  }

  test("oracle SQL renders the same analyses as the Spark battery") {
    val sql = AchillesGen.distOracleSql(model)
    for (id <- 102000 to 102009) assert(sql.contains(s"CAST($id AS BIGINT)"), s"oracle missing analysis $id")
    assert(sql.contains("CAST(year(o_orderdate) AS VARCHAR)"))
    assert(sql.contains("'ALL'"))
  }

  test("distAgg reproduces brute-force quantile_cont interpolation exactly") {
    import spark.implicits._
    // deliberately awkward group sizes (7, 11) so every quantile interpolates
    val values = Map("a" -> Seq(3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3),
      "b" -> (1 to 11).map(i => i * i / 7.0))
    val df = values.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "__v")
    val got = AchillesGen.distAgg(df, Seq("g")).collect().map(r => r.getString(0) -> r).toMap

    def quantileCont(vs: Seq[Double], q: Double): Double = {
      val sorted = vs.sorted
      val h = (sorted.size - 1) * q + 1 // 1-indexed, DuckDB semantics
      val lo = sorted(math.floor(h).toInt - 1)
      val hi = sorted(math.min(math.ceil(h).toInt, sorted.size) - 1)
      val r = lo + (h - math.floor(h)) * (hi - lo)
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((g, vs) <- values) {
      val row: Row = got(g)
      assert(row.getAs[Long]("count_value") == vs.size)
      assert(row.getAs[Double]("median_value") == quantileCont(vs, 0.5), s"median $g")
      assert(row.getAs[Double]("p10_value") == quantileCont(vs, 0.1), s"p10 $g")
      assert(row.getAs[Double]("p90_value") == quantileCont(vs, 0.9), s"p90 $g")
    }
  }

  test("distAgg suppresses small cells") {
    import spark.implicits._
    val df = (Seq.fill(6)("big") ++ Seq.fill(5)("small")).zipWithIndex
      .map { case (g, i) => (g, i.toDouble) }.toDF("g", "__v")
    val groups = AchillesGen.distAgg(df, Seq("g")).collect().map(_.getString(0))
    assert(groups.sameElements(Array("big")), s"expected only 'big', got ${groups.mkString(",")}")
  }

  test("a stratum crossing the small-cell threshold only ACROSS batches survives the merge") {
    // the continuous-Achilles contract: partials are stored UNSUPPRESSED
    // and suppression applies at read — a stratum with 4 rows in each of
    // two batches (4 <= smallCellCount in isolation, 8 > it merged) must
    // appear in the merged report exactly as the full scan would show it
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val evModel = graft.model.CdmModel(fields = Seq(
      graft.model.CdmField("events", "event_id", "int64", false, true, None, "CDM"),
      graft.model.CdmField("events", "event_type", "string", false, false, None, "CDM")))
    val rows = (1L to 8L).map(i => (i, "rare")) ++ (9L to 30L).map(i => (i, "common"))
    val ev = rows.toDF("event_id", "event_type")
    val parts = Seq(0, 1).map(b =>
      AchillesGen.partialCounts(evModel, _ => ev.filter(col("event_id") % 2 === b)))
    val merged = AchillesGen.mergePartialCounts(parts)
      .filter(col("stratum_1") === "rare").collect()
    assert(merged.length === 1 && merged.head.getLong(2) === 8L,
      s"rare stratum lost or miscounted across batches: ${merged.mkString(",")}")
    // and per-batch suppression WOULD have lost it — the trap this guards
    val suppressedEach = parts.map(p => AchillesGen.mergePartialCounts(Seq(p))
      .filter(col("stratum_1") === "rare").count())
    assert(suppressedEach.forall(_ === 0L))
  }

  test("generated id space is disjoint from the literal Achilles catalog") {
    // ADVICE r8: generated ids at 1000+i collided with literal catalog ids
    // (heel UnmappedIds 1001/1801/2101, concept-count x00/x01 bases) and
    // polluted the merged-store consumers. Pin the non-overlap invariant.
    val litMax = OhdsiAchilles.Catalog.map(_.id).max
    val genIds = AchillesGen.distResults(model, load).select("analysis_id")
      .distinct().collect().map(_.getLong(0))
    assert(AchillesGen.GeneratedBase > litMax,
      s"GeneratedBase ${AchillesGen.GeneratedBase} must exceed literal max $litMax")
    assert(genIds.forall(_ >= AchillesGen.GeneratedBase))
  }
}
