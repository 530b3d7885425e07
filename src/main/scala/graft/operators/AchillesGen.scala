package graft.operators

import graft.model.CdmModel
import org.apache.spark.sql.DataFrame
import scala.util.chaining._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampType}

/** Metadata-GENERATED Achilles analysis battery: the reference instantiates
  * its ~290 analyses from a config CSV over the CDM schema
  * (`/root/reference/src/riab/etl/achilles.py:54-227` builds the analysis
  * list, `:465-505` runs each as a scratch query, `:507-561` merges them
  * into `achilles_results`). This generator derives the same *families*
  * from the model's own metadata — so adding a table to the model grows the
  * battery with no code change:
  *
  *  - per table: total record count        (family 1/1xx "count of rows")
  *  - per string column: records by value  (the "by stratum" family)
  *  - per datetime column: records by year (the "by month/year" family)
  *  - per FK column: distinct referenced entities (the "N persons" shape)
  *
  * Every analysis lands in the standard `achilles_results` row shape
  * `(analysis_id, stratum_1, count_value)` with small-cell suppression
  * (counts <= 5, `achilles.py:27`). Analysis ids are assigned
  * deterministically from the model enumeration. [[oracleSql]] renders the
  * identical battery from the identical metadata.
  *
  * Scale shape: one aggregation per analysis, exactly like the reference's
  * scratch tables — each is a single groupBy (map-side combinable), merged
  * with UNION ALL; high-cardinality strata are real Achilles behavior and
  * the suppression filter prunes them after the partial aggregate.
  */
object AchillesGen {

  /** Offset keeping every generated analysis id clear of the literal
    * OHDSI catalog range (ids 0..~2900). Family sub-bases stay readable:
    * counts = +1000, dists = +2000, fk-dists = +3000, pairs = +4000,
    * span-dists = +5000.
    */
  val GeneratedBase = 100000L

  sealed private trait Kind
  private case object CountRows extends Kind
  private case object ByValue extends Kind
  private case object ByYear extends Kind
  private case object ByMonth extends Kind
  private case object DistinctFk extends Kind
  private case object DistinctFkByYear extends Kind

  private final case class Analysis(id: Long, kind: Kind, table: String, column: String, column2: String = "")

  private def analyses(model: CdmModel): Seq[Analysis] = {
    val items = model.tables.flatMap { tb =>
      val fks = model.fks(tb).keySet
      val firstTs = model.sparkSchema(tb).fields.find(_.dataType == TimestampType).map(_.name)
      Seq((CountRows: Kind, tb, "", "")) ++
        model.sparkSchema(tb).fields.collect {
          case f if f.dataType == StringType => (ByValue: Kind, tb, f.name, "")
          case f if f.dataType == TimestampType => (ByYear: Kind, tb, f.name, "")
        } ++
        // the "records per month" family (Achilles's xx02 shape)
        model.sparkSchema(tb).fields.collect {
          case f if f.dataType == TimestampType => (ByMonth: Kind, tb, f.name, "")
        } ++
        model.sparkSchema(tb).fields.collect {
          case f if fks.contains(f.name) => (DistinctFk: Kind, tb, f.name, "")
        } ++
        // the "entities with at least one record, per year" family
        // (Achilles's xx04 'persons by year' shape) — needs a date axis
        firstTs.toSeq.flatMap { ts =>
          model.sparkSchema(tb).fields.collect {
            case f if fks.contains(f.name) => (DistinctFkByYear: Kind, tb, f.name, ts)
          }
        }
    }
    // Generated ids live at 100000+ — OUTSIDE the literal Achilles id
    // space (0..~2900, `achilles.py:54-227`), so merged-store consumers
    // that key on literal ids (heel rules, the Atlas concept-count cache)
    // can never pick up a generated row by id collision.
    items.zipWithIndex.map { case ((k, t, c, c2), i) => Analysis(GeneratedBase + 1000L + i, k, t, c, c2) }
  }

  /** ONE per-analysis stratum rendering, shared by the fused sum pass and
    * the fused distinct pass — the incremental path's merge-equals-rescan
    * contract depends on the full battery and the partials shaping
    * identically, so the logic must not fork. (Spark-side mirror of
    * [[countSelectSql]]'s stratum expressions, analysis for analysis.)
    */
  private def stratumSql(a: Analysis): String = a.kind match {
    case CountRows => "'ALL'"
    case ByValue => s"`${a.column}`"
    case ByYear => s"CAST(year(`${a.column}`) AS STRING)"
    case ByMonth => s"date_format(`${a.column}`, 'yyyyMM')"
    case DistinctFk => "'ALL'"
    case DistinctFkByYear => s"CAST(year(`${a.column2}`) AS STRING)"
  }

  /** All of a table's COUNT-family analyses in ONE scan + ONE
    * map-side-combinable aggregate: each input row stacks into one
    * (analysis_id, stratum_1) pair per analysis and a single
    * groupBy counts them — k aggregation passes over the table collapse
    * to one (the same fusion [[distValueCounts]] already applies to the
    * dist families). Row-identical to the per-analysis groupBys for
    * non-empty tables; an empty table loses only its CountRows 0-row,
    * which small-cell suppression removed from every gated output anyway.
    */
  private def fusedSumCounts(as: Seq[Analysis], df: DataFrame): DataFrame = {
    val stackExpr =
      s"stack(${as.size}, " +
        as.map(a => s"CAST(${a.id} AS BIGINT), ${stratumSql(a)}").mkString(", ") +
        ") AS (analysis_id, stratum_1)"
    df.select(expr(stackExpr))
      .groupBy(col("analysis_id"), col("stratum_1"))
      .agg(count(lit(1)).as("count_value"))
  }

  /** All of a table's countDistinct-family analyses in ONE scan + ONE
    * distinct aggregate: rows stack into (analysis_id, stratum_1, __fk)
    * triples (each analysis contributes its own FK column) and a single
    * groupBy counts distinct FKs per (analysis, stratum). countDistinct
    * ignores the NULL __fk values exactly as the per-analysis aggregates
    * did.
    */
  private def fusedDistinctCounts(as: Seq[Analysis], df: DataFrame): DataFrame = {
    val stackExpr =
      s"stack(${as.size}, " +
        as.map(a => s"CAST(${a.id} AS BIGINT), ${stratumSql(a)}, `${a.column}`").mkString(", ") +
        ") AS (analysis_id, stratum_1, __fk)"
    df.select(expr(stackExpr))
      .groupBy(col("analysis_id"), col("stratum_1"))
      .agg(countDistinct(col("__fk")).as("count_value"))
  }

  /** Per-table fused battery passes in model-table order: a sum pass and
    * (when the table has FK analyses) a distinct pass — two scans per
    * table, never one per analysis. The distinct pass additionally
    * partitions by the FK column's Spark type: `stack` requires exact
    * type agreement across its stacked slots (NullType-only coercion),
    * so a model mixing string FKs with int64 FKs would fail analysis in
    * one stack; per-type stacks keep each pass narrow (no widening cast
    * on the shuffled FK value) and type-safe. The current model is
    * type-homogeneous, so this yields the same single pass per table.
    */
  private def fusedPasses(model: CdmModel, load: String => DataFrame,
      keep: Analysis => Boolean): Seq[DataFrame] = {
    val byTable = analyses(model).filter(keep).groupBy(_.table)
    model.tables.flatMap { tb =>
      byTable.get(tb).toSeq.flatMap { as =>
        val (dist, sums) = as.partition(a => DistinctKinds(a.kind))
        val df = load(tb)
        (if (sums.nonEmpty) Seq(fusedSumCounts(sums, df)) else Nil) ++
          dist.groupBy(a => df.schema(a.column).dataType).toSeq
            .sortBy(_._2.head.id)
            .map { case (_, group) => fusedDistinctCounts(group, df) }
      }
    }
  }

  private val DistinctKinds: Set[Kind] = Set(DistinctFk, DistinctFkByYear)

  def results(model: CdmModel, load: String => DataFrame): DataFrame =
    fusedPasses(model, load, _ => true)
      .pipe(graft.Unions.balanced)
      .filter(col("count_value") > 5)
      .orderBy("analysis_id", "stratum_1")

  /** The SUM-DECOMPOSABLE kinds: per-group COUNT(*) families merge across
    * disjoint input slices by summing (count is a commutative monoid);
    * the countDistinct families do NOT decompose and stay out of the
    * incremental path.
    */
  private val SumKinds: Set[Kind] = Set(CountRows, ByValue, ByYear, ByMonth)

  /** UNSUPPRESSED partial battery over the sum-decomposable families —
    * the incremental-ingest building block: a 100 TB store absorbs a new
    * batch by computing THIS over the batch alone and merging
    * ([[mergePartialCounts]]) into the stored partials, instead of
    * rescanning history. Suppression must NOT apply here (a stratum
    * crossing the small-cell threshold only across batches would be lost
    * from a merge of suppressed reports); [[mergePartialCounts]] applies
    * it after summing.
    */
  def partialCounts(model: CdmModel, load: String => DataFrame): DataFrame =
    fusedPasses(model, load, a => SumKinds(a.kind))
      .pipe(graft.Unions.balanced)

  /** Merge partial batteries (one shuffle on the tiny report key) and
    * apply small-cell suppression AFTER the sum — the merged result is
    * EXACTLY the full-scan battery restricted to the sum families.
    */
  def mergePartialCounts(parts: Seq[DataFrame], smallCellCount: Long = 5L): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("analysis_id"), col("stratum_1"))
      .agg(sum(col("count_value")).as("count_value"))
      .filter(col("count_value") > smallCellCount)
      .orderBy("analysis_id", "stratum_1")

  /** DuckDB rendering of the merged sum-family battery — identical to the
    * full-scan oracle restricted to the same analyses, which is the
    * incremental path's correctness contract.
    */
  def sumFamilyOracleSql(model: CdmModel): String = {
    val selects = analyses(model).filter(a => SumKinds(a.kind)).map(countSelectSql)
    s"""WITH results AS (
       |${selects.mkString("\nUNION ALL\n")}
       |)
       |SELECT analysis_id, stratum_1, count_value FROM results
       |WHERE count_value > 5
       |ORDER BY analysis_id, stratum_1""".stripMargin
  }

  /** Cross-stratum pair analyses (Achilles's two-strata shape, e.g.
    * "records by concept and year" — `achilles_results.stratum_2`): for
    * every (string column, first datetime column) pair of a table, record
    * counts by (value, year). One map-side-combinable aggregate per
    * analysis, suppressed like the rest of the battery.
    */
  private final case class PairAnalysis(id: Long, table: String, strCol: String, tsCol: String)

  private def pairAnalyses(model: CdmModel): Seq[PairAnalysis] = {
    var nextId = GeneratedBase + 4000L
    model.tables.flatMap { tb =>
      val schema = model.sparkSchema(tb)
      schema.fields.find(_.dataType == TimestampType).map(_.name).toSeq.flatMap { ts =>
        schema.fields.collect { case f if f.dataType == StringType => f.name }.map { sc =>
          val a = PairAnalysis(nextId, tb, sc, ts); nextId += 1; a
        }
      }
    }
  }

  def pairResults(model: CdmModel, load: String => DataFrame): DataFrame =
    pairAnalyses(model).groupBy(_.table).toSeq
      .sortBy { case (_, as) => as.head.id }
      .map { case (tb, as) =>
        // all of a table's pair analyses share its first datetime column,
        // so the whole per-table family fuses into ONE scan + ONE
        // aggregate: rows stack into (analysis_id, stratum_1) and
        // stratum_2 = year(ts) rides beside the stack unchanged
        val stackExpr =
          s"stack(${as.size}, " +
            as.map(a => s"CAST(${a.id} AS BIGINT), `${a.strCol}`").mkString(", ") +
            ") AS (analysis_id, stratum_1)"
        load(tb)
          .select(expr(stackExpr),
            year(col(as.head.tsCol)).cast("string").as("stratum_2"))
          .groupBy(col("analysis_id"), col("stratum_1"), col("stratum_2"))
          .agg(count(lit(1)).as("count_value"))
      }.pipe(graft.Unions.balanced)
      .filter(col("count_value") > 5)
      .orderBy("analysis_id", "stratum_1", "stratum_2")

  def pairOracleSql(model: CdmModel): String = {
    val selects = pairAnalyses(model).map { a =>
      s"""SELECT CAST(${a.id} AS BIGINT) AS analysis_id, ${a.strCol} AS stratum_1,
         |  CAST(year(${a.tsCol}) AS VARCHAR) AS stratum_2, count(*) AS count_value
         |FROM ${a.table} GROUP BY 2, 3""".stripMargin
    }
    s"""WITH results AS (
       |${selects.mkString("\nUNION ALL\n")}
       |)
       |SELECT analysis_id, stratum_1, stratum_2, count_value FROM results
       |WHERE count_value > 5
       |ORDER BY analysis_id, stratum_1, stratum_2""".stripMargin
  }

  /** The quantile set every dist analysis reports, with `quantile_cont`
    * interpolation semantics (h = (n-1)q + 1, linear between the bracketing
    * ranks — bit-identical to DuckDB's double arithmetic).
    */
  private val Quantiles = Seq("p10" -> 0.1, "p25" -> 0.25, "median" -> 0.5, "p75" -> 0.75, "p90" -> 0.9)

  /** Shared dist-row aggregation: `rows(groupCols..., __v)` -> one
    * `achilles_results_dist` row per group
    * (count/min/max/avg/stdev + the exact [[Quantiles]]).
    *
    * ONE rank window per input: the window partitions by the same key the
    * aggregate groups on, so Catalyst reuses a single shuffle for both, the
    * sort spills to disk instead of buffering per-group arrays the way the
    * `percentile` aggregate would, and groups process in parallel. Each
    * quantile picks its two bracketing ranks out of that same pass. Counts
    * <= 5 suppressed (`small_cell_count`, `achilles.py:27`).
    *
    * avg/stdev accumulate through DECIMAL(38,10) sums, not double `avg` /
    * `stddev_samp`: double summation is order-dependent, and a
    * parallel-partition sum can land one ulp away from the oracle's
    * single-threaded sum — observed flipping round(x, 4) on exactly one
    * sf0.1 stratum. Decimal addition is associative, so Spark and the
    * oracle compute bit-identical moments at every parallelism.
    */
  def distAgg(rows: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keys: _*)
    val base = rows
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val brackets = Quantiles.flatMap { case (name, q) =>
      val h = (col("__n") - 1) * lit(q) + 1
      Seq(
        max(when(col("__rn") === floor(h), col("__v"))).as(s"__lo_$name"),
        max(when(col("__rn") === floor(h) + 1, col("__v"))).as(s"__hi_$name"))
    }
    val aggs = Seq(
      count(lit(1)).as("count_value"),
      round(min(col("__v")), 4).as("min_value"),
      round(max(col("__v")), 4).as("max_value"),
      sum(col("__v").cast("decimal(38,10)")).as("__sv"),
      sum((col("__v") * col("__v")).cast("decimal(38,10)")).as("__svv"),
      sum(graft.ops.SimOps.quantUnits(col("__v"), 1e6)).as("__s6"),
      max(col("__n")).as("__nn")) ++ brackets
    distTail(base.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*), keys)
  }

  /** The generated dist battery: one analysis per numeric MEASURE column
    * (non-PK, non-FK `int64`/`float64`) of every model table, mirroring how
    * `achilles.py:54-227` instantiates its distribution analyses over the
    * CDM schema. Stratum rule: tables with a datetime column stratify by
    * year of the first one (so the big fact tables' rank windows partition
    * across strata and stay parallel at 100 TB); tables without one — the
    * small dims — run as a single 'ALL' stratum, which is fine precisely
    * because they are small.
    *
    * All of a table's measure columns are STACKED into `(analysis_id, __v)`
    * rows first, so the entire per-table battery flows through ONE window
    * shuffle (k analyses x strata partitions), not one shuffle per column.
    */
  private final case class DistAnalysis(id: Long, table: String, column: String)

  private def distAnalyses(model: CdmModel): Seq[(String, Option[String], Seq[DistAnalysis])] = {
    var nextId = GeneratedBase + 2000L
    model.tables.flatMap { tb =>
      val schema = model.sparkSchema(tb)
      val keyCols = model.pk(tb).toSet ++ model.fks(tb).keySet
      val measures = schema.fields.collect {
        case f if (f.dataType == LongType || f.dataType == DoubleType) && !keyCols(f.name) => f.name
      }.toSeq
      val stratumCol = schema.fields.find(_.dataType == TimestampType).map(_.name)
      if (measures.isEmpty) None
      else {
        val cols = measures.map { c =>
          val a = DistAnalysis(nextId, tb, c); nextId += 1; a
        }
        Some((tb, stratumCol, cols))
      }
    }
  }

  def distResults(model: CdmModel, load: String => DataFrame): DataFrame =
    distValueCounts(model, load)
      .pipe(hist => distAggFromValueCounts(hist, Seq("analysis_id", "stratum_1")))
      .orderBy("analysis_id", "stratum_1")

  /** The dist battery's VALUE HISTOGRAM stage alone — a mergeable summary:
    * histograms over disjoint slices merge by summing `__cnt` per
    * (analysis, stratum, value), and the dist aggregation over the merged
    * histogram (moments from exact decimal sums, quantiles from order
    * statistics) equals the full-scan battery EXACTLY — the incremental
    * path for the distribution families, mirroring [[partialCounts]].
    */
  def distValueCounts(model: CdmModel, load: String => DataFrame): DataFrame =
    distAnalyses(model).map { case (tb, stratumCol, cols) =>
      val df = load(tb)
      val stratum = stratumCol.map(c => year(col(c)).cast("string")).getOrElse(lit("ALL"))
      val stackExpr =
        s"stack(${cols.size}, " +
          cols.map(a => s"CAST(${a.id} AS BIGINT), CAST(`${a.column}` AS DOUBLE)").mkString(", ") +
          ") AS (analysis_id, __v)"
      // Per-table VALUE HISTOGRAM, not raw rows: the groupBy is map-side
      // combinable, so low-cardinality measures (quantity/discount/tax
      // style domains) collapse at the scan and the rank window downstream
      // never sees raw fact rows — the round-7 switch from the per-row
      // distAgg (identical results: the histogram moments are the same
      // exact decimal sums, the quantile brackets the same order
      // statistics). Worst case (all-distinct values) degrades to the old
      // shuffle size, never worse.
      df.withColumn("stratum_1", stratum)
        .select(col("stratum_1"), expr(stackExpr))
        .filter(col("__v").isNotNull)
        .groupBy(col("analysis_id"), col("stratum_1"), col("__v"))
        .agg(count(lit(1)).as("__cnt"))
    }.pipe(graft.Unions.balanced)

  /** Merge partial value histograms and run the ONE dist aggregation —
    * exactly the full-scan dist battery when the partials cover a
    * partition of the input.
    */
  def mergeDistPartials(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("analysis_id"), col("stratum_1"), col("__v"))
      .agg(sum(col("__cnt")).as("__cnt"))
      .pipe(hist => distAggFromValueCounts(hist, Seq("analysis_id", "stratum_1")))
      .orderBy("analysis_id", "stratum_1")

  /** The quantile-interpolation + final-projection tail shared by
    * [[distAgg]] and [[distAggFromValueCounts]]: derives avg/stdev from
    * the exact decimal sums (`__sv`, `__svv`) so every double operation
    * happens in the same order on identical inputs in both engines.
    */
  private def distTail(grouped: DataFrame, keys: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val qCols = Quantiles.map { case (name, q) =>
      val h = (col("__nn") - 1) * lit(q) + 1
      val frac = h - floor(h)
      val lo = col(s"__lo_$name")
      val hi = coalesce(col(s"__hi_$name"), lo)
      round(lo + frac * (hi - lo), 4).as(s"${name}_value")
    }
    val n = col("count_value")
    val sv = col("__sv").cast("double")
    val svv = col("__svv").cast("double")
    // the mean never passes through a decimal->double cast or an engine
    // round(): integer-domain rhu over the micro-quantized sum (the r10
    // cross-engine-exactness sweep; rhu(S6/(n*100))/1e4 is the 4-dp mean)
    val avgCol = graft.ops.SimOps
      .meanOfQuantUnits(col("__s6"), n * lit(100L), 1e4).as("avg_value")
    val sdCol = round(when(n > 1,
      sqrt(greatest(lit(0.0), (svv - sv * sv / n) / (n - lit(1))))), 4).as("stdev_value")
    grouped
      .filter(col("count_value") > 5)
      .select(keys ++ Seq(col("count_value"), col("min_value"), col("max_value"),
        avgCol, sdCol) ++ qCols: _*)
  }

  /** Dist aggregation over a VALUE HISTOGRAM `(groupCols..., __v, __cnt)`
    * instead of raw rows: quantile brackets come from the cumulative count
    * over the histogram, moments from weighted sums. For distributions over
    * a small value domain (e.g. records-per-entity counts) this replaces a
    * rank window over all entities with a window over the tiny histogram —
    * the scale path when strata would otherwise be single giant partitions.
    */
  def distAggFromValueCounts(hist: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keys: _*)
    val base = hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
    val brackets = Quantiles.flatMap { case (name, q) =>
      val h = (col("__n") - 1) * lit(q) + 1
      // rank r lives on the histogram row whose cumulative range
      // (__cum - __cnt, __cum] contains it
      def at(r: org.apache.spark.sql.Column) =
        max(when(r > col("__cum") - col("__cnt") && r <= col("__cum"), col("__v")))
      Seq(at(floor(h)).as(s"__lo_$name"), at(floor(h) + 1).as(s"__hi_$name"))
    }
    // exact decimal moments: decimal(24,10) x decimal(13,0) -> decimal(38,10)
    // lands exactly at the 38 cap with NO precision loss, so the
    // histogram-weighted sum equals the oracle's raw-row decimal sum bit
    // for bit (see distAgg's doc). Bounds this trades on: |__v| <= 1e7
    // (so __v*__v fits 14 integer digits — every CDM measure domain:
    // days, per-entity counts, prices, char counts) and a per-(group,
    // value) multiplicity < 1e13, which survives a ~1e12-row 100 TB
    // stratum with a constant hot value (the previous decimal(9,0) cap
    // overflowed to null at 1e9 identical rows).
    val aggs = Seq(
      sum(col("__cnt")).as("count_value"),
      round(min(col("__v")), 4).as("min_value"),
      round(max(col("__v")), 4).as("max_value"),
      sum(col("__v").cast("decimal(24,10)") * col("__cnt").cast("decimal(13,0)")).as("__sv"),
      sum((col("__v") * col("__v")).cast("decimal(24,10)") * col("__cnt").cast("decimal(13,0)"))
        .as("__svv"),
      sum(graft.ops.SimOps.quantUnits(col("__v"), 1e6).cast("decimal(24,0)")
        * col("__cnt").cast("decimal(13,0)")).as("__s6"),
      max(col("__n")).as("__nn")) ++ brackets
    distTail(base.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*), keys)
  }

  /** Records-per-entity distributions (the reference's "records per person"
    * dist family, `achilles.py` analyses of the xx91 shape): for every FK
    * column, the distribution of child-row counts per referenced entity.
    *
    * Scale shape: stage 1 shuffles on the FK with a map-side-combinable
    * count; stage 2 histograms those counts (cardinality = number of
    * DISTINCT per-entity counts — tiny) and [[distAggFromValueCounts]]
    * windows over the histogram. No rank window ever sees the entities.
    */
  def fkDistResults(model: CdmModel, load: String => DataFrame): DataFrame = {
    val hist = fkDistAnalyses(model).map { a =>
      load(a.table).where(col(a.column).isNotNull)
        .groupBy(col(a.column)).agg(count(lit(1)).as("__pe"))
        .groupBy(col("__pe").cast("double").as("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .select(lit(a.id).as("analysis_id"), lit("ALL").as("stratum_1"),
          col("__v"), col("__cnt"))
    }.pipe(graft.Unions.balanced)
    distAggFromValueCounts(hist, Seq("analysis_id", "stratum_1"))
      .orderBy("analysis_id", "stratum_1")
  }

  private def fkDistAnalyses(model: CdmModel): Seq[DistAnalysis] = {
    var nextId = GeneratedBase + 3000L
    model.tables.flatMap { tb =>
      model.fks(tb).keys.toSeq.sorted.map { f =>
        val a = DistAnalysis(nextId, tb, f); nextId += 1; a
      }
    }
  }

  /** Observation-span distributions (the reference's "length of
    * observation" dist family, Achilles analysis 105 shape): for every
    * (FK column, date axis) pair, the distribution over entities of the
    * day span between the entity's first and last record.
    *
    * Scale shape: stage 1 shuffles on the FK with map-side-combinable
    * min/max; the spans then histogram (tiny domain) and
    * [[distAggFromValueCounts]] windows over the histogram — no rank
    * window ever sees the entities, same as [[fkDistResults]].
    */
  private final case class SpanAnalysis(id: Long, table: String, fkCol: String, tsCol: String)

  private def spanAnalyses(model: CdmModel): Seq[SpanAnalysis] = {
    var nextId = GeneratedBase + 5000L
    model.tables.flatMap { tb =>
      val firstTs = model.sparkSchema(tb).fields.find(_.dataType == TimestampType).map(_.name)
      firstTs.toSeq.flatMap { ts =>
        model.fks(tb).keys.toSeq.sorted.map { f =>
          val a = SpanAnalysis(nextId, tb, f, ts); nextId += 1; a
        }
      }
    }
  }

  def spanDistResults(model: CdmModel, load: String => DataFrame): DataFrame = {
    val hist = spanAnalyses(model).map { a =>
      load(a.table)
        .where(col(a.fkCol).isNotNull && col(a.tsCol).isNotNull)
        .groupBy(col(a.fkCol))
        .agg(datediff(to_date(max(col(a.tsCol))), to_date(min(col(a.tsCol))))
          .cast("double").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
        .select(lit(a.id).as("analysis_id"), lit("ALL").as("stratum_1"),
          col("__v"), col("__cnt"))
    }.pipe(graft.Unions.balanced)
    distAggFromValueCounts(hist, Seq("analysis_id", "stratum_1"))
      .orderBy("analysis_id", "stratum_1")
  }

  /** DuckDB rendering of the observation-span dist battery. */
  def spanDistOracleSql(model: CdmModel): String = {
    val selects = spanAnalyses(model).map { a =>
      s"""SELECT CAST(${a.id} AS BIGINT) AS analysis_id, 'ALL' AS stratum_1,
         |  CAST(date_diff('day', CAST(min(${a.tsCol}) AS DATE), CAST(max(${a.tsCol}) AS DATE)) AS DOUBLE) AS v
         |FROM ${a.table} WHERE ${a.fkCol} IS NOT NULL AND ${a.tsCol} IS NOT NULL GROUP BY ${a.fkCol}""".stripMargin
    }
    distOuterSql(selects.mkString("\nUNION ALL\n"))
  }

  /** Shared outer SELECT of the dist oracles (exact quantile_cont, matching
    * the Spark side's interpolation arithmetic bit-for-bit).
    */
  private def distOuterSql(dSql: String): String =
    s"""WITH d AS (
       |$dSql
       |)
       |SELECT analysis_id, stratum_1, count(*) AS count_value,
       |  round(min(v), 4) AS min_value, round(max(v), 4) AS max_value,
       |  $MomentsSql
       |  round(quantile_cont(v, 0.1), 4) AS p10_value,
       |  round(quantile_cont(v, 0.25), 4) AS p25_value,
       |  round(quantile_cont(v, 0.5), 4) AS median_value,
       |  round(quantile_cont(v, 0.75), 4) AS p75_value,
       |  round(quantile_cont(v, 0.9), 4) AS p90_value
       |FROM d WHERE v IS NOT NULL
       |GROUP BY 1, 2 HAVING count(*) > 5
       |ORDER BY 1, 2""".stripMargin

  /** DuckDB mirror of the [[distTail]] avg: integer-domain round-half-up
    * mean of the micro-quantized values at 4 dp (SUM(BIGINT) is HUGEINT —
    * exact; `//` on the evenly-divisible numerator is exact; the only
    * float op is one small-int -> DOUBLE divide).
    */
  private def duckAvg4(v: String, n: String): String = {
    val s = s"sum(CAST(floor(($v) * 1e6 + 0.5) AS BIGINT))"
    val a = s"(2 * $s + ($n) * 100)"
    val b = s"(2 * ($n) * 100)"
    s"CAST(($a - ((($a % $b) + $b) % $b)) // $b AS DOUBLE) / 1e4"
  }

  /** The avg/stdev oracle arithmetic, operation-for-operation identical to
    * [[distTail]]: the integer-domain quantized mean ([[duckAvg4]]) and,
    * for stdev, associative DECIMAL(38,10) sums feeding the same double
    * expression tree — summation order can no longer flip a rounding.
    */
  val MomentsSql: String =
    s"""${duckAvg4("v", "count(*)")} AS avg_value,
      |  round(CASE WHEN count(*) > 1 THEN sqrt(greatest(0.0,
      |    (CAST(sum(CAST(v * v AS DECIMAL(38,10))) AS DOUBLE)
      |     - CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE)
      |       * CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE) / count(*))
      |    / (count(*) - 1))) END, 4) AS stdev_value,""".stripMargin

  /** DuckDB rendering of the identical battery from the identical metadata
    * (`quantile_cont` natively — the Spark side's rank interpolation is
    * bit-compatible with it).
    */
  def distOracleSql(model: CdmModel): String = {
    val selects = distAnalyses(model).flatMap { case (tb, stratumCol, cols) =>
      val st = stratumCol.map(c => s"CAST(year($c) AS VARCHAR)").getOrElse("'ALL'")
      cols.map { a =>
        s"SELECT CAST(${a.id} AS BIGINT) AS analysis_id, $st AS stratum_1, CAST(${a.column} AS DOUBLE) AS v FROM $tb"
      }
    }
    distOuterSql(selects.mkString("\nUNION ALL\n"))
  }

  /** DuckDB rendering of the records-per-entity dist battery. */
  def fkDistOracleSql(model: CdmModel): String = {
    val selects = fkDistAnalyses(model).map { a =>
      s"""SELECT CAST(${a.id} AS BIGINT) AS analysis_id, 'ALL' AS stratum_1, CAST(count(*) AS DOUBLE) AS v
         |FROM ${a.table} WHERE ${a.column} IS NOT NULL GROUP BY ${a.column}""".stripMargin
    }
    distOuterSql(selects.mkString("\nUNION ALL\n"))
  }

  /** ONE per-analysis DuckDB rendering, shared by the full oracle and the
    * incremental sum-family oracle (same no-fork contract as
    * [[shapedCount]]).
    */
  private def countSelectSql(a: Analysis): String = a.kind match {
    case CountRows =>
      s"SELECT CAST(${a.id} AS BIGINT) AS analysis_id, 'ALL' AS stratum_1, count(*) AS count_value FROM ${a.table}"
    case ByValue =>
      s"SELECT ${a.id}, ${a.column}, count(*) FROM ${a.table} GROUP BY 2"
    case ByYear =>
      s"SELECT ${a.id}, CAST(year(${a.column}) AS VARCHAR), count(*) FROM ${a.table} GROUP BY 2"
    case ByMonth =>
      s"SELECT ${a.id}, strftime(${a.column}, '%Y%m'), count(*) FROM ${a.table} GROUP BY 2"
    case DistinctFk =>
      s"SELECT ${a.id}, 'ALL', count(DISTINCT ${a.column}) FROM ${a.table}"
    case DistinctFkByYear =>
      s"SELECT ${a.id}, CAST(year(${a.column2}) AS VARCHAR), count(DISTINCT ${a.column}) FROM ${a.table} GROUP BY 2"
  }

  private def countSelectsSql(model: CdmModel): String =
    analyses(model).map(countSelectSql).mkString("\nUNION ALL\n")

  def oracleSql(model: CdmModel): String =
    s"""WITH results AS (
       |${countSelectsSql(model)}
       |)
       |SELECT analysis_id, stratum_1, count_value FROM results
       |WHERE count_value > 5
       |ORDER BY analysis_id, stratum_1""".stripMargin

  /** The scratch->final merge (`achilles.py:507-561` /
    * `merge_achilles_tables.sql`): every analysis family lands in the ONE
    * canonical `achilles_results` shape — `analysis_id, stratum_1..5,
    * count_value` — with the unused strata NULL-padded (the reference's
    * `casted_names` padding), suppression already applied per family.
    */
  def mergedResults(model: CdmModel, load: String => DataFrame): DataFrame = {
    // Stage-2 fusion (guide §2.4): a table's SUM-family analyses and its
    // PAIR analyses share ONE stack + ONE count aggregate — the sum rows
    // ride with stratum_2 = NULL (their groups are untouched: the extra
    // key is constant) and the pair rows carry stratum_2 = year(ts), so
    // the merged battery scans each table at most TWICE (count pass +
    // distinct pass) instead of three times. Row-identical to the
    // separate results()+pairResults() union: same groups, same counts,
    // same >5 suppression per family.
    val byTable = analyses(model).groupBy(_.table)
    val pairsByTable = pairAnalyses(model).groupBy(_.table)
    val passes = model.tables.flatMap { tb =>
      val as = byTable.getOrElse(tb, Seq.empty)
      val (dist, sums) = as.partition(a => DistinctKinds(a.kind))
      val prs = pairsByTable.getOrElse(tb, Seq.empty)
      if (as.isEmpty && prs.isEmpty) Nil
      else {
        val df = load(tb)
        val countPass =
          if (sums.isEmpty && prs.isEmpty) Nil
          else {
            val entries =
              sums.map(a =>
                s"CAST(${a.id} AS BIGINT), ${stratumSql(a)}, CAST(NULL AS STRING)") ++
              prs.map(a =>
                s"CAST(${a.id} AS BIGINT), `${a.strCol}`, CAST(year(`${a.tsCol}`) AS STRING)")
            val stackExpr = s"stack(${entries.size}, ${entries.mkString(", ")}) " +
              "AS (analysis_id, stratum_1, stratum_2)"
            Seq(df.select(expr(stackExpr))
              .groupBy(col("analysis_id"), col("stratum_1"), col("stratum_2"))
              .agg(count(lit(1)).as("count_value")))
          }
        val distPasses = dist.groupBy(a => df.schema(a.column).dataType).toSeq
          .sortBy(_._2.head.id)
          .map { case (_, group) =>
            fusedDistinctCounts(group, df)
              .withColumn("stratum_2", lit(null).cast("string"))
          }
        countPass ++ distPasses
      }
    }
    val nulls = (3 to 5).map(i => lit(null).cast("string").as(s"stratum_$i"))
    passes.pipe(graft.Unions.balanced)
      .filter(col("count_value") > 5)
      .select(Seq(col("analysis_id"), col("stratum_1"), col("stratum_2")) ++
        nulls :+ col("count_value"): _*)
  }

  /** DuckDB rendering of [[mergedResults]]. */
  def mergedOracleSql(model: CdmModel): String = {
    val pairSelects = pairAnalyses(model).map { a =>
      s"""SELECT CAST(${a.id} AS BIGINT) AS analysis_id, ${a.strCol} AS stratum_1,
         |  CAST(year(${a.tsCol}) AS VARCHAR) AS stratum_2, count(*) AS count_value
         |FROM ${a.table} GROUP BY 2, 3""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH counts AS (
       |${countSelectsSql(model)}
       |), pairs AS (
       |$pairSelects
       |)
       |SELECT analysis_id, stratum_1,
       |  CAST(NULL AS VARCHAR) AS stratum_2, CAST(NULL AS VARCHAR) AS stratum_3,
       |  CAST(NULL AS VARCHAR) AS stratum_4, CAST(NULL AS VARCHAR) AS stratum_5,
       |  count_value
       |FROM counts WHERE count_value > 5
       |UNION ALL
       |SELECT analysis_id, stratum_1, stratum_2,
       |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), count_value
       |FROM pairs WHERE count_value > 5
       |ORDER BY analysis_id, stratum_1, stratum_2""".stripMargin
  }
}
