package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1 input: one concept column's usagi mapping — `(sourceCode, conceptId,
  * mappingStatus)` — with the status filter folded into the join condition
  * (P2) and the NULL-preservation rule for `_source_concept_id`-style
  * columns (P3, `{omop_table}_merge.sql.jinja:43-49`).
  */
final case class ConceptSwapSpec(
    column: String,
    outName: String,
    usagi: DataFrame,
    preserveNull: Boolean = false,
    statuses: Seq[String] = Seq("APPROVED"))

/** J3 input: one FK column's swap map `(x, y)`; required columns default to
  * 0 on a miss (`{omop_table}_merge.sql.jinja:34-42`).
  */
final case class FkSwapSpec(column: String, swap: DataFrame, required: Boolean)

/** §2.12-5: the composed merge pipeline — the reference's biggest generated
  * statement (`{omop_table}_merge.sql.jinja:3-149`) as ONE declarative
  * Spark plan:
  *
  *   uploads UNION ALL (U1, DISTINCT per S10)
  *     -> per-concept usagi LEFT joins (J1, status filter in the condition)
  *     -> PK-swap INNER join on the null-normalized compound key
  *        `x = t.pk AND IFNULL(swap.c, 0) = IFNULL(usagi.conceptId, 0)`
  *        (J2, `:81-95` — NULL deliberately conflates with the 0 default,
  *        so Spark's null-safe `<=>` would be WRONG here)
  *     -> per-FK swap LEFT joins (J3, required cols defaulted)
  *     -> `_source_value` STRING_AGG window over the dedup identity (W5)
  *     -> ROW_NUMBER dedup keep-first over (pk, concept cols) with the
  *        deterministic all-columns tie-break (W3)
  *     -> UNION ALL preserved rows (U2, the vocabulary `< 2e9` tail).
  *
  * Scale shape: usagi maps are human-curated (small) -> broadcast; the PK
  * swap join shuffles on `x` (the table's key — the same partitioning the
  * dedup window reuses); no driver-side data movement anywhere.
  */
object MergePipeline {

  def run(
      uploads: Seq[DataFrame],
      pkCol: String,
      newPkName: String,
      pkSwap: DataFrame, // columns: x, <concept outName cols>, y
      concepts: Seq[ConceptSwapSpec],
      fks: Seq[FkSwapSpec],
      sourceValue: Option[(String, String)], // (input col, aggregated output col)
      preserved: Option[DataFrame]): DataFrame = {

    // U1 + S10: per-query uploads are DISTINCT'ed, then unioned
    val t0 = MergeOps.unionUploads(uploads.map(_.distinct()))

    // J1: one usagi left join per concept column
    val withUsagi = concepts.zipWithIndex.foldLeft(t0) { case (df, (cs, i)) =>
      val u = broadcast(cs.usagi.select(
        col("sourceCode").as(s"__sc_$i"),
        col("conceptId").as(s"__ci_$i"),
        col("mappingStatus").as(s"__ms_$i")))
      df.join(u, df(cs.column) === u(s"__sc_$i") && u(s"__ms_$i").isin(cs.statuses: _*), "left")
        .drop(s"__sc_$i", s"__ms_$i")
    }

    // J2: INNER join the pk swap on the null-normalized compound identity
    val swapCols = col("x").as("__swap_x") +:
      concepts.map(c => col(c.outName).as(s"__swap_${c.outName}")) :+
      col("y").as("__swap_y")
    val sw = pkSwap.select(swapCols: _*)
    val joinCond = concepts.zipWithIndex.foldLeft(withUsagi(pkCol) === sw("__swap_x")) {
      case (acc, (cs, i)) =>
        acc && MergeOps.nullNormEq(sw(s"__swap_${cs.outName}"), withUsagi(s"__ci_$i"), lit(0L))
    }
    val j2 = withUsagi.join(sw, joinCond, "inner")

    // projection: surrogate pk; concept outputs (NULL preserved or 0-defaulted)
    val projected = concepts.zipWithIndex
      .foldLeft(j2.withColumn(newPkName, col("__swap_y"))) { case (df, (cs, i)) =>
        val out = if (cs.preserveNull) col(s"__ci_$i") else coalesce(col(s"__ci_$i"), lit(0L))
        df.withColumn(cs.outName, out).drop(s"__ci_$i").drop(s"__swap_${cs.outName}")
      }
      .drop("__swap_x", "__swap_y")
      .drop(pkCol)
      .drop(concepts.map(_.column).filterNot(c => concepts.exists(_.outName == c)): _*)

    // J3: FK swap left joins
    val withFks = fks.foldLeft(projected)((df, f) =>
      MergeOps.fkSwapJoin(df, f.swap, f.column, f.required))

    // W5: source-value aggregation over the dedup identity (same partition
    // the W3 window uses, so Catalyst reuses one sort+shuffle for both)
    val identityCols = (newPkName +: concepts.map(_.outName)).map(col)
    val withStragg = sourceValue.fold(withFks) { case (in, out) =>
      val w = Window.partitionBy(identityCols: _*)
      withFks
        .withColumn(out, substring(concat_ws(",", array_sort(collect_list(col(in)).over(w))), 1, 255))
        .drop(in)
    }

    // W3: deterministic dedup keep-first
    val deduped = MergeOps.dedupKeepFirst(withStragg, newPkName +: concepts.map(_.outName))

    // U2: preserved existing rows (vocabulary < 2e9 tail)
    preserved.fold(deduped)(p => deduped.unionByName(p))
  }
}
