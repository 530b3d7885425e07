package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repetition filters — the published Gopher/MassiveText
  * repetition rules (Rae et al. 2021, "Scaling Language Models", table A1):
  * a training corpus drops documents whose content is dominated by repeated
  * lines, paragraphs, or n-grams. The reference engine stops at corpus-level
  * dedup; this family is the *within*-document sibling every large-scale
  * text pipeline runs next to it.
  *
  * Measures (all per document):
  *  - duplicate line / paragraph fraction: the share of line (paragraph)
  *    occurrences whose text appears more than once in the document;
  *  - duplicate line / paragraph CHARACTER fraction: the share of
  *    characters inside those repeated occurrences;
  *  - top n-gram character mass (n = 2, 3, 4): `count(g) * len(g)` of the
  *    heaviest n-gram over the document's character length — the
  *    deterministic char-mass form of Gopher's "fraction of characters
  *    contained within the most frequently-occurring n-gram" (char mass
  *    needs no most-frequent tie-break, so it replays identically on any
  *    engine);
  *  - duplicate n-gram character mass (n = 5..10): the summed char mass of
  *    every n-gram occurring more than once, capped at 1 (the published
  *    rule discounts window overlap; the capped mass form is the standard
  *    reproduction and is exact integer arithmetic end-to-end).
  *
  * The fixture corpus is single-line word soup, so "lines" are defined
  * structurally: the floor(n/8) full non-overlapping 8-token windows
  * ("paragraphs": 32-token windows). Real line-delimited text would split
  * on '\n' instead; everything downstream of the window view is identical.
  *
  * Cross-engine exactness: every reported fraction is a micro-unit LONG
  * computed with integer floor-division only ([[microRatio]]), and every
  * gate threshold compares those integers — no double ever reaches a hash
  * or a branch. Scale shape: one scan per family, explode → one map-side
  * combinable count shuffle on (doc, window) → one bounded per-doc
  * aggregate; no window functions, no driver collects, no UDFs.
  */
object RepetitionOps {

  /** floor(1e6 * a / b) in exact integer arithmetic (a, b ≥ 0, b > 0).
    * Decimal-domain so `a * 1e6` cannot overflow a LONG on huge documents;
    * the final division is exact by construction (same idiom as
    * [[SimOps.meanOfQuantUnits]]). DuckDB mirror:
    * `(1000000 * CAST(a AS HUGEINT)) // b`.
    */
  def microRatio(a: Column, b: Column): Column = {
    val x = a.cast("decimal(38,0)") * lit(1000000L)
    val bd = b.cast("decimal(38,0)")
    ((x - pmod(x, bd)) / bd).cast("long")
  }

  /** The non-overlapping w-token window view: (doc_id, win) — every full
    * window, in document order. Rides the codegen'd `word_shingles`
    * explode with a position filter (the w-fold over-generation is a
    * scan-side projection, embarrassingly parallel, and keeps the plan
    * inside WholeStageCodegen — the transform/slice lambda alternative
    * runs interpreted, the round-4 lesson).
    */
  def windows(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"),
        posexplode(TextOps.shingles(col("text"), w)).as(Seq("i", "win")))
      .filter(col("i") % w === 0)
      .select(col("doc_id"), col("win"))

  /** Per-doc duplicate-window profile at one granularity:
    * (doc_id, n_win, dup_micro, dup_char_micro). Documents shorter than
    * `w` tokens have no windows and are absent (callers default them to
    * zero — nothing repeats inside a window that does not exist).
    */
  def dupWindowProfile(docs: DataFrame, w: Int): DataFrame =
    windows(docs, w)
      .groupBy(col("doc_id"), col("win")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).cast("long").as("n_win"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
          .cast("long").as("dup_win"),
        sum(col("cnt") * length(col("win")).cast("long"))
          .cast("long").as("win_chars"),
        sum(when(col("cnt") > 1, col("cnt") * length(col("win")).cast("long"))
          .otherwise(0L)).cast("long").as("dup_chars"))
      .select(col("doc_id"), col("n_win"),
        microRatio(col("dup_win"), col("n_win")).as("dup_micro"),
        microRatio(col("dup_chars"), col("win_chars")).as("dup_char_micro"))

  /** Line (8-token) + paragraph (32-token) repetition profile. */
  def lineParagraphProfile(docs: DataFrame): DataFrame = {
    val lines = dupWindowProfile(docs, 8)
      .withColumnsRenamed(Map("n_win" -> "n_lines",
        "dup_micro" -> "dup_line_micro", "dup_char_micro" -> "dup_line_char_micro"))
    val paras = dupWindowProfile(docs, 32)
      .withColumnsRenamed(Map("n_win" -> "n_paras",
        "dup_micro" -> "dup_para_micro", "dup_char_micro" -> "dup_para_char_micro"))
    lines.join(paras, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"), col("dup_line_micro"),
        col("dup_line_char_micro"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("dup_para_micro"), lit(0L)).as("dup_para_micro"),
        coalesce(col("dup_para_char_micro"), lit(0L)).as("dup_para_char_micro"))
  }

  /** Whitespace-normalized character length — the denominator every n-gram
    * mass divides by (`len(join(tokens, ' '))`, identical in both engines).
    */
  private def totalChars(text: Column): Column =
    length(concat_ws(" ", TextOps.tokens(text))).cast("long")

  /** One scan producing the n-gram stream for several n at once:
    * (doc_id, total_chars, n, gram). The per-n shingle arrays stack into
    * one array-of-structs so a single pair of explodes serves every n —
    * the corpus is never re-scanned per n.
    */
  private def gramStream(docs: DataFrame, ns: Seq[Int]): DataFrame =
    docs.select(col("doc_id"), totalChars(col("text")).as("total_chars"),
        explode(array(ns.map(n => struct(lit(n.toLong).as("n"),
          TextOps.shingles(col("text"), n).as("gs"))): _*)).as("x"))
      .select(col("doc_id"), col("total_chars"),
        col("x.n").as("n"), explode(col("x.gs")).as("gram"))

  /** Per-doc, per-n top n-gram char-mass micros (n = 2, 3, 4):
    * (doc_id, n, top_mass_micro).
    */
  def topGramMass(docs: DataFrame, ns: Seq[Int] = Seq(2, 3, 4)): DataFrame =
    gramStream(docs, ns)
      .groupBy(col("doc_id"), col("total_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("total_chars"), col("n"))
      .agg(max(col("cnt") * length(col("gram")).cast("long")).as("mass"))
      .select(col("doc_id"), col("n"),
        least(microRatio(col("mass"), col("total_chars")), lit(1000000L))
          .as("top_mass_micro"))

  /** Per-doc, per-n duplicated n-gram char-mass micros (n = 5..10), capped
    * at 1e6: (doc_id, n, dup_mass_micro).
    */
  def dupGramMass(docs: DataFrame, ns: Seq[Int] = (5 to 10)): DataFrame =
    gramStream(docs, ns)
      .groupBy(col("doc_id"), col("total_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("total_chars"), col("n"))
      .agg(sum(when(col("cnt") > 1, col("cnt") * length(col("gram")).cast("long"))
        .otherwise(0L)).cast("long").as("mass"))
      .select(col("doc_id"), col("n"),
        least(microRatio(col("mass"), col("total_chars")), lit(1000000L))
          .as("dup_mass_micro"))

  /** The published Gopher repetition thresholds, in micro-units, keyed the
    * way the gate reads them. Top n-gram: 0.20 / 0.18 / 0.16 for n=2/3/4;
    * duplicated n-gram: 0.15 down to 0.10 for n=5..10; duplicate
    * line/paragraph fraction 0.30; their character fractions 0.20.
    */
  val TopGramThresholdMicro: Map[Int, Long] =
    Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L)
  val DupGramThresholdMicro: Map[Int, Long] =
    Map(5 -> 150000L, 6 -> 140000L, 7 -> 130000L, 8 -> 120000L,
      9 -> 110000L, 10 -> 100000L)
  val DupWindowThresholdMicro = 300000L
  val DupWindowCharThresholdMicro = 200000L

  /** The composite Gopher repetition gate: per document, how many of the
    * 13 published repetition rules fail, and whether the document is kept
    * (kept = zero failures). Every comparison is integer micro vs integer
    * threshold. The per-n profiles arrive in long format and pivot into
    * bounded conditional sums — one aggregate per family, then a 3-way
    * join on doc_id (each side already doc-unique).
    */
  def gopherGate(docs: DataFrame): DataFrame = {
    val lp = lineParagraphProfile(docs)
      .select(col("doc_id"),
        ((col("dup_line_micro") > DupWindowThresholdMicro).cast("long") +
          (col("dup_para_micro") > DupWindowThresholdMicro).cast("long") +
          (col("dup_line_char_micro") > DupWindowCharThresholdMicro).cast("long") +
          (col("dup_para_char_micro") > DupWindowCharThresholdMicro).cast("long"))
          .as("win_fails"))
    val top = topGramMass(docs).groupBy(col("doc_id"))
      .agg(sum(TopGramThresholdMicro.toSeq.sortBy(_._1).map { case (n, th) =>
        when(col("n") === n && col("top_mass_micro") > th, 1L).otherwise(0L)
      }.reduce(_ + _)).as("top_fails"))
    val dup = dupGramMass(docs).groupBy(col("doc_id"))
      .agg(sum(DupGramThresholdMicro.toSeq.sortBy(_._1).map { case (n, th) =>
        when(col("n") === n && col("dup_mass_micro") > th, 1L).otherwise(0L)
      }.reduce(_ + _)).as("dup_fails"))
    // anchor on the DOCS frame so the gate is TOTAL over the corpus
    // (ADVICE r11): a document too short for any window or n-gram has
    // nothing to repeat — it fails zero rules and is kept, not silently
    // dropped from the verdict a downstream keep-join would read
    docs.select(col("doc_id"))
      .join(lp, Seq("doc_id"), "left")
      .join(top, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("win_fails"), lit(0L)) +
          coalesce(col("top_fails"), lit(0L)) +
          coalesce(col("dup_fails"), lit(0L))).as("fails"))
      .select(col("doc_id"), col("fails"),
        (col("fails") === 0L).cast("long").as("kept"))
  }
}
