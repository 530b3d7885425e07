package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, document fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs), so the whole family stays inside WholeStageCodegen and the
  * parquet scan only reads the referenced columns. Each primitive is also
  * expressible in ANSI SQL so the DuckDB oracle can replay it exactly.
  */
object TextOps {

  /** Portable deterministic 32-bit hash: first 8 hex chars of md5, parsed
    * base-16. Identical in any engine with `md5` + hex parsing (DuckDB:
    * `('0x'||substr(md5(s),1,8))::BIGINT`), unlike Spark's murmur `hash()`.
    * Used as the shingle/token hash for MinHash/SimHash.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace tokenization of trimmed, lower-cased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish sub-word unit count: split on whitespace AND on letter/digit
    * boundaries, approximating byte-pair segment counts with a pure regex
    * (no vocab needed at planning time).
    */
  def subwordCount(text: Column): Column =
    size(split(trim(lower(text)), "\\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"))

  /** Punctuation-character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Count of stopword occurrences from a fixed marker list. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    regexp_count(lower(text), lit(markers.mkString("\\b(", "|", ")\\b")))

  /** English stopword markers used by quality scoring / language ID. */
  val enMarkers = Seq("the", "and", "of", "a", "to", "in", "is")
  val deMarkers = Seq("der", "die", "das", "und", "ist", "ein", "von")
  val frMarkers = Seq("le", "la", "les", "et", "est", "un", "de")
  val esMarkers = Seq("el", "los", "las", "es", "un", "una", "y")

  /** Quality score in [0,1]: length band + stopword density - punctuation
    * noise. Deterministic arithmetic only (rounded by callers for float
    * parity across engines).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val stopDensity = least(markerCount(text, enMarkers).cast("double") / greatest(toks, lit(1.0)), lit(1.0))
    val punctNoise = least(punctCount(text).cast("double") / greatest(len, lit(1.0)), lit(1.0))
    (lenScore * lit(0.4) + stopDensity * lit(0.4) + (lit(1.0) - punctNoise) * lit(0.2))
  }

  /** N-gram-heuristic language ID: score each language by marker-word hits,
    * pick the max (ties broken by fixed language order en>de>fr>es, then
    * 'und' = undetermined when nothing matches).
    */
  def langId(text: Column): Column = {
    val en = markerCount(text, enMarkers)
    val de = markerCount(text, deMarkers)
    val fr = markerCount(text, frMarkers)
    val es = markerCount(text, esMarkers)
    val m = greatest(en, de, fr, es)
    when(m === 0, lit("und"))
      .when(en === m, lit("en"))
      .when(de === m, lit("de"))
      .when(fr === m, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Content-defined document fingerprint: md5 over the sorted distinct
    * token set — invariant to token order and duplication, the
    * set-fingerprint used for fast near-dup prefiltering.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** PII patterns, written to behave identically under Java regex (Spark)
    * and RE2 (DuckDB): no backreferences, no lookaround, unambiguous
    * greedy quantifiers — leftmost non-overlapping matching then agrees
    * between the engines, which is what keeps the scrub oracle-replayable.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,2} \\d{3} \\d{4}"

  /** Redact emails, IPv4 addresses, and phone numbers (in that fixed
    * order — replacement tokens must not re-match a later pattern). Three
    * chained codegen'd `regexp_replace`s, no UDF.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))

  /** Word w-shingles: overlapping w-token windows joined by a space — the
    * MinHash input unit. Backed by the native codegen'd
    * [[graft.functions.WordShingles]] expression (registered by
    * GraftExtensions): the earlier `transform(sequence, i ->
    * array_join(slice(...)))` formulation ran its lambda INTERPRETED per
    * shingle, in the hot path of every MinHash consumer.
    */
  def shingles(text: Column, w: Int = 3): Column =
    call_function("word_shingles", tokens(text), lit(w))

  /** Winnowing fingerprint set (MOSS, SIGMOD 2003): the distinct sorted
    * per-window minima of the shingle rolling hashes — guaranteed-coverage
    * local fingerprints for plagiarism/overlap detection (any shared run
    * of `window + shingleW - 1` tokens shares a fingerprint). Backed by
    * the native codegen'd [[graft.functions.WinnowHashes]] expression.
    */
  def winnowFingerprints(text: Column, shingleW: Int = 3, window: Int = 4): Column =
    // sort_array, NOT array_sort: the lambda comparator of array_sort is a
    // higher-order function and knocks the whole Project out of
    // WholeStageCodegen; sort_array is an ordinary codegen'd expression
    sort_array(array_distinct(
      call_function("winnow_hashes", shingles(text, shingleW), lit(window))))
}
