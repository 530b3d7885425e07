package graft.sources

import java.nio.file.{Files, Path}
import java.util.regex.{Matcher, Pattern}

/** S9 user-query template rendering: the reference's ETL folders hold
  * `.sql` / `.sql.jinja` files per OMOP table, and jinja files carry
  * `{{project_raw}}` / `{{dataset_work}}` / `{{dataset_omop}}` /
  * `{{omop_table}}` variables substituted before execution
  * (`/root/reference/src/riab/etl/etl.py:930-940` contract, rendering at
  * `bigquery/etl.py:325-345`; sample template
  * `bigquery/templates/cdm_folders/sample_etl_query.sql.jinja`).
  *
  * The Spark analogue renders the same four variables (to registered view
  * names / zone namespaces) and hands the result to `spark.sql`. Plain
  * `.sql` files pass through untouched, exactly like the reference.
  */
object SqlTemplates {

  /** Substitute `{{ name }}` (whitespace-tolerant) occurrences. */
  def render(sql: String, vars: Map[String, String]): String =
    vars.foldLeft(sql) { case (acc, (k, v)) =>
      acc.replaceAll(
        "\\{\\{\\s*" + Pattern.quote(k) + "\\s*\\}\\}",
        Matcher.quoteReplacement(v))
    }

  /** Read a user query file; render only `.jinja` files
    * (`bigquery/etl.py:335-344`) through the [[JinjaLite]] subset engine,
    * so `{% if %}`/`{% for %}` blocks work with Jinja2 semantics and any
    * construct beyond the subset fails loudly instead of reaching
    * `spark.sql` unrendered (round-6 advisory).
    */
  def fromFile(
      path: Path,
      omopTable: String,
      projectRaw: String,
      datasetWork: String,
      datasetOmop: String): String = {
    val raw = new String(Files.readAllBytes(path), "UTF-8")
    if (path.toString.endsWith(".jinja"))
      try JinjaLite.render(raw, Map(
        "project_raw" -> projectRaw,
        "dataset_work" -> datasetWork,
        "dataset_omop" -> datasetOmop,
        "omop_table" -> omopTable))
      catch {
        case e: RuntimeException =>
          throw new IllegalArgumentException(
            s"failed to render Jinja template $path: ${e.getMessage}", e)
      }
    else raw
  }
}
