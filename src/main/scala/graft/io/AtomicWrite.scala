package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S11: atomic table replace — the Spark analogue of the reference's
  * `CREATE OR REPLACE TABLE omop.{t} ... AS (query)` CTAS swap
  * (`/root/reference/src/riab/etl/bigquery/templates/etl/{omop_table}_merge.sql.jinja:3-12`),
  * honoring "each ETL step is an atomic operation, it either fails or
  * succeeds" (`/root/reference/README.md:30`).
  *
  * Protocol (all renames are single-filesystem directory renames, which
  * HDFS/local/most object-store committers perform atomically):
  *
  *   1. write the new data to `<path>.__tmp` (stale tmp from a crash is
  *      deleted first — it was never promoted, so it is garbage);
  *   2. demote the current table: `<path>` -> `<path>.__old`;
  *   3. promote: `<path>.__tmp` -> `<path>`;
  *   4. drop `<path>.__old`.
  *
  * A crash before 3 leaves the old table readable (possibly under the
  * `.__old` name — [[recover]] restores it); a crash after 3 leaves the new
  * table live. No reader ever observes a half-written table at `<path>`.
  */
object AtomicWrite {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpOf(path: String) = new Path(path + ".__tmp")
  private def oldOf(path: String) = new Path(path + ".__old")

  /** Atomically replace the parquet table at `path` with `df`. */
  def replace(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val target = new Path(path)
    val f = fs(spark, target)
    val tmp = tmpOf(path)
    val old = oldOf(path)
    if (f.exists(tmp)) f.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(old)) f.delete(old, true)
    if (f.exists(target)) {
      if (!f.rename(target, old))
        throw new java.io.IOException(s"atomic replace: demote failed for $path")
    }
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"atomic replace: promote failed for $path")
    f.delete(old, true)
  }

  /** Restore a table whose promote step was interrupted: if `<path>` is
    * missing but `<path>.__old` survives, the demoted table is moved back.
    * Returns true if a recovery happened.
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val target = new Path(path)
    val f = fs(spark, target)
    val old = oldOf(path)
    if (!f.exists(target) && f.exists(old)) f.rename(old, target)
    else false
  }

  /** Read the table, transparently recovering from an interrupted replace. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    recover(spark, path)
    spark.read.parquet(path)
  }
}
