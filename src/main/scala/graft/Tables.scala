package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md,
  * plus `documents`/`embeddings` which exist on disk at every scale factor).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * the parquet tables it needs through these helpers, so filters/projections
  * written against the returned DataFrames are pushed straight into the
  * parquet scan by Catalyst (verify with `.explain("formatted")`:
  * `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): a DataFrame is an immutable plan, so
  // handing the same object to every caller is pure reuse — each action still
  // re-executes, but the parquet file listing + footer schema read happen once
  // per table instead of once per `load` call (the generated DQD/Achilles
  // batteries call `load` once per analysis — dozens of times per table).
  private val plans =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    plans.getOrElseUpdate((spark, sfDir, name), doLoad(spark, sfDir, name))

  private def doLoad(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts arrives as either parquet TIMESTAMP(MICROS) (read natively
      // as a timestamp type) or TIMESTAMP(NANOS), which Spark 4 refuses to
      // map to TimestampType and surfaces as raw nano LONGs when the session
      // was built with `spark.sql.legacy.parquet.nanosAsLong=true`
      // (Bench/Verify/SparkSpec set it; a NANOS file read without it fails
      // in the schema converter with its own error). Branch on the REAL
      // schema rather than assuming a generator version: the nano data is
      // micro-precision, so `nanos div 1000` is lossless.
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      val fixed = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => df
      }
      fixed.select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view so queries can also be phrased in
    * Spark SQL (the engine's equivalent of the reference's warehouse-SQL
    * surface, src/riab/etl/etl.py:930-940).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
