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
  // Library note: entries live for the SparkSession's lifetime and are never
  // evicted. That is the right trade for a bench/ETL process reading a fixed
  // table set; a long-lived service loading from many directories would want
  // an eviction policy (or to call `spark.read.parquet` directly) — the
  // cached object is only a logical plan, so the footprint is small but
  // unbounded in the number of distinct (dir, table) pairs.
  private val plans =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    plans.getOrElseUpdate((spark, sfDir, name), doLoad(spark, sfDir, name))

  /** Normalize a timestamp column read from parquet to session-TZ
    * `TimestampType`, whatever the on-disk encoding. Test-data generators
    * have shipped three encodings of `events.ts` across rounds, and the
    * loader must accept all of them (the driver can change the encoding
    * between scored rounds — round 7 lost six queries to exactly that):
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 can't map it to TimestampType and
    *    surfaces raw nano LONGs when the session sets
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (Bench/Verify/SparkSpec
    *    do; without the conf the schema converter fails with its own error).
    *    The nano payload is micro-precision, so `div 1000` is lossless.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it
    *    as TIMESTAMP_NTZ. The session TZ is pinned UTC everywhere we run,
    *    so the cast to TimestampType is value-preserving.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=true): already
    *    TimestampType — pass through.
    *
    * Anything else (e.g. a plain INT64 column in a session WITHOUT the
    * nanos conf, or a string column) fails loudly rather than mis-scaling.
    */
  def normalizedTs(spark: SparkSession, dt: org.apache.spark.sql.types.DataType,
      colName: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType =>
        // A long-typed ts can only legitimately arise from the nanosAsLong
        // conf on a TIMESTAMP(NANOS) file; a generator emitting plain INT64
        // epoch-micros/millis would be silently mis-scaled by `div 1000`,
        // so pin the provenance to the conf and fail loudly otherwise.
        require(
          spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
          "long-typed ts without spark.sql.legacy.parquet.nanosAsLong=true: " +
            "unknown epoch unit, refusing to guess")
        // SQL `div` is integer division — `/` on longs would detour through
        // double and lose precision past 2^53 (same trap JoinOps.floorDiv
        // documents).
        expr(s"timestamp_micros(`$colName` div 1000)")
      case TimestampNTZType => col(colName).cast(TimestampType)
      case TimestampType    => col(colName)
      case other => throw new IllegalArgumentException(
        s"unsupported on-disk encoding for event timestamps: $other")
    }
  }

  private def doLoad(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "events" =>
        df.withColumn("ts", normalizedTs(spark, df.schema("ts").dataType, "ts"))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case "embeddings" =>
        // the same drift-proofing the events.ts episode taught (a generator
        // encoding change must never reach operator code): the similarity
        // tier's contract is `array<float>` + long ids — a generator
        // switching to float64 vectors or int32 ids would otherwise fail
        // analysis (vec_dot is float-typed) in a scored round. Casting an
        // already-float32 column is a no-op in the plan.
        import org.apache.spark.sql.types._
        df.schema("embedding").dataType match {
          case ArrayType(FloatType | DoubleType, _) => ()
          case other => throw new IllegalArgumentException(
            s"unsupported on-disk embedding type: $other")
        }
        df.withColumn("vec_id", col("vec_id").cast("long"))
          .withColumn("embedding", col("embedding").cast("array<float>"))
          .withColumn("label", col("label").cast("int"))
      case "documents" =>
        // ids/counters pinned to long — the dedup tier keys every join on
        // doc_id and the salted paths take doc_id % salt
        df.withColumn("doc_id", col("doc_id").cast("long"))
          .withColumn("n_chars", col("n_chars").cast("long"))
      case _ => df
    }
  }

  /** Register every table as a temp view so queries can also be phrased in
    * Spark SQL (the engine's equivalent of the reference's warehouse-SQL
    * surface, src/riab/etl/etl.py:930-940).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
