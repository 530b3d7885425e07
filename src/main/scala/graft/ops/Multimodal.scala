package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns traveling next to typed metadata. The Spark-side
  * contract — schema, partition sizing, batch-shaped decode boundary — is
  * real and tested; the actual codec call is STUBBED (this container ships
  * no image/audio libraries) behind [[MediaCodec.decodeStub]], a
  * deterministic fake that preserves the data-flow shape.
  */
object Multimodal {

  /** Canonical media-row schema: payload + typed metadata. Binary payloads
    * are opaque to Catalyst; all filtering/pruning happens on the metadata
    * columns so scans can skip payload bytes entirely (parquet column
    * pruning) when a query only needs metadata.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("byte_len", LongType, nullable = true),
    StructField("content_hash", StringType, nullable = true)))

  /** Wrap a text-ish table into media rows (payload = utf8 bytes) — the
    * plumbing used by tests and the oracle query; a real ingest would read
    * binaryFile sources (`spark.read.format("binaryFile")`) instead.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col(textCol).cast("binary")).cast("long").as("byte_len"),
      md5(col(textCol).cast("binary")).as("content_hash"))

  /** Video-style frame sampling: explode each payload into fixed-width
    * frame windows, one row per sampled frame — the fan-out stage a video
    * pipeline runs before per-frame decode (which remains the stubbed
    * codec boundary). Pure expressions: `sequence` for the frame index
    * domain, binary `substring` for the window — no UDF, row amplification
    * bounded by `maxFrames`.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(
      lit(maxFrames.toLong),
      ceil(col("byte_len").cast("double") / frameBytes).cast("long"))
    media
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0L), nFrames - 1))
          .otherwise(array().cast("array<bigint>"))))
      .select(
        col("media_id"),
        col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame_bytes"))
      .select(
        col("media_id"),
        col("frame_idx"),
        octet_length(col("frame_bytes")).cast("long").as("frame_len"),
        md5(col("frame_bytes")).as("frame_hash"))
  }

  /** Decoded-feature schema produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Batch decode boundary: the Scala analogue of a `mapInPandas` batch UDF —
    * `mapPartitions` so the (expensive, native-library) decoder amortizes
    * per-partition setup, exactly the batch shape a real codec needs.
    * Partition sizing stays the caller's lever (`repartition` upstream);
    * nothing is collected to the driver.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outEncoder = org.apache.spark.sql.Encoders.row(featureSchema)
    media
      .select("media_id", "modality", "payload")
      .mapPartitions { rows =>
        // per-partition codec init would happen here (native lib handle)
        rows.map { r =>
          val (feat, w, h) = MediaCodec.decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), r.getString(1), feat, w, h)
        }
      }(outEncoder)
  }
}

/** STUB codec — deterministic fake standing in for an image/audio decoder
  * (the real call would be e.g. libjpeg/ffmpeg via JNI; not present in this
  * container). Produces stable pseudo-features from payload bytes so the
  * pipeline around it is fully testable.
  */
object MediaCodec {
  def decodeStub(payload: Array[Byte]): (Array[Float], Int, Int) = {
    if (payload == null) (Array.empty[Float], 0, 0)
    else {
      val n = payload.length
      // 8 deterministic moments over byte windows = the fake "feature".
      // The mean divides in DOUBLE and narrows to float afterwards: float
      // division double-rounds differently from float(double-division) in
      // rare cases, and the double->float narrowing is the one form an
      // external SQL oracle can replay exactly (CAST(sum/len AS FLOAT)).
      val feat = (0 until 8).map { k =>
        val slice = payload.drop(k * n / 8).take(math.max(n / 8, 1))
        if (slice.isEmpty) 0f
        else (slice.map(_ & 0xff).sum.toDouble / slice.length).toFloat
      }.toArray
      (feat, n % 640, n % 480)
    }
  }
}
