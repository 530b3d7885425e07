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

  /** REAL binary-file ingest: read a directory of media files through
    * Spark's `binaryFile` source into the canonical media-row shape —
    * media_id parsed from the file name, payload = file content. The
    * distributed path an image corpus actually arrives on: the source
    * splits by file, pushes `pathGlobFilter`, and prunes `content` when a
    * downstream query touches only metadata.
    */
  def fromBinaryFiles(
      spark: SparkSession, dir: String, glob: String, modality: String, mime: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[A-Za-z0-9]+$", 1).cast("long").as("media_id"),
        lit(modality).as("modality"),
        col("content").as("payload"),
        lit(mime).as("mime"),
        col("length").as("byte_len"),
        md5(col("content")).as("content_hash"))

  /** Wrap a text-ish table into media rows (payload = utf8 bytes) — the
    * plumbing used by tests and the oracle query; real file corpora come
    * in through [[fromBinaryFiles]] instead.
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

  /** REAL image decode through the same batch boundary as
    * [[decodeFeatures]]: `mapPartitions` over `(media_id, payload)` rows,
    * PNG-decoding each payload with [[PngCodec]] and emitting exact channel
    * moments. The decoder initializes per partition (ImageIO reader reuse
    * would live here), nothing is collected, and the binary column never
    * reaches the driver.
    */
  val imageMomentSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  def decodeImageMoments(media: DataFrame): DataFrame = {
    val outEncoder = org.apache.spark.sql.Encoders.row(imageMomentSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        // positional access: upstream mapPartitions stages emit schema-less
        // GenericRows, where name-based getAs throws
        rows.map { r =>
          val (w, h, sr, sg, sb) = PngCodec.channelSums(r.getAs[Array[Byte]](1))
          val n = (w.toLong * h).toDouble
          Row(r.getLong(0), w, h, sr / n, sg / n, sb / n)
        }
      }(outEncoder)
  }

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

/** REAL pure-JVM image codec (round-5 verdict "Next round" #5): the JDK
  * ships `javax.imageio` — PNG (and BMP/GIF) decode with zero new
  * dependencies, so the image modality no longer needs [[MediaCodec]]'s
  * stub. PNG is lossless: encode(pixels) -> decode recovers the exact
  * channel values, which is what makes the path externally oracle-checkable
  * (the DuckDB oracle predicts the channel moments of a synthetic image
  * analytically; a wrong decode shifts every mean).
  */
object PngCodec {

  /** Deterministic fixture image for `mediaId`: pixel (x, y) carries
    * r=(id+x)%256, g=(id+y)%256, b=(id+x+y)%256 — moments an external SQL
    * oracle can compute without decoding.
    */
  def syntheticPng(mediaId: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((mediaId + x) % 256).toInt
        val g = ((mediaId + y) % 256).toInt
        val b = ((mediaId + x + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** [[syntheticPng]] with pixel (0, 0) forced WHITE — the near-duplicate
    * fixture: one perturbed pixel leaves the average-hash within a few
    * bits of the base image's.
    */
  def syntheticPngWhiteOrigin(mediaId: Long, width: Int, height: Int): Array[Byte] = {
    val base = syntheticPng(mediaId, width, height)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    img.setRGB(0, 0, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The 8x8 average-hash (aHash — the classic perceptual near-dup
    * fingerprint) as a 64-char '0'/'1' string, row-major over blocks.
    * Pixel (x, y) lands in block (y*8/h, x*8/w); a block's bit is set iff
    * its gray sum exceeds the image mean, compared CROSS-MULTIPLIED
    * (blockSum * totalPixels > totalSum * blockPixels) so the whole hash
    * is integer-exact and an external SQL oracle replays it from the
    * synthetic fixtures' pixel formula — certifying decode + hash
    * end-to-end. A bitstring (not a packed long) keeps bit 63 out of sign
    * territory and makes banding a substring.
    */
  def aHashBits(payload: Array[Byte]): String = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val gs = Array.ofDim[Long](8, 8)
    val np = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val rgb = img.getRGB(x, y)
        gs(by)(bx) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        np(by)(bx) += 1
        x += 1
      }
      y += 1
    }
    var (gtot, ntot) = (0L, 0L)
    for (by <- 0 until 8; bx <- 0 until 8) { gtot += gs(by)(bx); ntot += np(by)(bx) }
    val sb = new StringBuilder(64)
    for (by <- 0 until 8; bx <- 0 until 8)
      sb.append(if (gs(by)(bx) * ntot > gtot * np(by)(bx)) '1' else '0')
    sb.result()
  }

  /** Decode a PNG payload and return `(width, height, sumR, sumG, sumB)` —
    * exact integer channel sums, so the derived means replay bit-for-bit in
    * any engine (`CAST(sum AS DOUBLE) / count`).
    */
  def channelSums(payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, sr, sg, sb)
  }
}

/** STUB codec — deterministic fake standing in for an image/audio decoder
  * (the real call would be e.g. libjpeg/ffmpeg via JNI; not present in this
  * container). Still used for the audio/video modalities; the IMAGE path
  * decodes for real through [[PngCodec]]. Produces stable pseudo-features
  * from payload bytes so the pipeline around it is fully testable.
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
