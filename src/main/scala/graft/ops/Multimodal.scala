package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode / feature-extraction
  * running batched per partition.
  *
  * The decode step is REAL for the two classic uncompressed image formats
  * — binary PPM (P6) and 24-bit BMP, parsed header+pixels by
  * [[ImageCodecs]] with zero codec dependencies — and falls back to a
  * deterministic pseudo-feature hash for any other byte stream (JPEG/PNG/
  * audio need entropy coders that arrive via JNI/FFI in deployment, behind
  * the same signature). The pipeline shape (mapPartitions over an iterator
  * of records, fixed-size feature output, spill-safe streaming) is exactly
  * what such a decoder needs at 100 TB.
  */
object Multimodal {

  /** Output schema of [[decodeFeatures]]: id, byte length, and a
    * fixed-width feature vector. */
  def featureSchema(idField: StructField, featureDim: Int): StructType =
    StructType(Seq(
      idField,
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
    ))

  /** Fallback pseudo-features for byte streams that are not a supported
    * image format: deterministic, so unknown-codec payloads still get a
    * stable (if meaningless) vector instead of a crash. */
  def fakeDecode(bytes: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % featureDim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Decode dispatch: real PPM/BMP parse when the payload carries either
    * magic, pseudo-feature fallback otherwise. */
  def decodeToFeatures(bytes: Array[Byte], featureDim: Int): Array[Float] =
    ImageCodecs.decode(bytes) match {
      case Some(img) => ImageCodecs.imageFeatures(img, featureDim)
      case None      => fakeDecode(bytes, featureDim)
    }

  /** Batched decode: one pass per partition over (id, payload) rows,
    * emitting (id, n_bytes, features). Runs as a single narrow
    * mapPartitions — no shuffle; partition sizing (and therefore decoder
    * memory) is controlled upstream by `spark.sql.files.maxPartitionBytes`.
    */
  def decodeFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      featureDim: Int = 16
  ): DataFrame = {
    val idField = df.schema(idCol)
    val schema = featureSchema(idField, featureDim)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        // null payloads are inevitable in ingested media tables: decode
        // them to an empty feature vector instead of crashing the task
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Row(r.get(idIdx), 0L, Seq.empty[Float])
        else Row(r.get(idIdx), bytes.length.toLong,
          decodeToFeatures(bytes, featureDim).toSeq)
      }
    }(encoder)
  }

  /** Batched perceptual hashing: decode each payload and emit the
    * integer-exact average-hash halves
    * ([[ImageCodecs.averageHashHalves]]) — (id, ahash_hi, ahash_lo),
    * null halves for undecodable/null payloads (degrade-don't-crash).
    * One narrow mapPartitions, no shuffle; the hash pair (8 bytes) is
    * what a 100-TB media table persists for dedup — payload bytes never
    * travel again. */
  def imageHashes(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      grid: Int = 8
  ): DataFrame = {
    val idField = df.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("ahash_hi", LongType, nullable = true),
      StructField("ahash_lo", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val decoded = if (bytes == null) None else ImageCodecs.decode(bytes)
        decoded match {
          case Some(img) =>
            val (hi, lo) = ImageCodecs.averageHashHalves(img, grid)
            Row(r.get(idIdx), hi, lo)
          case None => Row(r.get(idIdx), null, null)
        }
      }
    }(encoder)
  }

  /** Batched 256-bit gradient hashing ([[ImageCodecs.gradientHashWords]]):
    * (id, dh0..dh7) — eight non-negative 32-bit words, long-typed, null
    * for undecodable/null payloads. The 32-byte artifact a 100-TB media
    * table persists when 64-bit average-hash banding hits its
    * distinct-image ceiling (see
    * [[graft.ops.Dedup.imageNearDupPairs256]]). One narrow
    * mapPartitions, no shuffle. */
  def imageHashes256(
      df: DataFrame,
      idCol: String,
      payloadCol: String
  ): DataFrame = {
    val idField = df.schema(idCol)
    val schema = StructType(
      idField +: (0 until 8).map(j =>
        StructField(s"dh$j", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val decoded = if (bytes == null) None else ImageCodecs.decode(bytes)
        decoded match {
          case Some(img) =>
            val w = ImageCodecs.gradientHashWords(img)
            Row.fromSeq(r.get(idIdx) +: w.toSeq)
          case None => Row.fromSeq(r.get(idIdx) +: Seq.fill[Any](8)(null))
        }
      }
    }(encoder)
  }

  /** Batched WAV metadata + signal features via [[AudioCodecs.decodeWav]]:
    * (id, sample_rate, channels, bits, n_frames, duration_us, rms), null
    * metadata for undecodable payloads (same degrade-don't-crash contract
    * as the image path). One narrow mapPartitions, no shuffle. */
  def wavFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idField = df.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_us", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        AudioCodecs.decodeWav(bytes) match {
          case Some(m) =>
            Row(r.get(idIdx), m.sampleRate, m.channels, m.bitsPerSample,
              m.nFrames, m.nFrames * 1000000L / m.sampleRate, m.rms)
          case None =>
            Row(r.get(idIdx), null, null, null, null, null, null)
        }
      }
    }(encoder)
  }

  /** Batched audio fingerprinting
    * ([[AudioCodecs.energyFingerprintHalves]]): (id, afp_hi, afp_lo) —
    * the 8-byte integer-exact energy-gradient artifact audio dedup
    * persists; null halves for undecodable/empty payloads. One narrow
    * mapPartitions, no shuffle — the audio sibling of [[imageHashes]]. */
  def audioFingerprints(
      df: DataFrame,
      idCol: String,
      payloadCol: String
  ): DataFrame = {
    val idField = df.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("afp_hi", LongType, nullable = true),
      StructField("afp_lo", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val fp = if (bytes == null) None else AudioCodecs.energyFingerprintHalves(bytes)
        fp match {
          case Some((hi, lo)) => Row(r.get(idIdx), hi, lo)
          case None           => Row(r.get(idIdx), null, null)
        }
      }
    }(encoder)
  }

  /** Batched per-frame 256-bit gradient hashing of concatenated-PPM
    * clips ([[VideoCodecs.decodeClip]] → [[ImageCodecs
    * .gradientHashWords]] per frame): one row per DECODED frame,
    * `(id, frame_idx, dh0..dh7)` — the frame-class table video dedup
    * runs on ([[graft.ops.Dedup.videoNearDupPairs]]). Undecodable/null
    * payloads contribute NO rows (a clip with zero parseable frames has
    * no frame classes to vet; count ids upstream if absence must be
    * loud). One narrow mapPartitions (flatMap per clip), no shuffle —
    * frames never travel, 33 bytes per frame do. */
  def videoFrameHashes(
      df: DataFrame,
      idCol: String,
      payloadCol: String
  ): DataFrame = {
    val idField = df.schema(idCol)
    val schema = StructType(
      Seq(idField, StructField("frame_idx", IntegerType, nullable = false)) ++
        (0 until 8).map(j => StructField(s"dh$j", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val decoded = if (bytes == null) None else VideoCodecs.decodeClip(bytes)
        decoded.toSeq.flatMap { frames =>
          frames.iterator.zipWithIndex.map { case (img, f) =>
            Row.fromSeq(r.get(idIdx) +: f +:
              ImageCodecs.gradientHashWords(img).toSeq)
          }
        }
      }
    }(encoder)
  }

  /** Attach media metadata columns derivable without decoding (cheap,
    * codegen'd): payload size, leading magic bytes, a content digest. */
  def withMediaMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("magic", hex(substring(col(payloadCol), 1, 4)))
      .withColumn("content_digest", md5(col(payloadCol)))

  /** Image resize for binary payloads: payloads [[ImageCodecs]] can parse
    * (binary PPM / 24-bit BMP) are decoded, nearest-neighbor downscaled by
    * `factor` ([[ImageCodecs.resizeNearest]] — exact integer index math),
    * and re-encoded as PPM; any other byte stream falls back to the
    * deterministic keep-every-`factor`-th-byte downsample (the shape
    * plumbing for codecs that arrive via JNI/FFI at deployment). Batched
    * per partition like [[decodeFeatures]] — one narrow mapPartitions,
    * no shuffle. */
  def resizePayload(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      factor: Int = 4
  ): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val idField = df.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("n_bytes", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Row(r.get(idIdx), 0L, Array.empty[Byte])
        else ImageCodecs.decode(bytes) match {
          case Some(img) =>
            val resized = ImageCodecs.encodePpm(ImageCodecs.resizeNearest(img, factor))
            Row(r.get(idIdx), bytes.length.toLong, resized)
          case None =>
            val out = new Array[Byte]((bytes.length + factor - 1) / factor)
            var i = 0
            while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
            Row(r.get(idIdx), bytes.length.toLong, out)
        }
      }
    }(encoder)
  }

  /** Frame-sampling plumbing for video-like payloads: split the payload
    * into `frameSize`-byte chunks and keep every `stride`-th chunk — the
    * partition/batch shape of real frame extraction, with byte-slicing
    * standing in for the codec. */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frameSize: Int = 256,
      stride: Int = 4
  ): DataFrame = {
    val nFrames = ceil(length(col(payloadCol)).cast("double") / lit(frameSize.toDouble)).cast("int")
    df.filter(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(col(idCol), col(payloadCol),
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))).as("frame_idx"))
      .withColumn("frame_bytes",
        col(payloadCol).substr(col("frame_idx") * lit(frameSize) + 1, lit(frameSize)))
      .drop(payloadCol)
  }
}
