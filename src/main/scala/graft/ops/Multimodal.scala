package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (north-star extension): image/audio/video
 * travel as opaque `BINARY` columns with typed metadata, processed by
 * per-partition batch functions — the Spark-side schema, partitioning and
 * batch shape are real; the actual media decoding is STUBBED with
 * deterministic byte-level fakes because no image/audio codec libraries
 * ship in this environment (builder contract). A production deployment
 * swaps [[StubDecoders]] for real codecs behind the same signatures.
 */
object Multimodal {

  /** Asset metadata carried beside the bytes. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true))), nullable = true)))

  /**
   * STUB decoders: deterministic byte-level features standing in for real
   * codec output. Each is a pure function of the bytes, so results are
   * reproducible across engines and runs.
   */
  object StubDecoders extends Serializable {
    /** "Decode" an image to a 16-bin high-nibble byte histogram (raw
      * counts) — stands in for decode→resize→feature-extract. Counts, not
      * ratios: small integers are exact in float32, so any engine —
      * including the DuckDB verification oracle — reproduces the features
      * bit-for-bit (exactness holds while a bin count stays below 2^24 ≈
      * a 16 MB single asset; larger media belongs with a real decoder
      * anyway). Normalize downstream if a unit-scale feature is needed. */
    def imageFeatures(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      if (bytes == null || bytes.isEmpty) return hist
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
      hist
    }

    /** "Sample" every-nth frame of a video: fixed-size byte slices —
      * stands in for container demux + frame decode. */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, everyN: Int): Seq[Array[Byte]] = {
      if (bytes == null || frameSize <= 0 || everyN <= 0) return Nil
      (0 until bytes.length by frameSize * everyN)
        .map(off => java.util.Arrays.copyOfRange(bytes, off,
          math.min(off + frameSize, bytes.length)))
    }

    /** "Resample" audio: mean absolute byte amplitude per window —
      * stands in for PCM decode + resample. */
    def audioEnvelope(bytes: Array[Byte], window: Int): Array[Float] = {
      if (bytes == null || window <= 0 || bytes.isEmpty) return Array.empty
      (0 until bytes.length by window).map { off =>
        var s = 0L
        var i = off
        val end = math.min(off + window, bytes.length)
        while (i < end) { s += math.abs(bytes(i).toInt); i += 1 }
        s.toFloat / (end - off)
      }.toArray
    }
  }

  /** Per-partition feature extraction over the binary column: the real
    * batch shape (iterator-of-rows in, iterator-of-rows out; one decoder
    * init per partition, not per row). Adds `features ARRAY<FLOAT>` and
    * `n_bytes LONG`. */
  def extractImageFeatures(assets: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(bytesCol)
    assets.mapPartitions { rows =>
      // per-partition init point for a real codec goes here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats = StubDecoders.imageFeatures(bytes)
        Row.fromSeq(r.toSeq ++ Seq(feats.toSeq,
          if (bytes == null) 0L else bytes.length.toLong))
      }
    }(enc)
  }

  /** Per-partition audio "decode": adds `envelope ARRAY<FLOAT>` (per-window
    * mean |amplitude|, [[StubDecoders.audioEnvelope]]) and `n_bytes` — the
    * same batch shape as [[extractImageFeatures]]. */
  def extractAudioEnvelope(assets: DataFrame, window: Int = 256,
      bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("envelope", ArrayType(FloatType, containsNull = false)),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(bytesCol)
    assets.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val env = StubDecoders.audioEnvelope(bytes, window)
        Row.fromSeq(r.toSeq ++ Seq(env.toSeq,
          if (bytes == null) 0L else bytes.length.toLong))
      }
    }(enc)
  }

  /** Explode videos into sampled frame rows `(asset_id, frame_index,
    * frame_bytes)` — the row-expanding shape of frame sampling. */
  def sampleVideoFrames(assets: DataFrame, frameSize: Int = 4096,
      everyN: Int = 2): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idIdx = assets.schema.fieldIndex("asset_id")
    val bIdx = assets.schema.fieldIndex("bytes")
    assets.flatMap { r =>
      StubDecoders.sampleFrames(r.getAs[Array[Byte]](bIdx), frameSize, everyN)
        .zipWithIndex.map { case (f, i) => Row(r.getLong(idIdx), i, f) }
    }(enc)
  }

  /** Demo asset table derived from a text DataFrame (no real media in the
    * fixtures): bytes = UTF-8 encoding of the text, modality round-robin. */
  def assetsFromText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"), lit(1000).as("duration_ms")).as("meta"))
}
