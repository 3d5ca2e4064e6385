package minietl.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Design: media are opaque `binary` columns paired with a typed metadata
  * struct; heavy per-item work (decode / feature extraction / resize /
  * frame sampling) runs batched per partition via `mapPartitions` — the
  * Scala analog of the Python `mapInPandas` batch-UDF pattern: one decoder
  * instance per task, rows streamed through it, output schema declared up
  * front so Catalyst plans around the opaque stage.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching, partition
  * sizing, null handling — is real and tested; swapping the stub for a real
  * decoder changes one function body.
  */
object Multimodal {

  /** media metadata carried alongside the payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", mediaMetaType, nullable = true)))

  /** Wrap any table into the media schema with a deterministic fake payload
    * (UTF-8 bytes of a text column) — lets the full pipeline run end-to-end
    * without real media files.
    */
  def fakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        lit("fake/utf8").as("format"),
        length(col(textCol)).as("width"),
        lit(1).as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** STUB decoder: a real implementation would decode `content` with an
    * image/audio codec. The stub derives `featureDim` deterministic doubles
    * in [-1, 1) from the payload bytes: slot j is a polynomial rolling hash
    * (base 131, mod 2^31-1) over the byte subsequence at positions i ≡ j
    * (mod featureDim), scaled by an exact power-of-two division — so each
    * feature is order-sensitive within its stride, every value is an exact
    * binary double, and any SQL engine can replay one slot independently
    * with a sequential fold (no cross-slot state).
    */
  def decodeStub(content: Array[Byte], featureDim: Int): Array[Double] = {
    val h = new Array[Long](featureDim)
    if (content != null) {
      var i = 0
      while (i < content.length) {
        val j = i % featureDim
        h(j) = (h(j) * 131L + (content(i) & 0xffL)) % 2147483647L
        i += 1
      }
    }
    h.map(v => (v % 1048576L) / 524288.0 - 1.0) // exact: n/2^19 - 1 in [-1, 1)
  }

  /** Batched "decode + featurize" stage: per-partition iteration with a
    * declared output schema (media_id, n_bytes, features). At scale the
    * partition is the batch: one task = one decoder = thousands of items,
    * no per-row interpreter round-trips.
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(id, if (bytes == null) 0L else bytes.length.toLong,
          decodeStub(bytes, featureDim).toSeq)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** STUB resampler: a real implementation would decode and rescale pixels;
    * the stub nearest-neighbor-resamples the raw bytes to `targetBytes`,
    * which preserves the pipeline shape (fixed-size outputs, meta updated)
    * deterministically.
    */
  def resizeStub(content: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (content == null || content.isEmpty) return new Array[Byte](0)
    val out = new Array[Byte](targetBytes)
    var i = 0
    while (i < targetBytes) {
      out(i) = content((i.toLong * content.length / targetBytes).toInt)
      i += 1
    }
    out
  }

  /** Batched resize stage: same per-partition batching contract as
    * [[extractFeatures]]; emits the resized payload with refreshed metadata.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(r.getLong(0), resizeStub(bytes, targetBytes))
      }
    }
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    spark.createDataFrame(rows, outSchema)
      .select(col("media_id"), col("content"),
        struct(
          lit("fake/resized").as("format"),
          lit(targetBytes).as("width"), lit(1).as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
  }

  /** Frame-sampling plumbing for video-like payloads: split the byte stream
    * into `frames` fixed-size slices (a stand-in for keyframe extraction)
    * and emit one row per sampled frame — the explode-shaped stage a video
    * pipeline needs, with deterministic fake slicing.
    */
  def sampleFrames(media: DataFrame, frames: Int = 4): DataFrame = {
    media.select(col("media_id"), col("content"),
        posexplode(sequence(lit(0), lit(frames - 1))).as(Seq("frame_idx", "_f")))
      .select(
        col("media_id"),
        col("frame_idx"),
        expr(s"substring(content, cast(frame_idx * (octet_length(content) / $frames) as int) + 1, " +
          s"cast(octet_length(content) / $frames as int))").as("frame_bytes"))
      .filter(octet_length(col("frame_bytes")) > 0)
  }
}
