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
  * Codec status: **images decode for real** via the JDK's `javax.imageio`
  * (PNG/BMP/GIF/JPEG, zero extra dependencies — see [[decodeImage]]);
  * audio/video remain STUBBED (`decodeStub`) because no audio/video codecs
  * ship offline. [[extractFeatures]] dispatches on the `meta.format` MIME
  * type: `image/...` MIME payloads get decoded width/height/channel-mean/entropy
  * features, everything else the deterministic byte-hash stub. The
  * batching, schema, partition sizing and null handling are shared by both
  * paths.
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

  /** Exact per-image statistics from a REAL decode (see [[decodeImage]]). */
  final case class ImageStats(
      width: Int, height: Int,
      rSum: Long, gSum: Long, bSum: Long,
      nPixels: Long, entropy: Double)

  /** Real image decoder: `javax.imageio.ImageIO` (JDK `java.desktop`
    * module — PNG/BMP/GIF/JPEG, fully offline). Returns exact integer
    * channel sums (replayable by any engine as arithmetic, unlike means
    * which divide) plus the Shannon entropy in bits of the 256-bin
    * luminance histogram (`lum = (r+g+b)/3`, integer division). `None` for
    * null/empty/undecodable payloads — callers decide whether that is an
    * error or a skip.
    */
  def decodeImage(content: Array[Byte]): Option[ImageStats] = {
    if (content == null || content.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val lumHist = new Array[Long](256)
    var rs = 0L; var gs = 0L; var bs = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        rs += r; gs += g; bs += b
        lumHist((r + g + b) / 3) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var ent = 0.0
    var i = 0
    while (i < 256) {
      val c = lumHist(i)
      if (c > 0L) { val p = c.toDouble / n; ent -= p * (math.log(p) / math.log(2.0)) }
      i += 1
    }
    Some(ImageStats(w, h, rs, gs, bs, n, ent))
  }

  /** Feature vector from a real image decode: `[width, height, rMean,
    * gMean, bMean, entropy]` truncated/zero-padded to `featureDim`.
    */
  private def imageFeatureVector(st: ImageStats, featureDim: Int): Array[Double] = {
    val n = st.nPixels.toDouble
    val full = Array[Double](
      st.width.toDouble, st.height.toDouble,
      st.rSum / n, st.gSum / n, st.bSum / n, st.entropy)
    java.util.Arrays.copyOf(full, featureDim)
  }

  /** STUB decoder for audio/video (no offline codecs for those): derives `featureDim` deterministic doubles
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
    * no per-row interpreter round-trips. Dispatch: `image/...` MIME formats are
    * REALLY decoded ([[decodeImage]] → width/height/channel-mean/entropy
    * features; stub fallback if the payload doesn't parse); other formats
    * (audio/video/fake) use [[decodeStub]].
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = media.select(col("media_id"), col("content"), col("meta.format"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val fmt = if (r.isNullAt(2)) "" else r.getString(2)
          val feats =
            if (fmt.startsWith("image/"))
              decodeImage(bytes).map(imageFeatureVector(_, featureDim))
                .getOrElse(decodeStub(bytes, featureDim))
            else decodeStub(bytes, featureDim)
          Row(id, if (bytes == null) 0L else bytes.length.toLong, feats.toSeq)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Exact decoded-image statistics frame: one row per media item with
    * `(media_id, width, height, r_sum, g_sum, b_sum, n_pixels, entropy)`.
    * Dims and sums are exact integers straight from the decoded pixels, so
    * any engine that knows how the image was produced can replay them with
    * pure arithmetic — the honest round-trip check for the decode path.
    * Undecodable payloads yield null stats (same batching contract as
    * [[extractFeatures]]).
    */
  def imageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("r_sum", LongType, nullable = true),
      StructField("g_sum", LongType, nullable = true),
      StructField("b_sum", LongType, nullable = true),
      StructField("n_pixels", LongType, nullable = true),
      StructField("entropy", DoubleType, nullable = true)))
    val rows = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        decodeImage(bytes) match {
          case Some(st) =>
            Row(id, st.width, st.height, st.rSum, st.gSum, st.bSum, st.nPixels, st.entropy)
          case None => Row(id, null, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Encode a `w`×`h` two-colour checkerboard ((x+y) even → `c1`, odd →
    * `c2`, RGB 0-255 triples) as real PNG bytes via JDK ImageIO. PNG is
    * lossless, so a decode must recover every pixel exactly.
    */
  def checkerPng(w: Int, h: Int, c1: (Int, Int, Int), c2: (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = if ((x + y) % 2 == 0) c1 else c2
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic per-row PNG corpus: for each id, a checkerboard of
    * `width = 4 + id%5`, `height = 3 + id%4`, colours
    * `c1 = (37id, 59id, 83id) mod 256` and `c2 = (101id+7, 13id+11,
    * 29id+23) mod 256`. Every expected decode statistic is closed-form
    * arithmetic over the id (checker cell counts: `n1 = ceil(w/2)*ceil(h/2)
    * + floor(w/2)*floor(h/2)`, `n2 = w*h - n1`), which lets an external SQL
    * oracle verify the REAL decode without being able to decode PNGs
    * itself. One encoder per partition, same batching contract as the
    * decode stages.
    */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val c1 = (((id * 37) % 256).toInt, ((id * 59) % 256).toInt, ((id * 83) % 256).toInt)
        val c2 = (((id * 101 + 7) % 256).toInt, ((id * 13 + 11) % 256).toInt, ((id * 29 + 23) % 256).toInt)
        Row(id, checkerPng(w, h, c1, c2), Row("image/png", w, h, null))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
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
