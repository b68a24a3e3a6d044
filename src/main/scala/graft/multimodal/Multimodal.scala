package graft.multimodal

import graft.functions.MockEmbedder
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` with typed
  * metadata (BASELINE.json north-star requirement).
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch shape —
  * is real and tested. Decode is REAL for the zero-dependency formats
  * ([[MediaDecode]]: BMP and PNG → 8×8 mean-luma grid, WAV/PCM → RMS
  * envelope + duration; [[JpegDecode]]: sequential AND progressive JPEG →
  * luma grid; [[GifDecode]]: GIF87a/89a LZW first frame → luma grid;
  * [[Mp3Decode]]: MPEG Layer III frame-header walk → exact duration +
  * per-frame bitrate envelope; [[Mp4Probe]]: ISO-BMFF box walk → duration,
  * video dimensions, frame rate) and a clearly-marked deterministic STUB
  * ([[fakeDecodeFeatures]]) for the one remaining codec boundary (MP4/MP3
  * SAMPLE decode — H.264 pixels, Layer III PCM), which genuinely
  * need codec libraries absent from this offline container. A production
  * build swaps exactly one function (the bytes→features kernel inside
  * [[extractFeatures]]); everything around it is unchanged.
  *
  * Why the Layer III PCM boundary stays a stub rather than going the way
  * progressive JPEG did: JPEG's entropy tables travel INSIDE the file and
  * its transform is analytic, so a from-the-spec decoder is verifiable
  * against golden JDK output. Layer III's 34 Huffman tables and the
  * 512-coefficient synthesis window are fixed spec-side DATA (ISO/IEC
  * 11172-3 Annex B) that ships with no container copy and no reference
  * decoder to validate against here — a decoder built on reconstructed
  * tables could only be tested against fixtures encoded with those same
  * tables, a circular check that would pass even if every table were
  * wrong. An honest documented boundary beats unverifiable surface.
  *
  * Scale: media bytes stay columnar in parquet (never collected); feature
  * extraction is `mapPartitions` so a real decoder amortizes model/codec
  * init per partition (the same batching contract as `mapInPandas`).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("frame_rate", DoubleType, nullable = true))), nullable = true)))

  final case class MediaFeature(media_id: String, kind: String, feature: Array[Float])

  /** STUB decode: deterministic pseudo-features from the raw bytes (content
    * hash → mock-embedding series). Stands in for compressed-codec decode +
    * CNN embedding / spectrogram; deterministic so pipelines are testable
    * offline.
    */
  def fakeDecodeFeatures(bytes: Array[Byte], dim: Int = 64): Array[Float] =
    MockEmbedder.embed(java.util.Base64.getEncoder.encodeToString(bytes), dim)

  /** Decode dispatch: REAL kernels for the codec-free byte formats, stub
    * for the rest. BMP → 8×8 mean-luma grid (perceptual-hash basis);
    * WAV/PCM → `dim`-bin RMS envelope (audio-fingerprint basis); other
    * formats → [[fakeDecodeFeatures]]. Malformed bytes of a recognized
    * format also fall back (ingest must not die on one corrupt file).
    */
  def decodeFeatures(bytes: Array[Byte], dim: Int = 64): Array[Float] = {
    def fit(a: Array[Float]): Array[Float] =
      if (a.length == dim) a
      else if (a.length > dim) a.take(dim)
      else a ++ Array.fill(dim - a.length)(0f)
    try {
      if (MediaDecode.isBmp(bytes))
        fit(MediaDecode.bmpLumaGrid(bytes, grid = math.max(1, math.sqrt(dim).toInt)))
      else if (MediaDecode.isPng(bytes))
        fit(MediaDecode.pngLumaGrid(bytes, grid = math.max(1, math.sqrt(dim).toInt)))
      else if (JpegDecode.isJpeg(bytes))
        fit(JpegDecode.jpegLumaGrid(bytes, grid = math.max(1, math.sqrt(dim).toInt)))
      else if (GifDecode.isGif(bytes))
        fit(GifDecode.gifLumaGrid(bytes, grid = math.max(1, math.sqrt(dim).toInt)))
      else if (MediaDecode.isWav(bytes))
        MediaDecode.wavEnvelope(bytes, bins = dim)
      else if (Mp3Decode.isMp3(bytes))
        Mp3Decode.mp3BitrateEnvelope(bytes, bins = dim)
      else fakeDecodeFeatures(bytes, dim)
    } catch {
      // NonFatal, not just IllegalArgumentException: a decode bug on one
      // crafted file must degrade to the stub, never kill the ingest task
      case scala.util.control.NonFatal(_) => fakeDecodeFeatures(bytes, dim)
    }
  }

  /** Batched feature extraction over partitions — the real pipeline shape:
    * one iterator per partition, decoder initialized once per partition,
    * rows streamed through it.
    */
  def extractFeatures(
      spark: SparkSession, media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(String, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init site: a real impl constructs its codec here
        rows.map { case (id, kind, bytes) =>
          MediaFeature(id, kind, decodeFeatures(bytes, dim))
        }
      }
  }

  final case class ProbedMeta(
      width: Option[Int], height: Option[Int], format: Option[String],
      duration_ms: Option[Long], frame_rate: Option[Double])

  /** Probe real metadata from the bytes where the format allows (BMP
    * dimensions, WAV duration); None fields where it doesn't.
    */
  def probeMeta(bytes: Array[Byte]): ProbedMeta =
    try {
      if (MediaDecode.isBmp(bytes)) {
        val (w, h) = MediaDecode.bmpSize(bytes)
        ProbedMeta(Some(w), Some(h), Some("bmp"), None, None)
      } else if (MediaDecode.isPng(bytes)) {
        val (w, h) = MediaDecode.pngSize(bytes)
        ProbedMeta(Some(w), Some(h), Some("png"), None, None)
      } else if (JpegDecode.isJpeg(bytes)) {
        val (w, h) = JpegDecode.jpegSize(bytes)
        ProbedMeta(Some(w), Some(h), Some("jpeg"), None, None)
      } else if (GifDecode.isGif(bytes)) {
        val (w, h) = GifDecode.gifSize(bytes)
        ProbedMeta(Some(w), Some(h), Some("gif"), None, None)
      } else if (MediaDecode.isWav(bytes)) {
        ProbedMeta(None, None, Some("wav"),
          Some(MediaDecode.wavDurationMs(bytes)), None)
      } else if (Mp3Decode.isMp3(bytes)) {
        ProbedMeta(None, None, Some("mp3"),
          Some(Mp3Decode.mp3Meta(bytes).durationMs), None)
      } else if (Mp4Probe.isMp4(bytes)) {
        val m = Mp4Probe.probe(bytes)
        ProbedMeta(m.width, m.height, Some("mp4"),
          Some(m.durationMs), m.frameRate)
      } else ProbedMeta(None, None, None, None, None)
    } catch {
      case scala.util.control.NonFatal(_) => ProbedMeta(None, None, None, None, None)
    }

  /** Column transform: overwrite `meta` with probed values where the format
    * is parseable, keeping the declared meta otherwise.
    */
  def withProbedMeta(media: DataFrame): DataFrame = {
    val probeUdf = udf((bytes: Array[Byte]) => probeMeta(bytes))
    media.withColumn("__probe", probeUdf(col("bytes")))
      .withColumn("meta", struct(
        coalesce(col("__probe.width"), col("meta.width")).as("width"),
        coalesce(col("__probe.height"), col("meta.height")).as("height"),
        coalesce(col("__probe.format"), col("meta.format")).as("format"),
        coalesce(col("__probe.duration_ms"), col("meta.duration_ms")).as("duration_ms"),
        col("meta.frame_rate").as("frame_rate")))
      .drop("__probe")
  }

  /** Video frame sampling: one row per sampled frame index, evenly spaced
    * across the duration — pure plan-side arithmetic (no decode), the decode
    * of each frame is deferred to [[extractFeatures]] on the exploded rows.
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    // sequence(0, nFrames-1) with nFrames <= 0 would auto-step DOWNWARD and
    // emit bogus negative frame indexes instead of zero rows
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    media.filter(col("kind") === "video" && col("meta.duration_ms").isNotNull)
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_ts_ms",
        (col("frame_idx") * col("meta.duration_ms") / nFrames).cast("long"))
      .select(col("media_id"), col("frame_idx"), col("frame_ts_ms"), col("meta"))
  }

  /** Resize metadata transform (STUB kernel): plan-side metadata math is
    * real; the pixel work is the deferred decode kernel.
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim) / greatest(col("meta.width"), col("meta.height")), lit(1.0))
    media.withColumn("target_width", (col("meta.width") * scale).cast("int"))
      .withColumn("target_height", (col("meta.height") * scale).cast("int"))
  }
}
