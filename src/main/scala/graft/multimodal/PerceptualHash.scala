package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image hashing — the multimodal leg of the dedup family.
  *
  * Text near-dup has MinHash/SimHash (operators.Dedup); images need the
  * same "re-encoded copy collides, distinct content doesn't" primitive.
  * The classic answer is dHash/aHash over a downscaled luma grid: decode
  * to luma, block-mean to a tiny grid, then hash the grid's STRUCTURE
  * (adjacent-cell gradients for dHash, above-mean mask for aHash) so the
  * bits survive JPEG requantization, format conversion and mild resizing —
  * exactly what kills byte-level hashes on crawled image corpora.
  *
  * The reference has no media pipeline (its parser dispatcher routes
  * documents only — /root/reference/internal/parser/dispatcher.go:52-62);
  * this extends the engine the way SURVEY §2.12 extends text dedup.
  *
  * Scale shape: hashing is one decode pass per row (mapPartitions-style
  * UDF, no shuffle); candidate pairing reuses the SimHash 16-bit-chunk
  * banding machinery ([[graft.operators.Dedup.hammingBandedPairs]]) — the
  * pigeonhole property and the bucket-capped self-join shape are hash
  * properties, independent of whether the 64 bits came from token weights
  * or luma gradients. Both hashes ride ONE decode (the 9×9 grid feeds
  * dHash's 8×9 difference window and aHash's 8×8 mean mask), so the
  * expensive step — full-image decode — is never paid twice.
  */
object PerceptualHash {

  /** Grid side for the shared luma downscale: 9 gives dHash its 8 adjacent
    * column differences per row and contains aHash's 8×8 block.
    */
  val GridSide = 9

  /** Decode any supported image format to a `grid`×`grid` mean-luma grid;
    * None for non-image bytes or undecodable images (corpus rows must
    * degrade to "no hash", never kill the task — the decodeFeatures
    * contract).
    */
  def imageLumaGrid(bytes: Array[Byte], grid: Int = GridSide): Option[Array[Float]] =
    try {
      if (bytes == null) None
      else if (MediaDecode.isBmp(bytes)) Some(MediaDecode.bmpLumaGrid(bytes, grid))
      else if (MediaDecode.isPng(bytes)) Some(MediaDecode.pngLumaGrid(bytes, grid))
      else if (JpegDecode.isJpeg(bytes)) Some(JpegDecode.jpegLumaGrid(bytes, grid))
      else if (GifDecode.isGif(bytes)) Some(GifDecode.gifLumaGrid(bytes, grid))
      else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Difference hash over a 9×9 luma grid: bit (y·8+x) is set iff
    * cell(y,x) < cell(y,x+1) — 8 rows × 8 horizontal gradients. Gradient
    * SIGNS survive global brightness/contrast shifts and requantization;
    * absolute values don't, which is why dHash beats byte hashing on
    * re-encoded copies.
    */
  def dHash64(grid9: Array[Float]): Long = {
    require(grid9.length == GridSide * GridSide,
      s"dHash needs a ${GridSide}x$GridSide grid, got ${grid9.length} cells")
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid9(y * GridSide + x) < grid9(y * GridSide + x + 1))
          h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Average hash over the 8×8 sub-block of the 9×9 grid: bit (y·8+x) is
    * set iff cell(y,x) > mean. Complements dHash (mask vs gradient): a
    * pair colliding on BOTH is a much stronger near-dup signal than either
    * alone.
    */
  def aHash64(grid9: Array[Float]): Long = {
    require(grid9.length == GridSide * GridSide,
      s"aHash needs a ${GridSide}x$GridSide grid, got ${grid9.length} cells")
    var sum = 0.0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) { sum += grid9(y * GridSide + x); x += 1 }
      y += 1
    }
    val mean = sum / 64.0
    var h = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid9(y * GridSide + x) > mean) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Both hashes from one decode; None for non-images. */
  def hashes(bytes: Array[Byte]): Option[(Long, Long)] =
    imageLumaGrid(bytes).map(g => (dHash64(g), aHash64(g)))

  private val hashesUdf = udf { (bytes: Array[Byte]) => hashes(bytes) }

  /** Per-image hash columns (idCol, dhash, ahash); rows whose bytes are not
    * a decodable image are DROPPED (they have no perceptual identity — the
    * caller's exact-hash dedup still covers them byte-wise).
    */
  def perceptualHashes(
      media: DataFrame, idCol: String, bytesCol: String): DataFrame =
    media.select(col(idCol), hashesUdf(col(bytesCol)).as("__ph"))
      .filter(col("__ph").isNotNull)
      .select(col(idCol),
        col("__ph._1").as("dhash"),
        col("__ph._2").as("ahash"))

  /** Near-duplicate image pairs: dHash within `maxHamming`, candidates
    * found by the 16-bit-chunk banding self-join (lossless for
    * maxHamming ≤ 3 by pigeonhole). Output (media_a, media_b, hamming).
    *
    * Same image re-encoded (JPEG quality change, PNG↔BMP conversion)
    * collides; distinct content doesn't — the golden tests pin both.
    */
  def dhashPairs(
      media: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val hashed = perceptualHashes(media, idCol, bytesCol)
      .select(col(idCol), col("dhash"))
    graft.operators.Dedup
      .hammingBandedPairs(hashed, idCol, "dhash", maxHamming, maxBucketSize)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }
}
