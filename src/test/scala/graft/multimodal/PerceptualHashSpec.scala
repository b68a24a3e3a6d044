package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual image dedup: hash bit semantics, re-encode collision goldens
  * (same content at two JPEG qualities / across formats), distinct-content
  * separation, the banded pair query, and partition invariance.
  */
class PerceptualHashSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  // ------------------------------------------------------------ fixtures

  private def image(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int))
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    img
  }

  private def jpegBytes(img: java.awt.image.BufferedImage, quality: Float)
      : Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    out.toByteArray
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // structured content with clear gradients — the shape dHash is built for
  private def scene(x: Int, y: Int): (Int, Int, Int) = {
    val v = (x * 7 + y * 3) % 256
    val band = if ((x / 8 + y / 8) % 2 == 0) 200 else 40
    ((v + band) / 2, band, v)
  }

  private def inverted(x: Int, y: Int): (Int, Int, Int) = {
    val (r, g, b) = scene(31 - x, 31 - y)
    (255 - r, 255 - g, 255 - b)
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ----------------------------------------------------------- bit logic

  test("dHash bit semantics: hand grid") {
    // row 0 strictly increasing -> its 8 bits set; all other rows flat -> 0
    val g = Array.tabulate(81) { i =>
      val y = i / 9; val x = i % 9
      if (y == 0) x.toFloat else 0.5f
    }
    assert(PerceptualHash.dHash64(g) == 0xffL)
    intercept[IllegalArgumentException](PerceptualHash.dHash64(new Array[Float](64)))
  }

  test("aHash bit semantics: hand grid") {
    // left half 0, right half 1 (of the 8x8 block): mean 0.5, right bits set
    val g = Array.tabulate(81) { i =>
      val x = i % 9
      if (x >= 4 && x < 8) 1f else 0f
    }
    val h = PerceptualHash.aHash64(g)
    for (y <- 0 until 8; x <- 0 until 8) {
      val bit = (h >>> (y * 8 + x)) & 1L
      assert(bit == (if (x >= 4) 1L else 0L), s"bit ($x,$y)")
    }
    intercept[IllegalArgumentException](PerceptualHash.aHash64(new Array[Float](64)))
  }

  // ------------------------------------------------------------- goldens

  test("golden: same image at two JPEG qualities collides (hamming <= 3)") {
    val img = image(32, 32, scene)
    val hq = PerceptualHash.hashes(jpegBytes(img, 0.9f)).get
    val lq = PerceptualHash.hashes(jpegBytes(img, 0.5f)).get
    assert(ham(hq._1, lq._1) <= 3, s"dhash drifted: ${ham(hq._1, lq._1)} bits")
    assert(ham(hq._2, lq._2) <= 3, s"ahash drifted: ${ham(hq._2, lq._2)} bits")
  }

  test("golden: same content across formats (PNG vs JPEG) collides") {
    val img = image(32, 32, scene)
    val p = PerceptualHash.hashes(pngBytes(img)).get
    val j = PerceptualHash.hashes(jpegBytes(img, 0.9f)).get
    assert(ham(p._1, j._1) <= 3, s"dhash drifted: ${ham(p._1, j._1)} bits")
  }

  test("golden: distinct content separates (hamming far above the gate)") {
    val a = PerceptualHash.hashes(pngBytes(image(32, 32, scene))).get
    val b = PerceptualHash.hashes(pngBytes(image(32, 32, inverted))).get
    assert(ham(a._1, b._1) > 16, s"dhash too close: ${ham(a._1, b._1)} bits")
  }

  test("non-image and corrupt bytes yield no hash, never throw") {
    assert(PerceptualHash.hashes("not an image".getBytes).isEmpty)
    assert(PerceptualHash.hashes(Array.empty[Byte]).isEmpty)
    assert(PerceptualHash.hashes(null).isEmpty)
    // recognizable PNG magic with garbage body: decode fails -> None
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      1, 2, 3, 4, 5)
    assert(PerceptualHash.hashes(corrupt).isEmpty)
  }

  // --------------------------------------------------------- pair query

  private def corpus() = {
    import spark.implicits._
    val img = image(32, 32, scene)
    Seq(
      ("hq" , jpegBytes(img, 0.9f)),
      ("lq" , jpegBytes(img, 0.5f)),
      ("png", pngBytes(img)),
      ("inv", pngBytes(image(32, 32, inverted))),
      ("txt", "plain text bytes, not an image".getBytes)
    ).toDF("media_id", "bytes")
  }

  test("dhashPairs: re-encodes pair up, distinct content and non-images don't") {
    val pairs = PerceptualHash.dhashPairs(corpus(), "media_id", "bytes")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(pairs == Set(("hq", "lq"), ("hq", "png"), ("lq", "png")))
  }

  test("perceptualHashes drops non-images and keeps one row per image") {
    val out = PerceptualHash.perceptualHashes(corpus(), "media_id", "bytes")
    assert(out.columns.toSeq == Seq("media_id", "dhash", "ahash"))
    assert(out.select("media_id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("hq", "inv", "lq", "png"))
  }

  test("partition invariance: repartitioned corpus yields identical pairs") {
    val base = corpus()
    def run(df: org.apache.spark.sql.DataFrame) =
      PerceptualHash.dhashPairs(df, "media_id", "bytes")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(run(base) == run(base.repartition(7)) && run(base).nonEmpty)
  }
}
