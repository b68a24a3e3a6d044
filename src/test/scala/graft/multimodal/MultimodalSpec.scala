package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mediaDf = {
    val rows = Seq(
      Row("img1", "image", Array[Byte](1, 2, 3, 4), Row(640, 480, "png", null, null)),
      Row("img2", "image", Array[Byte](9, 9, 9), Row(100, 2000, "jpg", null, null)),
      Row("vid1", "video", Array[Byte](5, 6, 7), Row(1920, 1080, "mp4", 10000L, 30.0)),
      Row("aud1", "audio", Array[Byte](8), Row(null, null, "wav", 5000L, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("feature extraction is deterministic per content, batched per partition") {
    val f1 = Multimodal.extractFeatures(spark, mediaDf, dim = 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, mediaDf, dim = 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.keySet == Set("img1", "img2", "vid1", "aud1"))
    assert(f1("img1") != f1("img2"))
    assert(f1.values.forall(_.length == 16))
  }

  // ------------------------------------------------- real decode fixtures

  /** Uncompressed 24-bit bottom-up BMP with the given row-major pixels
    * (display order, (r,g,b)).
    */
  private def bmp(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel offset
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- h - 1 to 0 by -1) { // bottom-up storage
      for (x <- 0 until w) {
        val (r, g, b) = px(row * w + x)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      buf.position(buf.position() + (rowSize - w * 3)) // row padding
    }
    buf.array()
  }

  /** 16-bit PCM mono WAV from raw samples. */
  private def wav(rate: Int, samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("BMP decode: real 8x8 luma grid separates black and white halves") {
    // 8x8 image, left half black, right half white
    val px = for (y <- 0 until 8; x <- 0 until 8)
      yield if (x < 4) (0, 0, 0) else (255, 255, 255)
    val img = bmp(8, 8, px)
    assert(MediaDecode.isBmp(img))
    assert(MediaDecode.bmpSize(img) == ((8, 8)))
    val grid = MediaDecode.bmpLumaGrid(img)
    assert(grid.length == 64)
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val v = grid(gy * 8 + gx)
      if (gx < 4) assert(v < 0.01, s"cell ($gx,$gy)") else assert(v > 0.99, s"cell ($gx,$gy)")
    }
    // the same image through the pipeline dispatch (not the stub)
    assert(Multimodal.decodeFeatures(img, 64).toSeq == grid.toSeq)
  }

  /** PNG from row-major (r,g,b) pixels via the JDK encoder (java.desktop
    * ships a full PNG writer; its adaptive per-row filter choice exercises
    * the Sub/Up/Average/Paeth reconstruction paths).
    */
  private def png(w: Int, h: Int, px: Seq[(Int, Int, Int)],
                  imageType: Int = java.awt.image.BufferedImage.TYPE_INT_RGB): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imageType)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(y * w + x)
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("PNG decode: identical pixels as BMP yield the identical luma grid") {
    // gradient + noise: non-trivial rows force varied filter types
    val rnd = new scala.util.Random(7)
    val px = for (y <- 0 until 32; x <- 0 until 32)
      yield ((x * 8 + rnd.nextInt(16)) % 256, (y * 8) % 256, ((x + y) * 4) % 256)
    val pngBytes = png(32, 32, px)
    val bmpBytes = bmp(32, 32, px)
    assert(MediaDecode.isPng(pngBytes))
    assert(MediaDecode.pngSize(pngBytes) == ((32, 32)))
    val pGrid = MediaDecode.pngLumaGrid(pngBytes)
    val bGrid = MediaDecode.bmpLumaGrid(bmpBytes)
    assert(pGrid.toSeq == bGrid.toSeq)
    // dispatch routes PNG to the real kernel, not the stub
    assert(Multimodal.decodeFeatures(pngBytes, 64).toSeq == pGrid.toSeq)
    assert(Multimodal.probeMeta(pngBytes) ==
      Multimodal.ProbedMeta(Some(32), Some(32), Some("png"), None, None))
  }

  test("PNG decode: grayscale and palette color types") {
    val px = for (y <- 0 until 8; x <- 0 until 8)
      yield { val v = if (x < 4) 0 else 255; (v, v, v) }
    for (t <- Seq(java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
                  java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
                  java.awt.image.BufferedImage.TYPE_INT_ARGB)) {
      val bytes = png(8, 8, px, t)
      val grid = MediaDecode.pngLumaGrid(bytes)
      for (gy <- 0 until 8; gx <- 0 until 8) {
        val v = grid(gy * 8 + gx)
        if (gx < 4) assert(v < 0.01, s"type $t cell ($gx,$gy)")
        else assert(v > 0.99, s"type $t cell ($gx,$gy)")
      }
    }
  }

  /** Baseline JPEG via the JDK encoder (java.desktop ships a full libjpeg-
    * style writer: SOF0, 4:2:0 subsampling, standard huffman tables).
    */
  private def jpeg(w: Int, h: Int, px: Seq[(Int, Int, Int)],
                   imageType: Int = java.awt.image.BufferedImage.TYPE_INT_RGB,
                   quality: Float = 0.9f,
                   progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imageType)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(y * w + x)
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    val w0 = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w0.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w0.setOutput(ios)
    w0.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w0.dispose()
    out.toByteArray
  }

  /** Reference luma grid: decode the SAME jpeg bytes with the JDK reader,
    * take 0.299R+0.587G+0.114B, block-mean with the shared grid arithmetic.
    */
  private def jdkLumaGrid(bytes: Array[Byte], grid: Int = 8): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val out = new Array[Float](grid * grid)
    for (gy <- 0 until grid; gx <- 0 until grid) {
      val y0 = gy * img.getHeight / grid
      val y1 = math.max(y0 + 1, (gy + 1) * img.getHeight / grid)
      val x0 = gx * img.getWidth / grid
      val x1 = math.max(x0 + 1, (gx + 1) * img.getWidth / grid)
      var sum = 0.0
      for (y <- y0 until math.min(y1, img.getHeight);
           x <- x0 until math.min(x1, img.getWidth)) {
        val rgb = img.getRGB(x, y)
        sum += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
      }
      val n = (math.min(y1, img.getHeight) - y0) * (math.min(x1, img.getWidth) - x0)
      out(gy * grid + gx) = (sum / math.max(1, n)).toFloat
    }
    out
  }

  test("JPEG decode: luma grid matches the JDK's decode of the same bytes") {
    // gradient + structure: exercises DC prediction, AC runs, 4:2:0 MCUs
    val px = for (y <- 0 until 40; x <- 0 until 56)
      yield { val v = (x * 4 + y * 2) % 256; (v, (v + 40) % 256, (255 - v)) }
    val bytes = jpeg(56, 40, px)
    assert(JpegDecode.isJpeg(bytes))
    assert(JpegDecode.jpegSize(bytes) == ((56, 40)))
    val ours = JpegDecode.jpegLumaGrid(bytes)
    val jdk = jdkLumaGrid(bytes)
    // same coefficients, two IDCT/color paths: grids agree to ~1 luma level
    val maxDiff = ours.zip(jdk).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 2.0 / 255.0, s"max grid diff $maxDiff")
    // dispatch routes JPEG to the real kernel, and meta probes real dims
    assert(Multimodal.decodeFeatures(bytes, 64).toSeq == ours.toSeq)
    assert(Multimodal.probeMeta(bytes) ==
      Multimodal.ProbedMeta(Some(56), Some(40), Some("jpeg"), None, None))
  }

  test("JPEG decode: grayscale (single-component scan) and low quality") {
    val px = for (y <- 0 until 24; x <- 0 until 24)
      yield { val v = if (x < 12) 30 else 220; (v, v, v) }
    for (q <- Seq(0.5f, 0.95f)) {
      val bytes = jpeg(24, 24, px,
        imageType = java.awt.image.BufferedImage.TYPE_BYTE_GRAY, quality = q)
      val ours = JpegDecode.jpegLumaGrid(bytes)
      // reference from RAW raster samples: getRGB would re-apply the JDK's
      // gray→sRGB colorspace transfer and no longer reflect the coded Y
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val jdk = new Array[Float](64)
      for (gy <- 0 until 8; gx <- 0 until 8) {
        var sum = 0.0
        for (y <- gy * 3 until gy * 3 + 3; x <- gx * 3 until gx * 3 + 3)
          sum += img.getRaster.getSample(x, y, 0) / 255.0
        jdk(gy * 8 + gx) = (sum / 9).toFloat
      }
      val maxDiff = ours.zip(jdk).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff < 2.0 / 255.0, s"quality $q max grid diff $maxDiff")
      // halves stay separated even through heavy quantization (the JDK
      // encoder stores linearized gray: ~2 vs ~181 of the original 30/220)
      for (gy <- 0 until 8) {
        assert(ours(gy * 8) < 0.3, s"q $q left cell $gy")
        assert(ours(gy * 8 + 7) > 0.5, s"q $q right cell $gy")
      }
    }
  }

  test("JPEG fuzz: truncated/corrupt bytes fall back cleanly") {
    val px = for (y <- 0 until 16; x <- 0 until 16) yield (x * 16, y * 16, 128)
    val good = jpeg(16, 16, px)
    // truncations at every growth stage throw IAE (never AIOOBE/hang)…
    for (cut <- Seq(2, 4, 20, good.length / 2)) {
      intercept[IllegalArgumentException] {
        JpegDecode.jpegLumaGrid(good.take(cut))
      }
    }
    // a file cut exactly at the EOI marker still decodes (the scan is
    // complete; EOI is a trailer, not data)
    assert(JpegDecode.jpegLumaGrid(good.take(good.length - 2)).length == 64)
    // …and the pipeline dispatch degrades to the deterministic stub
    val cut = good.take(good.length / 2)
    assert(Multimodal.decodeFeatures(cut, 64).toSeq ==
      Multimodal.fakeDecodeFeatures(cut, 64).toSeq)
    // bit flips inside the entropy segment must never escape the fallback
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try JpegDecode.jpegLumaGrid(mut)
      catch { case _: IllegalArgumentException => () } // only IAE allowed
    }
    val sof0 = good.indexOfSlice(Seq(0xFF.toByte, 0xC0.toByte))
    if (sof0 >= 0) {
      // zero-dimension SOF: jpegSize must reject like decodeLuma does, so
      // probeMeta degrades to all-None instead of reporting Some(0)
      val zero = good.clone()
      zero(sof0 + 5) = 0; zero(sof0 + 6) = 0 // height := 0
      intercept[IllegalArgumentException] { JpegDecode.jpegSize(zero) }
      assert(Multimodal.probeMeta(zero) ==
        Multimodal.ProbedMeta(None, None, None, None, None))
    }
  }

  test("progressive JPEG decode: multi-scan luma matches the JDK's decode") {
    // gradient + structure across several MCU rows: the JDK's progressive
    // encoder emits the full scan script (interleaved DC first, per-
    // component AC bands, successive-approximation refinements with EOB
    // runs) — decoding it exercises every §G scan kind
    val px = for (y <- 0 until 48; x <- 0 until 64)
      yield { val v = (x * 3 + y * 4) % 256; (v, (v + 90) % 256, (255 - v)) }
    val bytes = jpeg(64, 48, px, progressive = true)
    // confirm the fixture really is progressive (SOF2 present)
    assert(bytes.indexOfSlice(Seq(0xFF.toByte, 0xC2.toByte)) >= 0)
    assert(JpegDecode.jpegSize(bytes) == ((64, 48)))
    val ours = JpegDecode.jpegLumaGrid(bytes)
    val jdk = jdkLumaGrid(bytes)
    val maxDiff = ours.zip(jdk).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 2.0 / 255.0, s"max grid diff $maxDiff")
    assert(Multimodal.decodeFeatures(bytes, 64).toSeq == ours.toSeq)

    // grayscale progressive: single-component scans, no interleaving
    val gpx = for (y <- 0 until 24; x <- 0 until 24)
      yield { val v = (x * 10 + y) % 256; (v, v, v) }
    val gbytes = jpeg(24, 24, gpx,
      imageType = java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
      progressive = true)
    assert(gbytes.indexOfSlice(Seq(0xFF.toByte, 0xC2.toByte)) >= 0)
    val gOurs = JpegDecode.jpegLumaGrid(gbytes)
    val gImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gbytes))
    val gJdk = new Array[Float](64)
    for (gy <- 0 until 8; gx <- 0 until 8) {
      var sum = 0.0
      for (y <- gy * 3 until gy * 3 + 3; x <- gx * 3 until gx * 3 + 3)
        sum += gImg.getRaster.getSample(x, y, 0) / 255.0
      gJdk(gy * 8 + gx) = (sum / 9).toFloat
    }
    val gDiff = gOurs.zip(gJdk).map { case (a, b) => math.abs(a - b) }.max
    assert(gDiff < 2.0 / 255.0, s"grayscale max grid diff $gDiff")
  }

  test("progressive JPEG cut exactly at the EOI still decodes") {
    // parity with the sequential path: all scans are complete, the missing
    // EOI is a tolerated trailer loss, not data loss
    val px = for (y <- 0 until 16; x <- 0 until 16) yield (x * 16, y * 16, 64)
    val good = jpeg(16, 16, px, progressive = true)
    assert((good(good.length - 2) & 0xFF) == 0xFF &&
      (good.last & 0xFF) == 0xD9) // fixture really ends with EOI
    val cut = good.take(good.length - 2)
    assert(JpegDecode.jpegLumaGrid(cut).toSeq ==
      JpegDecode.jpegLumaGrid(good).toSeq)
  }

  test("progressive JPEG fuzz: mutations never escape the fallback") {
    val px = for (y <- 0 until 16; x <- 0 until 16) yield (x * 16, y * 16, 64)
    val good = jpeg(16, 16, px, progressive = true)
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 300) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(3))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val cut = if (rnd.nextBoolean()) m.take(3 + rnd.nextInt(m.length - 3)) else m
      try JpegDecode.jpegLumaGrid(cut)
      catch { case _: IllegalArgumentException => () } // only IAE allowed
    }
  }

  test("PNG with a preset-dictionary zlib stream fails fast, never hangs") {
    // minimal PNG: IHDR(1x1 gray 8-bit) + IDAT whose zlib header sets the
    // FDICT flag (0x78 0x20: valid FCHECK, dictionary required). Inflater
    // returns 0 forever on it — the decoder must throw, not spin.
    def chunk(ctype: String, payload: Array[Byte]): Array[Byte] = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
      val crc = new java.util.zip.CRC32()
      crc.update(ctype.getBytes); crc.update(payload)
      val c = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
      len ++ ctype.getBytes ++ payload ++ c
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(1).putInt(1).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++
      chunk("IDAT", Array(0x78, 0x20, 0, 0, 0, 0).map(_.toByte)) ++
      chunk("IEND", Array.empty[Byte])
    assert(MediaDecode.isPng(png))
    intercept[IllegalArgumentException] { MediaDecode.pngLumaGrid(png) }
    // and through the pipeline boundary it degrades to the stub
    assert(Multimodal.decodeFeatures(png, 64).toSeq ==
      Multimodal.fakeDecodeFeatures(png, 64).toSeq)
  }

  test("PNG deflate-bomb guard: huge-area IHDR rejected before inflate") {
    // 65535x65535 passes the per-dimension cap but is ~4G pixels — the area
    // cap must throw IAE at IHDR time, never attempt the ~2GB allocations
    // (an OOME would escape the NonFatal fallback and kill the ingest task)
    def chunk(ctype: String, payload: Array[Byte]): Array[Byte] = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
      val crc = new java.util.zip.CRC32()
      crc.update(ctype.getBytes); crc.update(payload)
      val c = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
      len ++ ctype.getBytes ++ payload ++ c
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(65535).putInt(65535).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++
      chunk("IDAT", Array(0x78, 0x9c, 0, 0, 0, 0).map(_.toByte)) ++
      chunk("IEND", Array.empty[Byte])
    val e = intercept[IllegalArgumentException] { MediaDecode.pngLumaGrid(png) }
    assert(e.getMessage.contains("pixel cap"))
    assert(Multimodal.decodeFeatures(png, 64).toSeq ==
      Multimodal.fakeDecodeFeatures(png, 64).toSeq)
  }

  test("GIF decode: first frame luma grid matches the JDK's decode") {
    // blocky structure survives the encoder's palette quantization exactly
    // (GIF is lossless for ≤256-color images)
    val px = for (y <- 0 until 32; x <- 0 until 32)
      yield if ((x / 8 + y / 8) % 2 == 0) (255, 0, 0) else (0, 0, 255)
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val (r, g, b) = px(y * 32 + x)
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    val bytes = out.toByteArray
    assert(GifDecode.isGif(bytes))
    assert(GifDecode.gifSize(bytes) == ((32, 32)))
    val ours = GifDecode.gifLumaGrid(bytes)
    val jdk = jdkLumaGrid(bytes) // exact: same palette colors both sides
    assert(ours.toSeq == jdk.toSeq)
    assert(Multimodal.decodeFeatures(bytes, 64).toSeq == ours.toSeq)
    assert(Multimodal.probeMeta(bytes) ==
      Multimodal.ProbedMeta(Some(32), Some(32), Some("gif"), None, None))
  }

  test("GIF fuzz: mutations and truncations never escape the fallback") {
    val img = new java.awt.image.BufferedImage(24, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd0 = new scala.util.Random(5)
    for (y <- 0 until 24; x <- 0 until 24)
      img.setRGB(x, y, (0xff << 24) | rnd0.nextInt(1 << 24))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    val good = out.toByteArray
    assert(GifDecode.gifLumaGrid(good).length == 64) // the fixture decodes
    val rnd = new scala.util.Random(17)
    for (i <- 0 until 2000) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(3))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val cut = if (rnd.nextBoolean()) m.take(14 + rnd.nextInt(m.length - 14)) else m
      try GifDecode.gifLumaGrid(cut)
      catch { case _: IllegalArgumentException => () } // only IAE allowed
    }
  }

  test("PNG fuzz: crafted bytes behind the magic never escape the fallback") {
    val rnd = new scala.util.Random(43)
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    for (_ <- 1 to 200) {
      val body = new Array[Byte](16 + rnd.nextInt(256)); rnd.nextBytes(body)
      magic.copyToArray(body, 0)
      assert(Multimodal.decodeFeatures(body, 16).length == 16)
      assert(Multimodal.probeMeta(body) != null)
    }
    // truncated real PNG: valid signature + IHDR, cut mid-IDAT
    val real = png(16, 16, Seq.fill(256)((120, 30, 200)))
    val cut = real.take(real.length - 20)
    assert(Multimodal.decodeFeatures(cut, 16).toSeq ==
      Multimodal.fakeDecodeFeatures(cut, 16).toSeq)
  }

  test("WAV decode: duration and constant RMS envelope") {
    val samples = Seq.fill(1000)(16384.toShort) // constant half-amplitude
    val audio = wav(8000, samples)
    assert(MediaDecode.isWav(audio))
    assert(MediaDecode.wavDurationMs(audio) == 125L) // 1000/8000 s
    val env = MediaDecode.wavEnvelope(audio, bins = 64)
    assert(env.length == 64)
    env.foreach(v => assert(math.abs(v - 0.5) < 0.001))
    assert(Multimodal.decodeFeatures(audio, 64).toSeq == env.toSeq)
  }

  // ---- MP3: hand-built MPEG-1/2 Layer III streams (the header layout and
  // bitrate/samplerate tables are public ISO/IEC 11172-3 knowledge; the JDK
  // has no MP3 encoder, so fixtures are constructed frame by frame)

  /** One Layer III frame: 4-byte header + deterministic payload to the
    * exact computed frame size.
    */
  private def mp3Frame(
      bitrateKbps: Int = 128, sampleRate: Int = 44100, padding: Int = 0,
      mono: Boolean = false, mpeg1: Boolean = true): Array[Byte] = {
    val bitrates =
      if (mpeg1) Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      else Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    val rates = if (mpeg1) Seq(44100, 48000, 32000) else Seq(22050, 24000, 16000)
    val bi = bitrates.indexOf(bitrateKbps); require(bi > 0, s"bad bitrate $bitrateKbps")
    val si = rates.indexOf(sampleRate); require(si >= 0, s"bad rate $sampleRate")
    val b1 = if (mpeg1) 0xFB else 0xF3 // sync | version | layer III | no CRC
    val b2 = (bi << 4) | (si << 2) | (padding << 1)
    val b3 = if (mono) 0xC0 else 0x00
    val spf = if (mpeg1) 1152 else 576
    val size = (spf / 8) * bitrateKbps * 1000 / sampleRate + padding
    val f = new Array[Byte](size)
    f(0) = 0xFF.toByte; f(1) = b1.toByte; f(2) = b2.toByte; f(3) = b3.toByte
    var i = 4
    while (i < size) { f(i) = (i * 7 + 13).toByte; i += 1 }
    f
  }

  test("MP3 frame walk: duration/bitrate/channels from a hand-built CBR stream") {
    // known table anchor: 128 kbps @ 44100 → floor(144*128000/44100) = 417
    assert(mp3Frame().length == 417)
    assert(mp3Frame(padding = 1).length == 418)
    val bytes = Array.concat(Seq.fill(38)(mp3Frame()): _*)
    assert(Mp3Decode.isMp3(bytes))
    val m = Mp3Decode.mp3Meta(bytes)
    assert(m.nFrames == 38)
    assert(m.sampleRate == 44100)
    assert(m.channels == 2)
    assert(!m.vbr)
    assert(m.durationMs == 38L * 1152 * 1000 / 44100) // 992 ms
    assert(m.bitrateKbps == 128)
    // MPEG-2 (576 samples/frame) mono variant
    val m2bytes = Array.concat(Seq.fill(20)(mp3Frame(
      bitrateKbps = 64, sampleRate = 22050, mono = true, mpeg1 = false)): _*)
    val m2 = Mp3Decode.mp3Meta(m2bytes)
    assert(m2.nFrames == 20 && m2.channels == 1 && m2.sampleRate == 22050)
    assert(m2.durationMs == 20L * 576 * 1000 / 22050)
  }

  test("MP3: ID3v2 tag skipped, ID3v1 trailer tolerated, truncation safe") {
    val frames = Array.concat(Seq.fill(10)(mp3Frame()): _*)
    val id3size = 40
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0,
      0, 0, 0, id3size.toByte) ++ new Array[Byte](id3size)
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    val full = id3 ++ frames ++ id3v1
    assert(Mp3Decode.isMp3(full))
    val m = Mp3Decode.mp3Meta(full)
    assert(m.nFrames == 10) // tags excluded from the walk
    // truncated mid-frame: the walk stops, never throws
    val cut = (id3 ++ frames).take(id3.length + 417 * 3 + 100)
    assert(Mp3Decode.mp3Meta(cut).nFrames == 4) // 3 whole + the partial head
    // non-MP3 bytes are rejected, not decoded
    assert(!Mp3Decode.isMp3(Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException] {
      Mp3Decode.mp3Meta(Array[Byte](1, 2, 3, 4))
    }
  }

  test("MP3 Xing/VBRI frame counts take precedence over the walk") {
    // Xing in the first frame: MPEG1 stereo no-CRC → offset 4 + 32 = 36
    val first = mp3Frame()
    first(36) = 'X'; first(37) = 'i'; first(38) = 'n'; first(39) = 'g'
    first(40) = 0; first(41) = 0; first(42) = 0; first(43) = 1 // flags: FRAMES
    first(44) = 0; first(45) = 0; first(46) = 0; first(47) = 100 // count
    val bytes = Array.concat(first +: Seq.fill(3)(mp3Frame()): _*)
    val m = Mp3Decode.mp3Meta(bytes)
    assert(m.nFrames == 100 && m.vbr)
    assert(m.durationMs == 100L * 1152 * 1000 / 44100)
    // bitrate is walked-bytes over WALKED duration — the Xing-declared
    // duration of a truncated file must not understate the rate
    assert(m.bitrateKbps == 128, s"got ${m.bitrateKbps}")
    // "Info" is the CBR variant of the same header
    val info = mp3Frame()
    info(36) = 'I'; info(37) = 'n'; info(38) = 'f'; info(39) = 'o'
    info(40) = 0; info(41) = 0; info(42) = 0; info(43) = 1
    info(44) = 0; info(45) = 0; info(46) = 0; info(47) = 50
    val mi = Mp3Decode.mp3Meta(info)
    assert(mi.nFrames == 50 && !mi.vbr)
    // VBRI sits at a fixed 4 + 32 offset with frames at +14
    val vbri = mp3Frame()
    vbri(36) = 'V'; vbri(37) = 'B'; vbri(38) = 'R'; vbri(39) = 'I'
    vbri(50) = 0; vbri(51) = 0; vbri(52) = 0; vbri(53) = 25 // frames at 36+14
    val mv = Mp3Decode.mp3Meta(vbri)
    assert(mv.nFrames == 25 && mv.vbr)
  }

  test("MP3 bitrate envelope is the stream's real VBR structure") {
    // first half 128 kbps, second half 320 kbps → a two-level envelope
    val bytes = Array.concat(
      (Seq.fill(16)(mp3Frame(128)) ++ Seq.fill(16)(mp3Frame(320))): _*)
    val env = Mp3Decode.mp3BitrateEnvelope(bytes, bins = 4)
    assert(env.length == 4)
    assert(math.abs(env(0) - 0.4f) < 1e-6 && math.abs(env(1) - 0.4f) < 1e-6)
    assert(math.abs(env(2) - 1.0f) < 1e-6 && math.abs(env(3) - 1.0f) < 1e-6)
    // pipeline routing: decodeFeatures uses the REAL kernel, probeMeta the
    // real duration — MP3 has left the stub path
    assert(Multimodal.decodeFeatures(bytes, 4).toSeq == env.toSeq)
    val pm = Multimodal.probeMeta(bytes)
    assert(pm.format.contains("mp3"))
    assert(pm.duration_ms.contains(32L * 1152 * 1000 / 44100))
  }

  test("MP3 fuzz: mutations and truncations never escape the fallback") {
    val good = Array.concat(Seq.fill(8)(mp3Frame()): _*)
    val rnd = new scala.util.Random(37)
    for (_ <- 0 until 500) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val cut = if (rnd.nextBoolean()) m.take(1 + rnd.nextInt(m.length - 1)) else m
      try {
        Mp3Decode.isMp3(cut)
        if (Mp3Decode.isMp3(cut)) {
          Mp3Decode.mp3Meta(cut)
          Mp3Decode.mp3BitrateEnvelope(cut, 16)
        }
      } catch { case _: IllegalArgumentException => () } // only IAE allowed
      // and the pipeline boundary never throws at all
      assert(Multimodal.decodeFeatures(cut, 16).length == 16)
    }
  }

  // ---- MP4: hand-built ISO-BMFF box trees (public 14496-12 layout)

  private def mp4Box(t: String, body: Array[Byte]*): Array[Byte] = {
    val payload = body.flatten.toArray
    java.nio.ByteBuffer.allocate(8 + payload.length)
      .putInt(8 + payload.length).put(t.getBytes("US-ASCII")).put(payload).array()
  }

  private def mp4Fixture: Array[Byte] = {
    def u32(v: Long) = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def u16(v: Int) = java.nio.ByteBuffer.allocate(2).putShort(v.toShort).array()
    val mvhd = mp4Box("mvhd", // v0: timescale 600, duration 3000 → 5000 ms
      u32(0), u32(0), u32(0), u32(600), u32(3000), u32(0x00010000), u16(0x0100),
      new Array[Byte](10), new Array[Byte](36), new Array[Byte](24), u32(2))
    val tkhd = mp4Box("tkhd", // v0 84-byte body; width/height 16.16 at the tail
      u32(0), u32(0), u32(0), u32(1), u32(0), u32(3000),
      new Array[Byte](8), u16(0), u16(0), u16(0), u16(0), new Array[Byte](36),
      u32(320L << 16), u32(240L << 16))
    val mdhd = mp4Box("mdhd", // v0: media timescale 2400
      u32(0), u32(0), u32(0), u32(2400), u32(12000), u16(0x55C4), u16(0))
    val hdlr = mp4Box("hdlr",
      u32(0), u32(0), "vide".getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0))
    val stts = mp4Box("stts", // 120 samples × 100 ticks @ 2400 → 24 fps
      u32(0), u32(1), u32(120), u32(100))
    val stbl = mp4Box("stbl", stts)
    val minf = mp4Box("minf", stbl)
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val moov = mp4Box("moov", mvhd, trak)
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), u32(0),
      "isom".getBytes("US-ASCII"))
    val mdat = mp4Box("mdat", Array.tabulate[Byte](64)(i => (i * 3).toByte))
    ftyp ++ moov ++ mdat
  }

  test("MP4 box walk: duration, video dimensions, frame rate") {
    val bytes = mp4Fixture
    assert(Mp4Probe.isMp4(bytes))
    val m = Mp4Probe.probe(bytes)
    assert(m.durationMs == 5000L) // 3000 ticks @ 600/s
    assert(m.width.contains(320) && m.height.contains(240))
    assert(m.frameRate.exists(r => math.abs(r - 24.0) < 1e-9))
    // routed through the pipeline: REAL metadata, stub features
    assert(Multimodal.probeMeta(bytes) == Multimodal.ProbedMeta(
      Some(320), Some(240), Some("mp4"), Some(5000L), Some(24.0)))
    assert(Multimodal.decodeFeatures(bytes, 16).toSeq ==
      Multimodal.fakeDecodeFeatures(bytes, 16).toSeq)
    // non-MP4 binary is rejected at the sniff
    assert(!Mp4Probe.isMp4("garbage bytes here".getBytes))
    intercept[IllegalArgumentException](Mp4Probe.probe(Array[Byte](1, 2, 3)))
  }

  test("MP4 fuzz: mutations and truncations never escape the fallback") {
    val good = mp4Fixture
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 500) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val cut = if (rnd.nextBoolean()) m.take(1 + rnd.nextInt(m.length - 1)) else m
      try { if (Mp4Probe.isMp4(cut)) Mp4Probe.probe(cut) }
      catch { case _: IllegalArgumentException => () } // only IAE allowed
      assert(Multimodal.probeMeta(cut) != null) // boundary never throws
    }
  }

  test("probeMeta fills real dimensions/duration, stub formats untouched") {
    val img = bmp(4, 2, Seq.fill(8)((10, 20, 30)))
    val audio = wav(16000, Seq.fill(320)(0.toShort))
    assert(Multimodal.probeMeta(img) ==
      Multimodal.ProbedMeta(Some(4), Some(2), Some("bmp"), None, None))
    assert(Multimodal.probeMeta(audio) ==
      Multimodal.ProbedMeta(None, None, Some("wav"), Some(20L), None))
    assert(Multimodal.probeMeta(Array[Byte](1, 2, 3)) ==
      Multimodal.ProbedMeta(None, None, None, None, None))

    // column transform: BMP row gets real meta, jpg row keeps declared meta
    val rows = Seq(
      Row("b1", "image", img, Row(null, null, null, null, null)),
      Row("j1", "image", Array[Byte](1, 2, 3), Row(640, 480, "jpg", null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val probed = Multimodal.withProbedMeta(df).collect()
      .map(r => r.getAs[String]("media_id") -> r.getAs[Row]("meta")).toMap
    assert(probed("b1").getAs[Integer]("width") == 4)
    assert(probed("b1").getAs[String]("format") == "bmp")
    assert(probed("j1").getAs[Integer]("width") == 640)
    assert(probed("j1").getAs[String]("format") == "jpg")
  }

  test("corrupt bytes of a recognized format fall back to the stub, not crash") {
    val truncated = bmp(8, 8, Seq.fill(64)((1, 2, 3))).take(60) // claims BM, no pixels
    val f = Multimodal.decodeFeatures(truncated, 16)
    assert(f.length == 16)
    assert(f.toSeq == Multimodal.fakeDecodeFeatures(truncated, 16).toSeq)
  }

  test("decode fuzz: crafted headers can never escape the fallback") {
    val rnd = new scala.util.Random(42)
    // random bytes behind valid magic — includes overflow-crafted headers
    for (_ <- 1 to 200) {
      val body = new Array[Byte](54 + rnd.nextInt(256)); rnd.nextBytes(body)
      body(0) = 'B'; body(1) = 'M'
      assert(Multimodal.decodeFeatures(body, 16).length == 16)
      assert(Multimodal.probeMeta(body) != null)
      val wavBody = new Array[Byte](44 + rnd.nextInt(256)); rnd.nextBytes(wavBody)
      "RIFF".getBytes.copyToArray(wavBody, 0); "WAVE".getBytes.copyToArray(wavBody, 8)
      assert(Multimodal.decodeFeatures(wavBody, 16).length == 16)
      assert(Multimodal.probeMeta(wavBody) != null)
    }
    // specific Int-overflow header: width chosen so width*3 overflows Int
    val evil = bmp(4, 2, Seq.fill(8)((0, 0, 0)))
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 0x2AAAAAAB) // width
    assert(Multimodal.decodeFeatures(evil, 16).length == 16) // falls back
    // short trailing fmt chunk: declared size 4, reads would run past buffer
    val shortFmt = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortFmt.put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(4).putInt(0)
    assert(Multimodal.probeMeta(java.util.Arrays.copyOf(shortFmt.array(), 48)) ==
      Multimodal.ProbedMeta(None, None, None, None, None))
  }

  test("frame sampling: evenly spaced frames for videos only") {
    val frames = Multimodal.sampleFrames(mediaDf, nFrames = 5).collect()
    assert(frames.length == 5)
    assert(frames.map(_.getAs[String]("media_id")).toSet == Set("vid1"))
    val ts = frames.map(_.getAs[Long]("frame_ts_ms")).sorted
    assert(ts.sameElements(Array(0L, 2000L, 4000L, 6000L, 8000L)))
  }

  test("resize metadata: aspect-preserving downscale, no upscale") {
    val r = Multimodal.resizeMeta(mediaDf, maxDim = 320).collect()
      .map(x => x.getAs[String]("media_id") ->
        (x.getAs[Integer]("target_width"), x.getAs[Integer]("target_height"))).toMap
    assert(r("img1") == ((320, 240)))
    assert(r("img2") == ((16, 320)))
    assert(r("vid1") == ((320, 180)))
  }
}
