package graft.multimodal

/** Zero-dependency JPEG decoder — luma (Y) channel only.
  *
  * Scope: Huffman-coded 8-bit JPEG, BOTH sequential (SOF0/SOF1 —
  * interleaved scan, restart intervals, arbitrary sampling factors) AND
  * progressive (SOF2 — spectral selection, successive approximation, EOB
  * runs, interleaved-DC / single-component-AC scans per ITU T.81 §G).
  * That covers what cameras, JDK ImageIO, libjpeg and web encoders emit.
  * Arithmetic coding, hierarchical and 12-bit modes throw
  * `IllegalArgumentException` and fall back to the stub at the
  * [[Multimodal.decodeFeatures]] boundary.
  *
  * Only the Y component is inverse-transformed: the feature kernel is the
  * 8×8 mean-luma grid, so chroma blocks are entropy-decoded (the bitstream
  * must advance) but never dequantized/IDCT'd — sequential cost is one
  * IDCT per luma block; progressive additionally buffers coefficient
  * planes across scans (hence its tighter pixel cap). Pure integer/double
  * arithmetic, bit-identical across JVMs.
  */
private[graft] object JpegDecode {

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  @inline private def be16(b: Array[Byte], off: Int): Int = {
    if (off + 1 >= b.length) fail("truncated")
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"jpeg: $msg")

  /** Zigzag index → natural (row-major) coefficient position. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ------------------------------------------------------- Huffman tables

  /** Canonical Huffman table (JPEG Annex F.2.2.3 mincode/maxcode decode). */
  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.bit()
      var l = 1
      while (l <= 16 && code > maxCode(l)) {
        code = (code << 1) | r.bit()
        l += 1
      }
      if (l > 16) fail("invalid huffman code")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  // ----------------------------------------------------------- bit reader

  /** MSB-first bit reader over the entropy-coded segment: un-stuffs 0xFF00
    * and treats any other marker mid-stream as corruption (restart markers
    * are consumed explicitly via [[restart]] at interval boundaries).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) fail("truncated entropy data")
        val v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) fail("truncated entropy data")
          if ((b(pos) & 0xFF) == 0x00) pos += 1
          else fail("unexpected marker in entropy data")
        }
        buf = v
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(): Unit = {
      cnt = 0
      if (pos + 1 >= b.length) fail("truncated at restart marker")
      val m = b(pos + 1) & 0xFF
      if ((b(pos) & 0xFF) != 0xFF || m < 0xD0 || m > 0xD7)
        fail("expected restart marker")
      pos += 2
    }
  }

  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ----------------------------------------------------------------- IDCT

  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Separable 2-D inverse DCT + level shift + clamp (double precision —
    * an index-build/feature kernel, not a hot query path).
    */
  private def idct(coef: Array[Double], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cn(u) * coef(y * 8 + u) * CosT(x * 8 + u); u += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cn(v) * tmp(v * 8 + x) * CosT(y2 * 8 + v); v += 1 }
        val px = math.round(s / 2.0 + 128.0).toInt
        out(y2 * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        y2 += 1
      }
      x += 1
    }
  }

  // ------------------------------------------------------------- decoding

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  private final case class Luma(
      width: Int, height: Int, plane: Array[Int], planeW: Int,
      xScaleNum: Int, xScaleDen: Int, yScaleNum: Int, yScaleDen: Int) {
    /** Luminance in [0,1] at image coordinates (nearest-neighbor across
      * sampling) — same range contract as the BMP/PNG luma kernels.
      */
    def luma(x: Int, y: Int): Double =
      plane((y * yScaleNum / yScaleDen) * planeW + (x * xScaleNum / xScaleDen)) / 255.0
  }

  /** One block: DC diff + AC run-lengths. `emit` = dequantize into `coef`
    * (natural order) for the luma component; chroma passes emit=false and
    * only advances the bitstream. Returns the new DC predictor.
    */
  private def decodeBlock(
      r: BitReader, dc: Huff, ac: Huff, qt: Array[Int], pred: Int,
      emit: Boolean, coef: Array[Double]): Int = {
    val t = dc.decode(r)
    if (t > 11) fail("invalid DC category")
    val diff = if (t == 0) 0 else extend(r.receive(t), t)
    val p = pred + diff
    if (emit) {
      java.util.Arrays.fill(coef, 0.0)
      coef(0) = p.toDouble * qt(0)
    }
    var k = 1
    while (k < 64) {
      val rs = ac.decode(r)
      val run = rs >> 4
      val s = rs & 0x0F
      if (s == 0) {
        if (run == 15) k += 16 else k = 64 // ZRL vs EOB
      } else {
        k += run
        if (k > 63) fail("AC coefficient index overflow")
        val v = extend(r.receive(s), s)
        if (emit) coef(ZigZag(k)) = v.toDouble * qt(k)
        k += 1
      }
    }
    p
  }

  /** Per-component coefficient plane for progressive decoding: zigzag-order
    * coefficients for every (MCU-padded) block, accumulated across scans and
    * dequantized/IDCT'd only at the end.
    */
  private final class ProgComp(
      val comp: Comp, val padBW: Int, val padBH: Int,
      val bw: Int, val bh: Int) {
    val coef = new Array[Int](padBW * padBH * 64)
    var pred = 0 // DC predictor, reset per scan / restart
  }

  /** Parse markers up to SOS, then decode the interleaved scan (baseline)
    * or accumulate every scan into coefficient planes (progressive, SOF2).
    */
  private def decodeLuma(b: Array[Byte]): Luma = {
    if (!isJpeg(b)) fail("not a JPEG (SOI missing)")
    val qts = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var dri = 0
    var progressive = false
    var prog: Array[ProgComp] = null
    var sawScan = false
    var pos = 2
    while (pos < b.length) {
      if ((b(pos) & 0xFF) != 0xFF) fail("expected marker")
      while (pos < b.length && (b(pos) & 0xFF) == 0xFF) pos += 1 // fill bytes
      if (pos >= b.length) fail("truncated marker")
      val m = b(pos) & 0xFF
      pos += 1
      m match {
        case 0x01 => () // TEM: no payload
        case x if x >= 0xD0 && x <= 0xD7 => () // stray RST: no payload
        case 0xD9 =>
          if (progressive && sawScan)
            return progressiveLuma(width, height, comps, prog, qts)
          fail("EOI before SOS")
        case 0xDB => // DQT
          val len = be16(b, pos)
          var p = pos + 2
          while (p < pos + len) {
            val pq = (b(p) & 0xFF) >> 4
            val tq = b(p) & 0x0F
            p += 1
            if (pq > 1) fail("invalid DQT precision")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) b(p + i) & 0xFF else be16(b, p + 2 * i)
              i += 1
            }
            p += (if (pq == 0) 64 else 128)
            qts(tq) = t
          }
          pos += len
        case 0xC4 => // DHT
          val len = be16(b, pos)
          var p = pos + 2
          while (p < pos + len) {
            val tc = (b(p) & 0xFF) >> 4
            val th = b(p) & 0x0F
            p += 1
            if (tc > 1 || th > 3) fail("invalid DHT header")
            if (p + 16 > b.length) fail("truncated DHT")
            val counts = Array.tabulate(16)(i => b(p + i) & 0xFF)
            p += 16
            val total = counts.sum
            if (total > 256 || p + total > b.length) fail("truncated DHT values")
            val vals = Array.tabulate(total)(i => b(p + i) & 0xFF)
            p += total
            if (tc == 0) dcT(th) = new Huff(counts, vals)
            else acT(th) = new Huff(counts, vals)
          }
          pos += len
        case 0xC0 | 0xC1 | 0xC2 => // SOF0/SOF1 sequential; SOF2 progressive
          progressive = m == 0xC2
          val len = be16(b, pos)
          if ((b(pos + 2) & 0xFF) != 8) fail("only 8-bit precision supported")
          height = be16(b, pos + 3)
          width = be16(b, pos + 5)
          if (width <= 0 || height <= 0) fail("empty frame")
          // crafted headers must not drive allocation/decode work unbounded;
          // progressive holds full coefficient planes, so its cap is tighter
          if (width.toLong * height > (if (progressive) 1L << 24 else 1L << 26))
            fail("image too large")
          val nc = b(pos + 7) & 0xFF
          if (nc < 1 || nc > 4) fail("invalid component count")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val c = Comp(b(o) & 0xFF, (b(o + 1) & 0xFF) >> 4, b(o + 1) & 0x0F,
              b(o + 2) & 0xFF)
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
              fail("invalid sampling/quant spec")
            c
          }
          if (progressive) {
            val hmax = comps.map(_.h).max
            val vmax = comps.map(_.v).max
            val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
            val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
            prog = comps.map { c =>
              val cw = (width * c.h + hmax - 1) / hmax
              val ch = (height * c.v + vmax - 1) / vmax
              new ProgComp(c, mcusX * c.h, mcusY * c.v,
                (cw + 7) / 8, (ch + 7) / 8)
            }
          }
          pos += len
        case x if (x >= 0xC3 && x <= 0xCB) || (x >= 0xCD && x <= 0xCF) =>
          fail(f"SOF marker $x%02x not supported (sequential/progressive huffman only)")
        case 0xDD => // DRI
          dri = be16(b, pos + 2)
          pos += be16(b, pos)
        case 0xDA => // SOS
          if (comps == null) fail("SOS before SOF")
          val len = be16(b, pos)
          val ns = b(pos + 2) & 0xFF
          if (ns < 1 || ns > comps.length) fail("invalid scan component count")
          val order = Array.tabulate(ns) { i =>
            val o = pos + 3 + 2 * i
            if (o + 1 >= b.length) fail("truncated SOS")
            val cs = b(o) & 0xFF
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0) fail("SOS references unknown component")
            val td = (b(o + 1) & 0xFF) >> 4
            val ta = b(o + 1) & 0x0F
            if (td > 3 || ta > 3) fail("invalid SOS table selector")
            (ci, td, ta)
          }
          if (!progressive) {
            if (ns != comps.length)
              fail("non-interleaved multi-scan sequential JPEG not supported")
            return decodeScan(b, pos + len, comps, order, qts, dcT, acT,
              width, height, dri)
          }
          // progressive: spectral selection + successive approximation
          val o = pos + 3 + 2 * ns
          if (o + 2 >= b.length) fail("truncated SOS")
          val ss = b(o) & 0xFF
          val se = b(o + 1) & 0xFF
          val ah = (b(o + 2) & 0xFF) >> 4
          val al = b(o + 2) & 0x0F
          pos = decodeProgressiveScan(b, pos + len, prog, order,
            ss, se, ah, al, dri, dcT, acT)
          sawScan = true
        case _ => // APPn, COM, anything else with a length field
          pos += be16(b, pos)
      }
    }
    // input exhausted without EOI: if every scan seen decoded to completion,
    // a lost trailer must not fail what the sequential path tolerates
    if (progressive && sawScan)
      return progressiveLuma(width, height, comps, prog, qts)
    fail("no SOS marker")
  }

  private def decodeScan(
      b: Array[Byte], dataPos: Int, comps: Array[Comp],
      order: Array[(Int, Int, Int)], qts: Array[Array[Int]],
      dcT: Array[Huff], acT: Array[Huff], width: Int, height: Int,
      dri: Int): Luma = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val yC = comps(0) // luma is the first SOF component (JFIF/EXIF contract)
    val planeW = mcusX * 8 * yC.h
    val plane = new Array[Int](planeW * mcusY * 8 * yC.v)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val px = new Array[Int](64)
    val r = new BitReader(b, dataPos)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          r.restart()
          java.util.Arrays.fill(preds, 0)
        }
        var oi = 0
        while (oi < order.length) {
          val (ci, td, ta) = order(oi)
          val c = comps(ci)
          val isLuma = ci == 0
          val qt = qts(c.tq)
          if (qt == null) fail("missing quantization table")
          if (dcT(td) == null || acT(ta) == null) fail("missing huffman table")
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              preds(ci) = decodeBlock(r, dcT(td), acT(ta), qt, preds(ci),
                emit = isLuma, coef)
              if (isLuma) {
                idct(coef, px)
                val ox = (mx * c.h + bh) * 8
                val oy = (my * c.v + bv) * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    plane((oy + yy) * planeW + ox + xx) = px(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
              }
              bh += 1
            }
            bv += 1
          }
          oi += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    Luma(width, height, plane, planeW, yC.h, hmax, yC.v, vmax)
  }

  // ------------------------------------------------- progressive decoding

  /** Position of the next marker (0xFF followed by a non-stuffing byte) at
    * or after `from` — how the multi-scan loop resumes after a scan's
    * entropy-coded segment.
    */
  private def nextMarker(b: Array[Byte], from: Int): Int = {
    var p = math.max(0, from)
    while (p + 1 < b.length) {
      if ((b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) != 0x00) return p
      p += 1
    }
    // scan decoded to completion but the trailing marker is cut off: report
    // end-of-input and let the caller decide (the marker loop treats a
    // truncated trailer after a complete scan like the sequential path does
    // a missing EOI — tolerated)
    b.length
  }

  /** One progressive scan (ITU T.81 §G.2): DC scans may be interleaved,
    * AC scans are single-component; Ah == 0 is the first pass for the
    * (Ss..Se, Al) band, Ah > 0 a successive-approximation refinement.
    * Returns the position of the marker terminating the scan.
    */
  private def decodeProgressiveScan(
      b: Array[Byte], dataPos: Int, prog: Array[ProgComp],
      order: Array[(Int, Int, Int)], ss: Int, se: Int, ah: Int, al: Int,
      dri: Int, dcT: Array[Huff], acT: Array[Huff]): Int = {
    if (ss > se || se > 63 || al > 13 || ah > 13) fail("invalid scan band")
    if (ss == 0 && se != 0) fail("DC scan must have Se = 0")
    if (ss > 0 && order.length != 1) fail("AC scan must be single-component")
    val r = new BitReader(b, dataPos)
    var eobrun = 0
    var unit = 0
    def maybeRestart(): Unit =
      if (dri > 0 && unit > 0 && unit % dri == 0) {
        r.restart()
        prog.foreach(_.pred = 0)
        eobrun = 0
      }

    def dcFirst(pc: ProgComp, huff: Huff, blockOff: Int): Unit = {
      val t = huff.decode(r)
      if (t > 11) fail("invalid DC category")
      val diff = if (t == 0) 0 else extend(r.receive(t), t)
      pc.pred += diff
      pc.coef(blockOff) = pc.pred << al
    }
    def dcRefine(pc: ProgComp, blockOff: Int): Unit =
      if (r.bit() == 1) pc.coef(blockOff) |= (1 << al)

    def acFirst(pc: ProgComp, huff: Huff, blockOff: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = huff.decode(r)
        val run = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            eobrun = (1 << run) - 1 + (if (run > 0) r.receive(run) else 0)
            k = se + 1
          }
        } else {
          k += run
          if (k > se) fail("AC index beyond band")
          pc.coef(blockOff + k) = extend(r.receive(s), s) << al
          k += 1
        }
      }
    }

    def acRefine(pc: ProgComp, huff: Huff, blockOff: Int): Unit = {
      val p1 = 1 << al
      val m1 = -1 << al
      @inline def correct(k: Int): Unit = {
        val c = pc.coef(blockOff + k)
        if (r.bit() == 1 && (c & p1) == 0)
          pc.coef(blockOff + k) = c + (if (c >= 0) p1 else m1)
      }
      var k = ss
      if (eobrun == 0) {
        var inBand = true
        while (inBand && k <= se) {
          val rs = huff.decode(r)
          var run = rs >> 4
          val s = rs & 0x0F
          var newval = 0
          if (s == 0) {
            if (run < 15) { // EOB run begins (includes this block's tail)
              eobrun = (1 << run) + (if (run > 0) r.receive(run) else 0)
              inBand = false
            }
            // run == 15: ZRL — skip 16 zero-history positions below
          } else {
            if (s != 1) fail("refinement magnitude must be 1")
            newval = if (r.bit() == 1) p1 else m1
          }
          if (inBand) {
            var placed = false
            while (!placed && k <= se) {
              if (pc.coef(blockOff + k) != 0) correct(k)
              else if (run == 0) {
                if (newval != 0) pc.coef(blockOff + k) = newval
                placed = true
              } else run -= 1
              k += 1
            }
            if (!placed && newval != 0) fail("refinement ran past band")
          }
        }
      }
      if (eobrun > 0) { // EOB region: correction bits for nonzero coeffs
        while (k <= se) {
          if (pc.coef(blockOff + k) != 0) correct(k)
          k += 1
        }
        eobrun -= 1
      }
    }

    if (ss == 0) { // DC scan: interleaved MCU order, or single-component
      if (order.length > 1) {
        val mcusX = prog(0).padBW / prog(0).comp.h
        val mcusY = prog(0).padBH / prog(0).comp.v
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            order.foreach { case (ci, td, _) =>
              val pc = prog(ci)
              if (ah == 0 && dcT(td) == null) fail("missing DC huffman table")
              var bv = 0
              while (bv < pc.comp.v) {
                var bh2 = 0
                while (bh2 < pc.comp.h) {
                  val off = ((my * pc.comp.v + bv) * pc.padBW +
                    (mx * pc.comp.h + bh2)) * 64
                  if (ah == 0) dcFirst(pc, dcT(td), off) else dcRefine(pc, off)
                  bh2 += 1
                }
                bv += 1
              }
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else {
        val (ci, td, _) = order(0)
        val pc = prog(ci)
        if (ah == 0 && dcT(td) == null) fail("missing DC huffman table")
        var by = 0
        while (by < pc.bh) {
          var bx = 0
          while (bx < pc.bw) {
            maybeRestart()
            val off = (by * pc.padBW + bx) * 64
            if (ah == 0) dcFirst(pc, dcT(td), off) else dcRefine(pc, off)
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
    } else { // AC scan: single component, non-interleaved block order
      val (ci, _, ta) = order(0)
      val pc = prog(ci)
      if (acT(ta) == null) fail("missing AC huffman table")
      var by = 0
      while (by < pc.bh) {
        var bx = 0
        while (bx < pc.bw) {
          maybeRestart()
          val off = (by * pc.padBW + bx) * 64
          if (ah == 0) acFirst(pc, acT(ta), off) else acRefine(pc, acT(ta), off)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    nextMarker(b, r.pos)
  }

  /** Dequantize + IDCT the accumulated luma coefficient plane. */
  private def progressiveLuma(
      width: Int, height: Int, comps: Array[Comp], prog: Array[ProgComp],
      qts: Array[Array[Int]]): Luma = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val yPc = prog(0) // luma is the first SOF component (JFIF/EXIF contract)
    val qt = qts(yPc.comp.tq)
    if (qt == null) fail("missing quantization table")
    val planeW = yPc.padBW * 8
    val plane = new Array[Int](planeW * yPc.padBH * 8)
    val coef = new Array[Double](64)
    val px = new Array[Int](64)
    var by = 0
    while (by < yPc.padBH) {
      var bx = 0
      while (bx < yPc.padBW) {
        val off = (by * yPc.padBW + bx) * 64
        java.util.Arrays.fill(coef, 0.0)
        var k = 0
        while (k < 64) {
          val v = yPc.coef(off + k)
          if (v != 0) coef(ZigZag(k)) = v.toDouble * qt(k)
          k += 1
        }
        idct(coef, px)
        val ox = bx * 8
        val oy = by * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            plane((oy + yy) * planeW + ox + xx) = px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    Luma(width, height, plane, planeW, yPc.comp.h, hmax, yPc.comp.v, vmax)
  }

  // ------------------------------------------------------------ public API

  /** Totalizes parsing over arbitrary bytes: every index is into the input
    * buffer (or a table derived from it), so an out-of-bounds read IS a
    * truncation/corruption — surface it as the contractual
    * IllegalArgumentException rather than guarding every payload offset.
    */
  @inline private def guarded[A](body: => A): A =
    try body
    catch {
      case _: ArrayIndexOutOfBoundsException => fail("truncated or corrupt data")
    }

  /** (width, height) from the SOF header — cheap, no entropy decode. */
  def jpegSize(b: Array[Byte]): (Int, Int) = guarded {
    if (!isJpeg(b)) fail("not a JPEG (SOI missing)")
    var pos = 2
    while (pos < b.length) {
      if ((b(pos) & 0xFF) != 0xFF) fail("expected marker")
      while (pos < b.length && (b(pos) & 0xFF) == 0xFF) pos += 1
      if (pos >= b.length) fail("truncated marker")
      val m = b(pos) & 0xFF
      pos += 1
      if ((m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC) {
        val (w, h) = (be16(b, pos + 5), be16(b, pos + 3))
        // same validity contract as decodeLuma: corrupt dims must probe as
        // an error (→ all-None meta), not as Some(0)
        if (w <= 0 || h <= 0) fail("empty frame")
        return (w, h)
      }
      if (m == 0xD9 || m == 0xDA) fail("no SOF before scan")
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) ()
      else pos += be16(b, pos)
    }
    fail("no SOF marker")
  }

  /** grid×grid mean-luma blocks (same contract as bmp/pngLumaGrid). */
  def jpegLumaGrid(b: Array[Byte], grid: Int = 8): Array[Float] = guarded {
    val l = decodeLuma(b)
    MediaDecode.lumaGridOf(l.width, l.height, grid, l.luma)
  }
}
