package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** PDF public-key (/Adobe.PubSec) handler: fixtures are CMS EnvelopedData
  * blobs hand-built from RFC 5652 with a from-scratch DER writer, the CEK
  * wrapped with JDK RSA and the content with JDK 3DES/AES (independent
  * implementations of the primitives the parser-side decrypt uses), inside
  * PDFs encrypted with the extractor's own RC4/AES object machinery — the
  * pdfRc4Fixture recipe extended one layer down the key hierarchy.
  */
class PdfPubSecSpec extends AnyFunSuite {

  // ------------------------------------------------------------ DER writer

  private def derLen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else if (n < 0x100) Array(0x81.toByte, n.toByte)
    else Array(0x82.toByte, (n >> 8).toByte, n.toByte)

  private def tlv(tag: Int, v: Array[Byte]): Array[Byte] =
    Array(tag.toByte) ++ derLen(v.length) ++ v

  private def cat(parts: Array[Byte]*): Array[Byte] =
    parts.foldLeft(Array.empty[Byte])(_ ++ _)

  private def seq(parts: Array[Byte]*) = tlv(0x30, cat(parts: _*))
  private def set(parts: Array[Byte]*) = tlv(0x31, cat(parts: _*))
  private def octet(v: Array[Byte]) = tlv(0x04, v)
  private def derInt(n: Int) = tlv(0x02, Array(n.toByte)) // small non-negative
  private def derNull = tlv(0x05, Array.empty)
  private def ctxCons(n: Int, v: Array[Byte]) = tlv(0xA0 | n, v)
  private def ctxPrim(n: Int, v: Array[Byte]) = tlv(0x80 | n, v)

  private def oid(s: String): Array[Byte] = {
    val arcs = s.split('.').map(_.toLong)
    val out = new ByteArrayOutputStream()
    out.write((arcs(0) * 40 + arcs(1)).toInt)
    arcs.drop(2).foreach { a =>
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var v = a
      bytes.prepend((v & 0x7F).toByte)
      v >>= 7
      while (v > 0) { bytes.prepend(((v & 0x7F) | 0x80).toByte); v >>= 7 }
      bytes.foreach(b => out.write(b.toInt))
    }
    tlv(0x06, out.toByteArray)
  }

  // ----------------------------------------------------- CMS fixture blob

  private def rsaKeyPair(seedByte: Int): java.security.KeyPair = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048, java.security.SecureRandom.getInstance("SHA1PRNG"))
    g.generateKeyPair()
  }

  /** One /Recipients blob: ContentInfo(EnvelopedData) with a single
    * KeyTransRecipientInfo for `pub` and the 24-byte seed‖perms content
    * under `cipherName` ("3des" | "aes128" | "rc4").
    */
  private def envelopedBlob(
      pub: java.security.PublicKey, seed: Array[Byte], perms: Int,
      cipherName: String): Array[Byte] = {
    require(seed.length == 20)
    val content = seed ++ Array[Byte](
      (perms >> 24).toByte, (perms >> 16).toByte, (perms >> 8).toByte, perms.toByte)
    val (cek, algId, encContent) = cipherName match {
      case "3des" =>
        val key = Array.tabulate[Byte](24)(i => (i * 7 + 11).toByte)
        val iv = Array.tabulate[Byte](8)(i => (i * 3 + 1).toByte)
        val c = javax.crypto.Cipher.getInstance("DESede/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "DESede"),
          new javax.crypto.spec.IvParameterSpec(iv))
        (key, seq(oid("1.2.840.113549.3.7"), octet(iv)), c.doFinal(content))
      case "aes128" =>
        val key = Array.tabulate[Byte](16)(i => (i * 13 + 5).toByte)
        val iv = Array.tabulate[Byte](16)(i => (i * 5 + 2).toByte)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        (key, seq(oid("2.16.840.1.101.3.4.1.2"), octet(iv)), c.doFinal(content))
      case "rc4" =>
        val key = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
        (key, seq(oid("1.2.840.113549.3.4")), PdfExtract.rc4(key, content))
    }
    val rsa = javax.crypto.Cipher.getInstance("RSA/ECB/PKCS1Padding")
    rsa.init(javax.crypto.Cipher.ENCRYPT_MODE, pub)
    val ek = rsa.doFinal(cek)
    val rid = seq(seq(), derInt(1)) // minimal IssuerAndSerialNumber
    val ktri = seq(derInt(0), rid,
      seq(oid("1.2.840.113549.1.1.1"), derNull), octet(ek))
    val eci = seq(oid("1.2.840.113549.1.7.1"), algId, ctxPrim(0, encContent))
    val env = seq(derInt(0), set(ktri), eci)
    seq(oid("1.2.840.113549.1.7.3"), ctxCons(0, env))
  }

  // ------------------------------------------------------- PDF fixtures

  private val Seed = Array.tabulate[Byte](20)(i => (i * 29 + 7).toByte)
  private val Latin1 = StandardCharsets.ISO_8859_1

  private def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02x").mkString

  /** Binary-safe PDF literal string: every byte as a 3-digit octal escape. */
  private def octalLiteral(b: Array[Byte]): String =
    b.map(x => f"\\${x & 0xFF}%03o").mkString

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  /** adbe.pkcs7.s4 / V2 / RC4-128 file. `blobs` must already be built for
    * the recipients; hexFirst picks the string spelling per blob (hex vs
    * octal literal) so both parser paths are exercised.
    */
  private def pubSecRc4Pdf(blobs: Seq[Array[Byte]], text: String,
      literalSpelling: Boolean = false): Array[Byte] = {
    import PdfExtract.{md5Bytes, rc4}
    val fileKey = sha1(Seq(Seed) ++ blobs: _*).take(16)
    def encObj(num: Int, data: Array[Byte]): Array[Byte] = {
      val salt = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte, 0, 0)
      rc4(md5Bytes(fileKey, salt).take(16), data)
    }
    val c1 = encObj(4, s"BT ($text) Tj ET".getBytes(Latin1))
    val recips = blobs.map(b =>
      if (literalSpelling) "(" + octalLiteral(b) + ")" else "<" + hex(b) + ">")
      .mkString(" ")
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(Latin1))
    w("%PDF-1.5\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${c1.length}>>\nstream\n")
    bos.write(c1)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj <</Filter/Adobe.PubSec/SubFilter/adbe.pkcs7.s4" +
      s"/V 2/Length 128/Recipients [$recips]>> endobj\n")
    w("trailer <</Root 1 0 R/Encrypt 5 0 R>>\n%%EOF\n")
    bos.toByteArray
  }

  /** adbe.pkcs7.s5 / V4 / AESV2 file (/Recipients inside the crypt filter
    * dict — the s5 layout).
    */
  private def pubSecAesV2Pdf(blobs: Seq[Array[Byte]], text: String): Array[Byte] = {
    import PdfExtract.{aesCbc, md5Bytes}
    val fileKey = sha1(Seq(Seed) ++ blobs: _*).take(16)
    def encObj(num: Int, data: Array[Byte]): Array[Byte] = {
      val salt = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte, 0, 0,
        0x73, 0x41, 0x6C, 0x54)
      val objKey = md5Bytes(fileKey, salt).take(16)
      val iv = Array.fill[Byte](16)(0x24)
      iv ++ aesCbc(encrypt = true, objKey, iv, data, pkcs5 = true)
    }
    val c1 = encObj(4, s"BT ($text) Tj ET".getBytes(Latin1))
    val recips = blobs.map(b => "<" + hex(b) + ">").mkString(" ")
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(Latin1))
    w("%PDF-1.6\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${c1.length}>>\nstream\n")
    bos.write(c1)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj <</Filter/Adobe.PubSec/SubFilter/adbe.pkcs7.s5" +
      s"/V 4/Length 128/CF <</DefaultCryptFilter <</CFM/AESV2/AuthEvent/DocOpen" +
      s"/Length 16/Recipients [$recips]>>>>" +
      s"/StmF/DefaultCryptFilter/StrF/DefaultCryptFilter>> endobj\n")
    w("trailer <</Root 1 0 R/Encrypt 5 0 R>>\n%%EOF\n")
    bos.toByteArray
  }

  /** adbe.pkcs7.s5 / V5 / AESV3 file (SHA-256 file key, no object salt). */
  private def pubSecAesV3Pdf(blobs: Seq[Array[Byte]], text: String): Array[Byte] = {
    import PdfExtract.aesCbc
    val fileKey = sha256(Seq(Seed) ++ blobs: _*)
    def encObj(data: Array[Byte]): Array[Byte] = {
      val iv = Array.fill[Byte](16)(0x51)
      iv ++ aesCbc(encrypt = true, fileKey, iv, data, pkcs5 = true)
    }
    val c1 = encObj(s"BT ($text) Tj ET".getBytes(Latin1))
    val recips = blobs.map(b => "<" + hex(b) + ">").mkString(" ")
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(Latin1))
    w("%PDF-2.0\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${c1.length}>>\nstream\n")
    bos.write(c1)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj <</Filter/Adobe.PubSec/SubFilter/adbe.pkcs7.s5" +
      s"/V 5/Length 256/CF <</DefaultCryptFilter <</CFM/AESV3/AuthEvent/DocOpen" +
      s"/Length 32/Recipients [$recips]>>>>" +
      s"/StmF/DefaultCryptFilter/StrF/DefaultCryptFilter>> endobj\n")
    w("trailer <</Root 1 0 R/Encrypt 5 0 R>>\n%%EOF\n")
    bos.toByteArray
  }

  private lazy val kp = rsaKeyPair(1)
  private lazy val kp2 = rsaKeyPair(2)

  // ----------------------------------------------------------------- tests

  test("s4/RC4: 3DES-enveloped recipient opens with its private key") {
    val blob = envelopedBlob(kp.getPublic, Seed, -44, "3des")
    val pdf = pubSecRc4Pdf(Seq(blob), "PubSec RC4 secret")
    assert(PdfExtract.text(pdf, kp.getPrivate).trim == "PubSec RC4 secret")
  }

  test("s4/RC4: octal-literal /Recipients spelling parses identically") {
    val blob = envelopedBlob(kp.getPublic, Seed, -44, "3des")
    val pdf = pubSecRc4Pdf(Seq(blob), "Literal spelling", literalSpelling = true)
    assert(PdfExtract.text(pdf, kp.getPrivate).trim == "Literal spelling")
  }

  test("s4/RC4: AES-128- and RC4-enveloped recipients also open") {
    for (cipher <- Seq("aes128", "rc4")) {
      val blob = envelopedBlob(kp.getPublic, Seed, -44, cipher)
      val pdf = pubSecRc4Pdf(Seq(blob), s"Enveloped via $cipher")
      assert(PdfExtract.text(pdf, kp.getPrivate).trim == s"Enveloped via $cipher")
    }
  }

  test("multi-recipient: the SECOND recipient's key opens the file") {
    val blobs = Seq(
      envelopedBlob(kp.getPublic, Seed, -44, "3des"),
      envelopedBlob(kp2.getPublic, Seed, -44, "aes128"))
    val pdf = pubSecRc4Pdf(blobs, "Shared document")
    assert(PdfExtract.text(pdf, kp.getPrivate).trim == "Shared document")
    assert(PdfExtract.text(pdf, kp2.getPrivate).trim == "Shared document")
  }

  test("s5/V4/AESV2: crypt-filter layout with /Recipients inside the CF") {
    val blob = envelopedBlob(kp.getPublic, Seed, -44, "3des")
    val pdf = pubSecAesV2Pdf(Seq(blob), "PubSec AES-128 secret")
    assert(PdfExtract.text(pdf, kp.getPrivate).trim == "PubSec AES-128 secret")
  }

  test("s5/V5/AESV3: SHA-256 file key, AES-256 objects") {
    val blob = envelopedBlob(kp.getPublic, Seed, -44, "aes128")
    val pdf = pubSecAesV3Pdf(Seq(blob), "PubSec AES-256 secret")
    assert(PdfExtract.text(pdf, kp.getPrivate).trim == "PubSec AES-256 secret")
  }

  test("wrong key refuses loudly; missing key reports what is needed") {
    val blob = envelopedBlob(kp.getPublic, Seed, -44, "3des")
    val pdf = pubSecRc4Pdf(Seq(blob), "No entry")
    val e1 = intercept[IllegalArgumentException](
      PdfExtract.text(pdf, kp2.getPrivate))
    assert(e1.getMessage.contains("no /Recipients entry matches"))
    val e2 = intercept[IllegalArgumentException](PdfExtract.text(pdf))
    assert(e2.getMessage.contains("recipient private key"))
  }

  test("corrupt recipient blobs refuse with IAE, never crash") {
    val blob = envelopedBlob(kp.getPublic, Seed, -44, "3des")
    val rnd = new scala.util.Random(13)
    var refused = 0
    for (_ <- 1 to 200) {
      val mutated = blob.clone()
      val i = rnd.nextInt(mutated.length)
      mutated(i) = (mutated(i) ^ (1 + rnd.nextInt(255))).toByte
      val pdf = pubSecRc4Pdf(Seq(mutated), "Mutant")
      try {
        PdfExtract.text(pdf, kp.getPrivate)
      } catch {
        case _: IllegalArgumentException => refused += 1
      }
    }
    // most single-byte flips land in the DER structure, the RSA block or
    // the ciphertext and must refuse; a flip in ignorable regions (rid,
    // unused header bytes) may still open — what matters is NO other
    // exception type ever escapes
    assert(refused > 100)
  }

  test("DER reader: oid round-trip and malformed-length refusals") {
    assert(PdfPubSec.oidOf(oid("1.2.840.113549.1.7.3").drop(2)) ==
      "1.2.840.113549.1.7.3")
    assert(PdfPubSec.oidOf(oid("2.16.840.1.101.3.4.1.42").drop(2)) ==
      "2.16.840.1.101.3.4.1.42")
    // truncated value
    intercept[IllegalArgumentException](
      PdfPubSec.readTlv(Array[Byte](0x30, 0x05, 0x01), 0))
    // indefinite length
    intercept[IllegalArgumentException](
      PdfPubSec.readTlv(Array[Byte](0x30, 0x80.toByte, 0x00, 0x00), 0))
  }
}
