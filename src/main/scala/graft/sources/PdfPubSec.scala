package graft.sources

/** PDF public-key security handler support (/Filter /Adobe.PubSec,
  * ISO 32000-1 §7.6.4 + RFC 5652 CMS): each string in /Recipients is a
  * DER-encoded `ContentInfo(envelopedData)`; a recipient's RSA private
  * key unwraps the content-encryption key, the decrypted content's first
  * 20 bytes are the seed, and the file key is a digest over
  * `seed ‖ every recipient blob in array order [‖ FFFFFFFF]` — after
  * which the file decrypts with the SAME per-object machinery as the
  * password handlers (RC4 / AESV2 / AESV3), which is why this module only
  * recovers the seed and leaves the rest to PdfExtract.
  *
  * Scope: definite-length DER (what Acrobat and OpenSSL emit for these
  * blobs), KeyTransRecipientInfo with RSA PKCS#1 v1.5 key transport (the
  * only transport Acrobat uses here), content ciphers 3DES-CBC,
  * AES-128/256-CBC (JCE) and RC4 (the extractor's own primitive).
  * BER indefinite lengths and keyAgreement recipients refuse loudly.
  * No certificate matching: like poppler, every KeyTransRecipientInfo is
  * tried against the supplied key and PKCS#1 unpadding decides — a wrong
  * key fails every recipient and the caller reports it.
  */
private[graft] object PdfPubSec {

  // ------------------------------------------------------------ DER reader

  /** One definite-length TLV: `tag` is the full identifier octet. */
  final case class Tlv(tag: Int, value: Array[Byte])

  /** Read the TLV starting at `off`; returns it plus the offset just past. */
  def readTlv(b: Array[Byte], off: Int): (Tlv, Int) = {
    require(off + 2 <= b.length, "DER: truncated TLV header")
    val tag = b(off) & 0xFF
    require((tag & 0x1F) != 0x1F, "DER: multi-byte tags unsupported")
    var p = off + 1
    val l0 = b(p) & 0xFF
    p += 1
    val len =
      if (l0 < 0x80) l0
      else {
        val n = l0 & 0x7F
        require(n >= 1, "DER: indefinite length unsupported")
        require(n <= 4, s"DER: $n-byte length absurd for a recipient blob")
        require(p + n <= b.length, "DER: truncated length")
        var v = 0L
        for (_ <- 0 until n) { v = (v << 8) | (b(p) & 0xFF); p += 1 }
        require(v <= Int.MaxValue - p, "DER: length overflows the blob")
        v.toInt
      }
    require(p + len <= b.length, "DER: value runs past the blob")
    (Tlv(tag, java.util.Arrays.copyOfRange(b, p, p + len)), p + len)
  }

  /** All sibling TLVs inside a constructed value. */
  def children(value: Array[Byte]): Seq[Tlv] = {
    val out = Seq.newBuilder[Tlv]
    var p = 0
    while (p < value.length) {
      val (t, next) = readTlv(value, p)
      out += t
      p = next
    }
    out.result()
  }

  /** Dotted-decimal OID from an OBJECT IDENTIFIER value. */
  def oidOf(value: Array[Byte]): String = {
    require(value.nonEmpty, "DER: empty OID")
    val first = value(0) & 0xFF
    val sb = new StringBuilder
    sb.append(first / 40).append('.').append(first % 40)
    var acc = 0L
    for (i <- 1 until value.length) {
      acc = (acc << 7) | (value(i) & 0x7F)
      if ((value(i) & 0x80) == 0) { sb.append('.').append(acc); acc = 0 }
    }
    sb.toString
  }

  // ------------------------------------------------------- CMS structures

  private val OidEnvelopedData = "1.2.840.113549.1.7.3"
  private val OidRsaEncryption = "1.2.840.113549.1.1.1"
  private val OidDesEde3Cbc = "1.2.840.113549.3.7"
  private val OidRc4 = "1.2.840.113549.3.4"
  private val OidAes128Cbc = "2.16.840.1.101.3.4.1.2"
  private val OidAes256Cbc = "2.16.840.1.101.3.4.1.42"

  /** One parsed recipient blob: the RSA-wrapped CEKs (one per
    * KeyTransRecipientInfo) plus the symmetric content parameters.
    */
  final case class Envelope(
      wrappedKeys: Seq[Array[Byte]], contentAlg: String,
      iv: Array[Byte], encryptedContent: Array[Byte])

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Parse `ContentInfo(envelopedData)` (or a bare EnvelopedData — some
    * producers skip the wrapper).
    */
  def parseEnvelope(der: Array[Byte]): Envelope = {
    val (top, _) = readTlv(der, 0)
    if (top.tag != 0x30) fail(s"CMS: expected SEQUENCE, got tag ${top.tag}")
    val topKids = children(top.value)
    val envData =
      if (topKids.nonEmpty && topKids.head.tag == 0x06) {
        // ContentInfo { contentType, [0] EXPLICIT content }
        if (oidOf(topKids.head.value) != OidEnvelopedData)
          fail("CMS: not an EnvelopedData blob")
        val content = topKids.find(_.tag == 0xA0)
          .getOrElse(fail("CMS: ContentInfo without content"))
        val (inner, _) = readTlv(content.value, 0)
        if (inner.tag != 0x30) fail("CMS: EnvelopedData is not a SEQUENCE")
        inner.value
      } else top.value // bare EnvelopedData
    val kids = children(envData)
    if (kids.isEmpty || kids.head.tag != 0x02) fail("CMS: missing version")
    // skip optional [0] originatorInfo between version and the SET
    val recipSet = kids.find(_.tag == 0x31)
      .getOrElse(fail("CMS: missing recipientInfos SET"))
    val wrapped = children(recipSet.value).collect {
      case Tlv(0x30, v) => // KeyTransRecipientInfo (keyAgreement is [1])
        val parts = children(v)
        if (parts.length < 4) fail("CMS: short KeyTransRecipientInfo")
        // version, rid (SEQUENCE or [0]), keyEncryptionAlgorithm, encryptedKey
        val alg = parts(2)
        if (alg.tag != 0x30) fail("CMS: bad keyEncryptionAlgorithm")
        val algOid = children(alg.value).headOption
          .filter(_.tag == 0x06).map(t => oidOf(t.value))
          .getOrElse(fail("CMS: keyEncryptionAlgorithm without OID"))
        if (algOid != OidRsaEncryption)
          fail(s"CMS: unsupported key transport $algOid (need RSA PKCS#1 v1.5)")
        val ek = parts(3)
        if (ek.tag != 0x04) fail("CMS: encryptedKey is not an OCTET STRING")
        ek.value
    }
    if (wrapped.isEmpty) fail("CMS: no KeyTransRecipientInfo present")
    // EncryptedContentInfo ::= SEQ { contentType, algorithm, [0] content }
    val eci = kids.drop(1).find(_.tag == 0x30)
      .getOrElse(fail("CMS: missing EncryptedContentInfo"))
    val eciKids = children(eci.value)
    if (eciKids.length < 2) fail("CMS: short EncryptedContentInfo")
    val algKids = children(eciKids(1).value)
    val contentAlg = algKids.headOption.filter(_.tag == 0x06)
      .map(t => oidOf(t.value))
      .getOrElse(fail("CMS: content algorithm without OID"))
    val iv = algKids.drop(1).headOption match {
      case Some(Tlv(0x04, v)) => v
      case _ => Array.empty[Byte] // RC4 has no params
    }
    val enc = eciKids.drop(2).collectFirst {
      case Tlv(0x80, v) => v // [0] IMPLICIT primitive
      case Tlv(0xA0, v) => // [0] constructed: concatenated OCTET STRING chunks
        children(v).collect { case Tlv(0x04, c) => c }.foldLeft(Array.empty[Byte])(_ ++ _)
    }.getOrElse(fail("CMS: missing encryptedContent"))
    Envelope(wrapped, contentAlg, iv, enc)
  }

  // ------------------------------------------------------- seed recovery

  /** Try the private key against every KeyTransRecipientInfo of every blob;
    * the first RSA unwrap with valid PKCS#1 padding yields the CEK, the
    * symmetric decrypt yields `seed(20) ‖ permissions(4)`. Returns
    * (seed, permissions); throws when no recipient matches the key.
    */
  def openSeed(
      recipientBlobs: Seq[Array[Byte]],
      key: java.security.PrivateKey): (Array[Byte], Int) = {
    require(recipientBlobs.nonEmpty, "public-key PDF without /Recipients")
    var lastParse: Option[IllegalArgumentException] = None
    recipientBlobs.foreach { blob =>
      val env =
        try parseEnvelope(blob)
        catch {
          case e: IllegalArgumentException => lastParse = Some(e); null
        }
      if (env != null) env.wrappedKeys.foreach { ek =>
        val cek =
          try {
            val c = javax.crypto.Cipher.getInstance("RSA/ECB/PKCS1Padding")
            c.init(javax.crypto.Cipher.DECRYPT_MODE, key)
            Some(c.doFinal(ek))
          } catch { case _: java.security.GeneralSecurityException => None }
        cek.foreach { k =>
          val content = decryptContent(env, k)
          if (content.length < 24)
            fail(s"CMS: decrypted envelope is ${content.length} bytes, need 24")
          val seed = content.take(20)
          val perms = ((content(20) & 0xFF) << 24) | ((content(21) & 0xFF) << 16) |
            ((content(22) & 0xFF) << 8) | (content(23) & 0xFF)
          return (seed, perms)
        }
      }
    }
    lastParse.foreach(throw _)
    fail("no /Recipients entry matches the supplied private key")
  }

  private def decryptContent(env: Envelope, cek: Array[Byte]): Array[Byte] =
    env.contentAlg match {
      case OidRc4 => PdfExtract.rc4(cek, env.encryptedContent)
      case OidDesEde3Cbc =>
        jce("DESede/CBC/PKCS5Padding", "DESede", cek, env.iv, env.encryptedContent)
      case OidAes128Cbc | OidAes256Cbc =>
        jce("AES/CBC/PKCS5Padding", "AES", cek, env.iv, env.encryptedContent)
      case other => fail(s"CMS: unsupported content cipher $other")
    }

  private def jce(transform: String, alg: String, key: Array[Byte],
      iv: Array[Byte], data: Array[Byte]): Array[Byte] =
    try {
      val c = javax.crypto.Cipher.getInstance(transform)
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, alg),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    } catch {
      case e: java.security.GeneralSecurityException =>
        fail(s"CMS: content decrypt failed (${e.getMessage})")
    }

  /** The §7.6.4 file key: digest over seed ‖ blobs [‖ FFFFFFFF when V≥4
    * and /EncryptMetadata false]; SHA-1 for V < 5, SHA-256 for V 5.
    */
  def fileKey(
      seed: Array[Byte], recipientBlobs: Seq[Array[Byte]], keyLen: Int,
      sha256: Boolean, encryptMetadata: Boolean): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(
      if (sha256) "SHA-256" else "SHA-1")
    d.update(seed)
    recipientBlobs.foreach(d.update)
    if (!encryptMetadata) d.update(Array[Byte](-1, -1, -1, -1))
    d.digest().take(keyLen)
  }
}
