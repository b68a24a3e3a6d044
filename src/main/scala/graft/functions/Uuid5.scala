package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

/** RFC 4122 name-based UUIDv5 (SHA-1).
  *
  * The reference derives idempotency keys as
  * `uuid.NewSHA1(uuid.NameSpaceURL, "<path>-<chunkIndex>")`
  * (/root/reference/internal/server/ingest_handler.go:111-114,
  * internal/client/drone_client.go:36-42); re-ingesting the same file yields
  * the same chunk ids, making writes idempotent (INSERT OR REPLACE there;
  * dropDuplicates/MERGE here).
  */
object Uuid5 {
  /** RFC 4122 URL namespace. */
  val NamespaceUrl: UUID = UUID.fromString("6ba7b811-9dad-11d1-80b4-00c04fd430c8")

  def uuid5(namespace: UUID, name: String): UUID = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(uuidBytes(namespace))
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val d = md.digest()
    d(6) = ((d(6) & 0x0f) | 0x50).toByte // version 5
    d(8) = ((d(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    fromBytes(d)
  }

  /** Chunk id as used by the ingest path: uuid5(URL, s"$path-$index"). */
  def chunkId(path: String, chunkIndex: Int): String =
    uuid5(NamespaceUrl, s"$path-$chunkIndex").toString

  private def uuidBytes(u: UUID): Array[Byte] = {
    val b = new Array[Byte](16)
    var msb = u.getMostSignificantBits
    var lsb = u.getLeastSignificantBits
    var i = 7
    while (i >= 0) { b(i) = (msb & 0xff).toByte; msb >>>= 8; i -= 1 }
    i = 15
    while (i >= 8) { b(i) = (lsb & 0xff).toByte; lsb >>>= 8; i -= 1 }
    b
  }

  private def fromBytes(d: Array[Byte]): UUID = {
    var msb = 0L
    var lsb = 0L
    var i = 0
    while (i < 8) { msb = (msb << 8) | (d(i) & 0xff); i += 1 }
    while (i < 16) { lsb = (lsb << 8) | (d(i) & 0xff); i += 1 }
    new UUID(msb, lsb)
  }
}
