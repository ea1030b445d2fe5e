package graft.ingest

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/**
 * Standard security handler decryption for [[PdfText]] (PDF 1.7 §7.6 /
 * PDF 2.0 §7.6.4), closing the "encrypted documents are skipped" scope gap:
 * the reference's pymupdf opens password-less encrypted PDFs transparently
 * (`/root/reference/document_processor.py:76-84`), and most encrypted PDFs
 * in the wild are exactly that — owner-restricted but readable with the
 * EMPTY user password.
 *
 * Supported: /Filter /Standard, revisions 2-6 — RC4-40 (V1/R2), RC4-n
 * (V2/R3), crypt filters V4/R4 with /CFM /V2 (RC4), /AESV2 (AES-128-CBC)
 * or /Identity, and V5/R5-R6 /AESV3 (AES-256-CBC, SHA-2 family key
 * derivation incl. the R6 iterated Algorithm 2.B). Only the empty user
 * password is attempted; a non-empty password (validation fails) or an
 * unknown handler yields None and the document stays a counted skip.
 *
 * All primitives are JDK-only: MD5/SHA-2 via MessageDigest, AES-CBC via
 * JCE; RC4 is hand-rolled below (20 lines) rather than relying on the
 * optional ARCFOUR provider.
 */
object PdfCrypt {

  /** The 32-byte standard padding string (PDF 1.7 §7.6.3.3). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    var n = 0
    while (n < data.length) {
      i = (i + 1) & 0xFF
      j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      out(n) = (data(n) ^ s((s(i) + s(j)) & 0xFF)).toByte
      n += 1
    }
    out
  }

  /** AES/CBC; `pad` selects PKCS#5 (content) vs none (key wrapping). */
  def aesCbc(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte], pad: Boolean): Array[Byte] = {
    val c = Cipher.getInstance(if (pad) "AES/CBC/PKCS5Padding" else "AES/CBC/NoPadding")
    c.init(if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Revision-6 password hash, Algorithm 2.B (PDF 2.0 §7.6.4.3.4): the
    * SHA-256/384/512 + AES-128-CBC iteration. `udata` is empty for the user
    * password, the 48-byte /U for the owner password. */
  def hash2B(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    var e: Array[Byte] = null
    var i = 0
    while (i < 64 || (e(e.length - 1) & 0xFF) > i - 32) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      for (r <- 0 until 64) System.arraycopy(block, 0, k1, r * block.length, block.length)
      e = aesCbc(encrypt = true, k.take(16), k.slice(16, 32), k1, pad = false)
      val mod = e.take(16).map(_ & 0xFF).sum % 3
      k = sha(mod match { case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512" }, e)
      i += 1
    }
    k.take(32)
  }

  /** Per-document decryptor: computes per-object keys and decrypts
    * string/stream bytes. `r >= 5` uses the file key directly (AES-256);
    * earlier revisions derive MD5(fileKey ‖ objnum ‖ gen [‖ sAlT]). */
  final class Decryptor(val fileKey: Array[Byte], r: Int, val useAes: Boolean) {

    private def objKey(num: Int, gen: Int): Array[Byte] =
      if (r >= 5) fileKey
      else {
        val ext = Array[Byte](
          (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte, ((num >> 16) & 0xFF).toByte,
          (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte)
        val salt = if (useAes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
        md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
      }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val k = objKey(num, gen)
      if (!useAes) rc4(k, data)
      else if (data.length < 17) Array.empty[Byte] // no room for IV + a block
      else aesCbc(encrypt = false, k, data.take(16),
        java.util.Arrays.copyOfRange(data, 16, data.length - (data.length - 16) % 16),
        pad = true)
    }
  }

  /** Build a decryptor from the /Encrypt dictionary's primitives with the
    * EMPTY user password, or None when the handler/revision is unsupported
    * or the password validation fails (→ counted skip upstream).
    * `cfm` is the /StmF crypt filter's /CFM for V≥4 ("" otherwise). */
  def forDocument(filter: String, v: Int, r: Int, lengthBits: Int,
      o: Array[Byte], u: Array[Byte], oe: Array[Byte], ue: Array[Byte],
      p: Long, id0: Array[Byte], encryptMetadata: Boolean,
      cfm: String): Option[Decryptor] = {
    if (filter != "Standard") return None
    try {
      if (v >= 5) forAes256(r, u, ue)
      else forRc4Family(v, r, lengthBits, o, u, p, id0, encryptMetadata, cfm)
    } catch { case _: Exception => None }
  }

  private def forAes256(r: Int, u: Array[Byte], ue: Array[Byte]): Option[Decryptor] = {
    if (r != 5 && r != 6) return None
    if (u.length < 48 || ue.length < 32) return None
    val pwd = Array.empty[Byte]
    val valSalt = u.slice(32, 40)
    val keySalt = u.slice(40, 48)
    val check =
      if (r == 5) sha("SHA-256", pwd, valSalt)
      else hash2B(pwd, valSalt, Array.empty)
    if (!java.util.Arrays.equals(check, u.take(32))) return None
    val inter =
      if (r == 5) sha("SHA-256", pwd, keySalt)
      else hash2B(pwd, keySalt, Array.empty)
    val fileKey = aesCbc(encrypt = false, inter, new Array[Byte](16), ue.take(32), pad = false)
    Some(new Decryptor(fileKey, r, useAes = true))
  }

  private def forRc4Family(v: Int, r: Int, lengthBits: Int, o: Array[Byte],
      u: Array[Byte], p: Long, id0: Array[Byte], encryptMetadata: Boolean,
      cfm: String): Option[Decryptor] = {
    if (r < 2 || r > 4 || o.length < 32 || u.length < 16) return None
    if (v >= 4 && cfm != "V2" && cfm != "AESV2") return None // Identity/custom
    val len = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
    // Algorithm 2: file key from the (empty → pad) user password
    val pLe = Array[Byte](
      (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)
    val metaExt =
      if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xFF.toByte)
      else Array.empty[Byte]
    var key = md5(Pad, o.take(32), pLe, id0, metaExt).take(len)
    if (r >= 3) for (_ <- 0 until 50) key = md5(key).take(len)
    // Algorithm 6: validate the empty user password against /U
    val ok = r match {
      case 2 => java.util.Arrays.equals(rc4(key, Pad), u.take(32))
      case _ =>
        var x = rc4(key, md5(Pad, id0))
        for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
        java.util.Arrays.equals(x, u.take(16))
    }
    if (!ok) None
    else Some(new Decryptor(key, r, useAes = cfm == "AESV2"))
  }
}
