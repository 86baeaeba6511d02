package graft.extract

import java.security.MessageDigest

/** PDF Standard security handler (PDF 32000-1:2008 §7.6.3), RC4 variants
  * V=1/2, R=2/3(/4 key-derivation extras) — from the public spec, not a
  * pypdf port. Covers the reference's `get_pdf_info`/`decrypt_pdf`
  * empty-password behavior (pdf_utils.py:205-225): verify the user
  * password (Algorithms 2, 4, 5), derive per-object keys, decrypt strings.
  * AES (V=4 /AESV2, V=5) and owner-password recovery are documented
  * non-goals — R≥3 RC4-128 is the dominant legacy-encrypted corpus.
  *
  * RC4 itself is implemented inline (20 lines, public algorithm) and
  * unit-tested against the published test vectors.
  */
object PdfCrypt {

  /** §7.6.3.3 Table 1: the 32-byte password padding string. */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def pad(password: Array[Byte]): Array[Byte] =
    (password ++ Pad).take(32)

  private def le4(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: the file encryption key from a (user) password. */
  def fileKey(
      password: Array[Byte],
      o: Array[Byte],
      p: Int,
      id0: Array[Byte],
      r: Int,
      keyLenBytes: Int,
      encryptMetadata: Boolean = true): Array[Byte] = {
    val extra =
      if (r >= 4 && !encryptMetadata) Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)
      else Array.emptyByteArray
    var key = md5(pad(password), o, le4(p), id0, extra)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(keyLenBytes)); i += 1 }
    }
    key.take(keyLenBytes)
  }

  /** Algorithm 4 (R=2) / Algorithm 5 (R≥3): the expected /U entry. */
  def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var x = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        x = rc4(key.map(b => (b ^ i).toByte), x)
        i += 1
      }
      x // 16 bytes; the stored /U appends 16 bytes of arbitrary padding
    }

  /** Algorithm 6: verify a user password; Some(fileKey) when it opens the
    * document. R≥3 compares the first 16 bytes of /U per the spec.
    */
  def verifyUserPassword(
      password: Array[Byte],
      o: Array[Byte],
      u: Array[Byte],
      p: Int,
      id0: Array[Byte],
      r: Int,
      keyLenBytes: Int,
      encryptMetadata: Boolean = true): Option[Array[Byte]] = {
    val key = fileKey(password, o, p, id0, r, keyLenBytes, encryptMetadata)
    val expect = computeU(key, id0, r)
    val ok =
      if (r == 2) java.util.Arrays.equals(expect, u)
      else expect.take(16).sameElements(u.take(16))
    if (ok) Some(key) else None
  }

  /** Algorithm 3 (encrypt side, used by the round-trip fixture writer):
    * the /O entry from the owner password (user password when absent).
    */
  def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte], r: Int, keyLenBytes: Int): Array[Byte] = {
    var h = md5(pad(ownerPwd))
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    val rc4Key = h.take(keyLenBytes)
    var o = rc4(rc4Key, pad(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) { o = rc4(rc4Key.map(b => (b ^ i).toByte), o); i += 1 }
    }
    o
  }

  /** §7.6.2 Algorithm 1: per-object key (V<5). AES (/AESV2) appends the
    * "sAlT" marker bytes before hashing.
    */
  def objectKey(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean = false): Array[Byte] = {
    val ext = Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt = if (aes) Array('s', 'A', 'l', 'T').map(_.toByte) else Array.emptyByteArray
    md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
  }

  def decryptString(fileKey: Array[Byte], num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] =
    rc4(objectKey(fileKey, num, gen), bytes)

  /** Same primitive both ways for RC4. */
  def encryptString(fileKey: Array[Byte], num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] =
    decryptString(fileKey, num, gen, bytes)

  /** AESV2 (§7.6.2): payload = 16-byte IV ++ AES-128-CBC ciphertext with
    * PKCS#5 padding, under the salted per-object key. JDK JCE supplies the
    * cipher; only the PDF-specific framing lives here.
    */
  def decryptAes(fileKey: Array[Byte], num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 16) return Array.emptyByteArray
    val key = objectKey(fileKey, num, gen, aes = true)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(bytes.take(16)))
    c.doFinal(bytes, 16, bytes.length - 16)
  }

  /** Encrypt side for round-trip fixtures; the IV is derived
    * deterministically from the plaintext so the writer stays reproducible.
    */
  def encryptAes(fileKey: Array[Byte], num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] = {
    val key = objectKey(fileKey, num, gen, aes = true)
    val iv = md5(bytes, key).take(16)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(bytes)
  }

  /** Cipher-dispatching decryption for a carrier object's string/stream. */
  def decryptData(fileKey: Array[Byte], aes: Boolean, num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] =
    if (aes) decryptAes(fileKey, num, gen, bytes)
    else decryptString(fileKey, num, gen, bytes)
}
