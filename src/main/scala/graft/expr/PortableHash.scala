package graft.expr

import java.nio.charset.StandardCharsets

import org.apache.spark.unsafe.types.UTF8String

/**
 * Engine-portable deterministic hashing for the sketch/embedding kernels.
 *
 * Every kernel that feeds a driver-verified query derives its randomness
 * from MD5 — a hash any SQL engine reproduces bit-for-bit (the DuckDB
 * oracle computes the same values with
 * `CAST('0x' || substr(md5(s), 1, k) AS BIGINT)`), unlike `xxhash64`,
 * which only Spark exposes. Values are sliced from the hex expansion of
 * the digest:
 *
 *   - `hex15(s)`  = first 15 hex chars → 60-bit non-negative long
 *   - the MinHash pair splits the same 15 nibbles: `h1` = nibbles 0-6
 *     (28 bits), `h2` = nibbles 8-14 (28 bits, forced odd) — i.e. DuckDB's
 *     `substr(md5(s), 1, 7)` and `substr(md5(s), 9, 7)`.
 *
 * 28-bit widths keep every Kirsch-Mitzenmacher combination
 * `h1 + i * h2 (i < 64)` below 2^35, so the arithmetic is exact in any
 * engine's signed 64-bit integers — no wraparound semantics to match.
 */
object PortableHash {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def first8(bytes: Array[Byte]): Long = {
    val d = digests.get()
    d.reset()
    val md = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (md(i) & 0xFFL); i += 1 }
    v
  }

  /** First 15 hex chars of `md5(utf8(s))` as a 60-bit non-negative long. */
  def hex15(s: String): Long = first8(s.getBytes(StandardCharsets.UTF_8)) >>> 4

  /** As [[hex15]] over a UTF8String's bytes (no String round-trip). */
  def hex15(u: UTF8String): Long = first8(u.getBytes) >>> 4

  /** MinHash base hash: hex chars 1-7 of md5 (28 bits). */
  def minhashH1(h15: Long): Long = h15 >>> 32

  /** MinHash step hash: hex chars 9-15 of md5 (28 bits), forced odd. */
  def minhashH2(h15: Long): Long = (h15 & 0xFFFFFFFL) | 1L

  /** Column twin of [[hex15]] built from Spark built-ins — the ONE place
    * the engine-side SQL spelling of the portable hash lives (oracle:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`). Input is cast to
    * string first, so any key type hashes by its decimal rendering. */
  def hex15Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")
  }
}
