package graft.functions

/**
 * Bit-exact implementation of FarmHash `Fingerprint64` (farmhashna::Hash64),
 * the hash behind BigQuery's `FARM_FINGERPRINT`.
 *
 * The reference engine keys its deterministic 90/10 train/holdout split and
 * class rebalancing off this hash (see
 * `/root/reference/backend/controller/ml_model/templates/model_bqml.sql:95-101,305-311`),
 * so split parity requires bit-exactness — Spark's builtin `xxhash64` is NOT
 * compatible. Algorithm re-implemented from the published FarmHash spec
 * (github.com/google/farmhash, MIT); golden-tested against Guava's
 * `Hashing.farmHashFingerprint64()` in `FarmHashSpec`.
 *
 * Written as static jump-free Long arithmetic so the Catalyst codegen path
 * ([[FarmFingerprint]]) can call it directly from generated Java.
 */
object FarmHash {
  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def rotr(v: Long, s: Int): Long = java.lang.Long.rotateRight(v, s)

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= (a >>> 47)
    var b = (v ^ a) * mul
    b ^= (b >>> 47)
    b * mul
  }

  private def hashLen0to16(b: Array[Byte], off: Int, len: Int): Long = {
    if (len >= 8) {
      val mul = K2 + len * 2L
      val a = fetch64(b, off) + K2
      val c = fetch64(b, off + len - 8)
      val d = rotr(c, 37) * mul + a
      val e = (rotr(a, 25) + c) * mul
      hashLen16(d, e, mul)
    } else if (len >= 4) {
      val mul = K2 + len * 2L
      val a = fetch32(b, off)
      hashLen16(len + (a << 3), fetch32(b, off + len - 4), mul)
    } else if (len > 0) {
      val a = b(off) & 0xffL
      val c = b(off + (len >> 1)) & 0xffL
      val d = b(off + len - 1) & 0xffL
      val y = a + (c << 8)
      val z = len + (d << 2)
      shiftMix(y * K2 ^ z * K0) * K2
    } else K2
  }

  private def hashLen17to32(b: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2L
    val a = fetch64(b, off) * K1
    val b2 = fetch64(b, off + 8)
    val c = fetch64(b, off + len - 8) * mul
    val d = fetch64(b, off + len - 16) * K2
    hashLen16(rotr(a + b2, 43) + rotr(c, 30) + d, a + rotr(b2 + K2, 18) + c, mul)
  }

  private def hashLen33to64(b: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2L
    val a = fetch64(b, off) * K2
    val b2 = fetch64(b, off + 8)
    val c = fetch64(b, off + len - 8) * mul
    val d = fetch64(b, off + len - 16) * K2
    val y = rotr(a + b2, 43) + rotr(c, 30) + d
    val z = hashLen16(y, a + rotr(b2 + K2, 18) + c, mul)
    val e = fetch64(b, off + 16) * mul
    val f = fetch64(b, off + 24)
    val g = (y + fetch64(b, off + len - 32)) * mul
    val h = (z + fetch64(b, off + len - 24)) * mul
    hashLen16(rotr(e + f, 43) + rotr(g, 30) + h, e + rotr(f + a, 18) + g, mul)
  }

  /** WeakHashLen32WithSeeds; writes into `out(0)`=first, `out(1)`=second. */
  @inline private def weakHash32Seeds(b: Array[Byte], i: Int, a0: Long, b0: Long, out: Array[Long]): Unit = {
    val w = fetch64(b, i)
    val x = fetch64(b, i + 8)
    val y = fetch64(b, i + 16)
    val z = fetch64(b, i + 24)
    var a = a0 + w
    var bb = rotr(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    bb += rotr(a, 44)
    out(0) = a + z
    out(1) = bb + c
  }

  /** FarmHash Fingerprint64 over the whole byte array. */
  def fingerprint64(bytes: Array[Byte]): Long = hash64(bytes, 0, bytes.length)

  def hash64(b: Array[Byte], off: Int, len: Int): Long = {
    if (len <= 32) {
      if (len <= 16) return hashLen0to16(b, off, len)
      else return hashLen17to32(b, off, len)
    } else if (len <= 64) {
      return hashLen33to64(b, off, len)
    }

    val seed = 81L
    var x = seed
    var y = seed * K1 + 113L
    var z = shiftMix(y * K2 + 113L) * K2
    var v0 = 0L; var v1 = 0L
    var w0 = 0L; var w1 = 0L
    x = x * K2 + fetch64(b, off)

    var s = off
    val end = off + ((len - 1) / 64) * 64
    val last64 = end + ((len - 1) & 63) - 63
    val tmp = new Array[Long](2)

    while (s != end) {
      x = rotr(x + y + v0 + fetch64(b, s + 8), 37) * K1
      y = rotr(y + v1 + fetch64(b, s + 48), 42) * K1
      x ^= w1
      y += v0 + fetch64(b, s + 40)
      z = rotr(z + w0, 33) * K1
      weakHash32Seeds(b, s, v1 * K1, x + w0, tmp); v0 = tmp(0); v1 = tmp(1)
      weakHash32Seeds(b, s + 32, z + w1, y + fetch64(b, s + 16), tmp); w0 = tmp(0); w1 = tmp(1)
      val t = z; z = x; x = t
      s += 64
    }

    val mul = K1 + ((z & 0xff) << 1)
    s = last64
    w0 += ((len - 1) & 63)
    v0 += w0
    w0 += v0
    x = rotr(x + y + v0 + fetch64(b, s + 8), 37) * mul
    y = rotr(y + v1 + fetch64(b, s + 48), 42) * mul
    x ^= w1 * 9L
    y += v0 * 9L + fetch64(b, s + 40)
    z = rotr(z + w0, 33) * mul
    weakHash32Seeds(b, s, v1 * mul, x + w0, tmp); v0 = tmp(0); v1 = tmp(1)
    weakHash32Seeds(b, s + 32, z + w1, y + fetch64(b, s + 16), tmp); w0 = tmp(0); w1 = tmp(1)
    val t = z; z = x; x = t
    hashLen16(
      hashLen16(v0, w0, mul) + shiftMix(y) * K0 + z,
      hashLen16(v1, w1, mul) + x,
      mul)
  }

  /** Fingerprint of a UTF-8 string (what FARM_FINGERPRINT(STRING) hashes). */
  def fingerprint64(s: String): Long =
    fingerprint64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
