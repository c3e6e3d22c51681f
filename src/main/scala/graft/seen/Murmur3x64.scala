package graft.seen

/** MurmurHash3 x64 128-bit (Austin Appleby's public-domain algorithm), the
  * base hash for the seen-set filters.
  *
  * Why 128 bits: all k Bloom probe positions (and the cuckoo
  * bucket/fingerprint pair) derive from the base hash via
  * Kirsch–Mitzenmacher double hashing, so the filter's effective
  * false-positive floor is the base hash's collision rate. A 32-bit base
  * (java String.hashCode) guarantees ~n²/2³² colliding key pairs — ≈2.3
  * per cell at the north-rule's 10¹⁰ keys — orders of magnitude above a
  * configured 1% FPP. With 128 bits the collision term is negligible
  * (n²/2¹²⁸) and the configured FPP is the real FPP (see SeenSpec's
  * empirical-FPP property).
  */
object Murmur3x64 {

  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  private val out = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](2)
  }

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private def getLong(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) |
      ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24) |
      ((d(i + 4) & 0xffL) << 32) |
      ((d(i + 5) & 0xffL) << 40) |
      ((d(i + 6) & 0xffL) << 48) |
      ((d(i + 7) & 0xffL) << 56)

  /** Hash the UTF-8 bytes of `key`; returns a thread-local 2-element array
    * [h1, h2] valid until this thread's next call (zero-alloc steady state
    * apart from the UTF-8 encode). */
  def hash128(key: String, seed: Long = 0L): Array[Long] =
    hash128(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  def hash128(data: Array[Byte], seed: Long): Array[Long] = {
    val len = data.length
    var h1 = seed
    var h2 = seed
    val nblocks = len >>> 4
    var i = 0
    while (i < nblocks) {
      var k1 = getLong(data, i << 4)
      var k2 = getLong(data, (i << 4) + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks << 4
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 15) k2 ^= (data(tail + 14) & 0xffL) << 48
    if (rem >= 14) k2 ^= (data(tail + 13) & 0xffL) << 40
    if (rem >= 13) k2 ^= (data(tail + 12) & 0xffL) << 32
    if (rem >= 12) k2 ^= (data(tail + 11) & 0xffL) << 24
    if (rem >= 11) k2 ^= (data(tail + 10) & 0xffL) << 16
    if (rem >= 10) k2 ^= (data(tail + 9) & 0xffL) << 8
    if (rem >= 9) {
      k2 ^= data(tail + 8) & 0xffL
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem >= 8) k1 ^= (data(tail + 7) & 0xffL) << 56
    if (rem >= 7) k1 ^= (data(tail + 6) & 0xffL) << 48
    if (rem >= 6) k1 ^= (data(tail + 5) & 0xffL) << 40
    if (rem >= 5) k1 ^= (data(tail + 4) & 0xffL) << 32
    if (rem >= 4) k1 ^= (data(tail + 3) & 0xffL) << 24
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xffL) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xffL) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xffL
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len.toLong
    h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    val r = out.get()
    r(0) = h1
    r(1) = h2
    r
  }
}
