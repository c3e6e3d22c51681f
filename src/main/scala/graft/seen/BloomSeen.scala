package graft.seen

import org.apache.spark.rdd.RDD

/** Simple serializable Bloom filter over 64-bit key hashes.
  * k hash probes derived from one 128-bit base hash (Kirsch–Mitzenmacher
  * double hashing), bits in a long array.
  */
final class BloomFilter(val numBits: Long, val numHashes: Int) extends Serializable {
  require(numBits > 0 && numHashes > 0)
  private val words = new Array[Long](((numBits + 63) / 64).toInt)

  /** Compact wire format: numBits, numHashes, words. */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + words.length * 8)
    bb.putLong(numBits).putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def add(key: String): Unit = {
    val h1 = mix64(key.hashCode.toLong ^ (key.length.toLong << 32))
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(key: String): Boolean = {
    val h1 = mix64(key.hashCode.toLong ^ (key.length.toLong << 32))
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mergeInPlace(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes)
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def approxBitsSet: Long = words.map(java.lang.Long.bitCount(_).toLong).sum
}

object BloomFilter {
  def fromBytes(bytes: Array[Byte]): BloomFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val bits = bb.getLong
    val hashes = bb.getInt
    val bf = new BloomFilter(bits, hashes)
    var i = 0
    while (bb.remaining() >= 8) { bf.words(i) = bb.getLong; i += 1 }
    bf
  }

  /** Size a filter for n items at the target false-positive rate. */
  def sized(expectedItems: Long, fpp: Double): BloomFilter = {
    val n = math.max(expectedItems, 1L)
    val bits = math.max(64L, math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val k = math.max(1, math.round(bits.toDouble / n * math.log(2)).toInt)
    new BloomFilter(bits, k)
  }
}

/** The URL-seen set at frontier scale (SURVEY.md C10, north_rule):
  * key-range-partitioned Bloom filters, built distributed and merged through
  * `treeAggregate` so the driver never sees per-key traffic and the merge
  * tree bounds reduce fan-in. A single 10^10-key filter at 1% FPP is ~12 GB
  * — partitioning by key range keeps each piece executor- and
  * broadcast-sized, and lets a cluster probe/ship only the ranges a
  * partition needs.
  *
  * Bloom positives are *candidates*: the engine always confirms them with an
  * exact anti-join against the store (false positives must never silently
  * drop URLs — SURVEY.md §7.5 risk 4).
  */
final class BloomSeen(val parts: Array[BloomFilter], val numParts: Int) extends Serializable {
  private def partOf(key: String): Int =
    java.lang.Math.floorMod(key.hashCode, numParts)

  def mightContain(key: String): Boolean = parts(partOf(key)).mightContain(key)

  def add(key: String): Unit = parts(partOf(key)).add(key)

  def mergeInPlace(other: BloomSeen): BloomSeen = {
    var i = 0
    while (i < parts.length) { parts(i).mergeInPlace(other.parts(i)); i += 1 }
    this
  }
}

object BloomSeen {
  def empty(numParts: Int, expectedItems: Long, fpp: Double): BloomSeen =
    new BloomSeen(
      Array.fill(numParts)(BloomFilter.sized(math.max(expectedItems / numParts, 1), fpp)),
      numParts)

  /** Distributed build: seqOp adds keys into the partition-local filter
    * bank, combOp ORs banks pairwise up a tree of depth 2+. */
  def build(keys: RDD[String], numParts: Int, expectedItems: Long,
      fpp: Double, depth: Int = 2): BloomSeen =
    keys.treeAggregate(empty(numParts, expectedItems, fpp))(
      seqOp = (acc, k) => { acc.add(k); acc },
      combOp = (a, b) => a.mergeInPlace(b),
      depth = depth)
}
