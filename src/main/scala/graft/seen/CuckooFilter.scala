package graft.seen

import org.apache.spark.rdd.RDD

/** Cuckoo filter: approximate membership with DELETE support — the
  * north_rule's fallback for seen-set maintenance when URLs must be
  * retired (e.g. purged hosts), which a Bloom filter cannot do.
  *
  * Standard partial-key cuckoo hashing (Fan et al., CoNEXT'14): 16-bit
  * fingerprints, 4 slots per bucket, alternate bucket = bucket XOR
  * hash(fingerprint).
  */
final class CuckooFilter(val numBuckets: Int, val maxKicks: Int = 500)
    extends SeenFilter {
  require((numBuckets & (numBuckets - 1)) == 0, "numBuckets must be a power of two")
  private val SlotsPerBucket = 4
  // fingerprints stored in a short array; 0 = empty
  private val table = new Array[Short](numBuckets * SlotsPerBucket)
  private var count = 0L

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Bucket from h1, fingerprint from h2 — independent halves of one
    * 128-bit Murmur3 base hash (a 32-bit base hash would floor the FPP at
    * the base collision rate at 10^10 keys; see BloomFilter). */
  private def fingerprintOf(h2: Long): Short = {
    val f = ((h2 >>> 48) & 0xffff).toInt
    (if (f == 0) 1 else f).toShort
  }

  private def altBucket(b: Int, f: Short): Int =
    (b ^ (mix64(f.toLong & 0xffffL) & (numBuckets - 1)).toInt) & (numBuckets - 1)

  private def slotBase(b: Int) = b * SlotsPerBucket

  private def insertInto(b: Int, f: Short): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = f; count += 1; return true }
      s += 1
    }
    false
  }

  /** Insert a fingerprint whose primary bucket is b1, kicking residents to
    * their alternate buckets as needed. */
  private def insertFingerprint(b1: Int, f: Short): Boolean = {
    val b2 = altBucket(b1, f)
    if (insertInto(b1, f) || insertInto(b2, f)) return true
    // kick
    var b = if ((mix64(b1.toLong ^ (f & 0xffffL)) & 1L) == 0L) b1 else b2
    var cur = f
    var kicks = 0
    while (kicks < maxKicks) {
      val base = slotBase(b)
      val victimSlot = (mix64(b.toLong * 31 + kicks) & (SlotsPerBucket - 1)).toInt
      val victim = table(base + victimSlot)
      table(base + victimSlot) = cur
      cur = victim
      b = altBucket(b, cur)
      if (insertInto(b, cur)) return true
      kicks += 1
    }
    false
  }

  /** Insert; false if the filter is too full (caller should resize). */
  def add(key: String): Boolean = {
    val h = Murmur3x64.hash128(key)
    insertFingerprint((h(0) & (numBuckets - 1)).toInt, fingerprintOf(h(1)))
  }

  private def removeFrom(b: Int, f: Short): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == f) { table(base + s) = 0; count -= 1; return true }
      s += 1
    }
    false
  }

  def remove(key: String): Boolean = {
    val h = Murmur3x64.hash128(key)
    val f = fingerprintOf(h(1))
    val b1 = (h(0) & (numBuckets - 1)).toInt
    removeFrom(b1, f) || removeFrom(altBucket(b1, f), f)
  }

  def mightContain(key: String): Boolean = {
    val h = Murmur3x64.hash128(key)
    val f = fingerprintOf(h(1))
    val b1 = (h(0) & (numBuckets - 1)).toInt
    val base1 = slotBase(b1)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base1 + s) == f) return true
      s += 1
    }
    val base2 = slotBase(altBucket(b1, f))
    s = 0
    while (s < SlotsPerBucket) {
      if (table(base2 + s) == f) return true
      s += 1
    }
    false
  }

  def size: Long = count

  /** Union-merge: re-inserts the other's fingerprints. Both filters must
    * share numBuckets so bucket indices stay consistent. */
  def mergeInPlace(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets)
    var i = 0
    while (i < other.table.length) {
      val f = other.table(i)
      if (f != 0) {
        // XOR-partial-key hashing is symmetric, so the stored bucket works
        // as the primary for re-insertion (with kicking)
        insertFingerprint(i / SlotsPerBucket, f)
      }
      i += 1
    }
    this
  }
}

object CuckooFilter {
  def sized(expectedItems: Long): CuckooFilter = {
    // 4 slots/bucket at ~95% load
    var buckets = 1
    while (buckets.toLong * 4 * 95 / 100 < expectedItems) buckets <<= 1
    new CuckooFilter(buckets)
  }

  /** Distributed build via treeAggregate, mirroring BloomSeen.build. */
  def build(keys: RDD[String], expectedItems: Long, depth: Int = 2): CuckooFilter =
    keys.treeAggregate(sized(expectedItems))(
      (acc, k) => { acc.add(k); acc },
      (a, b) => a.mergeInPlace(b),
      depth)
}
