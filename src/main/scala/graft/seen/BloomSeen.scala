package graft.seen

import org.apache.spark.rdd.RDD

/** Approximate-membership probe surface shared by the seen-set structures,
  * so Catalyst expressions (functions.SeenMightContain) and jobs can hold
  * any of them behind one type. */
trait SeenFilter extends Serializable {
  def mightContain(key: String): Boolean
}

/** Simple serializable Bloom filter over string keys.
  * k hash probes derived from one 128-bit Murmur3 base hash of the key
  * bytes (Kirsch–Mitzenmacher double hashing: bit_i = h1 + i*h2), bits in
  * a long array. The 128-bit base matters: deriving all probes from a
  * 32-bit hash caps the achievable FPP at the base hash's collision rate
  * (~2 colliding pairs per cell at 10^10 keys), regardless of filter size.
  */
final class BloomFilter(val numBits: Long, val numHashes: Int) extends SeenFilter {
  require(numBits > 0 && numHashes > 0)
  private val words = new Array[Long](((numBits + 63) / 64).toInt)

  /** Versioned wire format: magic+version, numBits, numHashes, words. */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 12 + words.length * 8)
    bb.putInt(BloomFilter.FormatV2)
    bb.putLong(numBits).putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  def add(key: String): Unit = {
    val h = Murmur3x64.hash128(key)
    val h1 = h(0)
    val h2 = h(1) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(key: String): Boolean = {
    val h = Murmur3x64.hash128(key)
    val h1 = h(0)
    val h2 = h(1) | 1L
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
  /** 'GBF' tag + format version (v2 = murmur3-128 base hash). */
  val FormatV2: Int = 0x47424602

  def fromBytes(bytes: Array[Byte]): BloomFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val version = bb.getInt
    require(version == FormatV2, s"unknown bloom wire format: $version")
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
final class BloomSeen(val parts: Array[BloomFilter], val numParts: Int) extends SeenFilter {
  /** Bank partition a key routes to (stable across builds and delta adds). */
  def partIndex(key: String): Int =
    java.lang.Math.floorMod(key.hashCode, numParts)

  private def partOf(key: String): Int = partIndex(key)

  def mightContain(key: String): Boolean = parts(partOf(key)).mightContain(key)

  def add(key: String): Unit = parts(partOf(key)).add(key)

  def mergeInPlace(other: BloomSeen): BloomSeen = {
    var i = 0
    while (i < parts.length) { parts(i).mergeInPlace(other.parts(i)); i += 1 }
    this
  }
}

object BloomSeen {

  /** 'GBS' tag + version for the bank wire format. */
  val BankFormatV1: Int = 0x47425301

  /** Checkpoint the seen-set bank to a Hadoop-FS path (file://, hdfs://,
    * s3a://) — with the snapshot table's HEAD this makes a crawl resumable
    * without rebuilding the bloom from the store (north_rule: "resumable
    * from checkpoint"; at 10^10 keys a rebuild is a full key scan). */
  def save(seen: BloomSeen, path: String,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val out = fs.create(p, true)
    try {
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(BankFormatV1)
      dos.writeInt(seen.numParts)
      seen.parts.foreach { part =>
        val b = part.toBytes
        dos.writeInt(b.length)
        dos.write(b)
      }
      dos.flush()
    } finally out.close()
  }

  def load(path: String,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): BloomSeen = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    try {
      val dis = new java.io.DataInputStream(in)
      val version = dis.readInt()
      require(version == BankFormatV1, s"unknown seen-set format: $version")
      val n = dis.readInt()
      val parts = Array.fill(n) {
        val len = dis.readInt()
        val buf = new Array[Byte](len)
        dis.readFully(buf)
        BloomFilter.fromBytes(buf)
      }
      new BloomSeen(parts, n)
    } finally in.close()
  }

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

  /** Incremental delta add (the crawl-loop maintenance path, reference
    * putIfAbsent semantics, FrontierJob.java:62-71): fold only `keys` —
    * a round's delta, never the store — into an existing bank.
    *
    * Shape matters at 10^10: a treeAggregate whose zero is a full empty
    * bank ships P × bankSize bytes (the bank, not the delta, dominates —
    * measured 1.0 s for a 100k delta against a 10M-key bank, all of it
    * bank serialization). Instead the delta keys are SHUFFLED by their
    * bank-partition index, each reduce task builds exactly the one
    * geometry-matched part its keys route to, and the driver collects one
    * bank's worth of parts total — wire cost O(|delta| + bankSize), and
    * only non-empty parts travel. Returns `bank` (mutated). */
  def addAll(bank: BloomSeen, keys: RDD[String]): BloomSeen = {
    // only scalars and the tiny geometry table may enter the closures below:
    // referencing `bank` itself would serialize every part's bit array into
    // the task binary — the O(P × bankSize) wire cost this method exists to
    // avoid (partIndex is floorMod(hashCode, n), replicated here on the Int)
    val n = bank.numParts
    val geometry = bank.parts.map(p => (p.numBits, p.numHashes))
    val built = keys
      .map(k => (java.lang.Math.floorMod(k.hashCode, n), k))
      .partitionBy(new org.apache.spark.HashPartitioner(n))
      .mapPartitionsWithIndex { (pid, it) =>
        // HashPartitioner over the Int part index is the identity, so this
        // task sees exactly the keys of bank part `pid`
        if (it.isEmpty) Iterator.empty
        else {
          val (bits, hashes) = geometry(pid)
          val bf = new BloomFilter(bits, hashes)
          it.foreach { case (_, k) => bf.add(k) }
          Iterator((pid, bf))
        }
      }
      .collect()
    built.foreach { case (pid, bf) => bank.parts(pid).mergeInPlace(bf) }
    bank
  }
}
