package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.seen.{BloomFilter, BloomSeen, CuckooFilter}

class SeenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bloom filter: no false negatives, bounded false positives") {
    val n = 10000
    val bf = BloomFilter.sized(n, 0.01)
    val keys = (0 until n).map(i => s"http://host-${i % 97}.example/page-$i.html")
    keys.foreach(bf.add)
    assert(keys.forall(bf.mightContain), "bloom filters must never have false negatives")
    val fps = (n until 2 * n).count(i => bf.mightContain(s"http://other-$i.example/x"))
    assert(fps < n * 0.05, s"false positive rate too high: $fps / $n")
  }

  test("bloom merge is a union") {
    val a = BloomFilter.sized(1000, 0.01)
    val b = BloomFilter.sized(1000, 0.01)
    a.add("x"); b.add("y")
    a.mergeInPlace(b)
    assert(a.mightContain("x") && a.mightContain("y"))
  }

  test("partitioned bloom seen-set built via treeAggregate") {
    val keys = (0 until 5000).map(i => s"key-$i")
    val rdd = spark.sparkContext.parallelize(keys, 8)
    val seen = BloomSeen.build(rdd, numParts = 16, expectedItems = 5000, fpp = 0.01)
    assert(keys.forall(seen.mightContain))
    val fps = (5000 until 10000).count(i => seen.mightContain(s"key-$i"))
    assert(fps < 250, s"fpp too high: $fps/5000")
  }

  test("addAll delta folds: no false negatives, equals a from-scratch build over the union") {
    val base = (0 until 3000).map(i => s"base-$i")
    val delta1 = (0 until 800).map(i => s"d1-$i")
    val delta2 = (0 until 500).map(i => s"d2-$i")
    val bank = BloomSeen.build(spark.sparkContext.parallelize(base, 8),
      numParts = 16, expectedItems = 5000, fpp = 0.01)
    BloomSeen.addAll(bank, spark.sparkContext.parallelize(delta1, 8))
    BloomSeen.addAll(bank, spark.sparkContext.parallelize(delta2, 5))
    // the bloom invariant that makes the crawl loop correct: a delta-added
    // key can NEVER be a false negative
    assert((base ++ delta1 ++ delta2).forall(bank.mightContain))
    // bit-identical to building once over the union (add is commutative OR)
    val all = BloomSeen.build(spark.sparkContext.parallelize(base ++ delta1 ++ delta2, 8),
      numParts = 16, expectedItems = 5000, fpp = 0.01)
    (0 until 16).foreach { p =>
      assert(bank.parts(p).toBytes.sameElements(all.parts(p).toBytes),
        s"part $p diverged from the from-scratch build")
    }
    // empty delta is a no-op
    val before = bank.parts.map(_.approxBitsSet).toSeq
    BloomSeen.addAll(bank, spark.sparkContext.parallelize(Seq.empty[String], 4))
    assert(bank.parts.map(_.approxBitsSet).toSeq == before)
  }

  test("empirical FPP matches the configured FPP at 10^7 keys (128-bit base hash)") {
    // With a 32-bit base hash this test fails: colliding (hashCode, length)
    // pairs floor the FPP well above the configured rate long before 10^7
    // keys. The murmur3-128 base keeps measured FPP ≈ configured FPP, which
    // is what makes the sizing math real at the north-rule's 10^10 scale.
    val n = 10_000_000
    val fpp = 0.01
    val bf = BloomFilter.sized(n, fpp)
    var i = 0
    while (i < n) { bf.add(s"http://h${i % 9973}.example/p/$i"); i += 1 }
    val probes = 1_000_000
    var fps = 0
    i = 0
    while (i < probes) {
      if (bf.mightContain(s"http://absent-$i.example/q/$i")) fps += 1
      i += 1
    }
    val measured = fps.toDouble / probes
    assert(measured < fpp * 1.5,
      f"measured FPP $measured%.5f vs configured $fpp (floor from base-hash collisions?)")
    assert(measured > fpp * 0.3, f"measured FPP $measured%.5f suspiciously low — probe bug?")
  }

  test("murmur3 x64-128 matches reference vectors") {
    // Golden values from the canonical MurmurHash3.cpp x64_128 variant.
    def hex(s: String, seed: Long = 0): (Long, Long) = {
      val h = graft.seen.Murmur3x64.hash128(s, seed)
      (h(0), h(1))
    }
    // empty string, seed 0
    assert(hex("") == (0L, 0L))
    // well-known vectors
    assert(hex("a") == (0x85555565f6597889L, 0xe6b53a48510e895aL))
    assert(hex("abc") == (0xb4963f3f3fad7867L, 0x3ba2744126ca2d52L))
    assert(hex("Hello, world!") == (0xf1512dd1d2d665dfL, 0x2c326650a8f3c564L))
  }

  test("seen-set bank checkpoints to a Hadoop-FS path and loads back") {
    val dir = SparkTestBase.tmpDir("seen-ckpt")
    val seen = BloomSeen.empty(numParts = 4, expectedItems = 10000, fpp = 0.01)
    val keys = (0 until 5000).map(i => s"http://h${i % 37}.example/p$i")
    keys.foreach(seen.add)
    BloomSeen.save(seen, s"$dir/seen.bloom")
    val loaded = BloomSeen.load(s"$dir/seen.bloom")
    assert(keys.forall(loaded.mightContain), "no false negatives after roundtrip")
    val fps = (5000 until 10000).count(i => loaded.mightContain(s"http://absent/$i"))
    assert(fps < 250, s"fpp degraded after roundtrip: $fps/5000")
  }

  test("cuckoo filter: insert, lookup, delete") {
    val cf = CuckooFilter.sized(10000)
    val keys = (0 until 8000).map(i => s"url-$i")
    val inserted = keys.filter(cf.add)
    assert(inserted.size == keys.size, "all inserts should fit below 95% load")
    assert(keys.forall(cf.mightContain))
    // deletes actually remove
    val toDelete = keys.take(1000)
    toDelete.foreach(k => assert(cf.remove(k)))
    val stillThere = toDelete.count(cf.mightContain)
    // fingerprint collisions may retain a few, but the bulk must be gone
    assert(stillThere < 50, s"deleted keys still visible: $stillThere")
    // non-deleted keys unaffected
    assert(keys.drop(1000).forall(cf.mightContain))
  }

  test("cuckoo distributed build via treeAggregate") {
    val keys = (0 until 3000).map(i => s"k-$i")
    val rdd = spark.sparkContext.parallelize(keys, 6)
    val cf = CuckooFilter.build(rdd, 3000)
    val misses = keys.count(k => !cf.mightContain(k))
    // union-merge can drop items when buckets saturate; at 50% load none should drop
    assert(misses == 0, s"$misses false negatives after merge")
  }
}
