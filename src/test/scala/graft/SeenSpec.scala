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
