package graft.url

/** Salted host/domain/url partitioner.
  *
  * Reproduces the reference's URLPartitioner
  * (src/main/java/org/apache/nutch/crawl/URLPartitioner.java:79-116): hash of
  * the host (or domain / whole url), XOR'd with a per-round seed so hosts
  * land on different partitions on different runs — the explicit salt that
  * kills hot-host pinning across rounds (FetcherJob.java:69-75 rationale).
  *
  * byIP mode is intentionally dropped (no network in this engine); byHost is
  * the default as in the reference.
  */
object UrlPartitioner {
  val ModeHost = "byHost"
  val ModeDomain = "byDomain"
  val ModeUrl = "byURL"

  /** Partition for a url. `normalize` runs in SCOPE_PARTITION first, like
    * the reference. Uses Java String.hashCode for parity with the
    * reference's partition assignment.
    */
  def getPartition(
      urlString: String,
      numPartitions: Int,
      seed: Int = 1,
      mode: String = ModeHost,
      normalizer: String => String = identity): Int = {
    if (numPartitions == 1) return 0
    val normalized = try normalizer(urlString) catch { case _: Exception => urlString }
    var hashCode = normalized.hashCode
    UrlUtil.tryParse(normalized).foreach { url =>
      mode match {
        case ModeHost   => hashCode = url.host.hashCode
        case ModeDomain => hashCode = UrlUtil.getDomainName(url).hashCode
        case ModeUrl    => hashCode = normalized.hashCode
        case _          => hashCode = url.host.hashCode
      }
    }
    hashCode ^= seed
    (hashCode & Int.MaxValue) % numPartitions
  }

  /** Java-callable entry for codegen (graft.functions.Exprs.HostPartition). */
  def simplePartition(url: String, numPartitions: Int, seed: Int): Int =
    getPartition(url, numPartitions, seed)
}
