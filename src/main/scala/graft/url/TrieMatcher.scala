package graft.url

/** Character-trie string matchers (reference: util/TrieStringMatcher.java,
  * PrefixStringMatcher.java, SuffixStringMatcher.java): O(|input|) matching
  * against arbitrarily many patterns, replacing the O(patterns) per-URL
  * `exists(startsWith)` scan — the structure production crawls use for
  * large prefix/suffix rule sets.
  */
final class TrieMatcher private (reverse: Boolean) extends Serializable {

  private final class Node extends Serializable {
    var terminal: Boolean = false
    var children: java.util.HashMap[Char, Node] = null
    def child(c: Char): Node = if (children == null) null else children.get(c)
    def ensureChild(c: Char): Node = {
      if (children == null) children = new java.util.HashMap[Char, Node](4)
      var n = children.get(c)
      if (n == null) { n = new Node; children.put(c, n) }
      n
    }
  }

  private val root = new Node

  def add(pattern: String): this.type = {
    if (pattern.nonEmpty) {
      var node = root
      var i = 0
      val len = pattern.length
      while (i < len) {
        val c = if (reverse) pattern.charAt(len - 1 - i) else pattern.charAt(i)
        node = node.ensureChild(c)
        i += 1
      }
      node.terminal = true
    }
    this
  }

  /** True iff some stored pattern is a prefix (or suffix, in reverse mode)
    * of `input`. */
  def matches(input: String): Boolean = {
    var node = root
    var i = 0
    val len = input.length
    while (i < len) {
      node = node.child(if (reverse) input.charAt(len - 1 - i) else input.charAt(i))
      if (node == null) return false
      if (node.terminal) return true
      i += 1
    }
    false
  }

  /** Shortest matching pattern, or null (PrefixStringMatcher.shortestMatch). */
  def shortestMatch(input: String): String = {
    var node = root
    var i = 0
    val len = input.length
    while (i < len) {
      node = node.child(if (reverse) input.charAt(len - 1 - i) else input.charAt(i))
      if (node == null) return null
      if (node.terminal)
        return if (reverse) input.substring(len - 1 - i) else input.substring(0, i + 1)
      i += 1
    }
    null
  }
}

object TrieMatcher {
  /** Matches inputs having any of `prefixes` as a prefix. */
  def forPrefixes(prefixes: Iterable[String]): TrieMatcher = {
    val t = new TrieMatcher(reverse = false)
    prefixes.foreach(t.add)
    t
  }

  /** Matches inputs having any of `suffixes` as a suffix. */
  def forSuffixes(suffixes: Iterable[String]): TrieMatcher = {
    val t = new TrieMatcher(reverse = true)
    suffixes.foreach(t.add)
    t
  }
}
