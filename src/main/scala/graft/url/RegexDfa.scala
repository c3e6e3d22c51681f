package graft.url

import scala.collection.mutable

/** From-scratch regular-expression DFA (Thompson construction + subset
  * construction — Thompson CACM 1968; the textbook algorithms), giving
  * guaranteed O(|url|) whole-string matching with no backtracking.
  *
  * This is the engine behind AutomatonUrlFilter (reference:
  * plugin/urlfilter-automaton, which wraps dk.brics.automaton for the same
  * purpose): for large rule sets a production crawl cannot afford
  * backtracking regex per URL per rule. Matching is FULL-string (dk.brics
  * RunAutomaton.run semantics), unlike the regex filter's find().
  *
  * Supported syntax (the subset the reference's automaton rule files use):
  * literals, '.', escapes, character classes [a-z0-9_.] with ranges and
  * negation, grouping (), alternation |, and the *, +, ? repetitions.
  * Alphabet: ASCII 0-127 plus one symbol standing for all non-ASCII
  * characters (URL rule sets are ASCII; non-ASCII chars match only '.' and
  * negated classes).
  */
final class RegexDfa private (
    trans: Array[Int], // numStates x 129, -1 = reject
    accepting: Array[Boolean]) extends Serializable {

  import RegexDfa.{NumSymbols, Other}

  @inline private def symbolOf(c: Char): Int = if (c < 128) c else Other

  /** Whole-string match in O(len). */
  def matches(input: String): Boolean = {
    var state = 0
    var i = 0
    val len = input.length
    while (i < len) {
      state = trans(state * NumSymbols + symbolOf(input.charAt(i)))
      if (state < 0) return false
      i += 1
    }
    accepting(state)
  }
}

object RegexDfa {

  private val NumSymbols = 129
  private val Other = 128

  // ----------------------------------------------------------------- parser

  private sealed trait Rx
  private case object Eps extends Rx
  private final case class Sym(matchesSym: Array[Boolean]) extends Rx
  private final case class Cat(a: Rx, b: Rx) extends Rx
  private final case class Alt(a: Rx, b: Rx) extends Rx
  private final case class Star(a: Rx) extends Rx

  private def symFor(c: Char): Sym = {
    val m = new Array[Boolean](NumSymbols)
    if (c < 128) m(c.toInt) = true
    else m(Other) = true
    Sym(m)
  }

  private def anySym(): Sym = {
    val m = Array.fill(NumSymbols)(true)
    Sym(m)
  }

  private final class Parser(re: String) {
    private var pos = 0
    private def peek: Char = re.charAt(pos)
    private def more: Boolean = pos < re.length

    def parse(): Rx = {
      val r = alt()
      require(!more, s"unexpected '${peek}' at $pos in regex: $re")
      r
    }

    private def alt(): Rx = {
      var r = cat()
      while (more && peek == '|') { pos += 1; r = Alt(r, cat()) }
      r
    }

    private def cat(): Rx = {
      var r: Rx = Eps
      while (more && peek != '|' && peek != ')') {
        val a = rep()
        r = if (r == Eps) a else Cat(r, a)
      }
      r
    }

    private def rep(): Rx = {
      var r = atom()
      while (more && (peek == '*' || peek == '+' || peek == '?')) {
        r = peek match {
          case '*' => Star(r)
          case '+' => Cat(r, Star(r))
          case '?' => Alt(r, Eps)
        }
        pos += 1
      }
      r
    }

    private def atom(): Rx = {
      require(more, s"dangling operator at end of regex: $re")
      peek match {
        case '(' =>
          pos += 1
          val r = alt()
          require(more && peek == ')', s"unbalanced '(' in regex: $re")
          pos += 1
          r
        case '[' => charClass()
        case '.' => pos += 1; anySym()
        case '\\' =>
          pos += 1
          require(more, s"dangling escape in regex: $re")
          val c = peek; pos += 1
          symFor(c)
        case c =>
          pos += 1
          symFor(c)
      }
    }

    private def charClass(): Rx = {
      pos += 1 // consume '['
      var neg = false
      if (more && peek == '^') { neg = true; pos += 1 }
      val m = new Array[Boolean](NumSymbols)
      var first = true
      while (more && (peek != ']' || first)) {
        var c = peek
        if (c == '\\') { pos += 1; require(more, "dangling escape in class"); c = peek }
        pos += 1
        if (more && peek == '-' && pos + 1 < re.length && re.charAt(pos + 1) != ']') {
          pos += 1
          var hi = peek
          if (hi == '\\') { pos += 1; hi = peek }
          pos += 1
          var x = c
          while (x <= hi) { if (x < 128) m(x.toInt) = true; x = (x + 1).toChar }
        } else if (c < 128) m(c.toInt) = true
        first = false
      }
      require(more && peek == ']', s"unbalanced '[' in regex: $re")
      pos += 1
      if (neg) {
        var i = 0
        while (i < NumSymbols) { m(i) = !m(i); i += 1 }
        // negated classes also admit non-ASCII
      } else m(Other) = false
      Sym(m)
    }
  }

  // --------------------------------------------- Thompson NFA + subset DFA

  private final class Nfa {
    val eps = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]
    val symEdges = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Array[Boolean], Int)]]
    def newState(): Int = {
      eps += mutable.ArrayBuffer.empty
      symEdges += mutable.ArrayBuffer.empty
      eps.length - 1
    }
  }

  /** Returns (start, end) fragment states. */
  private def build(nfa: Nfa, rx: Rx): (Int, Int) = rx match {
    case Eps =>
      val s = nfa.newState(); val e = nfa.newState()
      nfa.eps(s) += e
      (s, e)
    case Sym(m) =>
      val s = nfa.newState(); val e = nfa.newState()
      nfa.symEdges(s) += (m -> e)
      (s, e)
    case Cat(a, b) =>
      val (as, ae) = build(nfa, a)
      val (bs, be) = build(nfa, b)
      nfa.eps(ae) += bs
      (as, be)
    case Alt(a, b) =>
      val s = nfa.newState(); val e = nfa.newState()
      val (as, ae) = build(nfa, a)
      val (bs, be) = build(nfa, b)
      nfa.eps(s) += as; nfa.eps(s) += bs
      nfa.eps(ae) += e; nfa.eps(be) += e
      (s, e)
    case Star(a) =>
      val s = nfa.newState(); val e = nfa.newState()
      val (as, ae) = build(nfa, a)
      nfa.eps(s) += as; nfa.eps(s) += e
      nfa.eps(ae) += as; nfa.eps(ae) += e
      (s, e)
  }

  private def epsClosure(nfa: Nfa, states: Set[Int]): Set[Int] = {
    val seen = mutable.Set.empty[Int] ++ states
    val stack = mutable.Stack.empty[Int].pushAll(states)
    while (stack.nonEmpty) {
      val s = stack.pop()
      nfa.eps(s).foreach { t => if (seen.add(t)) stack.push(t) }
    }
    seen.toSet
  }

  /** Compile a regex to a DFA. `maxStates` bounds subset-construction
    * blowup (a rule hitting it is a rule-authoring problem; URL rules
    * compile to a handful of states). */
  def compile(re: String, maxStates: Int = 100000): RegexDfa = {
    val rx = new Parser(re).parse()
    val nfa = new Nfa
    val (start, end) = build(nfa, rx)

    val dfaIds = mutable.LinkedHashMap.empty[Set[Int], Int]
    val transRows = mutable.ArrayBuffer.empty[Array[Int]]
    val startSet = epsClosure(nfa, Set(start))
    dfaIds(startSet) = 0
    transRows += Array.fill(NumSymbols)(-1)
    val work = mutable.Queue(startSet)
    while (work.nonEmpty) {
      val cur = work.dequeue()
      val curId = dfaIds(cur)
      // partition symbols by target set
      var sym = 0
      while (sym < NumSymbols) {
        var targets = Set.empty[Int]
        cur.foreach { s =>
          nfa.symEdges(s).foreach { case (m, t) => if (m(sym)) targets += t }
        }
        if (targets.nonEmpty) {
          val closed = epsClosure(nfa, targets)
          val id = dfaIds.getOrElseUpdate(closed, {
            require(dfaIds.size < maxStates, s"DFA blowup compiling: $re")
            transRows += Array.fill(NumSymbols)(-1)
            work.enqueue(closed)
            dfaIds.size
          })
          transRows(curId)(sym) = id
        }
        sym += 1
      }
    }
    val n = dfaIds.size
    val flat = new Array[Int](n * NumSymbols)
    var i = 0
    while (i < n) {
      System.arraycopy(transRows(i), 0, flat, i * NumSymbols, NumSymbols)
      i += 1
    }
    val accepting = new Array[Boolean](n)
    dfaIds.foreach { case (set, id) => accepting(id) = set.contains(end) }
    new RegexDfa(flat, accepting)
  }
}

/** First-match-decides +/- URL filter over DFA-compiled rules (reference:
  * plugin/urlfilter-automaton/AutomatonURLFilter.java — RegexURLFilterBase
  * rule semantics, dk.brics whole-string `run` matching). */
final class AutomatonUrlFilter(rules: Seq[(Boolean, RegexDfa)]) extends UrlFilter {
  def filter(url: String): String = {
    var i = 0
    while (i < rules.length) {
      val (accept, dfa) = rules(i)
      if (dfa.matches(url)) return if (accept) url else null
      i += 1
    }
    null
  }
  def accepts(url: String): Boolean = filter(url) != null
}

object AutomatonUrlFilter {
  /** Parse "+regex" / "-regex" lines ('#' comments and blanks skipped) —
    * identical file format to the regex filter. */
  def parse(lines: Seq[String]): AutomatonUrlFilter = {
    val rules = lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val accept = l.charAt(0) match {
          case '+' => true
          case '-' => false
          case c => throw new IllegalArgumentException(s"Invalid first character '$c' in rule: $l")
        }
        accept -> RegexDfa.compile(l.substring(1))
      }
      .toSeq
    new AutomatonUrlFilter(rules)
  }
}
