package graft.functions

/** Aho–Corasick multi-pattern matcher (Aho & Corasick, CACM 1975) —
  * the blocklist/keyword-filter kernel: all occurrences of every
  * pattern in one left-to-right pass over the text, O(n + Σ|p| + z)
  * total, independent of the pattern COUNT. A chained
  * `regexp_count` per pattern (the q58 redaction shape) is one scan
  * per pattern — fine for 6 PII regexes, wrong for a 10k-entry
  * blocklist; this is the kernel that makes large literal blocklists
  * a single-scan projection.
  *
  * Matching contract: OVERLAPPING occurrences, case-sensitive, by
  * char (UTF-16 code unit). Counts per pattern index are exact longs
  * — SQL-replayable by a positional substring census, which is what
  * lets the q230 gate hash the kernel.
  *
  * Built once on the driver (goto/fail/output arrays over a dense
  * child map), serialized into the task closure: automaton size is
  * O(Σ|p|) nodes — the broadcast-model convention of the fitted
  * classifiers, not per-row state. */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(p => p != null && p.nonEmpty),
    "patterns must be non-empty strings")

  // Trie as growable parallel arrays; children as per-node HashMap
  // (pattern alphabets are tiny; a flat 64k array per node would be
  // memory-hostile for large blocklists).
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Char, Int]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  // out(i) = pattern indices ending at node i (own + via fail links,
  // flattened after the BFS so matching never chases fail chains).
  private val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  locally {
    for ((p, pi) <- patterns.zipWithIndex) {
      var cur = 0
      for (ch <- p) {
        var nxt: Int = children(cur).getOrDefault(ch, -1)
        if (nxt == -1) {
          children += new java.util.HashMap[Char, Int]()
          fail += 0
          out += Nil
          nxt = children.size - 1
          children(cur).put(ch, nxt)
        }
        cur = nxt
      }
      out(cur) = pi :: out(cur)
    }
    // BFS fail links + output flattening.
    val queue = new java.util.ArrayDeque[Int]()
    children(0).forEach((_, c) => { fail(c) = 0; queue.add(c) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      out(u) = out(u) ::: out(fail(u))
      children(u).forEach { (ch, c) =>
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        fail(c) = if (children(f).containsKey(ch) && children(f).get(ch) != c)
          children(f).get(ch) else 0
        queue.add(c)
      }
    }
  }

  private val childArr: Array[java.util.HashMap[Char, Int]] = children.toArray
  private val failArr: Array[Int] = fail.toArray
  private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray

  /** Per-pattern occurrence counts (overlapping) in `text`. */
  def countHits(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      while (state != 0 && !childArr(state).containsKey(ch)) state = failArr(state)
      if (childArr(state).containsKey(ch)) state = childArr(state).get(ch)
      val o = outArr(state)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}
