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
  * child map); only the frozen arrays are fields, so the serialized
  * form is O(Σ|p|) nodes with no build-state overhang. Call sites
  * ship it via `sparkContext.broadcast` (once per executor, not per
  * task) — the broadcast-model convention of the fitted
  * classifiers, not per-row state. */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(p => p != null && p.nonEmpty),
    "patterns must be non-empty strings")

  // Build state (growable trie + BFS queue) is constructor-LOCAL so
  // only the three frozen arrays below are serialized — a 10k-entry
  // blocklist ships once-sized, not build-state-doubled. Children as
  // per-node HashMap (pattern alphabets are tiny; a flat 64k array
  // per node would be memory-hostile for large blocklists).
  private val (childArr, failArr, outArr): (
      Array[java.util.HashMap[Char, Int]], Array[Int], Array[Array[Int]]) = {
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    val fail = scala.collection.mutable.ArrayBuffer(0)
    // out(i) = pattern indices ending at node i (own + via fail links,
    // flattened after the BFS so matching never chases fail chains).
    val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
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
    (children.toArray, fail.toArray, out.map(_.toArray).toArray)
  }

  /** Number of patterns (the width of [[countHits]]' result). */
  val numPatterns: Int = patterns.length

  /** Per-pattern occurrence counts (overlapping) in `text`. */
  def countHits(text: String): Array[Long] = {
    val counts = new Array[Long](numPatterns)
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
