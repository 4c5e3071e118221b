package graft.functions

/** Suffix-array machinery for the document-PAIR tier of the
  * exact-substring family (q92/q93 find repeats inside/across the
  * corpus at anchor granularity; this computes the EXACT longest
  * common token run of a candidate pair — the Lee et al. "dedup by
  * longest shared substring" refinement step).
  *
  * Construction is prefix doubling (Manber–Myers): O(n log² n) with
  * a plain comparison sort per round — the right trade for per-pair
  * kernels over documents of a few hundred tokens, where a linear-
  * time SA-IS would be all constant factor. LCP via Kasai et al.
  * (2001), O(n). Longest common run = max LCP over SA-ADJACENT
  * suffix pairs originating in different halves of `a ⧺ [-1] ⧺ b`
  * (the classic two-string LCS-by-suffix-array reduction; the -1
  * separator occurs once, so no common prefix can span it). */
object SuffixArrays {

  /** Suffix array of `s` (arbitrary ints; compared numerically). */
  def suffixArray(s: Array[Int]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = new Array[Int](n)
    var tmp = new Array[Int](n)
    val sa = Array.range(0, n)
    // Initial ranks: compress values to dense ranks.
    locally {
      val sorted = s.clone(); java.util.Arrays.sort(sorted)
      var k = 0
      val m = new java.util.HashMap[Int, Int]()
      var i = 0
      while (i < n) {
        if (i == 0 || sorted(i) != sorted(i - 1)) { m.put(sorted(i), k); k += 1 }
        i += 1
      }
      i = 0
      while (i < n) { rank(i) = m.get(s(i)); i += 1 }
    }
    var len = 1
    while (len < n) {
      val l = len
      def key(i: Int): Long =
        (rank(i).toLong << 31) | (if (i + l < n) (rank(i + l) + 1).toLong else 0L)
      val keyed = sa.map(i => (key(i), i))
      java.util.Arrays.sort(keyed, (x: (Long, Int), y: (Long, Int)) =>
        if (x._1 != y._1) java.lang.Long.compare(x._1, y._1)
        else Integer.compare(x._2, y._2))
      var i = 0
      while (i < n) { sa(i) = keyed(i)._2; i += 1 }
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (key(sa(i)) != key(sa(i - 1))) 1 else 0)
        i += 1
      }
      val t = rank; rank = tmp; tmp = t
      if (rank(sa(n - 1)) == n - 1) return sa // all ranks distinct: done
      len *= 2
    }
    sa
  }

  /** Kasai LCP: `lcp(i)` = longest common prefix of suffixes
    * `sa(i-1)` and `sa(i)`; `lcp(0) = 0`. */
  def kasaiLcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val lcp = new Array[Int](n)
    if (n == 0) return lcp
    val inv = new Array[Int](n)
    var i = 0
    while (i < n) { inv(sa(i)) = i; i += 1 }
    var h = 0
    i = 0
    while (i < n) {
      if (inv(i) > 0) {
        val j = sa(inv(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(inv(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Length (in elements) of the longest run common to `a` and `b`.
    * Elements must be NON-NEGATIVE: the join uses -1 as the unique
    * separator, so a negative input element could forge a run that
    * spans the join point (guarded — [[suffixArray]]/[[kasaiLcp]]
    * themselves accept arbitrary ints). */
  def longestCommonRun(a: Array[Int], b: Array[Int]): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    require(a.forall(_ >= 0) && b.forall(_ >= 0),
      "longestCommonRun elements must be non-negative (-1 is the separator)")
    val n = a.length
    val s = new Array[Int](n + 1 + b.length)
    System.arraycopy(a, 0, s, 0, n)
    s(n) = -1 // unique separator: strictly below any interned token id
    System.arraycopy(b, 0, s, n + 1, b.length)
    val sa = suffixArray(s)
    val lcp = kasaiLcp(s, sa)
    var best = 0
    var i = 1
    while (i < s.length) {
      // Adjacent suffixes from different halves bound the LCS.
      if ((sa(i - 1) < n) != (sa(i) < n) && lcp(i) > best) best = lcp(i)
      i += 1
    }
    best
  }

  /** Longest common TOKEN run of two texts — tokenization matches
    * `split(text, " ")` (single-space, empties kept); tokens are
    * interned to non-negative ids shared across both sides, so runs
    * compare by id. The [[graft.functions.LcsTokenRun]] kernel. */
  def lcsTokenRun(aText: String, bText: String): Int = {
    val dict = new java.util.HashMap[String, Integer]()
    def ids(t: String): Array[Int] = {
      val parts = t.split(" ", -1)
      val out = new Array[Int](parts.length)
      var i = 0
      while (i < parts.length) {
        var id = dict.get(parts(i))
        if (id == null) { id = Integer.valueOf(dict.size()); dict.put(parts(i), id) }
        out(i) = id.intValue(); i += 1
      }
      out
    }
    longestCommonRun(ids(aText), ids(bText))
  }
}
