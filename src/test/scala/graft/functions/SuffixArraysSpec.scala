package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Suffix-array kernel pins: construction and LCP against naive
  * references under fuzz, and the LCS reduction against a quadratic
  * DP — two independent exact algorithms per property. */
class SuffixArraysSpec extends AnyFunSuite {

  private def naiveSa(s: Array[Int]): Array[Int] =
    Array.range(0, s.length).sortWith { (a, b) =>
      val x = s.drop(a); val y = s.drop(b)
      val c = x.zip(y).find { case (p, q) => p != q }
      c match {
        case Some((p, q)) => p < q
        case None => x.length < y.length
      }
    }

  private def naiveLcs(a: Array[Int], b: Array[Int]): Int = {
    // Classic O(n·m) longest-common-substring DP.
    var best = 0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }

  test("suffixArray + kasaiLcp ≡ naive references on random small-alphabet strings") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 120) {
      val n = 1 + rnd.nextInt(60)
      val alpha = 1 + rnd.nextInt(4) // small alphabet → many repeats
      val s = Array.fill(n)(rnd.nextInt(alpha))
      val sa = SuffixArrays.suffixArray(s)
      assert(sa.toSeq === naiveSa(s).toSeq, s"trial $trial s=${s.mkString(",")}")
      val lcp = SuffixArrays.kasaiLcp(s, sa)
      for (i <- 1 until n) {
        val x = s.drop(sa(i - 1)); val y = s.drop(sa(i))
        val expect = x.zip(y).takeWhile { case (p, q) => p == q }.length
        assert(lcp(i) === expect, s"trial $trial lcp@$i")
      }
    }
    assert(SuffixArrays.suffixArray(Array.empty[Int]).isEmpty)
  }

  test("longestCommonRun ≡ quadratic DP on random pairs; hand pins") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 150) {
      val a = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(5))
      val b = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(5))
      assert(SuffixArrays.longestCommonRun(a, b) === naiveLcs(a, b),
        s"trial $trial a=${a.mkString(",")} b=${b.mkString(",")}")
    }
    assert(SuffixArrays.longestCommonRun(Array(1, 2, 3), Array(1, 2, 3)) === 3)
    assert(SuffixArrays.longestCommonRun(Array(1, 2), Array(3, 4)) === 0)
    assert(SuffixArrays.longestCommonRun(Array.empty[Int], Array(1)) === 0)
  }

  test("lcsTokenRun: token semantics (single-space split, empties kept), hand pins") {
    assert(SuffixArrays.lcsTokenRun("a b c d", "x a b c y") === 3)
    assert(SuffixArrays.lcsTokenRun("a b c", "a b c") === 3)
    assert(SuffixArrays.lcsTokenRun("q w e", "z x c") === 0)
    // Repeats: the run, not the multiset, is what counts.
    assert(SuffixArrays.lcsTokenRun("a a a b", "a a c") === 2)
    // Consecutive spaces are empty tokens — shared empties match.
    assert(SuffixArrays.lcsTokenRun("a  b", "c  d") === 1)
    // Same token repeated far apart: run length 1.
    assert(SuffixArrays.lcsTokenRun("t u v t", "t") === 1)
  }
}
