package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.PropSampling.sample

/** Unit + property tests for the scalar kernels behind the custom
  * expressions. Reference semantics: slugify `__init__.py:10-29`,
  * duration parse `__init__.py:32-73` (tolerant separators, None on
  * failure). */
class StringOpsSpec extends AnyFunSuite {

  // ---- slugify (F1)

  test("slugify de-accents, lowercases, hyphenates") {
    assert(StringOps.slugify("Hello World") == "hello-world")
    assert(StringOps.slugify("Café au Lait!") == "cafe-au-lait")
    assert(StringOps.slugify("  padded   runs  ") == "padded-runs")
    assert(StringOps.slugify("Tiếng Việt") == "tieng-viet")
    // đ does not NFD-decompose — the reference keeps it; so do we.
    assert(StringOps.slugify("Đà Nẵng") == "đa-nang")
    assert(StringOps.slugify("keep_under-score") == "keep_under-score")
    assert(StringOps.slugify("") == "")
  }

  test("slugify is idempotent and emits no spaces/uppercase") {
    for (s <- sample(Gen.asciiPrintableStr)) {
      val once = StringOps.slugify(s)
      assert(StringOps.slugify(once) == once, s"input: $s")
      assert(!once.exists(_.isWhitespace), s"input: $s")
      assert(!once.exists(_.isUpper), s"input: $s")
    }
  }

  // ---- durationSeconds (F2)

  test("duration parses clock forms") {
    assert(StringOps.durationSeconds("01:02:03") == 3723.0)
    assert(StringOps.durationSeconds("62:03") == 3723.0)
    assert(StringOps.durationSeconds("45") == 45.0)
    // tolerant separators and empty fields (reference cleans [;:]+)
    assert(StringOps.durationSeconds("01;;02::03") == 3723.0)
    assert(StringOps.durationSeconds(":30") == 30.0)
    assert(StringOps.durationSeconds(" 1:00 ") == 60.0)
  }

  test("duration fails to NaN on malformed input") {
    assert(StringOps.durationSeconds("abc").isNaN)
    assert(StringOps.durationSeconds("1:2:3:4").isNaN)
    assert(StringOps.durationSeconds("").isNaN)
    assert(StringOps.durationSeconds("1:xx").isNaN)
    assert(StringOps.durationSeconds(null).isNaN)
  }

  test("duration round-trips h:m:s") {
    val g = for {
      h <- Gen.choose(0, 99); m <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    } yield (h, m, s)
    for ((h, m, s) <- sample(g)) {
      assert(StringOps.durationSeconds(f"$h%02d:$m%02d:$s%02d") == h * 3600.0 + m * 60.0 + s)
    }
  }

  // ---- wordLevenshtein (A8 unit)

  test("word levenshtein") {
    def d(a: String, b: String) =
      StringOps.wordLevenshtein(a.split(" "), b.split(" "))
    assert(d("a b c", "a b c") == 0)
    assert(d("a b c", "a b") == 1)
    assert(d("a b c", "a x c") == 1)
    assert(d("a b", "x y z") == 3)
    assert(StringOps.wordLevenshtein(Array.empty, Array("x")) == 1)
    assert(StringOps.wordLevenshtein(null, null) == 0)
  }

  test("word levenshtein bounds and symmetry") {
    val tok = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))).map(_.toArray)
    val g = for { a <- tok; b <- tok } yield (a, b)
    for ((a, b) <- sample(g)) {
      val ab = StringOps.wordLevenshtein(a, b)
      assert(ab == StringOps.wordLevenshtein(b, a))
      assert(ab <= math.max(a.length, b.length))
      assert(ab >= math.abs(a.length - b.length))
    }
  }

  // ---- canonicalUrl

  test("canonicalUrl: every rule, one at a time and composed") {
    val c = StringOps.canonicalUrl _
    assert(c("https://shop.example.com/item/7?a=1&b=2")
      === "https://shop.example.com/item/7?a=1&b=2")          // already canonical
    assert(c("HTTPS://Shop.Example.COM:443/item/7?a=1")
      === "https://shop.example.com/item/7?a=1")              // case + default port
    assert(c("http://Host.Example.com:80/x") === "http://host.example.com/x")
    assert(c("http://host.example.com:8080/x") === "http://host.example.com:8080/x") // non-default kept
    assert(c("https://h.example/p/?b=2&a=1") === "https://h.example/p?a=1&b=2") // slash + sort
    assert(c("https://h.example/p#frag") === "https://h.example/p")             // fragment
    assert(c("https://h.example/P/Q") === "https://h.example/P/Q")              // path case kept
    assert(c("https://H.example/") === "https://h.example")                     // root slash
    assert(c("https://h.example") === "https://h.example")
    assert(c("no-scheme/path?z=1&a=2#f") === "no-scheme/path?a=2&z=1")          // graceful non-URL
    // idempotence: canonical of canonical is a fixed point
    for (u <- Seq("HTTPS://A.B:443/c/d/?z=9&a=1#x", "http://Q:80/?b=2&a=1"))
      assert(c(c(u)) === c(u))
  }

  // ---- simhash60

  test("simhash60 matches its definition") {
    val hashes = Array(0x3L, 0x5L, 0x6L)
    // bit 0: +1 (3) +1 (5) -1 (6) = +1 -> set
    // bit 1: +1 (3) -1 (5) +1 (6) = +1 -> set
    // bit 2: -1 (3) +1 (5) +1 (6) = +1 -> set
    // all other bits: -3 -> clear
    assert(StringOps.simhash60(hashes) == 0x7L)
    assert(StringOps.simhash60(Array.empty[Long]) == 0L)
  }

  // ---- sentence split (F9) with r9 protections

  test("sentenceSplit keeps terminators, trims, drops empties") {
    assert(StringOps.sentenceSplit("One. Two! Three?").toSeq ==
      Seq("One.", "Two!", "Three?"))
    assert(StringOps.sentenceSplit("No terminator").toSeq == Seq("No terminator"))
    assert(StringOps.sentenceSplit("").toSeq == Seq.empty)
    assert(StringOps.sentenceSplit("Wait... what?").toSeq == Seq("Wait...", "what?"))
  }

  test("sentenceSplit does not break on decimal points") {
    assert(StringOps.sentenceSplit("Pi là 3.14 nhé. Xong.").toSeq ==
      Seq("Pi là 3.14 nhé.", "Xong."))
    // Protection matches are NON-OVERLAPPING (Java replaceAll and
    // RE2 'g' agree): in "1.2.3" the first match consumes its
    // trailing digit, so the second dot is unprotected — both
    // engines split there identically, which is the invariant that
    // matters (engine ≡ oracle, not linguistic perfection).
    assert(StringOps.sentenceSplit("v1.2.3 ra mắt. Hết.").toSeq ==
      Seq("v1.2.", "3 ra mắt.", "Hết."))
  }

  test("sentenceSplit does not break on title abbreviations") {
    assert(StringOps.sentenceSplit("TS. Nam nói chuyện. GS. Lan nghe.").toSeq ==
      Seq("TS. Nam nói chuyện.", "GS. Lan nghe."))
    // PGS. must be protected as one unit, not via its GS. suffix
    assert(StringOps.sentenceSplit("PGS. Hoa dạy. Hết giờ.").toSeq ==
      Seq("PGS. Hoa dạy.", "Hết giờ."))
    assert(StringOps.sentenceSplit("Dr. Smith vs. Mr. Jones. Done.").toSeq ==
      Seq("Dr. Smith vs. Mr. Jones.", "Done."))
    // lowercase 'ts.' is NOT an abbreviation (case-sensitive list)
    assert(StringOps.sentenceSplit("nước ts. chảy").toSeq ==
      Seq("nước ts.", "chảy"))
  }

  // ---- boundedLevenshtein (q146 verification kernel)

  test("boundedLevenshtein ≡ full Levenshtein with a −1 cap, random pairs") {
    import org.apache.spark.unsafe.types.UTF8String
    def full(a: String, b: String): Int = {
      // code-point unit reference DP (the builtin's semantics)
      val ca = a.codePoints.toArray; val cb = b.codePoints.toArray
      var prev = Array.tabulate(cb.length + 1)(identity)
      var curr = new Array[Int](cb.length + 1)
      for (i <- 1 to ca.length) {
        curr(0) = i
        for (j <- 1 to cb.length)
          curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (ca(i - 1) == cb(j - 1)) 0 else 1))
        val t = prev; prev = curr; curr = t
      }
      prev(cb.length)
    }
    def bl(a: String, b: String, k: Int): Int =
      StringOps.boundedLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b), k)
    // Alphabet mixes ASCII, 2-byte (é/τ), and an astral-plane char
    // (a full surrogate pair) so code-point units are exercised.
    val atomGen = Gen.oneOf(Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("τ", "é", " ", "😀"))
    val strGen = for {
      n <- Gen.chooseNum(0, 24)
      cs <- Gen.listOfN(n, atomGen)
    } yield cs.mkString
    val pairGen = for { a <- strGen; b <- strGen; k <- Gen.chooseNum(0, 6) } yield (a, b, k)
    for (t <- sample(pairGen, n = 400)) {
      val (a, b, k) = t
      val want = { val d = full(a, b); if (d <= k) d else -1 }
      assert(bl(a, b, k) == want, s"diverged on ('$a', '$b', $k)")
    }
  }

  test("boundedLevenshtein: trimming respects surrogate pairs and code-point units") {
    import org.apache.spark.unsafe.types.UTF8String
    def bl(a: String, b: String, k: Int): Int =
      StringOps.boundedLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b), k)
    // Astral plane chars (surrogate pairs in UTF-16) count as ONE edit.
    val grin = "😀" // 😀
    val party = "🥳" // 🥳
    assert(bl("x" + grin + "y", "x" + party + "y", 4) == 1)
    // Shared prefix/suffix around the edit region trims away fully.
    val core = "the quick brown fox jumps over the lazy dog " * 20
    assert(bl(core + "zz", core, 4) == 2)
    assert(bl(core, core, 0) == 0)
    assert(bl(core + "abcde", core, 4) == -1)
    // Edits inside a long shared context, both orientations.
    assert(bl(core + "X" + core, core + "Y" + core, 4) == 1)
    assert(bl(core + core, core + "Q" + core, 4) == 1)
    // maxEdits = 0 degenerates to equality.
    assert(bl("same", "same", 0) == 0)
    assert(bl("same", "sane", 0) == -1)
    // Empty sides.
    assert(bl("", "abc", 4) == 3)
    assert(bl("", "abcde", 4) == -1)
    assert(bl("", "", 0) == 0)
  }
}
