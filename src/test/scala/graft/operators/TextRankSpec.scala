package graft.operators

import graft.{PropSampling, SparkSuite}
import org.scalacheck.Gen

/** Gates for the retrieval tier: keyword search against a
  * brute-force in-test ranking, and BM25 against an independent
  * Scala computation of the same formula (the float path is not
  * cross-engine portable, so this spec IS its gate — q55 hash-gates
  * the integer path). */
class TextRankSpec extends SparkSuite {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "rare")
  private val docGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(5, 40)
    docs <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(len, Gen.frequency(
        (8, Gen.oneOf(vocab.init)), (1, Gen.const("rare"))))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("keywordSearch ≡ brute-force (n_matched, tf_total, id) ranking") {
    import spark.implicits._
    val terms = Seq("alpha", "rare")
    for (docs <- PropSampling.sample(docGen, n = 6)) {
      val got = TextRank.keywordSearch(
          docs.toDF("doc_id", "text"), "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val expected = docs.map { case (id, t) =>
        val toks = t.split(" ", -1).toSeq
        val tfs = terms.map(q => toks.count(_ == q))
        (id, tfs.count(_ > 0).toLong, tfs.sum.toLong, toks.size.toLong)
      }.filter(_._2 > 0)
        .sortBy { case (id, nm, tft, _) => (-nm, -tft, id) }
        .take(10)
      assert(got.toSeq === expected, s"ranking diverged on $docs")
    }
  }

  test("bm25TopK matches an independent computation of the formula") {
    import spark.implicits._
    val terms = Seq("alpha", "rare")
    val (k1, b) = (1.2, 0.75)
    for (docs <- PropSampling.sample(docGen, n = 4)) {
      val got = TextRank.bm25TopK(
          docs.toDF("doc_id", "text"), "doc_id", "text", terms, k = 8,
          k1 = k1, b = b)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val tokenized = docs.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
      val n = tokenized.size.toDouble
      val avgdl = tokenized.map(_._2.size).sum / n
      val dfs = terms.map(q => tokenized.count(_._2.contains(q)).toDouble)
      val expected = tokenized.map { case (id, toks) =>
        val dl = toks.size.toDouble
        val score = terms.zip(dfs).map { case (q, df) =>
          val tf = toks.count(_ == q).toDouble
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }.sum
        (id, score)
      }.filter(_._2 > 0.0).sortBy { case (id, s) => (-s, id) }.take(8)
      assert(got.map(_._1).toSeq === expected.map(_._1),
        s"BM25 ranking diverged on $docs")
      got.zip(expected).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9, s"score $gs != $es")
      }
    }
  }

  test("bm25Search (integer) ≡ bm25TopK (float) ranking on separated fixtures; BM25 properties hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare x x x"),                          // rare term, df=1
      (2L, "alpha alpha alpha x"),                 // tf=3, dl=4
      (3L, "alpha x y z"),                         // tf=1, dl=4
      (9L, "alpha x x x x y y z"),                 // tf=1, dl=8 (longer)
      (5L, "x y z"), (6L, "x y z"), (7L, "x y z")) // df dilution
      .toDF("doc_id", "text")
    val terms = Seq("alpha", "rare")
    val ints = TextRank.bm25Search(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val floats = TextRank.bm25TopK(docs, "doc_id", "text", terms, k = 10,
        k1 = 1.2, b = 0.75)
      .collect().map(_.getLong(0))
    assert(ints.map(_._1).toSeq === floats.toSeq,
      "integer quantization must not reorder a separated fixture")
    val score = ints.toMap
    assert(score(1L) > score(3L), "rare-term idf must outrank a common term at equal tf")
    assert(score(2L) < 3L * score(3L), "tf=3 must score under 3x tf=1 (saturation)")
    assert(score(3L) > score(9L), "longer doc with same tf must score lower (length norm)")
  }

  test("postingCompressionStats: exact varint bytes across the 7-bit boundaries") {
    import spark.implicits._
    // "t" in docs {0,1,200}: gaps 1,1,199 → 1+1+2 bytes.
    // "u" in docs {127, 255}: gaps 128 (2 bytes), 128 (2 bytes).
    // "v" in doc {0}: gap 1 → 1 byte.
    val docs = Seq((0L, "t v"), (1L, "t"), (200L, "t"), (127L, "u"), (255L, "u"))
      .toDF("doc_id", "text")
    val rows = TextRank.postingCompressionStats(docs, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("t") === ((3L, 24L, 4L, 1666L)))
    assert(rows("u") === ((2L, 16L, 4L, 2500L)))
    assert(rows("v") === ((1L, 8L, 1L, 1250L)))
  }

  test("invertedIndex ≡ brute-force postings on random corpora") {
    import spark.implicits._
    for (docs <- PropSampling.sample(docGen, n = 5)) {
      val got = TextRank.invertedIndex(
          docs.toDF("doc_id", "text"), postingsK = 3)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val tokenized = docs.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
      val expected = tokenized.flatMap { case (id, ts) => ts.map(t => (t, id)) }
        .groupBy(_._1).map { case (term, pairs) =>
          val byDoc = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
          term -> ((byDoc.size.toLong, byDoc.values.sum,
            byDoc.keys.toSeq.sorted.take(3).mkString(",")))
        }
      assert(got === expected, s"index diverged on $docs")
    }
  }

  test("full-match documents rank above any partial match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha alpha alpha"), // heavy partial match
      (2L, "alpha rare"),                    // light full match
      (3L, "beta beta")).toDF("doc_id", "text")
    val top = TextRank.keywordSearch(docs, "doc_id", "text",
      Seq("alpha", "rare"), k = 3).collect().map(_.getLong(0)).toSeq
    assert(top === Seq(2L, 1L), "full match must outrank heavier partial match")
  }

  test("rrfFuse ≡ driver-side fusion; both-lists beats single-list; absent contributes zero") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "r")
    val b = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("id", "r")
    val got = TextRank.rrfFuse(a, "id", "r", b, "id", "r", k = 10, c = 60)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3)))
    def t(r: Option[Long]): Double = r.map(x => 1.0d / (60.0d + x)).getOrElse(0.0d)
    val expect = Map(
      10L -> (Some(1L), Some(3L)), 20L -> (Some(2L), Some(1L)),
      30L -> (Some(3L), None), 40L -> (None, Some(2L)))
      .map { case (id, (ra, rb)) => id -> ((ra, rb, t(ra) + t(rb))) }
    assert(got.length === 4)
    for ((id, ra, rb, s) <- got)
      assert(expect(id) === ((ra, rb, s)), s"fusion diverged for $id")
    // Docs in BOTH lists outrank every single-list doc here, and the
    // produced order is (rrf desc, id).
    val order = got.map(_._1).toSeq
    assert(order.take(2).toSet === Set(10L, 20L),
      s"both-list docs must lead the fusion: $order")
    assert(got.map(_._4).toSeq === got.map(_._4).toSeq.sorted.reverse,
      "fused scores must be non-increasing in output order")
  }

  test("marketBasket fails fast on non-integral keys instead of silently dropping rows") {
    import spark.implicits._
    // A string basket id used to cast to NULL in-plan; collect_set
    // dropped it and the query returned empty rule sets silently.
    val bad = Seq(("order-1", 1L), ("order-1", 2L)).toDF("o", "p")
    val e = intercept[Exception](
      TextRank.marketBasket(bad, "o", "p", minSupport = 1).collect())
    assert(e.getMessage != null)
    // Numeric strings still cast cleanly — only NON-integral content trips.
    val ok = Seq(("1", 10L), ("1", 20L)).toDF("o", "p")
    val rows = TextRank.marketBasket(ok, "o", "p", minSupport = 1).collect()
    assert(rows.length === 1)
  }
}
