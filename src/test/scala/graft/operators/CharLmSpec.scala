package graft.operators

import graft.{PropSampling, SparkSuite}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Differential gates for the char-bigram familiarity scorer: the
  * distributed fit+score lineage must equal a sequential in-test
  * model on random corpora, the bigram expression must shingle
  * multibyte text by character, and the relative-rarity flag must
  * actually separate corpus-typical text from injected garbage. */
class CharLmSpec extends SparkSuite {

  test("charBigrams: character shingles, multibyte-safe, empty below length 2") {
    import spark.implicits._
    val rows = Seq("hello", "ab", "a", "", "你好吗", "x y").toDF("t")
      .select(CharLm.charBigrams(col("t")).as("bg"))
      .collect().map(_.getSeq[String](0).toList)
    assert(rows(0) === List("he", "el", "ll", "lo"))
    assert(rows(1) === List("ab"))
    assert(rows(2) === Nil)
    assert(rows(3) === Nil)
    assert(rows(4) === List("你好", "好吗"), "multibyte must shingle by character")
    assert(rows(5) === List("x ", " y"))
  }

  test("bigramFamiliarity ≡ sequential corpus model on random corpora") {
    import spark.implicits._
    // Tiny alphabet so bigrams genuinely collide across documents.
    val docGen = Gen.chooseNum(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    val rareFactor = 10L
    for (texts <- PropSampling.sample(Gen.listOfN(20, docGen), n = 5)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def grams(t: String): Seq[String] =
        if (t.length < 2) Nil else (0 until t.length - 1).map(i => t.substring(i, i + 2))
      val counts = docs.flatMap(d => grams(d._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = counts.values.sum
      val expected = docs.map { case (id, t) =>
        val gs = grams(t)
        (id, gs.size.toLong,
          gs.map(counts).sum,
          gs.count(g => counts(g) * rareFactor < total).toLong)
      }.toSet
      val got = CharLm.bigramFamiliarity(docs.toDF("doc_id", "text"), rareFactor = rareFactor)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === expected, s"familiarity diverged on: $docs")
    }
  }

  test("scoreWithModel ≡ bigramFamiliarity on the fit corpus; unseen bigrams score 0 and rare") {
    import spark.implicits._
    val docGen = Gen.chooseNum(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    for (texts <- PropSampling.sample(Gen.listOfN(15, docGen), n = 4)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val model = CharLm.collectModel(docs, rareFactor = 10)
      val viaModel = CharLm.scoreWithModel(docs, model)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val distributed = CharLm.bigramFamiliarity(docs, rareFactor = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(viaModel === distributed, s"model scoring diverged on: $texts")
    }
    // Unseen text: every bigram contributes familiarity 0, counts rare.
    val fit = Seq((1L, "aaaa bbbb")).toDF("doc_id", "text")
    val model = CharLm.collectModel(fit, rareFactor = 10)
    val out = CharLm.scoreWithModel(Seq((9L, "zzqq")).toDF("doc_id", "text"), model)
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) === ((3L, 0L, 3L)),
      "unseen bigrams must score familiarity 0 and all-rare")
  }

  test("relative rarity separates corpus-typical text from injected garbage") {
    import spark.implicits._
    // 50 docs drawn from one template distribution + 1 doc of noise
    // characters the rest of the corpus never emits.
    val typical = (0L until 50L).map(i => (i, s"the cat sat on mat ${i % 3}"))
    val garbage = Seq((99L, "zq#7@!kx~pv^w%j"))
    // rareFactor sized to the corpus: rare = under 1/50 of the
    // ~1200-occurrence mass (the 2000 default targets real corpora).
    val out = CharLm.bigramFamiliarity((typical ++ garbage).toDF("doc_id", "text"),
        rareFactor = 50L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (gN, gFam, gRare) = out(99L)
    assert(gRare === gN, "every garbage bigram must flag rare")
    val typRareShare = typical.map(d => out(d._1)).map { case (n, _, r) => r.toDouble / n }.max
    assert(typRareShare < 0.5, s"typical docs must not be majority-rare: $typRareShare")
    // Mean familiarity of garbage sits far below every typical doc.
    val gMean = gFam.toDouble / gN
    val tMin = typical.map(d => out(d._1)).map { case (n, f, _) => f.toDouble / n }.min
    assert(gMean < tMin / 10.0, s"garbage mean familiarity $gMean vs typical min $tMin")
  }
}
