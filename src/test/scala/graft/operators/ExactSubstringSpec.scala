package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Exact-substring (suffix-array tier) dedup vs an in-driver
  * brute-force reference: slide every k-window, count corpus-wide,
  * coalesce consecutive duplicated positions into maximal spans. The
  * brute force is O(corpus · k) driver work — fine on 500 docs, which
  * is the point of the two-linear-shuffle plan under test. */
class ExactSubstringSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  /** Reference spans: (doc_id, span_start, span_len). */
  private def brute(texts: Seq[(Long, Array[String])], k: Int,
                    minCount: Int): Set[(Long, Long, Long)] = {
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    for ((_, ts) <- texts; i <- 0 to ts.length - k)
      counts(ts.slice(i, i + k).mkString(" ")) += 1
    (for {
      (id, ts) <- texts.iterator
      dupPos = (0 to ts.length - k).filter(i => counts(ts.slice(i, i + k).mkString(" ")) >= minCount)
      if dupPos.nonEmpty
      // coalesce consecutive anchor positions into runs
      run <- dupPos.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), p) if p == h.head + 1 => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }
    } yield (id, run.min.toLong, (run.max - run.min + k).toLong)).toSet
  }

  private def corpusTexts: Seq[(Long, Array[String])] =
    docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => id -> t.split(" ") }

  private def collectSpans(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("doc_id", "span_start", "span_len").as[(Long, Long, Long)].collect().toSet

  test("repeated spans match brute force on the corpus (k=8)") {
    assert(collectSpans(ExactSubstring.repeatedSpans(docs, k = 8)) ==
      brute(corpusTexts, 8, 2))
  }

  test("repeated spans match brute force at minCount=3 and k=5") {
    assert(collectSpans(ExactSubstring.repeatedSpans(docs, k = 5, minCount = 3)) ==
      brute(corpusTexts, 5, 3))
  }

  test("every span is at least k tokens and starts non-negative") {
    val spans = ExactSubstring.repeatedSpans(docs, k = 8)
      .agg(min("span_len"), min("span_start")).as[(Long, Long)].head()
    assert(spans._1 >= 8 && spans._2 >= 0)
  }

  private def handmade = Seq(
    // shared 4-token boilerplate mid-document, unique elsewhere
    (1L, "alpha beta the quick brown fox gamma delta"),
    (2L, "one two the quick brown fox three four"),
    // exact twins: every window duplicated -> fully covered
    (3L, "copy of a fully duplicated document body"),
    (4L, "copy of a fully duplicated document body"),
    // no repeats at all
    (5L, "entirely unique text with no shared windows anywhere")
  ).toDF("doc_id", "text")

  test("dropRepeatedSpans removes covered tokens and keeps the rest in order") {
    val out = ExactSubstring.dropRepeatedSpans(handmade, k = 4)
      .select("doc_id", "kept_text", "kept_len").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("alpha beta gamma delta", 4L)))
    assert(out(2L) == (("one two three four", 4L)))
    assert(out(5L) == (("entirely unique text with no shared windows anywhere", 8L)))
  }

  test("fully-repeated documents survive as explicit empty rows") {
    val out = ExactSubstring.dropRepeatedSpans(handmade, k = 4)
    assert(out.count() == 5) // corpus row count preserved
    val twins = out.filter(col("doc_id").isin(3L, 4L))
      .select("kept_text", "kept_len").as[(String, Long)].collect().toSet
    assert(twins == Set(("", 0L)))
  }

  test("adjacent duplicated windows coalesce into one maximal span") {
    // twins: the whole 7-token doc is ONE span of len 7, not four k=4 spans
    val spans = collectSpans(
      ExactSubstring.repeatedSpans(handmade, k = 4).filter(col("doc_id") === 3L))
    assert(spans == Set((3L, 0L, 7L)))
  }
}
