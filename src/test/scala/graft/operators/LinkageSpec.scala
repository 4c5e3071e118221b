package graft.operators

import graft.{PropSampling, SparkSuite}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Differential gate for the Fellegi-Sunter blocked field matcher:
  * the blocked join + weight sum must agree with a sequential
  * all-pairs replay restricted to shared blocks, and the block
  * census guard must fail fast instead of running a dense block
  * quadratically. */
class LinkageSpec extends SparkSuite {
  import spark.implicits._

  test("blockedFieldMatch ≡ sequential same-block replay on random records") {
    // (id, block, name, value) — names from a 3-symbol pool force
    // agreements; values near each other exercise the tolerance rule.
    val gen = for {
      n <- Gen.chooseNum(4, 40)
      rows <- Gen.listOfN(n, for {
        b <- Gen.chooseNum(0, 2)
        nm <- Gen.oneOf("ann", "bob", "cyd")
        v <- Gen.chooseNum(0L, 30L)
      } yield (b.toLong, nm, v))
    } yield rows.zipWithIndex.map { case ((b, nm, v), i) => (i.toLong, b, nm, v) }
    val rules = Seq(Linkage.exact("name", 40L, -15L),
      Linkage.withinLong("value", 5L, 20L, -10L))
    for (rows <- PropSampling.sample(gen, n = 6)) {
      val got = Linkage.blockedFieldMatch(
          rows.toDF("id", "blk", "name", "value"), Seq("blk"), rules, "id",
          minScore = 10L, matchScore = 50L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      val expected = (for {
        a <- rows; b <- rows
        if a._1 < b._1 && a._2 == b._2
        score = (if (a._3 == b._3) 40L else -15L) +
          (if (math.abs(a._4 - b._4) <= 5L) 20L else -10L)
        if score >= 10L
      } yield (a._1, b._1, score,
        if (score >= 50L) "match" else "possible")).toSet
      assert(got === expected, s"linkage diverged on $rows")
    }
  }

  test("block census guard fails fast on an oversized block") {
    val rows = (0L until 10L).map(i => (i, 1L, "x", i))
    val e = intercept[Exception] {
      Linkage.blockedFieldMatch(rows.toDF("id", "blk", "name", "value"),
        Seq("blk"), Seq(Linkage.exact("name", 10L, -10L)), "id",
        minScore = 0L, matchScore = 5L, maxBlockSize = 4L).collect()
    }
    assert(e.getMessage.contains("block"), e.getMessage)
  }

  test("survivorship: completeness beats recency; fusion is latest NON-NULL per attribute") {
    // Cluster "x": id 1 complete, id 11 newest but seg null →
    // golden = 1 (completeness wins), seg_fused = 1's, bal_fused = 11's.
    // Cluster "y": id 2 complete, id 22 complete + newer → golden 22.
    // Cluster "z": single member with all-null seg → fused null.
    val rows = Seq(
      (1L, "x", Option(10L), Option("A")),
      (11L, "x", Option(20L), None),
      (2L, "y", Option(30L), Option("B")),
      (22L, "y", Option(40L), Option("C")),
      (3L, "z", Option(50L), None))
    val got = Linkage.survivorship(
        rows.toDF("id", "name", "bal", "seg"), Seq("name"), "id", Seq("bal", "seg"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.getString(5))))
    assert(got.toSeq === Seq(
      ("x", 1L, 2L, 1L, 20L, Some("A")),
      ("y", 22L, 2L, 2L, 40L, Some("C")),
      ("z", 3L, 1L, 0L, 50L, None)))
  }

  test("survivorship: id guard trips outside [0, 1e9)") {
    val e = intercept[Exception] {
      Linkage.survivorship(Seq((1000000000L, "x", Option(1L)))
          .toDF("id", "name", "bal"), Seq("name"), "id", Seq("bal"))
        .collect()
    }
    assert(e.getMessage.contains("survivorship"), e.getMessage)
  }
}
