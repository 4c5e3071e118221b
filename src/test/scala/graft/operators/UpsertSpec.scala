package graft.operators

import graft.{PropSampling, SparkSuite}
import org.scalacheck.Gen

/** Differential gate for the CDC read side: [[Upsert.snapshotDiff]]
  * must agree with a per-key brute-force column compare on random
  * version pairs — including keys present on one side only, null vs
  * empty-string payloads, and values that would collide under a
  * separator-less fingerprint. */
class UpsertSpec extends SparkSuite {

  test("snapshotDiff ≡ brute-force column compare on random version pairs") {
    import spark.implicits._
    val payload = Gen.oneOf[Option[String]](None, Some(""), Some("a"),
      Some("b"), Some("ab"), Some("ab"))
    val side = Gen.listOfN(25, for {
      k <- Gen.chooseNum(0L, 14L)
      p <- payload
      q <- payload
    } yield (k, p, q)).map(_.groupBy(_._1).map(_._2.head).toSeq)
    val gen = for { o <- side; n <- side } yield (o, n)
    for ((o, n) <- PropSampling.sample(gen, n = 8)) {
      val got = Upsert.snapshotDiff(
          o.toDF("k", "p", "q"), n.toDF("k", "p", "q"),
          keyCols = Seq("k"), compareCols = Seq("p", "q"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val om = o.map(r => r._1 -> (r._2, r._3)).toMap
      val nm = n.map(r => r._1 -> (r._2, r._3)).toMap
      val expected = (om.keySet ++ nm.keySet).flatMap { k =>
        (om.get(k), nm.get(k)) match {
          case (None, Some(_))              => Some(k -> "added")
          case (Some(_), None)              => Some(k -> "removed")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _                            => None
        }
      }
      assert(got === expected, s"diff diverged on old=$o new=$n")
    }
  }

  test("snapshotDiff distinguishes null/empty payloads and shifted field boundaries") {
    import spark.implicits._
    // ("ab", "c") vs ("a", "bc") concatenate identically without a
    // separator; (null, "x") vs ("", "x") collide without a null
    // sentinel — all four pairs must tag as changed.
    val o = Seq((1L, Option("ab"), Option("c")), (2L, None: Option[String], Option("x")))
      .toDF("k", "p", "q")
    val n = Seq((1L, Option("a"), Option("bc")), (2L, Option(""), Option("x")))
      .toDF("k", "p", "q")
    val got = Upsert.snapshotDiff(o, n, Seq("k"), Seq("p", "q"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(1L -> "changed", 2L -> "changed"))
  }
}
