package graft.operators

import graft.{PropSampling, SparkSuite}
import org.scalacheck.Gen

/** Laws of the count-min sketch: estimates never undercount, a
  * collision-free width is exact, and the structure is
  * deterministic (same input → same cells, any partitioning). */
class SketchesSpec extends SparkSuite {

  private val termGen: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(50, 300)
    ts <- Gen.listOfN(n, Gen.chooseNum(1, 25).map(i => s"term$i"))
  } yield ts

  test("CMS estimates are never below true counts; wide sketches are exact") {
    import spark.implicits._
    for (terms <- PropSampling.sample(termGen, n = 5)) {
      val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val df = terms.toDF("term")
      val probes = truth.keys.toSeq.toDF("term")
      // Narrow sketch: collisions likely — the overcount-only law.
      val narrow = Sketches.cmsEstimate(
          Sketches.countMinSketch(df, "term", depth = 3, width = 8),
          probes, "term", depth = 3, width = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (t, c) =>
        assert(narrow(t) >= c, s"CMS undercounted $t: ${narrow(t)} < $c")
      }
      // Wide sketch: 25 distinct terms into 4x4096 cells — md5-uniform
      // buckets make a same-cell collision in all 4 rows effectively
      // impossible, so min-of-cells is exact.
      val wide = Sketches.cmsEstimate(
          Sketches.countMinSketch(df, "term", depth = 4, width = 4096),
          probes, "term", depth = 4, width = 4096)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(wide === truth, "wide sketch should be exact on a tiny vocabulary")
    }
  }

  test("unseen probes estimate zero on empty buckets") {
    import spark.implicits._
    val sketch = Sketches.countMinSketch(Seq("a", "a", "b").toDF("term"), "term", 4, 4096)
    val est = Sketches.cmsEstimate(sketch, Seq("zzz-unseen").toDF("term"), "term", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("zzz-unseen") === 0L)
  }
}
