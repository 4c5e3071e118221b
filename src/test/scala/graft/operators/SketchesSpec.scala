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

  test("cmsBuckets kernel ≡ the md5-hex column pipeline, sliced and salted rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // depth 6 exercises both regimes: rows 0-3 slice ONE md5 (DuckDB's
    // ('0x' || substr(md5(t), 1+8d, 8))::BIGINT % width), rows 4-5 the
    // salted h60 fallback.
    val depth = 6; val width = 512
    val terms = (1 to 40).map(i => s"term$i") :+ "" :+ "✓ unicode ñ"
    val legacy = terms.toDF("t").select(col("t"),
      array((0 until depth).map { d =>
        val h =
          if (d < 4) conv(substring(md5(col("t")), 1 + 8 * d, 8), 16, 10).cast("long")
          else graft.functions.HashFunctions.h60(concat(lit(s"cms$d:"), col("t")))
        pmod(h, lit(width.toLong))
      }: _*).as("b"))
    val kernel = terms.toDF("t").select(col("t"),
      Sketches.cmsBucketArray(col("t"), depth, width).as("b"))
    val l = legacy.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val k = kernel.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(k === l)
  }

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

  test("HLL ignores duplicates and partitioning; registers stay bounded") {
    import spark.implicits._
    val base = (1 to 400).map(i => s"user$i")
    val once = base.toDF("u").withColumn("g", org.apache.spark.sql.functions.lit("a"))
    // Same distinct set, tripled multiplicity, different partitioning:
    // a distinct-count sketch must not move by one bit.
    val tripled = (base ++ base ++ base).toDF("u")
      .repartition(7)
      .withColumn("g", org.apache.spark.sql.functions.lit("a"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.hyperloglog(df, "u", Seq("g"), p = 6).collect().map(r =>
        (r.getAs[Long]("n_regs"), r.getAs[Long]("s_scaled"),
         r.getAs[Double]("nd_estimate"))).toSeq
    val a = run(once)
    val b = run(tripled)
    assert(a === b, "HLL must be duplicate- and partitioning-insensitive")
    val (nRegs, sScaled, est) = a.head
    assert(nRegs <= 64, "more registers than m")
    assert(sScaled <= 64L * (1L << 55), "harmonic sum above the all-empty bound")
    // md5 hashing is fixed, so the estimate for this exact input is a
    // constant — pin the accuracy it happens to achieve (raw HLL
    // sigma at m=64 is ~13%).
    assert(math.abs(est - 400.0) / 400.0 < 0.25,
      s"raw estimate $est too far from 400")
  }

  test("hllPairAlgebra: union ≡ HLL of concatenated groups; inclusion–exclusion ties out; guard trips") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // a: 1..300, b: 201..500 (overlap 100), c: 501..520 (disjoint).
    val df = ((1 to 300).map(i => ("a", s"u$i")) ++
      (201 to 500).map(i => ("b", s"u$i")) ++
      (501 to 520).map(i => ("c", s"u$i"))).toDF("g", "u")
    val pairs = Sketches.hllPairAlgebra(df, "u", "g", p = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(pairs.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // The pair's nd_union must equal the plain HLL estimate of the
    // two groups' pooled values — register max IS set union.
    def pooled(gs: Set[String]): Double =
      Sketches.hyperloglog(
        df.filter(col("g").isin(gs.toSeq: _*)).withColumn("g", lit("x")),
        "u", Seq("g"), p = 6).collect().head.getAs[Double]("nd_estimate")
    for ((ga, gb) <- pairs.keySet) {
      val r = pairs((ga, gb))
      assert(r.getAs[Double]("nd_union") === pooled(Set(ga, gb)),
        s"($ga,$gb): union estimate != pooled-scan estimate")
      assert(r.getAs[Double]("nd_intersect_est") ===
        r.getAs[Double]("nd_a") + r.getAs[Double]("nd_b") - r.getAs[Double]("nd_union"))
    }
    // Overlapping pair estimates a materially larger intersection
    // than the disjoint pairs (whose estimate hovers near zero).
    // Raw HLL at m=64 carries ~13% per-estimate sigma, so the
    // subtraction's noise floor is tens of units — the meaningful
    // property is the ORDERING: the true-overlap pair estimates
    // well above both disjoint pairs (measured: a∩b 132.9 vs
    // a∩c 47.8, b∩c 2.7 on this fixed md5 input).
    val abEst = pairs(("a", "b")).getAs[Double]("nd_intersect_est")
    val acEst = pairs(("a", "c")).getAs[Double]("nd_intersect_est")
    val bcEst = pairs(("b", "c")).getAs[Double]("nd_intersect_est")
    assert(abEst > 60.0 && abEst < 250.0, s"a∩b estimate $abEst implausible for true 100")
    assert(abEst > acEst + 20.0 && abEst > bcEst + 20.0,
      s"overlap pair ($abEst) must dominate disjoint pairs ($acEst, $bcEst)")
    // Quadratic-pair guard fails fast on high-cardinality groups.
    val wide = (1 to 100).map(i => (s"g$i", "u")).toDF("g", "u")
    val e = intercept[IllegalArgumentException](
      Sketches.hllPairAlgebra(wide, "u", "g", p = 6, maxGroups = 64))
    assert(e.getMessage.contains("maxGroups"))
  }

  test("HLL empty-register accounting: one value touches one register") {
    import spark.implicits._
    val df = Seq("solo").toDF("u").withColumn("g", org.apache.spark.sql.functions.lit("x"))
    val r = Sketches.hyperloglog(df, "u", Seq("g"), p = 6).collect().head
    assert(r.getAs[Long]("n_regs") === 1L)
    // 63 empty registers contribute 2^55 each; the one occupied
    // register contributes 2^(55 - rho) for some rho in [1, 55].
    val s = r.getAs[Long]("s_scaled")
    assert(s > 63L * (1L << 55) && s < 64L * (1L << 55), s"s_scaled $s out of range")
  }

  test("binnedPercentiles: estimate is the floor of the exact discrete percentile, within one bin") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Random per-group samples incl. negative values and ties; the
    // exact discrete percentile (q62's rank convention) must land
    // inside the reported bin: est ≤ exact < est + 1/binsPerUnit.
    val rowGen = for {
      n <- Gen.chooseNum(5, 200)
      vs <- Gen.listOfN(n, Gen.chooseNum(-40000, 40000).map(_ / 100.0))
    } yield vs
    for (groups <- PropSampling.sample(Gen.listOfN(3, rowGen), n = 4)) {
      val rows = groups.zipWithIndex.flatMap { case (vs, g) => vs.map(v => (s"g$g", v)) }
      val df = rows.toDF("grp", "value").repartition(7)
      val got = Sketches.binnedPercentiles(df, Seq("grp"), col("value"),
          percentiles = Seq(50, 90), binsPerUnit = 4)
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
      groups.zipWithIndex.foreach { case (vs, g) =>
        val sorted = vs.sorted
        val (e50, e90) = (sorted(((vs.size - 1) * 50) / 100), sorted(((vs.size - 1) * 90) / 100))
        val (p50, p90, n) = got(s"g$g")
        assert(n === vs.size.toLong)
        assert(p50 <= e50 && e50 < p50 + 0.25, s"p50 est $p50 vs exact $e50")
        assert(p90 <= e90 && e90 < p90 + 0.25, s"p90 est $p90 vs exact $e90")
      }
    }
  }

  test("binnedPercentiles drops NaN with null — neither inflates n nor shifts ranks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Some(Double.NaN)), ("g", None: Option[Double])).toDF("grp", "value")
    val r = Sketches.binnedPercentiles(df, Seq("grp"), col("value"),
      percentiles = Seq(50), binsPerUnit = 4).collect().head
    assert(r.getLong(2) === 3L, "n must count only finite observed values")
    assert(r.getDouble(1) === 2.0, "p50 over {1,2,3} is 2")
  }

  test("unseen probes estimate zero on empty buckets") {
    import spark.implicits._
    val sketch = Sketches.countMinSketch(Seq("a", "a", "b").toDF("term"), "term", 4, 4096)
    val est = Sketches.cmsEstimate(sketch, Seq("zzz-unseen").toDF("term"), "term", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("zzz-unseen") === 0L)
  }

  test("cmsJoinSizeAudit: exact on a single key, never underestimates, zero on disjoint keys") {
    import spark.implicits._
    def audit(a: Seq[String], b: Seq[String]) =
      Sketches.cmsJoinSizeAudit(a.toDF("k"), "k", b.toDF("k"), "k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    // One key both sides: no collision possible → estimate is exact.
    assert(audit(Seq("x", "x", "x"), Seq("x", "x")) === ((6L, 6L, 0L)))
    // Multi-key: the CMS inner product NEVER underestimates.
    val (exact, estv, over) = audit(
      Seq.tabulate(60)(i => s"k${i % 12}"), Seq.tabulate(40)(i => s"k${i % 8}"))
    assert(estv >= exact && over >= 0L, s"CMS underestimated: $estv < $exact")
    assert(exact === 60L / 12L * (40L / 8L) * 8L)
    // Disjoint key sets: exact join size 0.
    val (e0, est0, _) = audit(Seq("a", "b"), Seq("c", "d"))
    assert(e0 === 0L && est0 >= 0L)
  }
}
