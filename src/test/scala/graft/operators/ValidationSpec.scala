package graft.operators

import graft.{PropSampling, SparkSuite}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Differential gate for the declarative validation report: every
  * check type must agree with a driver-side replay on random data
  * exercising nulls, duplicates, range and domain violations, and FK
  * orphans — and the scan checks must compile into ONE aggregate
  * pass (no join, no second scan). */
class ValidationSpec extends SparkSuite {
  import Validation._

  test("report ≡ driver replay across all check types on random data") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(4, 50)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 20L)            // duplicate-heavy key
        s <- Gen.oneOf[Option[String]](None, Some("A"), Some("B"), Some("Z"))
        v <- Gen.oneOf[Option[Double]](None, Some(-5.0), Some(3.0), Some(40.0))
        fk <- Gen.chooseNum(0L, 9L)
      } yield (k, s, v, fk))
    } yield rows
    val dim = Seq(0L, 1L, 2L, 3L, 4L).toDF("d")
    for (rows <- PropSampling.sample(gen, n = 8)) {
      val df = rows.toDF("k", "s", "v", "fk")
      val got = Validation.report(df, Seq(
          Complete("c", "s", minRatio = 0.5),
          Unique("u", "k", minRatio = 0.9),
          InRange("r", "v", 0.0, 10.0),
          InSet("d", "s", Seq("A", "B")),
          RefIntegrity("f", "fk", dim, "d")))
        .collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2),
          r.getLong(3), r.getLong(4))))
        .toMap
      val n = rows.size.toLong
      val nnS = rows.count(_._2.isDefined).toLong
      val expC = (("s", nnS.toDouble / n, n - nnS,
        if (nnS.toDouble / n >= 0.5) 1L else 0L))
      assert(got("c") === expC, s"complete diverged on $rows")
      val ks = rows.map(_._1)
      val ndK = ks.distinct.size.toLong
      assert(got("u") === (("k", ndK.toDouble / n, n - ndK,
        if (ndK.toDouble / n >= 0.9) 1L else 0L)), s"unique diverged on $rows")
      val vr = rows.count(r => r._3.exists(x => x < 0.0 || x > 10.0)).toLong
      assert(got("r") === (("v", vr.toDouble / n, vr, if (vr == 0) 1L else 0L)))
      val vs = rows.count(r => r._2.exists(x => x != "A" && x != "B")).toLong
      assert(got("d") === (("s", vs.toDouble / n, vs, if (vs == 0) 1L else 0L)))
      val orph = rows.count(_._4 > 4L).toLong
      val nnFk = n  // fk never null in this generator
      assert(got("f") === (("fk", orph.toDouble / nnFk, orph,
        if (orph == 0) 1L else 0L)), s"fk diverged on $rows")
    }
  }

  test("scan checks are one aggregate pass: no join, one parquet scan") {
    val df = graft.Tables.orders(spark, sfDir)
    val p = Validation.report(df, Seq(
        Complete("a", "o_orderpriority"),
        Unique("b", "o_orderkey"),
        InRange("c", "o_totalprice", 0.0, 300000.0),
        InSet("d", "o_orderstatus", Seq("O", "F"))))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"scan checks must not join:\n${p.take(1200)}")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected one scan for all scan checks, got $scans")
  }

  test("guards: empty checks and duplicate names fail fast") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException](Validation.report(df, Nil))
    intercept[IllegalArgumentException](Validation.report(df,
      Seq(Complete("x", "s"), Unique("x", "k"))))
  }
}
