package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.{PropSampling, SparkSuite}

class ClusteringSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  private val dim = 8

  private def toDf(vecs: Seq[(Long, Array[Float])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      vecs.map { case (id, v) => Row(id, v.toSeq) }.asJava, schema)
  }

  /** Driver-side replay of the operator's exact arithmetic: double
    * distances in index order, floor(x*2^20+0.5) long sums, keep-old
    * on emptied clusters. */
  private def reference(vecs: Seq[(Long, Array[Float])], k: Int, iters: Int) = {
    val quant = 1048576.0d
    val prep = vecs.map { case (id, vf) =>
      val v = vf.map(_.toDouble)
      val qv = v.map(x => math.floor(x * quant + 0.5).toLong)
      val vv = v.foldLeft(0.0d)((a, x) => a + x * x)
      (id, v, qv, vv)
    }
    var cents: Seq[(Int, Array[Double])] = prep
      .map { case (id, v, _, _) => ((id * 2654435761L) % 1000000007L, id, v) }
      .sortBy { case (h, id, _) => (h, id) }
      .take(k).zipWithIndex
      .map { case ((_, _, v), i) => (i + 1, v) }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def assign(v: Array[Double], vv: Double): (Int, Double) =
      cents.map { case (cid, c) => (cid, vv - 2.0d * dot(v, c) + dot(c, c)) }
        .reduceLeft((a, b) => if (b._2 < a._2) b else a) // strict <: first wins ties
    for (_ <- 1 to iters) {
      val byC = prep.map { case (id, v, qv, vv) => (assign(v, vv)._1, qv) }
        .groupBy(_._1)
      cents = cents.map { case (cid, c) =>
        byC.get(cid) match {
          case Some(members) =>
            val n = members.size.toDouble
            val sums = members.map(_._2).transpose.map(_.sum)
            (cid, sums.map(s => s.toDouble / (n * quant)).toArray)
          case None => (cid, c)
        }
      }
    }
    prep.map { case (id, v, _, vv) =>
      val (cid, d) = assign(v, vv)
      (id, cid, math.floor(d * 1000000.0d + 0.5) / 1000000.0d)
    }.toSet
  }

  test("kmeans ≡ driver-side replay on random corpora (ties, duplicate points)") {
    // Coordinates on a coarse grid force duplicate points and exact
    // distance ties, exercising the smaller-centroid-id tie rule.
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-4, 4).map(_ / 2.0f)).map(_.toArray)
    val corpusGen = Gen.chooseNum(5, 30).flatMap(n => Gen.listOfN(n, vecGen))
    for ((vecs, i) <- PropSampling.sample(corpusGen, n = 4).zipWithIndex) {
      val rows = vecs.zipWithIndex.map { case (v, j) => (j.toLong * 3 + 1, v) }
      val got = Clustering.kmeans(toDf(rows), k = 4, iters = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(got === reference(rows, k = 4, iters = 2), s"sample $i diverged")
    }
  }

  test("emptied clusters keep their previous centroid; k > n degenerates safely") {
    // Two far blobs, k=4: at most two clusters keep members after the
    // first update; the other seeds must survive as stale centroids
    // without crashing the next round.
    val rows = Seq[(Long, Array[Float])](
      (1L, Array.fill(dim)(0.0f)), (2L, Array.fill(dim)(0.01f)),
      (3L, Array.fill(dim)(10.0f)), (4L, Array.fill(dim)(10.01f)),
      (5L, Array.fill(dim)(0.02f)))
    val got = Clustering.kmeans(toDf(rows), k = 4, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got === reference(rows, k = 4, iters = 3))
    // k > n: every point seeds its own cluster and stays there.
    val tiny = rows.take(2)
    val got2 = Clustering.kmeans(toDf(tiny), k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got2.map(_._1) === Set(1L, 2L) && got2.map(_._2).size == 2)
  }

  test("assignment plan is a pure projection: no join, no window, no corpus sort") {
    val rows = (0 until 50).map(i => (i.toLong, Array.fill(dim)(i.toFloat / 10)))
    val out = Clustering.kmeans(toDf(rows), k = 4, iters = 1)
    val plan = out.queryExecution.executedPlan.toString
    for (bad <- Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct", "Window"))
      assert(!plan.contains(bad), s"assignment must not plan a $bad:\n${plan.take(1200)}")
  }

  test("dbscanGrid ≡ sequential DBSCAN replay on random point sets; guard trips") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Sequential reference: brute-force neighborhoods, BFS over
    // core-core edges, min-id labels, min-label border attachment.
    def reference(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
        : Map[Long, (String, Option[Long])] = {
      def near(p: (Long, Long, Long), q: (Long, Long, Long)): Boolean = {
        val dx = p._2 - q._2; val dy = p._3 - q._3
        dx * dx + dy * dy <= eps * eps
      }
      val nbrs = pts.map(p =>
        p._1 -> pts.filter(q => q._1 != p._1 && near(p, q)).map(_._1)).toMap
      val core = pts.filter(p => nbrs(p._1).size + 1 >= minPts).map(_._1).toSet
      // components over core-core adjacency
      val label = scala.collection.mutable.Map.empty[Long, Long]
      for (c <- core.toSeq.sorted if !label.contains(c)) {
        val queue = scala.collection.mutable.Queue(c)
        val seen = scala.collection.mutable.Set(c)
        while (queue.nonEmpty) {
          val u = queue.dequeue()
          for (v <- nbrs(u) if core(v) && seen.add(v)) queue.enqueue(v)
        }
        val lbl = seen.min
        seen.foreach(v => label(v) = lbl)
      }
      pts.map { p =>
        if (core(p._1)) p._1 -> (("core", Some(label(p._1))))
        else {
          val coreNb = nbrs(p._1).filter(core).map(label)
          if (coreNb.nonEmpty) p._1 -> (("border", Some(coreNb.min)))
          else p._1 -> (("noise", None))
        }
      }.toMap
    }
    val gen = for {
      n <- Gen.chooseNum(6, 60)
      xs <- Gen.listOfN(n, Gen.chooseNum(-40L, 40L))
      ys <- Gen.listOfN(n, Gen.chooseNum(-40L, 40L))
    } yield xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    for (pts <- PropSampling.sample(gen, n = 6)) {
      val got = Clustering.dbscanGrid(
          pts.toDF("id", "x", "y"), "id", col("x"), col("y"),
          eps = 10L, minPts = 3)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
      assert(got === reference(pts, 10L, 3), s"dbscan diverged on $pts")
    }
    // Cell-occupancy guard fails fast on a dense cell.
    val dense = (0L until 10L).map(i => (i, 1L, 1L))
    val e = intercept[Exception] {
      Clustering.dbscanGrid(dense.toDF("id", "x", "y"), "id",
        col("x"), col("y"), eps = 100L, minPts = 3, maxCellSize = 4L).collect()
    }
    assert(e.getMessage.contains("grid cell"), e.getMessage)
  }

  test("labelCohesion ≡ BigInt replay; tight-vs-spread labels order; label guard trips") {
    import spark.implicits._
    // Two tight clusters far apart + one diffuse label: the diffuse
    // label's dispersion must exceed the tight ones', and each tight
    // label's nearest centroid is the other tight one's area or the
    // diffuse centroid — replay decides exactly.
    val rows = Seq(
      (0, Seq(0.10, 0.10)), (0, Seq(0.11, 0.10)), (0, Seq(0.10, 0.12)),
      (1, Seq(-0.40, -0.40)), (1, Seq(-0.41, -0.39)), (1, Seq(-0.40, -0.41)),
      (2, Seq(0.50, -0.50)), (2, Seq(-0.50, 0.50)), (2, Seq(0.45, 0.48)))
      .map { case (l, v) => (l, v.map(_.toFloat).toArray) }
      .toDF("label", "embedding")
    def q(x: Double): BigInt = BigInt(math.floor(x * 1e6 + 0.5).toLong)
    val data = Seq(
      0 -> Seq(Seq(0.10, 0.10), Seq(0.11, 0.10), Seq(0.10, 0.12)),
      1 -> Seq(Seq(-0.40, -0.40), Seq(-0.41, -0.39), Seq(-0.40, -0.41)),
      2 -> Seq(Seq(0.50, -0.50), Seq(-0.50, 0.50), Seq(0.45, 0.48)))
    val sums = data.map { case (l, vs) =>
      l -> (vs.size, (0 to 1).map(d => vs.map(v => q(v(d).toFloat.toDouble)).sum),
        vs.map(v => v.map(x => { val xq = q(x.toFloat.toDouble); xq * xq }).sum).sum)
    }.toMap
    val expDisp = sums.map { case (l, (n, sd, sq2)) =>
      l -> (BigInt(n) * sq2 - sd.map(s => s * s).sum) / (BigInt(n) * n) }
    val expSep = data.map(_._1).map { la =>
      val (na, sa, _) = sums(la)
      val cands = data.map(_._1).filter(_ != la).map { lb =>
        val (nb, sb, _) = sums(lb)
        val num = (0 to 1).map(d => {
          val t = sa(d) * nb - sb(d) * na; t * t }).sum
        (num / (BigInt(na) * na * nb * nb), lb)
      }
      la -> cands.minBy { case (s, lb) => (s, lb) }
    }.toMap
    val got = Clustering.labelCohesion(rows).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), BigInt(r.getLong(2)),
        r.getInt(3), BigInt(r.getLong(4))))).toMap
    for (l <- Seq(0, 1, 2)) {
      val (n, disp, nl, sep) = got(l)
      assert(n === 3L && disp === expDisp(l) &&
        (sep, nl) === expSep(l), s"label $l: $got vs $expDisp / $expSep")
    }
    // Geometry sanity: the diffuse label disperses most; the tight
    // labels are well separated (sep >> disp).
    assert(got(2)._2 > got(0)._2 && got(2)._2 > got(1)._2)
    assert(got(0)._4 > got(0)._2 && got(1)._4 > got(1)._2)
    // Label-cardinality guard fails fast before any quadratic work.
    val e2 = intercept[IllegalArgumentException] {
      Clustering.labelCohesion(rows, maxLabels = 2)
    }
    assert(e2.getMessage.contains("labelCohesion"), e2.getMessage)
  }
}
