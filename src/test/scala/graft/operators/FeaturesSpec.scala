package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Standardization: the stats fit must equal an exact driver-side
  * replay of the quantized sufficient statistics, the transform must
  * actually center/scale the corpus, and the projection must stay a
  * scan (stream-deployable, zero shuffle). */
class FeaturesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("dimensionStats ≡ exact driver replay of the quantized sums") {
    val vecs = emb.select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val dims = vecs.head.length
    val got = Features.dimensionStats(emb).orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === dims)
    for (d <- 0 until dims) {
      val qs = vecs.map(v => math.floor(v(d) * 1000000L + 0.5d).toLong)
      val n = qs.length.toDouble
      val sv = qs.sum
      val svv = qs.map(q => q * q).sum
      val mean = (sv.toDouble / n) / 1000000.0d
      val std = math.sqrt((n * svv.toDouble - sv.toDouble * sv.toDouble) /
        (n * (n - 1.0d))) / 1000000.0d
      val (gd, gn, gm, gs) = got(d)
      assert(gd === d + 1L && gn === qs.length.toLong)
      assert(gm === mean, s"mean dim $d")
      assert(gs === std, s"std dim $d")
    }
  }

  test("standardize: per-dimension mean ≈ 0 and std ≈ 1; plan is a pure projection") {
    val model = Features.fitStandardizer(emb)
    val out = Features.standardize(emb, model)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"standardize must not shuffle:\n${plan.take(800)}")
    val check = Features.dimensionStats(
        out.select(col("standardized").as("embedding")), scale = 1000000L)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(check.forall { case (m, s) =>
      math.abs(m) < 1e-4 && math.abs(s - 1.0) < 1e-3
    }, s"standardized stats off: ${check.take(4).toSeq}")
  }

  test("fitStandardizer fails fast on a degenerate dimension") {
    val bad = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(2.0f, 5.0f)), (3L, Seq(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Features.fitStandardizer(bad))
    assert(e.getMessage.contains("degenerate"))
  }

  test("covarianceMatrix ≡ exact driver replay; diagonal ≡ dimensionStats variance") {
    val vecs = emb.select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val d = vecs.head.length
    val qs = vecs.map(v => v.map(x => math.floor(x * 1000000L + 0.5d).toLong))
    val n = qs.length
    val got = Features.covarianceMatrix(emb).orderBy("dim_i", "dim_j").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === d * (d + 1) / 2)
    for (i <- 0 until d; j <- i until d) {
      val pij = qs.map(q => q(i) * q(j)).sum
      val si = qs.map(_(i)).sum
      val sj = qs.map(_(j)).sum
      val cov = (n.toDouble * pij.toDouble - si.toDouble * sj.toDouble) /
        (n.toDouble * (n.toDouble - 1.0d)) / 1.0e12
      val (gn, gc) = got((i + 1L, j + 1L))
      assert(gn === n.toLong)
      assert(gc === cov, s"cov($i,$j)")
    }
    // Cross-check against the marginal census: Var(i) = Cov(i, i).
    val stds = Features.dimensionStats(emb).orderBy("dim").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for (i <- 1L to d.toLong) {
      val v = got((i, i))._2
      assert(math.abs(math.sqrt(v) - stds(i) * 1.0) < 1e-12, s"diag dim $i")
    }
  }

  test("jlProject ≡ driver replay of the signed integer sums; plan is one scan, no join") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val d = vecs.head._2.length
    def sign(a: Int, j: Int): Long =
      if (graft.functions.HashOps.h60(s"jl:$a:$j".getBytes("UTF-8")) % 2L == 0L) 1L else -1L
    val axes = 4
    val expected = (for {
      (id, v) <- vecs
      q = v.map(x => math.floor(x.toDouble * 1000000L + 0.5d).toLong)
      a <- 1 to axes
    } yield (id, a.toLong, (0 until d).map(j => q(j) * sign(a, j + 1)).sum)).toSet
    val got = Features.jlProject(emb, axes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // Signs differ across axes and dims (the matrix is not constant).
    assert((1 to axes).flatMap(a => (1 to d).map(j => sign(a, j))).toSet.size === 2)
    val p = Features.jlProject(emb, axes).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"JL projection must be join-free:\n${p.take(1200)}")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected one embeddings scan, got $scans")
  }

  test("covarianceMatrix fails fast on mixed dimensionality; plan has no join") {
    val mixed = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](Features.covarianceMatrix(mixed).collect())
    assert(e.getMessage.contains("dimensionality") ||
      Option(e.getCause).exists(_.getMessage.contains("dimensionality")))
    val p = Features.covarianceMatrix(emb).queryExecution.executedPlan.toString
    assert(!p.contains("Join"),
      s"covariance census must be one aggregator scan, not a pair join:\n${p.take(1200)}")
  }

  test("fitPcaTop/pcaProject ≡ exact integer driver replay; dominant axis found; join-free") {
    // Independent sequential replay of the whole integer pipeline
    // from the raw vectors: quantize → trunc-mean center → scatter →
    // shift pre-scale → 8 power rounds → project.
    val vecs = emb.filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.toArray.map(x =>
        math.floor(x.toDouble * 1000000L + 0.5d).toLong)) }
    val d = vecs.head._2.length
    val n = vecs.length.toLong
    val means = Array.tabulate(d)(j => vecs.map(_._2(j)).sum / n)
    val qc = vecs.map { case (id, q) =>
      (id, Array.tabulate(d)(j => q(j) - means(j))) }
    val scatter = Array.tabulate(d, d)((i, j) =>
      qc.map { case (_, v) => v(i) * v(j) }.sum)
    val maxAbs = scatter.flatten.map(math.abs).max
    val shift = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(maxAbs) - 30)
    val c = scatter.map(_.map(x => (if (x < 0) -1L else 1L) * (math.abs(x) >> shift)))
    var v = Array.fill(d)(1L)
    for (_ <- 1 to 8) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      val div = math.max(1L, m / 1048576L)
      v = w.map(x => (if (x < 0) -1L else 1L) * (math.abs(x) / div))
    }
    val expected = qc.map { case (id, q) =>
      (id, (0 until d).map(j => q(j) * v(j)).sum) }.toMap
    val model = Features.fitPcaTop(emb)
    assert(model.means.toSeq === means.toSeq)
    assert(model.axis.toSeq === v.toSeq)
    val proj = Features.pcaProject(emb, model)
    val got = proj.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
    // The projection scan is join-free over literal model arrays.
    val p = proj.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"pcaProject must be join-free:\n${p.take(1200)}")
    // Planted dominant direction: variance concentrated on one axis
    // pulls the fitted axis onto it.
    val planted = (0L until 40L).map { i =>
      (i, Seq.tabulate(4)(j =>
        if (j == 2) (if (i % 2 == 0) 0.9f else -0.9f) else 0.001f * i))
    }.toDF("vec_id", "embedding")
    val pm = Features.fitPcaTop(planted)
    assert(pm.axis.zipWithIndex.maxBy { case (a, _) => math.abs(a) }._2 === 2,
      pm.axis.mkString(","))
  }

  test("shingle_bucket_tokens ≡ conv(shingle_hex_tokens, 16, 10) % buckets") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions
    // The fused kernel must reproduce the hex-string chain bit-for-bit
    // (it IS what the DuckDB oracle replays for q152).
    val docs = Tables.documents(spark, sfDir).limit(200)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    for ((n, b) <- Seq((2, 8192), (3, 97), (1, 2))) {
      val diff = docs.select(
          GraftFunctions.shingle_bucket_tokens(col("toks"), n, b).as("fused"),
          transform(GraftFunctions.shingle_hex_tokens(col("toks"), n),
            h => pmod(conv(h, 16, 10).cast("long"), lit(b.toLong))).as("chain"))
        .filter(not(col("fused") === col("chain")))
        .count()
      assert(diff === 0L, s"fused bucket kernel diverged at n=$n buckets=$b")
    }
    // Degenerate parameters fail at construction on BOTH surfaces
    // (the SQL registration reaches the same expression constructor):
    // buckets = 0 would divide by zero per row, negative buckets
    // diverge from the conv/pmod chain.
    for (b <- Seq(0, -3)) {
      intercept[IllegalArgumentException](
        GraftFunctions.shingle_bucket_tokens(col("toks"), 2, b))
      intercept[Exception](
        spark.sql(s"SELECT shingle_bucket_tokens(array('a','b','c'), 2, $b)").collect())
    }
    intercept[IllegalArgumentException](
      GraftFunctions.shingle_bucket_tokens(col("toks"), 0, 8))
  }
}
