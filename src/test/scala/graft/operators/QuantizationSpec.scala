package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Product-quantization properties beyond the q103 hash gate. */
class QuantizationSpec extends SparkSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)
  private lazy val model = Quantization.fitPq(emb, m = 8, ksub = 8, iters = 1)

  test("fitPq shape: 8 subspaces x 8 codes x 8 dims, deterministic across fits") {
    assert(model.m === 8 && model.dsub === 8)
    assert(model.codebooks.length === 8)
    assert(model.codebooks.forall(cb => cb.length === 8 && cb.forall(_.length === 8)))
    val again = Quantization.fitPq(emb, m = 8, ksub = 8, iters = 1)
    assert(again === model, "fit must be bit-deterministic")
  }

  test("encodePq: m codes per row, all in 1..ksub, matches a driver-side argmin") {
    val enc = Quantization.encodePq(emb, model).collect()
    assert(enc.length === emb.count())
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for (row <- enc.take(25)) {
      val codes = row.getSeq[Int](1)
      assert(codes.length === 8 && codes.forall(c => c >= 1 && c <= 8))
      val v = vecs(row.getLong(0))
      for (j <- 0 until 8) {
        val sub = v.slice(j * 8, j * 8 + 8)
        // Same metric as the plan expression: |s|^2 - 2 s·c + |c|^2,
        // left-to-right doubles, tie by smaller cid.
        def dot(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0d; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }; s
        }
        val best = model.codebooks(j).zipWithIndex.map { case (c, i) =>
          (dot(sub, sub) - 2.0d * dot(sub, c.toArray) + dot(c.toArray, c.toArray), i + 1)
        }.min
        assert(codes(j) === best._2,
          s"vec ${row.getLong(0)} subspace $j: plan code ${codes(j)} != driver argmin ${best._2}")
      }
    }
  }

  test("adcTopK: a query's own vector is always among the minimum-distance rows") {
    // ADC distance depends only on the CANDIDATE's codes, and the
    // query's own codes are the per-subspace argmin against the
    // query — so no candidate can score strictly below the query
    // itself. With ties broken by id, the self row surfaces at rank
    // 1 whenever the query id is the smallest among tied minima.
    val queries = emb.filter(pmod(col("vec_id"), lit(97)) === 0)
    val top = Quantization.adcTopK(emb, queries, model, k = 5)
    val byQuery = top.collect().groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    for ((qid, rows) <- byQuery) {
      val sorted = rows.sortBy(_.getInt(2))
      val minDist = sorted.head.getDouble(3)
      val selfRow = sorted.find(_.getLong(1) == qid)
      assert(selfRow.isDefined, s"query $qid: self not in top-5")
      assert(selfRow.get.getDouble(3) === minDist,
        s"query $qid: self adist ${selfRow.get.getDouble(3)} above the minimum $minDist")
    }
  }

  test("ivfPqTopK: every neighbor lives in one of its query's probed lists") {
    // Independent replay of the routing through the PUBLIC coarse
    // APIs: fit the same seed-only coarse model, assign the corpus
    // with assignWithModel (the shared-metric scorer), and compute
    // each query's nProbe nearest lists driver-side. Every reported
    // neighbor must belong to a probed list — the inverted-file
    // contract that gives IVF-PQ its ~nProbe/nCoarse scan shape.
    val queries = emb.filter(pmod(col("vec_id"), lit(97)) === 0)
    val top = Quantization.ivfPqTopK(emb, queries, k = 5,
      nCoarse = 16, nProbe = 4, m = 8, ksub = 8, iters = 1).collect()
    assert(top.nonEmpty)
    val coarse = Clustering.fit(emb, k = 16, iters = 0)
    val listOf = Clustering.assignWithModel(emb, coarse)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cents = coarse.centroids.sortBy(_._1).map(_._2.toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val qvecs = queries.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val probed = qvecs.map { case (qid, v) =>
      qid -> cents.zipWithIndex
        .map { case (c, i) => (dot(v, v) - 2.0d * dot(v, c) + dot(c, c), i + 1) }
        .sorted.take(4).map(_._2).toSet
    }
    for (row <- top) {
      val (qid, nid) = (row.getLong(0), row.getLong(1))
      assert(probed(qid).contains(listOf(nid)),
        s"query $qid: neighbor $nid from unprobed list ${listOf(nid)} (probed ${probed(qid)})")
    }
  }

  test("PQ and IVF-PQ recall@5 against exact euclidean top-5 is usable") {
    // Collapse floor, not a tuning target: the fixture vectors are
    // near-uniform, so distances CONCENTRATE and recall@5 plateaus
    // around 0.33-0.37 no matter the codebook budget (measured:
    // ksub 8→32, iters 1→3 all land there — the information just
    // isn't in 24-bit codes for this distribution; real embedding
    // corpora are far more clusterable). Random guessing would score
    // 5/500 = 0.01, so a floor well above chance still catches a
    // silent metric or codebook regression that the hash gates
    // (which pin the model's own output, right or wrong) cannot.
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sqd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val queries = emb.filter(pmod(col("vec_id"), lit(97)) === 0)
    val qids = queries.select("vec_id").collect().map(_.getLong(0))
    val exact = qids.map { qid =>
      qid -> vecs.toSeq.map { case (id, v) => (sqd(vecs(qid), v), id) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    def recall(res: Array[org.apache.spark.sql.Row]): Double = {
      val byQ = res.groupBy(_.getLong(0))
      val hits = qids.map(q => byQ.getOrElse(q, Array.empty)
        .count(r => exact(q).contains(r.getLong(1)))).sum
      hits.toDouble / (qids.length * 5)
    }
    val pq = recall(Quantization.adcTopK(emb, queries, model, k = 5).collect())
    val ivf = recall(Quantization.ivfPqTopK(emb, queries, k = 5,
      nCoarse = 16, nProbe = 4, m = 8, ksub = 8, iters = 1).collect())
    assert(pq >= 0.2, s"flat PQ recall@5 collapsed: $pq")
    assert(ivf >= 0.15, s"IVF-PQ recall@5 collapsed: $ivf")
  }

  test("adcTopK ranks are dense 1..k with adist non-decreasing") {
    val queries = emb.filter(pmod(col("vec_id"), lit(97)) === 0)
    val top = Quantization.adcTopK(emb, queries, model, k = 5).collect()
    for ((_, rows) <- top.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to sorted.length))
      val dists = sorted.map(_.getDouble(3)).toSeq
      assert(dists === dists.sorted, s"adist not monotone: $dists")
    }
  }

  test("adcRerankTopK: results ⊆ shortlist, exactly re-ordered by true cosine, self on top") {
    val queries = emb.filter(pmod(col("vec_id"), lit(97)) === 0)
    val kShort = 25
    val short = Quantization.adcTopK(emb, queries, model, k = kShort)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val rr = Quantization.adcRerankTopK(emb, queries, model, kShort = kShort, k = 5)
      .collect().groupBy(_.getLong(0))
    assert(rr.keySet === short.keySet)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    for ((qid, rows) <- rr) {
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to sorted.length))
      assert(sorted.forall(r => short(qid).contains(r.getLong(1))),
        s"query $qid: re-ranked neighbor outside the ADC shortlist")
      // Rank 1 is the query itself at cosine 1 (the shortlist always
      // carries it — see the adcTopK self-minimality test).
      assert(sorted.head.getLong(1) === qid && sorted.head.getDouble(3) === 1.0d)
      // The top-5 must be the shortlist's true-cosine top-5 (exact
      // driver-side replay: corpus-vec-first dot, raw-sim order,
      // id tiebreak), i.e. stage 2 really re-decides stage 1's order.
      val exactTop = short(qid).toSeq.map { id =>
        val (q, c) = (vecs(qid), vecs(id))
        val sim = dot(c, q) / (math.sqrt(dot(c, c)) * math.sqrt(dot(q, q)))
        (-sim, id)
      }.sorted.take(5).map(_._2)
      assert(sorted.map(_.getLong(1)).toSeq === exactTop,
        s"query $qid: re-rank order diverged from exact shortlist cosine")
    }
  }

  test("pqCodeNearDup: finds most synthesized twins, only twins, verified ≥ threshold; bucket guard trips") {
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val twins = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) * lit(1.2)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = base.unionByName(twins)
    val m = Quantization.fitPq(corpus, m = 8, ksub = 8, iters = 1)
    val pairs = Quantization.pqCodeNearDup(corpus, m, threshold = 0.99).collect()
    val nTwins = twins.count()
    assert(pairs.nonEmpty && pairs.length <= nTwins)
    // Every found pair is an (original, its twin) pair at sim ≥ .99 —
    // the near-orthogonal fixture has no other >0.99 neighbors.
    for (r <- pairs) {
      assert(r.getLong(1) === r.getLong(0) + 1000000L,
        s"non-twin pair (${r.getLong(0)}, ${r.getLong(1)}) survived the verify")
      assert(r.getDouble(2) >= 0.99)
    }
    // Blocking recall floor: most twins share all 8 sub-codes
    // (measured 47/50 at this fixture; a codebook/metric regression
    // collapses this).
    assert(pairs.length.toDouble / nTwins >= 0.8,
      s"compressed-domain recall collapsed: ${pairs.length}/$nTwins")
    // Over-collapsed bucket fails fast, never runs the n² verify.
    val clones = base.limit(1).select(lit(1L).as("vec_id"), col("embedding"))
      .unionByName(base.limit(1).select(lit(2L).as("vec_id"), col("embedding")))
      .unionByName(base.limit(1).select(lit(3L).as("vec_id"), col("embedding")))
    val e = intercept[IllegalArgumentException](
      Quantization.pqCodeNearDup(clones, m, threshold = 0.99, maxBucketSize = 2))
    assert(e.getMessage.contains("over-collapses"))
  }
}
