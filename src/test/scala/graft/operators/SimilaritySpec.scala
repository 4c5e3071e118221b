package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** ANN quality: the approximate paths (LSH buckets, IVF probes) are
  * graded against the exact brute-force top-k on the same corpus —
  * the recall assertion VectorQueries promises. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  private lazy val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))

  test("exact top-k returns k neighbors per query") {
    assert(exact.size == 50)
  }

  test("LSH ANN recall vs exact") {
    val got = pairs(Similarity.lshAnn(emb, queries, k = 5, dim = 64, nPlanes = 6, nTables = 16))
    val recall = (got & exact).size.toDouble / exact.size
    // Multi-table union search: a true neighbor is missed only if it
    // hashes apart in every table. The floor is an empirical pin for
    // this corpus + plane family — below it the hashing regressed.
    assert(recall >= 0.45, s"LSH recall $recall")
    assert(got.size <= 50)
  }

  test("IVF ANN recall vs exact") {
    val got = pairs(Similarity.ivfAnn(emb, queries, k = 5, nCentroids = 16, nProbe = 4))
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("kCenterCoreset ≡ brute-force greedy FPS; trajectory non-increasing; deterministic") {
    import graft.functions.VectorFunctions.asDouble
    val got = Similarity.kCenterCoreset(emb, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // Brute-force greedy replay on collected vectors (sf fixture is
    // small): same seed, same d² spelling, same (md DESC, id) pick.
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val naa = vecs.map { case (_, v) => dot(v, v) }
    var sel = List(0) // index of min id
    val exp = scala.collection.mutable.ArrayBuffer(
      (1L, vecs(0)._1, Option.empty[Double]))
    for (rk <- 2 to 6) {
      val cand = vecs.indices.filterNot(sel.contains)
        .map { i =>
          val md = sel.map { j =>
            naa(i) - 2.0d * dot(vecs(i)._2, vecs(j)._2) + naa(j) }.min
          (md, vecs(i)._1, i)
        }
      val (md, id, idx) = cand.minBy { case (m, id0, _) => (-m, id0) }
      sel = idx :: sel
      exp += ((rk.toLong, id, Some(math.rint(md * 1e6) / 1e6)))
    }
    assert(got.toSeq === exp.toSeq)
    // Max-min distances are non-increasing (the FPS invariant).
    val ds = got.flatMap(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.toSeq.toString)
    // Pure function of the corpus: re-run reproduces exactly.
    val again = Similarity.kCenterCoreset(emb, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq === got.map(t => (t._1, t._2)).toSeq)
  }

  test("graph-ANN beam recall vs exact; determinism; fit guard trips") {
    val got = pairs(Similarity.graphAnnBeam(emb, queries, k = 5, m = 8,
      beam = 4, hops = 3))
    val recall = (got & exact).size.toDouble / exact.size
    // A 3-hop width-4 walk over an m=8 exact-kNN graph from a single
    // fixed entry: empirical floor for this corpus — below it the
    // graph build or the walk regressed.
    assert(recall >= 0.3, s"graph-ANN recall $recall")
    assert(got.size <= 50)
    // Pure function of (graph, entry, query): re-running the walk
    // must reproduce the pair set exactly.
    val again = pairs(Similarity.graphAnnBeam(emb, queries, k = 5, m = 8,
      beam = 4, hops = 3))
    assert(again === got)
    // More hops can only refine toward exact (never below the
    // 1-hop-from-entry baseline on this corpus).
    val oneHop = pairs(Similarity.graphAnnBeam(emb, queries, k = 5, m = 8,
      beam = 4, hops = 1))
    val r1 = (oneHop & exact).size.toDouble / exact.size
    assert(recall >= r1 - 1e-9, s"3-hop $recall vs 1-hop $r1")
    val e = intercept[IllegalArgumentException](
      Similarity.graphAnnBeam(emb, queries, k = 5, maxFitRows = 3))
    assert(e.getMessage.contains("exceeds 3 rows"))
  }

  test("LSH near-dup pairs ⊆ exact pairs, and catch every synthesized twin") {
    import graft.functions.VectorFunctions.asDouble
    // Twin construction mirrors q57: every 10th vector duplicated
    // with its first coordinate scaled — cosine ≥ ~0.995 by
    // construction, far above the corpus's natural ~0.6 ceiling.
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
    val twins = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) * lit(1.2)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = base.unionByName(twins)
    val lsh = Similarity.nearDupPairsLsh(corpus, threshold = 0.99, dim = 64)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val exactPairs = Similarity.nearDupPairs(corpus, threshold = 0.99)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exactPairs), "LSH must never invent a pair")
    val twinPairs = twins.select("vec_id").as[Long].collect()
      .map(t => (t - 1000000L, t)).toSet
    assert(twinPairs.subsetOf(exactPairs), "twin construction broke")
    assert(twinPairs.subsetOf(lsh),
      s"LSH missed twins: ${(twinPairs -- lsh).take(5)}")
  }

  test("nearDupPairsAuto routes by corpus size: exact below the bound, LSH above") {
    import graft.functions.VectorFunctions.asDouble
    // Same twin corpus as the LSH test — both routes must catch
    // every synthesized twin.
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
    val twins = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) * lit(1.2)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = base.unionByName(twins)
    val exactPairs = Similarity.nearDupPairs(corpus, threshold = 0.99)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // Below the bound: the auto route IS the exact plan — identical
    // pair set, and the physical plan contains the all-pairs
    // nested-loop join.
    val small = Similarity.nearDupPairsAuto(corpus, threshold = 0.99, dim = 64)
    assert(small.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet === exactPairs)
    assert(small.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "small corpus should take the exact all-pairs plan")
    // Above the (forced-tiny) bound: the LSH plan runs instead — no
    // nested-loop join anywhere in the physical plan — and still
    // catches every twin with no invented pairs.
    val routed = Similarity.nearDupPairsAuto(corpus, threshold = 0.99, dim = 64,
      maxExactRows = 10)
    assert(!routed.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "large corpus must not plan the quadratic self-join")
    val routedPairs = routed.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(routedPairs.subsetOf(exactPairs), "routed path must never invent a pair")
    val twinPairs = twins.select("vec_id").as[Long].collect()
      .map(t => (t - 1000000L, t)).toSet
    assert(twinPairs.subsetOf(routedPairs),
      s"routed path missed twins: ${(twinPairs -- routedPairs).take(5)}")
  }

  test("semantic blocking ⊆ exact pairs, catches every twin, and never plans all-pairs") {
    import graft.functions.VectorFunctions.asDouble
    // Same twin corpus as the LSH test — centroid blocking is the
    // third scale path and must pass the same containment + recall
    // gates.
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
    val twins = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) * lit(1.2)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = base.unionByName(twins)
    val blocked = Similarity.semanticBlockedPairs(corpus, threshold = 0.99,
      nCentroids = 16, nAssign = 2)
    val p = blocked.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "blocking must never plan the quadratic self-join")
    // The only permitted nested loops are the one-row broadcast
    // centroid-array attaches (O(n); the self-join references the
    // un-reused assignment lineage once per side, so the attach
    // appears twice). The candidate stage itself stays equi-join.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"unexpected nested-loop joins:\n${p.take(2000)}")
    val got = blocked.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val exactPairs = Similarity.nearDupPairs(corpus, threshold = 0.99)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exactPairs), "blocking must never invent a pair")
    val twinPairs = twins.select("vec_id").as[Long].collect()
      .map(t => (t - 1000000L, t)).toSet
    assert(twinPairs.subsetOf(got),
      s"blocking missed twins: ${(twinPairs -- got).take(5)}")
    // Top-1 assignment is strictly coarser: still contained in the
    // exact set, never larger than the top-2 result.
    val top1 = Similarity.semanticBlockedPairs(corpus, threshold = 0.99,
        nCentroids = 16, nAssign = 1)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(top1.subsetOf(got), "top-1 blocks must be a subset of top-2 blocks")
  }

  test("trained-centroid blocking ⊆ exact pairs, catches every twin, no all-pairs plan") {
    import graft.functions.VectorFunctions.asDouble
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
    val twins = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) * lit(1.2)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = base.unionByName(twins)
    val model = Clustering.fit(corpus, k = 8, iters = 2)
    val blocked = Similarity.semanticBlockedPairsWithModel(corpus, threshold = 0.99,
      model = model, nAssign = 2)
    val p = blocked.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "trained blocking must never plan the quadratic self-join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "trained centroids are plan literals — no attach join at all:\n" + p.take(1200))
    val got = blocked.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val exactPairs = Similarity.nearDupPairs(corpus, threshold = 0.99)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exactPairs), "trained blocking must never invent a pair")
    val twinPairs = twins.select("vec_id").as[Long].collect()
      .map(t => (t - 1000000L, t)).toSet
    assert(twinPairs.subsetOf(got),
      s"trained blocking missed twins: ${(twinPairs -- got).take(5)}")
  }

  test("brute force matches a driver-side exact computation") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = (for (q <- 0L until 10L) yield {
      val top = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).map(_._1)
      top.map(n => (q, n))
    }).flatten.toSet
    assert(exact == expect)
  }

  test("lshRecallAudit ≡ intersection of the two paths it audits; zero-hit probes still emit") {
    val k = 10
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k))
    val ann = pairs(Similarity.lshAnn(emb, queries, k, dim = 64, nPlanes = 6, nTables = 16))
    val expect = (0L until 10L).map { q =>
      q -> (exact.filter(_._1 == q) intersect ann.filter(_._1 == q)).size.toLong
    }.toMap
    val got = Similarity.lshRecallAudit(emb, queries, k, dim = 64, nPlanes = 6, nTables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 10)
    assert(got.map(g => g._1 -> g._2).toMap === expect, "audit hits ≠ path intersection")
    // recall denominates by ground-truth size (= k here, corpus >> k)
    assert(got.forall { case (_, h, t, r) =>
      t === k.toLong && r === h.toDouble / t && r >= 0.0 && r <= 1.0 })
    // a probe with fewer than k eligible neighbors can still score
    // 1.0: identical vectors share every LSH bucket, so a 6-clone
    // corpus yields full candidate sets and ground truth of size 5
    val one = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0)
    import spark.implicits._
    val clones = (0L until 6L).map(i => (i, one)).toDF("vec_id", "embedding")
    val tinyAudit = Similarity.lshRecallAudit(clones, clones, k, dim = 64,
        nPlanes = 6, nTables = 16)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(tinyAudit.forall { case (h, t, r) => t === 5L && h === 5L && r === 1.0 },
      s"clone corpus must audit at perfect recall over 5-truth: ${tinyAudit.toSeq}")
  }

  test("maxSimTopK ≡ driver-side replay; an exact duplicate scores the per-token maximum") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def maxsim(q: Array[Double], c: Array[Double]): Double =
      (0 until 8).map { i =>
        (0 until 8).map { j =>
          cos(q.slice(i * 8, i * 8 + 8), c.slice(j * 8, j * 8 + 8))
        }.max
      }.sum
    val expect = (for (q <- 0L until 4L) yield {
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, maxsim(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex.map { case ((id, _), r) => (q, r + 1, id) }
    }).flatten.toSet
    val got = Similarity.maxSimTopK(emb, queries.filter(col("vec_id") < 4), k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(got === expect, "MaxSim diverged from the sequential replay")
    // an exact duplicate of the query scores exactly nTok (each token
    // matches itself at cosine 1) and outranks everything
    val dup = emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.unionByName(dup)
    val top = Similarity.maxSimTopK(withDup, withDup.filter(col("vec_id") === 0L), k = 1)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    assert(top === Array((999999L, 8.0)), s"duplicate should top out at 8.0: ${top.toSeq}")
  }

  test("tripletMine ≡ driver-side replay: 1 same-label positive + k cross-label hard negatives") {
    val rows = emb.select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, l) => (id, v.map(_.toDouble).toArray, l) }
    val vecs = rows.map(r => r._1 -> r._2).toMap
    val labels = rows.map(r => r._1 -> r._3).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val kNeg = 5
    val expect = (for (q <- 0L until 8L) yield {
      val scored = rows.filter(_._1 != q)
        .map { case (id, v, l) => (id, cos(vecs(q), v), l == labels(q)) }
        .sortBy { case (id, s, _) => (-s, id) }
      val pos = scored.filter(_._3).take(1).map(t => (q, "pos", t._1))
      val neg = scored.filterNot(_._3).take(kNeg).map(t => (q, "neg", t._1))
      pos ++ neg
    }).flatten.toSet
    val got = Similarity.tripletMine(emb, queries.filter(col("vec_id") < 8), kNeg)
      .select("query_id", "role", "neighbor_id").as[(Long, String, Long)]
      .collect().toSet
    assert(got === expect, "triplet mining diverged from the sequential replay")
    // structural claims: every anchor mines exactly 1 positive and
    // kNeg negatives; positives share the anchor's label, negatives don't
    assert(got.count(_._2 == "pos") === 8)
    assert(got.count(_._2 == "neg") === 8 * kNeg)
    assert(got.filter(_._2 == "pos").forall(t => labels(t._3) == labels(t._1)))
    assert(got.filter(_._2 == "neg").forall(t => labels(t._3) != labels(t._1)))
  }

  test("mmrSelect: λ=1 ≡ relevance ranking; duplicates are deferred; greedy ≡ reference; guard trips") {
    import spark.implicits._
    // Shortlist with an exact duplicate of the most relevant item:
    // plain ranking puts the twin at rank 2, MMR at λ=0.5 defers it.
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val short = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),   // relevance 1.0
      (2L, Seq(1.0, 0.0, 0.0, 0.0)),   // exact duplicate of 1
      (3L, Seq(0.6, 0.8, 0.0, 0.0)),   // relevant but novel
      (4L, Seq(0.0, 0.0, 1.0, 0.0)))   // orthogonal
      .toDF("vec_id", "embedding")
    val plain = Similarity.mmrSelect(short, q, k = 4, lambda = 1.0)
    assert(plain.map(_.id) === Seq(1L, 2L, 3L, 4L),
      "λ=1 must reproduce the (relevance desc, id) ranking")
    // λ=0.4: after the top pick, the duplicate's novelty penalty
    // (max-sim 1.0) outweighs its relevance, the orthogonal doc wins
    // round 2, the novel-but-related doc round 3, the duplicate last.
    // (λ=0.5 on this fixture ties every marginal score at 0 — the
    // degenerate point where MMR decides by id alone.)
    val div = Similarity.mmrSelect(short, q, k = 4, lambda = 0.4)
    assert(div.head.id === 1L, "first pick is always the most relevant")
    assert(div.map(_.id) === Seq(1L, 4L, 3L, 2L),
      s"duplicate must be deferred to the end: ${div.map(_.id)}")
    assert(div.map(_.rank) === Seq(1, 2, 3, 4))
    // Greedy reference replay on a less structured shortlist.
    val vecs = Map(
      10L -> Seq(0.9, 0.1, 0.0), 11L -> Seq(0.8, 0.2, 0.1),
      12L -> Seq(0.1, 0.9, 0.2), 13L -> Seq(0.2, 0.1, 0.9))
    val q2 = Seq(1.0, 0.2, 0.1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val lam = 0.7
    var pickedRef = Seq.empty[Long]
    for (_ <- 1 to 3) {
      val best = vecs.keys.toSeq.filterNot(pickedRef.contains).map { id =>
        val nov = if (pickedRef.isEmpty) 0.0
          else pickedRef.map(p => cos(vecs(id), vecs(p))).max
        (-(lam * cos(vecs(id), q2) - (1 - lam) * nov), id)
      }.min._2
      pickedRef :+= best
    }
    val got = Similarity.mmrSelect(vecs.toSeq.toDF("vec_id", "embedding"), q2,
      k = 3, lambda = lam)
    assert(got.map(_.id) === pickedRef, s"greedy trace diverged: ${got.map(_.id)} vs $pickedRef")
    // Oversized shortlist fails fast instead of collecting the corpus.
    val e = intercept[IllegalArgumentException](
      Similarity.mmrSelect(short, q, k = 2, lambda = 0.5, maxShortlist = 3))
    assert(e.getMessage.contains("maxShortlist") || e.getMessage.contains("shortlist"))
  }

  test("mutualKnn ≡ brute-force reciprocity; a one-way hub edge never survives") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir).limit(60)
    val k = 4
    val knn = Similarity.bruteForceTopK(emb, emb, k)
    val directed = knn.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.mutualKnn(knn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ranks = knn.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue).toMap
    val expected = directed.filter { case (a, b) =>
      a < b && directed.contains((b, a))
    }.map { case (a, b) => (a, b, ranks((a, b)), ranks((b, a))) }
    assert(got.toSet === expected, "mutual pairs diverged from directed reciprocity")
    assert(got.nonEmpty, "fixture produced no mutual pairs — weaken k")
    // Every surviving pair is reciprocal by construction; a directed
    // edge whose reverse is missing must not appear.
    val oneWay = directed.collectFirst {
      case (a, b) if a < b && !directed.contains((b, a)) => (a, b)
    }
    for ((a, b) <- oneWay)
      assert(!got.exists(p => p._1 == a && p._2 == b), s"one-way edge ($a,$b) survived")
    // Composability: any (query_id, neighbor_id, rank) frame works —
    // a hand-built asymmetric list keeps only its reciprocal pair.
    val hand = Seq((1L, 2L, 1L), (2L, 1L, 2L), (1L, 3L, 2L), (3L, 4L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    val handGot = Similarity.mutualKnn(hand).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(handGot.toSeq === Seq((1L, 2L, 1L, 2L)))
  }

  test("labelConsistency: clean clusters agree fully; a planted mislabel is the suspect") {
    import spark.implicits._
    // Two tight, well-separated clusters of 4; vec 7 sits in cluster
    // B geometrically but carries cluster A's label.
    def v(base: Array[Float], j: Int): Array[Float] =
      base.zipWithIndex.map { case (x, i) => x + (if (i == j % 4) 0.01f else 0f) }
    val cA = Array(10f, 0f, 0f, 0f); val cB = Array(0f, 10f, 0f, 0f)
    val rows = (0 until 4).map(j => (j.toLong, v(cA, j), "A")) ++
      (4 until 7).map(j => (j.toLong, v(cB, j), "B")) :+
      ((7L, v(cB, 3), "A"))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.labelConsistency(
        Similarity.bruteForceTopK(emb, emb, k = 3),
        emb.select("vec_id", "label"), k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    (0L until 4L).foreach(i => assert(got(i) === ((10000L, false)), s"clean A $i"))
    (4L until 7L).foreach(i =>
      assert(got(i)._1 <= 6666L, s"B members see the intruder: $i ${got(i)}"))
    assert(got(7L) === ((0L, true)), "the planted mislabel must be the suspect")
  }

  test("truncationAudit: full dims ≡ perfect recall; truncation to 16 dims loses some") {
    val probes = emb.filter(col("vec_id") < 10)
    val full = Similarity.truncationAudit(emb, probes, k = 5, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(full.forall(_._2 == 10000L),
      s"dims=64 is the identity transform — recall must be exactly 1: ${full.toSeq}")
    val cut = Similarity.truncationAudit(emb, probes, k = 5, dims = 16)
      .collect().map(_.getLong(3))
    assert(cut.exists(_ < 10000L),
      "random 64-dim embeddings truncated to 16 must lose some neighbors")
  }

  test("marginMine ≡ driver-side replay of the ratio-margin pipeline") {
    // Deterministic 12-vector fixture, sides by parity.
    val vecs = (0L until 12L).map(id =>
      (id, Array.tabulate(4)(j => (((id * 7 + j * 13) % 10) - 4.5).toFloat)))
    val k = 2
    val minMargin = 0.8
    // Replay with the engine's own arithmetic: sequential dot,
    // FLOOR(sim·1e8) longs, (2k·sim·1e8)/Σ doubles.
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.iterator.zip(y.iterator).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val aSide = vecs.filter(_._1 % 2 == 0)
    val bSide = vecs.filter(_._1 % 2 == 1)
    val scoredR = for ((ai, av) <- aSide; (bi, bv) <- bSide)
      yield (ai, bi, cos(av, bv))
    def topk(rows: Seq[(Long, Long, Double)]) =
      rows.groupBy(_._1).view.mapValues(
        _.sortBy { case (_, id, s) => (-s, id) }.take(k)).toMap
    val fwd = topk(scoredR)
    val bwd = topk(scoredR.map { case (a, b, s) => (b, a, s) })
    def floorSum(rows: Seq[(Long, Long, Double)]): Long =
      rows.map { case (_, _, s) => math.floor(s * 1e8).toLong }.sum
    val expected = fwd.toSeq.flatMap { case (a, cands) =>
      val withMargin = cands.map { case (_, b, s) =>
        val den = (floorSum(fwd(a)) + floorSum(bwd(b))).toDouble
        (b, s, 2.0 * k * s * 1e8 / den)
      }
      val (b, s, m) = withMargin.minBy { case (bid, _, mm) => (-mm, bid) }
      if (m >= minMargin) Some((a, b,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }.sortBy(_._1)
    val df = vecs.toDF("vec_id", "embedding")
    val p = Similarity.prepared(df)
    val a = p.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("vec").as("av"), col("norm").as("an"))
    val b = p.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("b_id"), col("vec").as("bv"), col("norm").as("bn"))
    val scored = a.crossJoin(b).select(col("a_id"), col("b_id"),
      graft.functions.VectorFunctions.cosinePrenormed(
        graft.functions.VectorFunctions.dot(col("av"), col("bv")),
        col("an"), col("bn")).as("sim_raw"))
    val got = Similarity.marginMine(scored, k, minMargin).orderBy("a_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === expected)
  }

  test("spreadSmall: widens narrow leaves, passes shuffled frames through, submits NO job") {
    val width = spark.sessionState.conf.numShufflePartitions
    // A single-file parquet scan (documents is one file at test SFs)
    // behind a broadcast join must still be detected as narrow even
    // though the broadcast side contains a shuffle.
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val dim = docs.groupBy(length(col("text")).as("len")).count()
    val joined = docs.join(broadcast(dim), length(col("text")) === dim("len"))
    // A post-shuffle frame is conf-wide: pass through untouched (eq).
    val shuffled = docs.repartition(width, col("doc_id"))
    // Job-count listener: the probe must be strictly plan-only — the
    // r12 formulation (df.rdd under AQE) submitted and awaited every
    // upstream shuffle stage at probe time.
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val sDocs = Similarity.spreadSmall(docs)
      val sJoin = Similarity.spreadSmall(joined)
      val sWide = Similarity.spreadSmall(shuffled)
      Thread.sleep(500) // listener events are async; let the bus drain
      assert(jobs === 0, "spreadSmall probe submitted a Spark job")
      assert(sWide eq shuffled, "post-shuffle frame must pass through untouched")
      assert(sDocs ne docs, "single-file scan must be spread")
      assert(sJoin ne joined, "broadcast join over a single-file scan must be spread")
      assert(sDocs.rdd.getNumPartitions === width)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("ivfMergeDelta ≡ full re-index under the frozen model; standing index untouched; PQ twin") {
    // The no-refit contract: centroids fit on STANDING only, delta
    // merged in — must equal indexing standing ∪ delta under the
    // same frozen model (assignment is deterministic per row), and
    // must NOT equal a refit index (centroids would move).
    val standing = emb.filter(col("vec_id") % 13 =!= 0)
    val delta = emb.filter(col("vec_id") % 13 === 0)
    val cents = Similarity.ivfCentroids(standing, nCentroids = 16)
    val index = Similarity.ivfIndex(standing, cents).localCheckpoint(true)
    val merged = Similarity.ivfMergeDelta(index, delta, cents)
      .as[(Long, Int)].collect().toMap
    val full = Similarity.ivfIndex(emb, cents).as[(Long, Int)].collect().toMap
    assert(merged === full, "merge diverged from frozen-model re-index")
    assert(merged.size === emb.count())
    // Standing rows pass through the merge byte-identically.
    val standingIdx = index.as[(Long, Int)].collect().toMap
    standingIdx.foreach { case (id, cid) => assert(merged(id) === cid) }
    // Fixture sanity: the delta must actually spread over >1 list.
    val deltaLists = delta.select("vec_id").as[Long].collect()
      .map(merged).toSet
    assert(deltaLists.size > 1, "degenerate fixture: all delta in one list")
    // Serving (r17 q237): top-k over the MERGED index ≡ top-k over a
    // full frozen-model re-index, and delta vectors are immediately
    // retrievable as neighbors.
    val mergedIdx = Similarity.ivfMergeDelta(index, delta, cents)
    val servedMerged = Similarity.ivfAnnWithIndex(emb, mergedIdx, cents,
      queries, k = 5, nProbe = 4)
    val servedRebuilt = Similarity.ivfAnnWithIndex(emb,
      Similarity.ivfIndex(emb, cents), cents, queries, k = 5, nProbe = 4)
    assert(pairs(servedMerged) === pairs(servedRebuilt),
      "serving over the merged index diverged from a frozen-model rebuild")
    val deltaIds = delta.select("vec_id").as[Long].collect().toSet
    assert(pairs(servedMerged).exists { case (_, n) => deltaIds(n) },
      "degenerate fixture: no delta vector retrievable as a neighbor")
    // PQ twin: a delta encoded under FROZEN codebooks unioned with
    // the standing codes ≡ encoding the full corpus with the model.
    val pq = Quantization.fitPq(standing, m = 8, ksub = 8, iters = 1)
    val mergedCodes = Quantization.encodePq(standing, pq)
      .unionByName(Quantization.encodePq(delta, pq))
      .as[(Long, Seq[Int])].collect().toMap
    val fullCodes = Quantization.encodePq(emb, pq).as[(Long, Seq[Int])].collect().toMap
    assert(mergedCodes === fullCodes, "PQ delta encode diverged from full encode")
  }

  test("ivfServeBroadcast ≡ ivfAnnWithIndex on the same merged index; fit guard fires") {
    // The r18 q240 serving kernel: the broadcast-probe path must be
    // BIT-identical to the declarative join path — ranks, neighbor
    // ids, AND rounded sims.
    val standing = emb.filter(col("vec_id") % 13 =!= 0)
    val delta = emb.filter(col("vec_id") % 13 === 0)
    val cents = Similarity.ivfCentroids(standing, nCentroids = 16)
    val merged = Similarity.ivfMergeDelta(
      Similarity.ivfIndex(standing, cents), delta, cents)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"),
          col("rank").cast("int"), col("sim"))
        .as[(Long, Long, Int, Double)].collect().toSet
    val viaJoin = rows(Similarity.ivfAnnWithIndex(emb, merged, cents,
      queries, k = 5, nProbe = 4))
    val viaBroadcast = rows(Similarity.ivfServeBroadcast(emb, merged, cents,
      queries, k = 5, nProbe = 4))
    assert(viaBroadcast === viaJoin,
      "broadcast serve diverged from the declarative index join")
    // Fail-fast guard: an over-bound index must refuse, not OOM.
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfServeBroadcast(emb, merged, cents, queries,
        k = 5, nProbe = 4, maxFitRows = 3)
    }
    assert(ex.getMessage.contains("sharded"))
  }

  test("crossEncoderRerank: injected encoder drives ranks; k cut; id tie-break") {
    import spark.implicits._
    val texts = Seq(
      (0L, "q query text"),
      (1L, "high"), (2L, "mid"), (3L, "low"), (4L, "mid")) // 2 and 4 tie
      .toDF("doc_id", "text")
    val cands = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("query_id", "cand_id")
    // Seam proof: a mock encoder scoring by DOC text alone — the
    // rerank must honor whatever the injected model returns.
    val mock = new Similarity.CrossEncoder {
      override def score(query: String, doc: String): Double = doc match {
        case "high" => 0.9
        case "mid"  => 0.5
        case _      => 0.1
      }
    }
    val got = Similarity.crossEncoderRerank(cands, texts, mock, k = 3)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (0L, 1L, 1, 0.9), (0L, 2L, 2, 0.5), (0L, 4L, 3, 0.5)),
      "rank by injected score desc, cand_id asc tie-break, k=3 cut drops the 0.1")
    // The deterministic lexical stand-in: exact e9-truncated F1s.
    val e = Similarity.LexicalOverlapEncoder
    assert(e.score("a b c", "b c d") === math.floor(2.0e9 * 2 / 6) / 1e9)
    assert(e.score("a a b", "a b") === 1.0)    // distinct-unigram sets
    assert(e.score("", "a b") === 0.0)
    assert(e.score("a", "b") === 0.0)
  }
}
