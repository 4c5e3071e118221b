package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Dedup operators vs an in-driver brute-force reference on the
  * sf0.001 corpus (500 docs — exact all-pairs fits in memory here;
  * in the engine itself it never would, which is the point of the
  * LSH/prefix plans under test). */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  /** All pairs (a<b) with set-Jaccard >= t, computed naively. */
  private def brute(threshold: Double): Set[(Long, Long, Double)] = {
    val sets = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSet }
      .sortBy(_._1)
    (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (ia, sa) = sets(i)
      (ib, sb) = sets(j)
      ov = (sa & sb).size
      jac = ov.toDouble / (sa.size + sb.size - ov)
      if jac >= threshold
    } yield (ia, ib, math.rint(jac * 10000) / 10000)).toSet
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("minhash+LSH near-dup pairs match brute force at 0.99") {
    assert(collectPairs(Dedup.minhashNearDupPairs(docs, 0.99)) == brute(0.99))
  }

  test("prefix-filter similarity join matches brute force at 0.9") {
    assert(collectPairs(Dedup.jaccardSimilarityJoin(docs, 0.9)) == brute(0.9))
  }

  test("prefix-filter similarity join matches brute force at 0.7") {
    // looser threshold -> longer prefixes, more cross-set candidates;
    // exercises the non-identical-pair path of the collapsed design.
    assert(collectPairs(Dedup.jaccardSimilarityJoin(docs, 0.7)) == brute(0.7))
  }

  test("exact dedup groups sum to the corpus size") {
    val g = Dedup.exactByFingerprint(docs)
    val (nGroups, total) = g.agg(count(lit(1)), sum("n_dups")).as[(Long, Long)].head()
    val n = docs.count()
    assert(total == n && nGroups <= n)
  }

  test("deltaIngest ≡ brute-force triage on random corpora; corpus side never sort-merges") {
    import org.scalacheck.Gen
    import graft.PropSampling
    val vocab = (1 to 6).map(i => s"w$i")
    val docGen = Gen.chooseNum(1, 8).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val t = 0.6
    for (texts <- PropSampling.sample(Gen.listOfN(40, docGen), n = 4)) {
      val all = texts.zipWithIndex.map { case (txt, i) => (i.toLong, txt) }
      val (deltaRows, corpusRows) = all.partition(_._1 % 5 == 0)
      def set(s: String): Set[String] = s.split(" ").toSet
      val expected = deltaRows.map { case (id, txt) =>
        val dSet = set(txt)
        val exact = corpusRows.filter(c => set(c._2) == dSet).map(_._1).sorted.headOption
        val near = corpusRows.iterator.map { case (cid, ctxt) =>
          val cSet = set(ctxt)
          val ov = (dSet & cSet).size.toDouble
          (cid, ov / (dSet.size + cSet.size - ov))
        }.filter(_._2 >= t).toSeq
        val bestNear = near.sortBy { case (cid, jr) => (-jr, cid) }.headOption
        exact match {
          case Some(m) => (id, "exact", Some(m), Some(1.0))
          case None => bestNear match {
            case Some((cid, jr)) =>
              (id, "near", Some(cid), Some(math.floor(jr * 10000.0 + 0.5) / 10000.0))
            case None => (id, "accepted", None, None)
          }
        }
      }.toSet
      val out = Dedup.deltaIngest(
        corpusRows.toDF("doc_id", "text"), deltaRows.toDF("doc_id", "text"), threshold = t)
      val got = out.collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
      assert(got === expected, s"triage diverged on: $all")
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"corpus side must join broadcast-only:\n${p.take(1500)}")
      // Float-boundary regression: exact Jaccard == threshold where
      // t*n computes one ULP high (0.55*100 = 55.000000000000007
      // in doubles). Without the 1e-9 slack the prefix shortens by
      // one and the length window fails — the qualifying pair
      // silently dropped. |corpus ∩ delta| = 55, |union| = 100.
      val bigDelta = Seq((1000L, (1 to 100).map(i => s"w$i").mkString(" ")))
      val bigCorpus = Seq((2000L, (1 to 55).map(i => s"w$i").mkString(" ")))
      val boundary = Dedup.deltaIngest(
          bigCorpus.toDF("doc_id", "text"), bigDelta.toDF("doc_id", "text"),
          threshold = 0.55)
        .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSeq
      assert(boundary === Seq((1000L, "near", 2000L)),
        s"exact-threshold pair must survive the float prunes: $boundary")

      // Oversized-delta guard: a bound below the delta size drops the
      // broadcast hints — same classification, shuffled joins.
      val big = Dedup.deltaIngest(
        corpusRows.toDF("doc_id", "text"), deltaRows.toDF("doc_id", "text"),
        threshold = t, maxBroadcastDelta = 1)
      val gotBig = big.collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
      assert(gotBig === expected, "guarded path must classify identically")
    }
  }

  test("corpusTriageScored ≡ deltaIngest on random corpora (independent orientations)") {
    import org.scalacheck.Gen
    import graft.PropSampling
    // Two INDEPENDENT implementations of the same triage — the
    // broadcast-probe model (stream orientation, r17) and the
    // join-based plan (q81 batch orientation) — must agree on every
    // exact/near routing and score. The probe's extra 'contained'
    // tier fires only where the join plan says 'accepted' (it sits
    // strictly below 'near' in precedence).
    val vocab = (1 to 6).map(i => s"w$i")
    val docGen = Gen.chooseNum(1, 8).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val t = 0.6
    for (texts <- PropSampling.sample(Gen.listOfN(40, docGen), n = 3)) {
      val all = texts.zipWithIndex.map { case (txt, i) => (i.toLong, txt) }
      val (deltaRows, corpusRows) = all.partition(_._1 % 5 == 0)
      val corpusDf = corpusRows.toDF("doc_id", "text")
      val deltaDf = deltaRows.toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq.sortBy(_._1)
      val joinForm = rows(Dedup.deltaIngest(corpusDf, deltaDf, threshold = t))
      val model = Dedup.fitCorpusTriage(corpusDf)
      val probeForm = rows(Dedup.corpusTriageScored(deltaDf, model,
        threshold = t, containThreshold = 0.8))
      assert(joinForm.map(_._1) === probeForm.map(_._1))
      var containedSeen = 0
      for ((j, p) <- joinForm.zip(probeForm)) p._2 match {
        case "exact" | "near" => assert(j === p, s"orientation divergence: $j vs $p")
        case "contained" =>
          containedSeen += 1
          assert(j._2 === "accepted",
            s"probe 'contained' must sit below the join plan's near tier: $j vs $p")
        case "accepted" => assert(j === p, s"orientation divergence: $j vs $p")
        case other => fail(s"unknown status $other")
      }
    }
  }

  test("containmentJoin ≡ brute-force directed containment; catches excerpts Jaccard misses") {
    import org.scalacheck.Gen
    import graft.PropSampling
    val vocab = (1 to 9).map(i => s"w$i")
    val docGen = Gen.chooseNum(1, 7).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val t = 0.6
    for (texts <- PropSampling.sample(Gen.listOfN(25, docGen), n = 4)) {
      val all = texts.zipWithIndex.map { case (txt, i) => (i.toLong, txt) }
      def set(s: String): Set[String] = s.split(" ").toSet
      val expected = (for {
        (ia, ta) <- all; (ib, tb) <- all if ia != ib
        ov = (set(ta) & set(tb)).size.toDouble
        cr = ov / set(ta).size
        if cr >= t
      } yield (ia, ib, math.floor(cr * 10000.0 + 0.5) / 10000.0)).toSet
      val got = Dedup.containmentJoin(all.toDF("doc_id", "text"), threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"containment diverged on $all")
    }
    // The asymmetric showcase: a half-excerpt is contained (1.0) in
    // its source while symmetric Jaccard sits at 0.5 and misses it.
    val pair = Seq((1L, "a b c d e f g h"), (2L, "a b c d"))
    val out = Dedup.containmentJoin(pair.toDF("doc_id", "text"), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set((2L, 1L, 1.0)))
    assert(Dedup.jaccardSimilarityJoin(pair.toDF("doc_id", "text"), threshold = 0.9)
      .collect().isEmpty, "symmetric Jaccard must miss the excerpt")
    // Exact float boundary, directed form: 0.6 * 5 = 3.0000000000000004
    // in doubles without the slack; |A|=5 sharing exactly 3 with B.
    val bnd = Seq((1L, "a b c d e"), (2L, "a b c x y z"))
    val gotB = Dedup.containmentJoin(bnd.toDF("doc_id", "text"), threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotB.contains((1L, 2L, 0.6)), s"boundary pair dropped: $gotB")
  }

  test("cross-source dup matrix ≡ brute-force fingerprint intersection; bounded by source pairs") {
    // Handwritten corpus: identical token SETS across sources (order
    // and multiplicity must not matter), a three-source fingerprint,
    // and a source with no cross-source dups at all.
    val rows = Seq(
      (1L, "s1", "a b c"), (2L, "s2", "c b a"), (3L, "s3", "b a c c"),
      (4L, "s1", "x y"), (5L, "s2", "y x"),
      (6L, "s1", "solo text one"), (7L, "s3", "unshared here"),
      (8L, "s4", "only s4 content"), (9L, "s4", "x y z")).toDF("doc_id", "source", "text")
    val got = Dedup.crossSourceDupMatrix(rows)
      .as[(String, String, Long)].collect().toSet
    // fp(a b c) in s1,s2,s3 -> 3 pairs; fp(x y) in s1,s2 -> 1 pair.
    val expected = Set(
      ("s1", "s2", 2L), // {a b c} and {x y}
      ("s1", "s3", 1L), ("s2", "s3", 1L))
    assert(got === expected, s"matrix diverged: $got")
    // Bound law on the real corpus: rows never exceed source-pairs.
    val nSrc = docs.select("source").distinct().count()
    val m = Dedup.crossSourceDupMatrix(docs)
    assert(m.count() <= nSrc * (nSrc - 1) / 2, "matrix exceeded the source-pair bound")
  }

  test("minhash signature values equal the per-permutation column form") {
    // The one-pass kernel must be bit-identical to the md5-derived
    // permutation scheme it replaced (engine-portability contract).
    val viaKernel = Dedup.minhashSignatures(docs.limit(20), 8)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    val hs = transform(array_distinct(split(col("text"), " ")),
      x => graft.functions.HashFunctions.h28(x))
    val sigCols = array((0 until 8).map(i =>
      array_min(transform(hs, h => graft.functions.HashFunctions.minhashPerm(h, i)))): _*)
    val viaColumns = docs.limit(20).select(col("doc_id"), sigCols.as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel == viaColumns)
  }

  test("editDistanceNearDup ≡ within-block brute force; blocking recall caveat; block guard") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // Three prefix families with in-family char noise; block key is
    // the first 2 words.
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma deltX"),
      (3L, "alpha beta totally different tail"), (4L, "omega psi one two"),
      (5L, "omega psi one twoo"), (6L, "lone prefix here"))
      .toDF("doc_id", "text")
    val got = Dedup.editDistanceNearDup(docs, maxEdits = 2, blockTokens = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma deltX"),
      (3L, "alpha beta totally different tail"), (4L, "omega psi one two"),
      (5L, "omega psi one twoo"), (6L, "lone prefix here"))
    def blk(t: String) = t.split(" ").take(2).mkString(" ")
    val expected = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && blk(a._2) == blk(b._2)
      e = lev(a._2, b._2) if e <= 2
    } yield (a._1, b._1, e.toLong)).toSet
    assert(got === expected && got === Set((1L, 2L, 1L), (4L, 5L, 1L)))
    // Blocking recall caveat, pinned: one edit INSIDE the prefix
    // moves the pair out of the block even at distance 1.
    val prefixEdit = Seq((1L, "alpha beta tail"), (2L, "alphaX beta tail"))
      .toDF("doc_id", "text")
    assert(Dedup.editDistanceNearDup(prefixEdit, maxEdits = 2, blockTokens = 2)
      .collect().isEmpty)
    // A boilerplate block past the cap fails fast instead of running n².
    val boiler = (1L to 10L).map(i => (i, s"same same tail$i")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.editDistanceNearDup(boiler, maxEdits = 2, blockTokens = 2,
        maxBlockSize = 4L).collect()
    }
    assert(e.getMessage.contains("editDistanceNearDup") ||
      Option(e.getCause).exists(_.getMessage.contains("editDistanceNearDup")))
  }

  test("winnowOverlapPairs: planted copied span aligns; noise scatters; stop-fingerprints drop") {
    import spark.implicits._
    // Docs 1 and 2 share a verbatim 12-token run (>= w+k-1 = 6, so
    // collisions are guaranteed), starting at gram position 3 in
    // doc 1 ("a b" precede) and 2 in doc 2 ("q" precedes) ->
    // expected dominant delta = 2 - 3 = -1. Doc 3 is unrelated.
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a b $span x y z"),
      (2L, s"q $span r"),
      (3L, "completely different words with no shared phrases at all")
    ).toDF("doc_id", "text")
    val got = Dedup.winnowOverlapPairs(docs, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length === 1, got.toSeq.toString)
    val (a, b, nShared, nAligned, delta) = got.head
    assert((a, b) === ((1L, 2L)))
    assert(delta === -1L, s"dominant offset must be the span alignment, got $delta")
    assert(nShared >= 2L && nAligned >= 2L && nAligned <= nShared)
    // Stop-fingerprint drop: a phrase shared by MANY docs is not
    // copy evidence — with maxBucket below the bucket size, the
    // ubiquitous span produces no pairs at all.
    val boiler = (1L to 6L).map(i => (i, s"pad$i $span tail$i")).toDF("doc_id", "text")
    assert(Dedup.winnowOverlapPairs(boiler, minShared = 1, maxBucket = 4)
      .collect().isEmpty)
    // ...and with the bucket cap above the group size the pairs appear.
    assert(Dedup.winnowOverlapPairs(boiler, minShared = 1, maxBucket = 64)
      .collect().nonEmpty)
  }
}
