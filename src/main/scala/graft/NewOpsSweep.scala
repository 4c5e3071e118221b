package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: disjoint-replica wall-time sweep of the round-10 heavy
  * additions — q105 triangle census, q107 PQ re-rank, q111
  * compressed-domain dedup — the runtime companion of the in-suite
  * count gates (`CandidateLinearitySpec`).
  *
  * Scaling model per family:
  *  - graph: m node-offset replicas of the sf0.1 orders graph —
  *    replicas share no nodes, so nodes/triangles grow exactly m×
  *    and any super-linear TIME is the plan's fault (wedge blowup);
  *  - vectors: `ScaleCorpus` replica dirs (per-copy jitter breaks
  *    cross-copy neighbors) — q111's twin pairs and q107's query
  *    count grow ~m× (the PQ model refits on each scaled corpus, so
  *    code-collision recall may drift a few pairs; counts printed
  *    so the drift is visible, time is the gated claim).
  *
  * Usage: first materialize /tmp/nsweep{2,4}x via ScaleCorpus, then
  *   sbt "runMain graft.NewOpsSweep"
  */
object NewOpsSweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-newops-sweep", "32")
    val sf = "/root/testdata/sf0.1"
    // Optional family filter: sbt "runMain graft.NewOpsSweep q38,q148"
    val famFilter = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet)
    def fam(name: String): Boolean = famFilter.forall(_.contains(name))

    def time3[A](body: => DataFrame): (Double, Long) = {
      var rows = 0L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = body.count()
        (System.nanoTime() - t0) / 1e9
      }
      (times.sorted.apply(1), rows)
    }

    // Full-materialization timer (the Bench noop convention): count()
    // lets Catalyst PRUNE expensive output columns (q38/q148's sorted
    // re-concat would be dropped entirely), so families whose cost IS
    // the output column time the noop write instead.
    def time3Noop[A](body: => DataFrame): (Double, Long) = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (times.sorted.apply(1), body.count())
    }

    // q105 family: m disjoint graph replicas.
    val baseEdges = Tables.orders(spark, sf).select(
        pmod(col("o_custkey"), lit(2048)).as("src"),
        pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(2048)).as("dst"))
      .filter(col("src") =!= col("dst"))
    for (m <- Seq(1, 2, 4) if fam("q105")) {
      val edges = (0 until m).map(c =>
          baseEdges.select((col("src") + lit(c * 1000000L)).as("src"),
            (col("dst") + lit(c * 1000000L)).as("dst")))
        .reduce(_ unionByName _)
      val (t, rows) = time3(graft.operators.Graph.triangleCount(edges, "src", "dst"))
      println(f"NEWOPS q105 m=$m nodes=$rows median=$t%.2f")
    }

    // q118 family: LPA on the same disjoint graph replicas — labels
    // cannot leak across replicas, so nodes grow exactly m× and the
    // per-round join/census plan must track it linearly.
    val lpaBase = Tables.orders(spark, sf).select(
        pmod(col("o_custkey"), lit(1024L)).as("src"),
        pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(1024L)).as("dst"))
      .filter(col("src") =!= col("dst"))
    for (m <- Seq(1, 2, 4) if fam("q118")) {
      val edges = (0 until m).map(c =>
          lpaBase.select((col("src") + lit(c * 1000000L)).as("src"),
            (col("dst") + lit(c * 1000000L)).as("dst")))
        .reduce(_ unionByName _)
      val (t, rows) = time3(
        graft.operators.Graph.labelPropagation(edges, "src", "dst", rounds = 2))
      println(f"NEWOPS q118 m=$m nodes=$rows median=$t%.2f")
    }

    // q117 family: z-order census on m key-INTERLEAVED lineitem
    // replicas (`k*m + c` — a block offset would collapse each copy
    // into one grid cell and measure a degenerate census): the key
    // range grows m×, the fill stays uniform, buckets stay 64, and
    // the single scan + census shuffle must track rows linearly.
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    for (m <- Seq(1, 2, 4) if fam("q117")) {
      val wide = (0 until m).map(c =>
          li.select((col("l_partkey") * m + lit(c.toLong)).as("l_partkey"),
            (col("l_suppkey") * m + lit(c.toLong)).as("l_suppkey")))
        .reduce(_ unionByName _)
      val (t, rows) = time3(graft.operators.Layout.zorderZoneMap(
        wide, Seq("l_partkey", "l_suppkey"), bits = 8, bucketBits = 6))
      println(f"NEWOPS q117 m=$m buckets=$rows median=$t%.2f")
    }

    // q107 + q111 + session additions: ScaleCorpus replica dirs.
    val dirs = Seq(1 -> sf, 2 -> "/tmp/nsweep2x", 4 -> "/tmp/nsweep4x")
    for ((m, dir) <- dirs if fam("vec")) {
      val (t7, rows7) = time3(SparkEntry.queries("q107_pq_rerank")(spark, dir))
      println(f"NEWOPS q107 m=$m rows=$rows7 median=$t7%.2f")
      val (t11, rows11) = time3(SparkEntry.queries("q111_pq_code_dedup")(spark, dir))
      println(f"NEWOPS q111 m=$m pairs=$rows11 median=$t11%.2f")
      // q121: anchors (vec_id < 4) live in copy 0 only — the corpus
      // scan grows m×, the result stays 20 rows.
      val (t21, rows21) = time3(SparkEntry.queries("q121_maxsim_rerank")(spark, dir))
      println(f"NEWOPS q121 m=$m rows=$rows21 median=$t21%.2f")
      // q122: doc ids replicate at +10M offsets — sparse id blocks,
      // picks grow ~m× with the token mass.
      val (t22, rows22) = time3(SparkEntry.queries("q122_systematic_sample")(spark, dir))
      println(f"NEWOPS q122 m=$m picks=$rows22 median=$t22%.2f")
    }

    // q136 family: link prediction on disjoint graph replicas — the
    // wedge census (the op's dominant term) and the emitted pair set
    // both grow exactly m×, so measured time must track linearly or
    // the wedge join is doing superlinear work.
    val lpEdges = Tables.orders(spark, sf).select(
        pmod(col("o_custkey"), lit(2048L)).as("src"),
        pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(2048L)).as("dst"))
      .filter(col("src") =!= col("dst"))
    for (m <- Seq(1, 2, 4) if fam("q136")) {
      val edges = (0 until m).map(c =>
          lpEdges.select((col("src") + lit(c * 1000000L)).as("src"),
            (col("dst") + lit(c * 1000000L)).as("dst")))
        .reduce(_ unionByName _)
      val (t, rows) = time3(
        graft.operators.Graph.linkPrediction(edges, "src", "dst"))
      println(f"NEWOPS q136 m=$m pairs=$rows median=$t%.2f")
    }

    // q131/q138/q139 family: m disjoint event replicas — ids offset,
    // keys (user / event_type) prefixed per copy, so per-key state
    // stays constant while key count grows m×: the shape a
    // key-partitioned window plan must track linearly.
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
    for (m <- Seq(1, 2, 4) if fam("events")) {
      val evM = (0 until m).map(c =>
          ev.select((col("event_id") + lit(c * 1000000000L)).as("event_id"),
            (col("user_id") + lit(c * 1000000L)).as("user_id"),
            concat(lit(s"c$c:"), col("event_type")).as("event_type"),
            col("ts"), col("value")))
        .reduce(_ unionByName _)
      val (t31, rows31) = time3(graft.operators.Temporal.resampleLocf(
        evM.select("user_id", "ts", "value"), "user_id", "ts", "value",
        bucketNs = 21600000000000L))
      println(f"NEWOPS q131 m=$m rows=$rows31 median=$t31%.2f")
      val (t38, rows38) = time3(graft.operators.Stats.madOutliers(
        evM, Seq("event_type"), "event_id", col("value")))
      println(f"NEWOPS q138 m=$m rows=$rows38 median=$t38%.2f")
      val (t39, rows39) = time3(graft.operators.Stats.equiDepthBuckets(
        evM, "event_id", col("value"), k = 8))
      println(f"NEWOPS q139 m=$m rows=$rows39 median=$t39%.2f")
      // r14 additions share the same disjoint-key replica argument:
      // per-key census size stays constant, key count grows m×.
      val (t85, rows85) = time3(graft.operators.Temporal.seasonalDecompose(
        evM, Seq("event_type"), "ts", col("value"),
        bucketNs = 86400000000000L, period = 7))
      println(f"NEWOPS q185 m=$m rows=$rows85 median=$t85%.2f")
      val (t89, rows89) = time3(graft.operators.Temporal.binarySegmentation(
        evM, Seq("event_type"), "ts", col("value"),
        bucketNs = 86400000000000L, depth = 2))
      println(f"NEWOPS q189 m=$m rows=$rows89 median=$t89%.2f")
      // Trend pair: per-key point count stays constant (30 daily
      // buckets), keys grow m× — the quadratic pair stage must track
      // keys linearly, never cross keys.
      val censusM = evM
        .filter(col("value").isNotNull)
        .select(col("event_type"), expr("ts div 86400000000000").as("bucket"),
          floor(col("value") * lit(10000d) + lit(0.5d)).cast("long").as("v_e4"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(sum(col("v_e4")).as("v_e4"))
      val (t90, rows90) = time3(graft.operators.Stats.theilSen(
        censusM, Seq("event_type"), col("bucket"), col("v_e4")))
      println(f"NEWOPS q190 m=$m rows=$rows90 median=$t90%.2f")
      val (t91, rows91) = time3(graft.operators.Stats.mannKendall(
        censusM, Seq("event_type"), col("bucket"), col("v_e4")))
      println(f"NEWOPS q191 m=$m rows=$rows91 median=$t91%.2f")
      // Nonparametric two-sample tier (q194–q198): same disjoint-key
      // replica argument — census cells per key stay constant (the
      // e2-quantized value grid / the daily bucket count), keys grow
      // m×, so every census window and pair stage must track m
      // linearly.
      val evSplit = evM.filter(col("value").isNotNull)
        .select(col("event_type"),
          (pmod(expr("ts div 86400000000000"), lit(7L)) >= 5L).as("in_b"),
          floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("v_e2"))
      val (t94, rows94) = time3(graft.operators.Stats.ksTwoSample(
        evSplit, Seq("event_type"), col("in_b"), col("v_e2")))
      println(f"NEWOPS q194 m=$m rows=$rows94 median=$t94%.2f")
      val (t95, rows95) = time3(graft.operators.Stats.cliffsDelta(
        evSplit, Seq("event_type"), col("in_b"), col("v_e2")))
      println(f"NEWOPS q195 m=$m rows=$rows95 median=$t95%.2f")
      val dailyM = censusM.withColumn("in_b", pmod(col("bucket"), lit(7L)) >= 5L)
      val (t96, rows96) = time3(graft.operators.Stats.hodgesLehmannShift(
        dailyM, Seq("event_type"), col("in_b"), col("v_e4")))
      println(f"NEWOPS q196 m=$m rows=$rows96 median=$t96%.2f")
      val (t97, rows97) = time3(graft.operators.Stats.runsTest(
        censusM, Seq("event_type"), col("bucket"), col("v_e4")))
      println(f"NEWOPS q197 m=$m rows=$rows97 median=$t97%.2f")
      val (t98, rows98) = time3(graft.operators.Stats.autocorr(
        censusM, Seq("event_type"), col("bucket"), col("v_e4"), maxLag = 7))
      println(f"NEWOPS q198 m=$m rows=$rows98 median=$t98%.2f")
      val (t99, rows99) = time3(graft.operators.Stats.cvmTwoSample(
        evSplit, Seq("event_type"), col("in_b"), col("v_e2")))
      println(f"NEWOPS q199 m=$m rows=$rows99 median=$t99%.2f")
      // Kruskal–Wallis pools ACROSS groups (one global census), so
      // the replica argument is row mass: rows grow m×, distinct
      // pooled values stay constant — the census aggregate is the
      // only corpus-sized stage and must track rows linearly.
      val (t00, rows00) = time3(graft.operators.Stats.kruskalWallis(
        evSplit.select(col("event_type"), col("v_e2")), "event_type", col("v_e2")))
      println(f"NEWOPS q200 m=$m rows=$rows00 median=$t00%.2f")
      val dailyXY = evM.filter(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * lit(10000d) + lit(0.5d)).cast("long")).as("v_e4"))
      val (t01, rows01) = time3(graft.operators.Stats.kendallTauB(
        dailyXY, Seq("event_type"), col("bucket"), col("cnt"), col("v_e4")))
      println(f"NEWOPS q201 m=$m rows=$rows01 median=$t01%.2f")
      // q203 moments: one power-sum aggregate — rows grow m×, output
      // rows grow m× (disjoint keys), single map-side-combined pass.
      val (t03, rows03) = time3(graft.operators.Stats.momentStats(
        evM.filter(col("value").isNotNull).select(col("event_type"),
          floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("v_e2")),
        Seq("event_type"), col("v_e2")))
      println(f"NEWOPS q203 m=$m rows=$rows03 median=$t03%.2f")
      // q204 CCF is ALL-PAIRS by design — series count grows m×, so
      // ordered pairs (and the lag-join output) grow ~m²: the honest
      // claim here is that time tracks the PAIR count, i.e. the m=4
      // read may run ~16× the m=1 pair mass over a still-tiny census
      // (5→20 series, 10→190 pairs) and must stay in the sub-second
      // floor band, not that it stays flat in m.
      val dailyC = evM.filter(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("bucket"))
        .agg(sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).as("v"))
      val (t04, rows04) = time3(graft.operators.Stats.crossCorr(
        dailyC, "event_type", col("bucket"), col("v"), maxLag = 7))
      println(f"NEWOPS q204 m=$m pairs=$rows04 median=$t04%.2f")
      // q206 isotonic pools ACROSS types (global bin census) — the
      // replica argument is row mass over a constant ≤64-bin census.
      val (t06, rows06) = time3(graft.operators.Stats.isotonicCalibrate(
        evM.filter(col("value").isNotNull)
          .select(least(floor(col("value") / lit(8d)), lit(63d)).cast("long").as("bin"),
            (col("event_type").endsWith("purchase")).cast("long").as("l")),
        col("bin"), col("l")))
      println(f"NEWOPS q206 m=$m bins=$rows06 median=$t06%.2f")
      // q207/q208 emit corpus-shaped projections: rows AND output
      // grow m×, census cells per key stay constant — the projection
      // + broadcast-join plan must track rows linearly.
      val evQ = evM.filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("v_e2"))
      val (t07, rows07) = time3Noop(graft.operators.Stats.winsorize(
        evQ, Seq("event_type"), "event_id", col("v_e2")))
      println(f"NEWOPS q207 m=$m rows=$rows07 median=$t07%.2f")
      val (t08, rows08) = time3Noop(graft.operators.Stats.quantileNormalize(
        evQ, Seq("event_type"), "event_id", col("v_e2")))
      println(f"NEWOPS q208 m=$m rows=$rows08 median=$t08%.2f")
    }

    // q112 family: the crawl-ingest planner on m custkey-OFFSET order
    // replicas — urls embed the custkey, so frontiers are disjoint
    // and the dedup census grows m×; the 5-host politeness set stays
    // FIXED (offsets are multiples of 5 — the query's own design:
    // per-host sequence windows see m× rows over a constant host
    // count, which is exactly the shape the floor note must defend).
    val ordQ = Tables.orders(spark, sf).select("o_custkey", "o_orderkey")
    for (m <- Seq(1, 2, 4) if fam("q112")) {
      val oM = (0 until m).map(c =>
          ordQ.select((col("o_custkey") + lit(c * 100000000L)).as("o_custkey"),
            (col("o_orderkey") + lit(c * 1000000000L)).as("o_orderkey")))
        .reduce(_ unionByName _)
      val k = col("o_custkey").cast("string")
      val mm = pmod(col("o_custkey"), lit(7)).cast("string")
      val h = pmod(col("o_custkey"), lit(5)).cast("string")
      val raw = concat(lit("https://shop"), h, lit(".example.com/item/"), k,
        lit("?a=1&b="), mm)
      val frontier = oM
        .select(graft.functions.GraftFunctions.canonical_url(raw).as("url"),
          raw.as("raw"), col("o_orderkey"))
        .groupBy(col("url"))
        .agg(min(col("o_orderkey")).as("first_seen"),
          count(lit(1)).as("n_hits"),
          count_distinct(col("raw")).as("n_variants"))
        .withColumn("host", expr("parse_url(url, 'HOST')"))
      val (t, rows) = time3(graft.operators.Curation.crawlSchedule(frontier,
        hostCol = "host", orderCol = "first_seen",
        maxPerHost = 8, waveCapacity = 32))
      println(f"NEWOPS q112 m=$m rows=$rows median=$t%.2f")
    }

    // q160 family: marginMine on m id-OFFSET replicas of the SCORED
    // pair frame (cross-score computed once at sf0.1 and
    // checkpointed, so the sweep isolates the miner): pairs and
    // per-endpoint neighborhoods grow exactly m× and never span
    // replicas. The n²/4 exact cross-score feeding the miner at
    // audit scale is the known-quadratic scorer — swapped for
    // LSH/IVF candidates at 100 TB per the q160 doc note — so it is
    // deliberately OUTSIDE the timed body.
    val p160 = graft.operators.Similarity.prepared(Tables.embeddings(spark, sf))
    val a160 = p160.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select(col("vec_id").as("a_id"), col("vec").as("av"), col("norm").as("an"))
    val b160 = p160.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id").as("b_id"), col("vec").as("bv"), col("norm").as("bn"))
    lazy val scored160 = a160.crossJoin(broadcast(b160))
      .select(col("a_id"), col("b_id"),
        graft.functions.VectorFunctions.cosinePrenormed(
          graft.functions.VectorFunctions.dot(col("av"), col("bv")),
          col("an"), col("bn")).as("sim_raw"))
      .localCheckpoint(true)
    for (m <- Seq(1, 2, 4) if fam("q160")) {
      val sM = (0 until m).map(c =>
          scored160.select((col("a_id") + lit(c * 100000000L)).as("a_id"),
            (col("b_id") + lit(c * 100000000L)).as("b_id"), col("sim_raw")))
        .reduce(_ unionByName _)
      val (t, rows) = time3(
        graft.operators.Similarity.marginMine(sM, k = 4, minMargin = 1.15))
      println(f"NEWOPS q160 m=$m pairs=$rows median=$t%.2f")
    }

    // q146 family: edit-distance near-dup on m REPLICA-TAGGED
    // document copies — each copy's texts get a distinct first
    // token, so prefix blocks never span copies: blocks (and their
    // quadratic-per-block pair work) grow exactly m×, and
    // superlinear time would mean the block join leaks across
    // blocks. blockTokens=9 keeps the gate's 8 original words
    // under the added tag.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    for (m <- Seq(1, 2, 4) if fam("q146")) {
      val dM = (0 until m).map(c =>
          docs.select((col("doc_id") + lit(c * 100000000L)).as("doc_id"),
            concat(lit(s"r$c "), col("text")).as("text")))
        .reduce(_ unionByName _)
      val twins = dM.filter(pmod(col("doc_id"), lit(10L)) === 0L)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text"))
      val (t, rows) = time3(graft.operators.Dedup.editDistanceNearDup(
        dM.unionByName(twins), maxEdits = 4, blockTokens = 9))
      println(f"NEWOPS q146 m=$m pairs=$rows median=$t%.2f")
    }

    // q38 family: ordered-concat assembly on m id-OFFSET lineitem
    // replicas — groups never span replicas, so groups and rows grow
    // exactly m× and the single grouping shuffle + object aggregate
    // must track linearly (the r13 floor note's evidence: the shape
    // is scan → one exchange → sorted-struct agg → global sort, and
    // its constant is stage overhead, not a scaling term).
    val liBase = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber")
    for (m <- Seq(1, 2, 4) if fam("q38")) {
      val liM = (0 until m).map(c =>
          liBase.select((col("l_orderkey") + lit(c * 100000000L)).as("l_orderkey"),
            col("l_linenumber")))
        .reduce(_ unionByName _)
      val fname = concat(lit("part_"), col("l_linenumber"), lit(".mp3"))
      val seq = coalesce(
        substring_index(substring_index(col("fname"), ".", 1), "_", -1)
          .cast("int"), lit(0))
      val (t, rows) = time3Noop(liM
        .select(col("l_orderkey"), fname.as("fname"))
        .withColumn("seq", seq)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_parts"),
          array_join(transform(
              array_sort(collect_list(struct(col("seq"), col("fname")))),
              x => x.getField("fname")), ",").as("assembled")))
      println(f"NEWOPS q38 m=$m groups=$rows median=$t%.2f")
    }

    // q148 family: paragraph dedup on m replica-TAGGED document
    // copies — every paragraph window carries the copy tag, so
    // distinct paragraphs, winners and doc groups all grow exactly
    // m× and both census aggregates must track linearly.
    val pdocs = Tables.documents(spark, sf).select("doc_id", "text")
    for (m <- Seq(1, 2, 4) if fam("q148")) {
      val dM = (0 until m).map(c =>
          pdocs.select((col("doc_id") + lit(c * 100000000L)).as("doc_id"),
            concat(lit(s"r$c "), col("text")).as("text")))
        .reduce(_ unionByName _)
      val (t, rows) = time3Noop(graft.operators.Curation.paragraphDedup(
        dM, graft.operators.Curation.tokenWindows(col("text"), 8)))
      println(f"NEWOPS q148 m=$m docs=$rows median=$t%.2f")
    }

    // winnow family (r15): q219 fingerprints and q220 overlap pairs
    // on m TOKEN-tagged document copies — every token carries the
    // copy tag, so grams (hence fingerprints, buckets, and pairs)
    // never span copies: fingerprints grow exactly m×, bucket sizes
    // stay constant, and pair work grows m×. Superlinear time would
    // mean the bucket join leaks across copies.
    for (m <- Seq(1, 2, 4) if fam("q219") || fam("q220")) {
      val dM = (0 until m).map(c =>
          docs.select((col("doc_id") + lit(c * 100000000L)).as("doc_id"),
            array_join(transform(split(col("text"), " "),
              t => concat(t, lit(s"_$c"))), " ").as("text")))
        .reduce(_ unionByName _)
        .localCheckpoint(true)
      if (fam("q219")) {
        val (t, rows) = time3Noop(dM.select(col("doc_id"),
          explode(graft.functions.GraftFunctions.winnow_fingerprints(
            split(col("text"), " "), 3, 4)).as("fp")))
        println(f"NEWOPS q219 m=$m fps=$rows median=$t%.2f")
      }
      if (fam("q220")) {
        val (t, rows) = time3(graft.operators.Dedup.winnowOverlapPairs(dM))
        println(f"NEWOPS q220 m=$m pairs=$rows median=$t%.2f")
      }
      dM.unpersist(blocking = true)
    }

    // q142 family: mutualKnn on m id-OFFSET replicas of the exact
    // kNN edge list (computed once, checkpointed, so the sweep times
    // the reciprocity join alone): edges grow exactly m×, mutual
    // pairs never span replicas, and the single self-equi-join must
    // track linearly.
    val knnBase = graft.operators.Similarity.bruteForceTopK(
        Tables.embeddings(spark, sf), Tables.embeddings(spark, sf), k = 5)
      .select("query_id", "neighbor_id", "rank")
      .localCheckpoint(true)
    for (m <- Seq(1, 2, 4) if fam("q142")) {
      val kM = (0 until m).map(c =>
          knnBase.select((col("query_id") + lit(c * 100000000L)).as("query_id"),
            (col("neighbor_id") + lit(c * 100000000L)).as("neighbor_id"),
            col("rank")))
        .reduce(_ unionByName _)
      val (t, rows) = time3(graft.operators.Similarity.mutualKnn(kM))
      println(f"NEWOPS q142 m=$m pairs=$rows median=$t%.2f")
    }
    spark.stop()
  }
}
