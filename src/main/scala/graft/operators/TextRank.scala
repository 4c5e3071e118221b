package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Keyword search and BM25 relevance ranking over a tokenized text
  * column — the retrieval tier of a training-data pipeline (query a
  * corpus for topical documents, score crawl pages against a
  * seed-term profile).
  *
  * Scale design: per-document term statistics are pure scan
  * projections over the token array (`size(filter(...))` — codegen,
  * no explode, no shuffle), corpus-level statistics reduce to ONE
  * row that rides a broadcast cross join back onto the scan, and
  * top-k is `orderBy().limit(k)` — per-partition partial limits, so
  * the only data movement is k rows per partition into the final
  * cut. Nothing in either path shuffles the corpus.
  *
  * Tokenization is the house convention (space-split, matching
  * `TextFunctions.tokens` and every text-family oracle). */
object TextRank {

  /** Market-basket co-occurrence with LIFT — the association-mining
    * census ("what is bought/clicked/read together beyond chance")
    * over any (basket, item) relation: per item pair appearing in at
    * least `minSupport` shared baskets, the exact support counts and
    * `lift = N·n_ab / (n_a·n_b)` as ONE correctly-rounded division
    * of exact longs, so the frame hash-gates (confidence and other
    * rule stats are projections over the same four integers).
    *
    * Scale shape: one distinct pass to (basket, item), one grouping
    * shuffle to basket rows, then the pair expansion runs INSIDE
    * each grouped row (the [[graft.functions.AllPairsLong]]
    * Generator, value-ordered) — quadratic per basket only, the
    * natural bound being basket width, not corpus size, and never
    * crossing an exchange (the former basket-keyed self-join paid
    * the expansion through a join; measured 3× at sf0.1) — then a
    * map-side-combinable pair census, item marginals re-attached by
    * two item-keyed joins (AQE broadcasts them when items are few).
    * A pathological mega-basket would blow the per-basket square; an
    * in-plan census guard fails fast past `maxBasketSize` (the q146
    * convention). Basket and item keys must be integral (cast to
    * long in-plan); hash string items to ids first if needed. */
  def marketBasket(baskets: DataFrame, basketCol: String, itemCol: String,
                   minSupport: Long, maxBasketSize: Long = 4096L): DataFrame = {
    require(minSupport >= 1, "minSupport must be positive")
    require(maxBasketSize >= 2, "maxBasketSize must be >= 2")
    // ONE grouped basket frame feeds everything: the basket total,
    // the item marginals (explode), and the pair census. Pairs are
    // generated INSIDE the grouped row (AllPairsLong, value-ordered)
    // instead of a basket-keyed self-join — the quadratic expansion
    // never crosses an exchange and the census map-side combines.
    // The size guard rides the same projection (raise_error on an
    // oversized basket, before any pair is generated). The grouped
    // frame is materialized once: three consumers would otherwise
    // re-run the grouping aggregate per branch (exchange reuse
    // shares the shuffle, not the aggregate); collect_list order is
    // partition-dependent but every consumer is order-insensitive.
    // Cast guard (r13): a non-integral key (e.g. a string basket id)
    // casts to NULL, collect_set silently drops it, and the query
    // returns empty/partial rule sets with no error. raise_error on
    // a null-from-non-null cast fails fast instead; genuinely-null
    // input keys still drop like any SQL key.
    def intKey(c: String, as: String) = {
      val cast = col(c).cast("long")
      when(col(c).isNotNull && cast.isNull,
        raise_error(lit(s"marketBasket: column '$c' is not integral — hash string keys to ids first"))
          .cast("long"))
        .otherwise(cast).as(as)
    }
    val g = Similarity.spreadSmall(baskets
        .select(intKey(basketCol, "__o"), intKey(itemCol, "__p")))
      .groupBy(col("__o"))
      // collect_set IS the per-basket distinct — folding the dedup
      // into the grouping aggregate saves a whole (o, item)-keyed
      // exchange before the basket shuffle.
      .agg(collect_set(col("__p")).as("__items"))
      .select(
        when(size(col("__items")) <= maxBasketSize, col("__items"))
          .otherwise(raise_error(
            lit(s"marketBasket: a basket exceeds $maxBasketSize items"))
            .cast("array<bigint>"))
          .as("__items"))
      .localCheckpoint(true)
    val tot = g.agg(count(lit(1)).as("__n"))
    val marg = g.select(explode(col("__items")).as("__p"))
      .groupBy(col("__p")).agg(count(lit(1)).as("__c"))
    val pairs = g
      .select(GraftFunctions.all_pairs_long(col("__items")).as(Seq("part_a", "part_b")))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    // Marginals re-attach by item-keyed joins (AQE broadcasts them
    // when the item vocabulary is small; at web scale they stay a
    // shuffle join — never hardcode a broadcast of a vocab-sized
    // frame).
    pairs
      .join(marg.select(col("__p").as("part_a"), col("__c").as("n_a")), "part_a")
      .join(marg.select(col("__p").as("part_b"), col("__c").as("n_b")), "part_b")
      .crossJoin(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("__n") * col("n_ab")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  private def toks(textCol: Column): Column =
    graft.functions.TextFunctions.tokens(textCol)

  /** Per-term term frequency as a pure array expression. */
  private def tf(textCol: Column, term: String): Column =
    size(filter(toks(textCol), x => x === lit(term)))

  /** Multi-term keyword search: every document matching at least one
    * query term, ranked by (distinct terms matched, total term
    * frequency, id) — integer-exact relevance, so the ranking is
    * reproducible on any engine. Returns the top `k` with per-doc
    * stats: `n_matched`, `tf_total`, `dl` (token count).
    *
    * Conjunctive (AND) search is the `n_matched === terms.size`
    * filter of the same frame; the ranking already floats full
    * matches to the top. */
  def keywordSearch(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "keywordSearch needs at least one term")
    require(terms.toSet.size == terms.size, "duplicate query terms")
    val tfCols = terms.map(t => tf(col(textCol), t))
    val nMatched = tfCols.map(c => when(c > 0, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val tfTotal = tfCols.reduce(_ + _).cast("long")
    docs.select(
        col(idCol),
        nMatched.as("n_matched"),
        tfTotal.as("tf_total"),
        size(toks(col(textCol))).cast("long").as("dl"))
      .filter(col("n_matched") > 0)
      .orderBy(col("n_matched").desc, col("tf_total").desc, col(idCol).asc)
      .limit(k)
  }

  /** INTEGER-EXACT BM25-ranked retrieval (Robertson/Spärck Jones) —
    * the hash-gateable sibling of the float [[bm25TopK]]: same
    * relevance semantics (rare terms count more via idf, repeated
    * terms saturate via k1 = 1.2, long documents length-normalize
    * via b = 0.75), but every term of the score is an exact long, so
    * a DuckDB oracle can replay the ranking bit-for-bit — float BM25
    * can only be spec-checked against a tolerance, never
    * hash-gated. Use [[bm25TopK]] when true-float scores matter;
    * this when reproducibility across engines/runs does
    * (TextRankSpec pins that the two rankings agree on separated
    * fixtures).
    *
    * Integer-exact everywhere so the ranking hash-gates:
    *  - idf(t) = log2((N−df+½)/(df+½)) becomes
    *    `flog2q(2(N−df)+1) − flog2q(2df+1)` in 1/16-bit units
    *    (the [[Curation.flog2qSql]] kernel q152 built — `ln` would
    *    diverge between libm implementations);
    *  - avgdl is quantized to MILLITOKENS (`1000·ΣDL DIV N`), after
    *    which the tf-saturation ratio multiplies through to the
    *    exact long `(idf · 2200 · tf · avgdl_fp) DIV
    *    (10·tf·avgdl_fp + 3·avgdl_fp + 9000·dl)` — no float
    *    anywhere. raise_error guards fail fast on BOTH factors of
    *    `tf·avgdl_fp` (avgdl_fp ≤ 2e6 millitokens AND dl ≤ 1e6
    *    tokens, which bounds every tf), so the idf·2200·tf·avgdl_fp
    *    numerator stays below 2^63 instead of wrapping (ANSI-off
    *    Spark wraps silently; DuckDB errors — the engines would
    *    otherwise diverge exactly at the overflow).
    *
    * Scale shape: one narrow projection computes per-term tfs as
    * array expressions (no explode), ONE one-row corpus-stats
    * aggregate broadcasts back (N, ΣDL, per-term df), and the
    * ranking is a bounded TakeOrdered(k) — two corpus scans total,
    * no shuffle wider than the stats row. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one term")
    require(terms.toSet.size == terms.size, "duplicate query terms")
    val dlGuarded = when(size(toks(col(textCol))).cast("long") <= 1000000L,
        size(toks(col(textCol))).cast("long"))
      .otherwise(raise_error(
        lit("bm25Search: document longer than 1e6 tokens — tf*avgdl_fp " +
          "would overflow the long product; chunk the document first"))
        .cast("long"))
    val base = docs.select(
      col(idCol) +: dlGuarded.as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          tf(col(textCol), t).cast("long").as(s"__tf$i") }: _*)
    val statAggs = sum(col("dl")).as("__dl_total") +:
      count(lit(1)).as("__n_docs") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val joined = base.crossJoin(broadcast(stats))
      .withColumn("__avgdl_fp", expr("(1000 * __dl_total) DIV __n_docs"))
      .withColumn("__avgdl_fp",
        when(col("__avgdl_fp") <= 2000000L, col("__avgdl_fp"))
          .otherwise(raise_error(
            lit("bm25Search: avgdl above 2000 tokens — rescale the " +
              "millitoken quantization before the long product bound"))
            .cast("long")))
    def idf(i: Int): String =
      s"(${Curation.flog2qSql(s"2 * (__n_docs - __df$i) + 1")} - " +
        s"${Curation.flog2qSql(s"2 * __df$i + 1")})"
    val contribs = terms.indices.map(i => expr(
      s"""CASE WHEN __tf$i > 0
            THEN (${idf(i)} * 2200 * __tf$i * __avgdl_fp)
                 DIV (10 * __tf$i * __avgdl_fp + 3 * __avgdl_fp + 9000 * dl)
            ELSE 0 END"""))
    val nMatched = terms.indices.map(i =>
      when(col(s"__tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    joined
      .select(col(idCol), nMatched.as("n_matched"),
        contribs.reduce(_ + _).as("score_q"), col("dl"))
      .filter(col("n_matched") > 0)
      .orderBy(col("score_q").desc, col(idCol).asc)
      .limit(k)
  }

  /** Collected BM25 corpus statistics — the fit half of the
    * fit-batch/score-stream split: N, millitoken avgdl, and one df
    * per query term (driver state bounded by the term list). */
  final case class Bm25Model(nDocs: Long, avgdlFp: Long, dfs: Seq[Long])

  /** Fit [[Bm25Model]] on the standing corpus (batch). */
  def collectBm25Model(docs: DataFrame, terms: Seq[String],
                       textCol: String = "text"): Bm25Model = {
    val base = docs.select(
      size(toks(col(textCol))).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          tf(col(textCol), t).cast("long").as(s"__tf$i") }: _*)
    val aggs = sum(col("dl")).as("__dl_total") +:
      count(lit(1)).as("__n_docs") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val r = base.agg(aggs.head, aggs.tail: _*).collect().head
    val n = r.getLong(1)
    Bm25Model(n, 1000L * r.getLong(0) / math.max(n, 1L),
      terms.indices.map(i => r.getLong(2 + i)))
  }

  /** Stateless BM25 scoring under a batch-fit model — the
    * score-stream half: every statistic is a LITERAL folded into one
    * codegen projection (the [[graft.streaming.EventStreams]]
    * deployment family — no corpus join, no state store), with
    * arithmetic identical to [[bm25Search]] term for term, so
    * fit-corpus parity is exact (spec-pinned). No global top-k: a
    * stream cannot rank globally — route scores to a windowed TopK
    * downstream if ranking is needed. */
  def bm25ScoreWithModel(docs: DataFrame, model: Bm25Model, terms: Seq[String],
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(terms.size == model.dfs.size, "model/term list mismatch")
    require(model.avgdlFp <= 2000000L,
      "bm25ScoreWithModel: avgdl above 2000 tokens — rescale the quantization")
    val dl = when(size(toks(col(textCol))).cast("long") <= 1000000L,
        size(toks(col(textCol))).cast("long"))
      .otherwise(raise_error(
        lit("bm25ScoreWithModel: document longer than 1e6 tokens — " +
          "tf*avgdl_fp would overflow the long product; chunk first"))
        .cast("long"))
    val withTf = docs.select(
      col(idCol) +: dl.as("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          tf(col(textCol), t).cast("long").as(s"__tf$i") }: _*)
    def idf(df: Long): String =
      s"(${Curation.flog2qSql(s"${2L * (model.nDocs - df) + 1L}L")} - " +
        s"${Curation.flog2qSql(s"${2L * df + 1L}L")})"
    val contribs = terms.indices.map(i => expr(
      s"""CASE WHEN __tf$i > 0
            THEN (${idf(model.dfs(i))} * 2200 * __tf$i * ${model.avgdlFp}L)
                 DIV (10 * __tf$i * ${model.avgdlFp}L + 3 * ${model.avgdlFp}L + 9000 * __dl)
            ELSE 0 END"""))
    val nMatched = terms.indices.map(i =>
      when(col(s"__tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    withTf.select(col(idCol), nMatched.as("n_matched"),
        contribs.reduce(_ + _).as("score_q"), col("__dl").as("dl"))
      .filter(col("n_matched") > 0)
  }

  /** Posting-list VARINT-COMPRESSION estimator — the index-storage
    * planner next to [[invertedIndex]]: per term, the byte cost of
    * the standard delta-gap + varint posting encoding
    * (`Σ ceil(bitlen(gap)/7)`, first gap = id+1) against the raw
    * 8-byte-per-posting baseline — how an index budget is sized and
    * how doc-id REASSIGNMENT wins are measured (clustered ids →
    * smaller gaps → fewer bytes) before paying for either.
    *
    * Scale shape: one distinct-(term, doc) shuffle, then gaps
    * accumulate in a hash-partitioned sorted mapPartitions stream —
    * running sums only, so a stopword whose posting list IS the
    * corpus costs bounded MEMORY (it is still one partition's work:
    * the honest skew note, same as the SentenceGrouping convention —
    * a window-per-term would hold the same skew with worse
    * spilling). Output is the top-`k` terms by document frequency. */
  def postingCompressionStats(docs: DataFrame, k: Int = 20,
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame = {
    import docs.sparkSession.implicits._
    val postings = docs
      .select(col(idCol).cast("long").as("__id"), explode(toks(col(textCol))).as("term"))
      .select(col("term"), col("__id")).distinct()
    val sums = postings.as[(String, Long)]
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("__id"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var curTerm: String = null; var prev = 0L; var df = 0L; var bytes = 0L
        def flush(): Unit = if (curTerm != null) out += ((curTerm, df, bytes))
        it.foreach { case (t, id) =>
          if (t != curTerm) { flush(); curTerm = t; prev = -1L; df = 0L; bytes = 0L }
          val gap = if (prev < 0L) id + 1L else id - prev
          val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(gap, 1L))
          bytes += (bitlen + 6) / 7
          df += 1L; prev = id
        }
        flush(); out.iterator
      }
      .toDF("term", "df", "varint_bytes")
    sums
      .select(col("term"), col("df"), (col("df") * 8L).as("raw_bytes"),
        col("varint_bytes"),
        expr("CAST(varint_bytes * 10000 DIV (df * 8) AS BIGINT)").as("ratio_e4"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(k)
  }

  /** Inverted-index build — the other half of the retrieval tier
    * ([[keywordSearch]] queries it, this constructs it): one row per
    * term with document frequency, corpus term frequency, and the
    * head of the posting list (the `postingsK` smallest doc ids,
    * comma-joined for a stable cross-engine representation).
    *
    * Scale shape: explode + two map-side-combinable aggregations;
    * the posting head goes through the bounded [[TopK]] typed
    * aggregator — each partition reduces to at most `postingsK`
    * ids per term BEFORE the shuffle — never an unbounded
    * `collect_list` of a hot term's full posting list (a stopword's
    * list IS the corpus; see the cluster-id bound note at
    * Dedup.collapseIdentical for the same hazard). The final
    * `collect_list` runs over the aggregator's output: ≤ postingsK
    * rows per term by construction. */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", postingsK: Int = 20): DataFrame = {
    require(postingsK > 0, "postingsK must be positive")
    val tf = docs
      .select(col(idCol), explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
    val counts = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
    // Smallest-k ids via the (sim desc, id asc) aggregator: negated
    // ids are exact in double far beyond any realistic id space.
    val heads = TopK.perGroup(
        tf.withColumn("negid", -col(idCol).cast("double")),
        "term", idCol, "negid", postingsK)
      .groupBy(col("term"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rank"), col("neighbor_id")))),
          s => s.getField("neighbor_id").cast("string")),
        ",").as("postings_head"))
    counts.join(heads, "term")
  }

  /** Okapi BM25 top-k: score(d) = sum over query terms of
    * idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    * idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1) (the Lucene
    * non-negative form). Corpus statistics (N, avgdl, per-term df)
    * aggregate to a single row broadcast back onto the scan; the
    * scoring pass is projection-only.
    *
    * Scores are IEEE doubles through `ln` — deterministic for a
    * fixed engine but not bit-portable across engines, so this op is
    * spec-gated (TextRankSpec pins scores against an independent
    * in-test computation); the cross-engine gate query (q55) rides
    * the integer-exact [[keywordSearch]] ranking instead. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one term")
    require(terms.toSet.size == terms.size, "duplicate query terms")
    val withTf = docs.select(
      col(idCol) +: size(toks(col(textCol))).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tf(col(textCol), t).as(s"__tf$i") }: _*)
    val statCols =
      count(lit(1)).cast("double").as("N") ::
        avg(col("dl")).as("avgdl") ::
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1.0).otherwise(0.0)).as(s"__df$i")).toList
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tfc = col(s"__tf$i").cast("double")
      val idf = log((col("N") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)) + lit(1.0))
      idf * tfc * lit(k1 + 1.0) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored
      .select(col(idCol), score.as("score"), col("dl").cast("long").as("dl"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (Cormack et al. 2009; every lexical+dense "hybrid search" RAG
    * stack): two ranked lists merge by
    * `rrf(d) = Σ_lists 1/(c + rank_list(d))`, absent-from-a-list
    * contributing 0. Rank-based (not score-based) fusion needs no
    * score calibration between a BM25-ish lexical ranker and a
    * cosine ANN — which is exactly why it is the default fuser.
    *
    * Exactness: each term is ONE correctly-rounded division of
    * exact integers and the fusion is one addition in fixed written
    * order, so the floats hash-gate cross-engine (the no-ln rule —
    * score-based fusers like log-odds would not). Ties break by id.
    *
    * Scale shape: the inputs are already top-k lists (bounded —
    * queries × k rows), so the full-outer fuse, projection and
    * final top-`k` cut all run on presentation-sized frames; the
    * corpus-sized work happened inside the upstream rankers. */
  def rrfFuse(a: DataFrame, aIdCol: String, aRankCol: String,
              b: DataFrame, bIdCol: String, bRankCol: String,
              k: Int, c: Int = 60): DataFrame = {
    require(k >= 1 && c >= 0, "k >= 1 and c >= 0")
    val la = a.select(col(aIdCol).cast("long").as("doc_id"),
      col(aRankCol).cast("long").as("rank_a"))
    val lb = b.select(col(bIdCol).cast("long").as("doc_id"),
      col(bRankCol).cast("long").as("rank_b"))
    la.join(lb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0d) / (lit(c.toDouble) + col("rank_a")), lit(0.0d)) +
          coalesce(lit(1.0d) / (lit(c.toDouble) + col("rank_b")), lit(0.0d))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** Windowed co-occurrence census — the sufficient statistics of
    * PMI collocation mining (word2vec-era corpus analysis): for each
    * unordered token pair within `window` positions, the pair count
    * plus each side's corpus unigram count. INTEGER stats only (the
    * house float rule — PMI's `ln(N·c_ab/(c_a·c_b))` is the caller's
    * derivation); `minCount` bounds the output the way it bounds
    * every census here.
    *
    * Scale shape: pair generation is a GENERATE-ONLY nested
    * transform inside the row (window · n_tokens pairs, corpus-
    * linear for fixed window — never a positional self-join), the
    * pair census is one map-side-combined groupBy, and the unigram
    * counts attach by two equi-joins of the (already aggregated,
    * census-sized) pair table — the corpus itself is scanned twice
    * (pairs, unigrams) and shuffled only in census-sized
    * aggregates. */
  def cooccurrence(docs: DataFrame, window: Int = 5, minCount: Long = 5,
                   textCol: String = "text"): DataFrame = {
    require(window >= 1, "window must be at least 1")
    // Pair generation rides a dedicated Generator kernel
    // ([[graft.functions.WindowedPairs]] — one plain-JVM array walk
    // per row): the first cut, a nested transform/filter HOF, was
    // interpreted per ELEMENT and re-evaluated its inlined `split`
    // on every element_at reference — ~30 s at the sf0.1 gate vs
    // the floor band with the kernel (the q59/q77 lesson applied to
    // generation). Tokenize once, then generate.
    val tokenized = docs.select(toks(col(textCol)).as("__t"))
    val pairCounts = tokenized
      .select(GraftFunctions.windowed_pairs(col("__t"), window))
      .groupBy(col("a").as("term_a"), col("b").as("term_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val unigrams = tokenized.select(explode(col("__t")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    pairCounts
      .join(unigrams.select(col("term").as("term_a"), col("n").as("n_a")), Seq("term_a"))
      .join(unigrams.select(col("term").as("term_b"), col("n").as("n_b")), Seq("term_b"))
      .select(col("term_a"), col("term_b"), col("n_pair"), col("n_a"), col("n_b"))
  }
}
