package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions}

/** Exact-substring (suffix-array-style) deduplication: the maximal
  * repeated token spans of a corpus, in the sense of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" — a
  * span is REPEATED when every length-`k` token window inside it
  * occurs at least `minCount` times corpus-wide. Production text
  * pipelines run this tier after document-level dedup: boilerplate,
  * licenses, and quoted passages recur verbatim inside otherwise
  * distinct documents, and document-level Jaccard never sees them.
  *
  * The reference pipeline deduplicates at whole-item granularity
  * only (`tts_data_pipeline/crawler/utils.py:120-152` drops
  * name-identical books); this operator is the corpus-scale text
  * tier layered above that.
  *
  * Suffix arrays are the single-node construction; the Spark-native
  * shape is k-gram anchoring, which needs no global ordered
  * structure at all:
  *
  *  1. ANCHOR: every position's k-token window, hashed to a compact
  *     15-hex md5 key ([[graft.functions.ShingleHexTokens]] — one
  *     codegen'd pass, one md5 per window). One row per token ≈
  *     corpus-linear, like the tokenized corpus itself.
  *  2. FREQUENCY: windows occurring ≥ `minCount` times, as a
  *     `groupBy(h).count` (map-side partial aggregation: only
  *     per-partition distinct `(h, cnt)` pairs shuffle) followed by a
  *     LEFT SEMI join of the anchors against the qualifying hashes.
  *     NOT a `count over Window.partitionBy(h)`: a window buffers
  *     every occurrence of one hash in a single task's frame, so one
  *     boilerplate k-gram with 10⁷ corpus-wide hits is a single-task
  *     OOM — whereas the semi join's build side carries exactly one
  *     row per qualifying hash, streams the anchor side, and lets
  *     AQE broadcast it outright when the repeated-hash set is small.
  *  3. EXTEND: per document, maximal runs of CONSECUTIVE duplicated
  *     anchor positions coalesce into spans (`pos - row_number()`
  *     run ids over a per-doc window): adjacent duplicated k-grams
  *     overlap in k-1 tokens, so a run [p..q] certifies the whole
  *     token span [p, q+k-1] as repeated — the "extension" step of
  *     the suffix-array formulation, done with one shuffle by doc.
  *
  * Total: two full shuffles of the anchor set (by window hash for
  * the semi join, then by doc) plus one map-side-combined shuffle of
  * the small `(h, cnt)` census — never any pairwise join, and never
  * a per-key in-memory buffer proportional to a hash's occurrence
  * count, so a templated 100 TB corpus costs the same linear
  * shuffles as a clean one. The run groupBy after the per-doc window
  * introduces no extra exchange: the rows are already
  * hash-partitioned by `idCol`, which satisfies the `(idCol, run)`
  * clustering requirement.
  *
  * Spans from different documents that share content surface
  * independently (each document reports its own repeated regions) —
  * exactly what a span-removal rewrite consumes.
  */
object ExactSubstring {

  /** Maximal repeated spans per document: (idCol, span_start,
    * span_len) with `span_start` a 0-based token position and
    * `span_len ≥ k` in tokens. See the object doc for semantics and
    * the shuffle budget. */
  def repeatedSpans(docs: DataFrame, k: Int, minCount: Int = 2,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    require(minCount >= 2, "minCount must be at least 2")
    val anchors = docs.select(
      col(idCol),
      posexplode(GraftFunctions.shingle_hex_tokens(
        TextFunctions.tokens(col(textCol)), k)).as(Seq("pos", "h")))
    // Qualifying hashes as a one-row-per-hash build side; see the
    // object doc for why this beats a count-over-window on `h`.
    val frequent = anchors.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("h"))
    val dup = anchors.join(frequent, Seq("h"), "left_semi")
    val runs = dup.withColumn("run",
      col("pos") - row_number().over(Window.partitionBy(idCol).orderBy("pos")))
    runs.groupBy(col(idCol), col("run"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(k)).cast("long").as("span_len"))
      .select(col(idCol), col("span_start").cast("long").as("span_start"), col("span_len"))
  }

  /** Corpus rewrite dropping every repeated span: each document's
    * kept text is its tokens MINUS all positions covered by a
    * [[repeatedSpans]] span (the Lee-et-al. "drop the duplicated
    * bytes, keep one copy nowhere" policy applied symmetrically —
    * callers wanting keep-first instead can left-anti join spans
    * beforehand). Documents with no repeated span pass through
    * unchanged; a fully-repeated document comes out empty (kept_len
    * 0), which downstream length filters then drop. Span rows are
    * corpus-sparse (only repeated regions), so the join fans out at
    * most a few rows per affected doc; reassembly is one per-doc
    * aggregate over covered positions — no pairwise work. */
  def dropRepeatedSpans(docs: DataFrame, k: Int, minCount: Int = 2,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spans = repeatedSpans(docs, k, minCount, idCol, textCol)
      .select(col(idCol), col("span_start"), (col("span_start") + col("span_len")).as("span_end"))
    val toks = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
    val kept = toks.join(spans, toks(idCol) === spans(idCol) &&
        col("pos") >= col("span_start") && col("pos") < col("span_end"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
          array_sort(collect_list(struct(col("pos"), col("tok")))).getField("tok")).as("kept_text"),
        count(lit(1)).cast("long").as("kept_len"))
    // A fully-repeated document loses every token to the anti join
    // and would vanish from the groupBy — restore it as an explicit
    // empty row (kept_len 0) so the corpus row count is preserved
    // and downstream length filters, not silent absence, drop it.
    docs.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("kept_text"), lit("")).as("kept_text"),
        coalesce(col("kept_len"), lit(0L)).as("kept_len"))
  }

  /** Document-PAIR longest-common-run dedup tier (r17): candidate
    * pairs sharing at least one k-gram anchor hash are verified with
    * the EXACT longest common token run via the suffix-array kernel
    * ([[graft.functions.SuffixArrays]]) — the Lee et al. "dedup by
    * longest shared substring" refinement the span tiers (q92/q93)
    * approximate at anchor granularity. Output: (doc_a, doc_b,
    * lcs_len) for pairs with lcs_len ≥ `minLen`.
    *
    * Plan shape: anchors shuffle once by hash (k-gram hex anchors,
    * per-doc DISTINCT so a doc-internal repeat adds no pairs), the
    * anchor self-join moves ids only, and texts rejoin BY ID for the
    * per-pair kernel (the q22 ids-only candidate convention) — pair
    * text never rides the anchor shuffle. The kernel is O((|a|+|b|)
    * log²) per pair. Corpus-wide template k-grams make the pair set
    * itself quadratic in the sharing set — the q146 block-join
    * trade; collapse exact duplicates first ([[Dedup
    * .exactByFingerprint]]) when that bites. */
  def lcsNearDupPairs(docs: DataFrame, k: Int, minLen: Int,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    // Candidate recall is exactly 1 only for runs of >= k tokens (a
    // shorter common run never shares a k-gram anchor), so minLen
    // below k would silently miss qualifying pairs.
    require(minLen >= k, s"minLen ($minLen) must be >= the anchor width k ($k): " +
      "pairs whose longest common run is shorter than k share no anchor " +
      "and would be silently absent — lower k instead")
    val anchors = docs.select(
        col(idCol),
        explode(array_distinct(GraftFunctions.shingle_hex_tokens(
          TextFunctions.tokens(col(textCol)), k))).as("h"))
    // q92's qualifying-hash prefilter: only hashes seen in ≥2 docs
    // can pair, so the self-join's shuffle carries the duplicated
    // sliver, not the whole anchor set. The sliver is checkpointed
    // (the q105 multi-consumer convention): its lineage — corpus
    // tokenize + k-gram md5 + explode + count-filter — would
    // otherwise re-execute for each self-join side (measured −15%
    // min here at sf0.1), and the cut frame is anchor-sparse.
    val freq = anchors.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("h"))
    val dup = anchors.join(freq, Seq("h"), "left_semi").localCheckpoint(true)
    val pairs = dup.as("a")
      .join(dup.as("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
    import org.apache.spark.sql.graftshim.ColumnShim
    val lcs = ColumnShim.column(graft.functions.LcsTokenRun(
      ColumnShim.expression(col("ta")), ColumnShim.expression(col("tb"))))
    pairs
      .join(docs.select(col(idCol).as("doc_a"), col(textCol).as("ta")), Seq("doc_a"))
      .join(docs.select(col(idCol).as("doc_b"), col(textCol).as("tb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), lcs.cast("long").as("lcs_len"))
      .filter(col("lcs_len") >= minLen)
  }
}
