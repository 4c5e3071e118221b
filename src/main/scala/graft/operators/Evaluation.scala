package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generation-evaluation statistics for eval-data pipelines: exact
  * integer sufficient components of BLEU (Papineni et al., ACL 2002)
  * and ROUGE-n recall (Lin, 2004) per (candidate, reference) pair.
  *
  * The portable-exactness split (the q55 BM25 precedent): the gated
  * frame carries the INTEGER components — clipped n-gram matches,
  * candidate/reference totals, lengths — plus the add-one-smoothed
  * log-precision sum in [[Curation.flog2qSql]] 1/16-bit log2 units;
  * the float BLEU (exp of the mean, brevity penalty e^(1−r/c)) is a
  * display-side transform of these columns, because exp/ln are not
  * bit-portable across engines. ROUGE-n recall is matches/ref-total
  * from the same frame.
  *
  * Scale shape: both texts live in the row, so the whole census is
  * one per-row kernel — no explode, no shuffle, stream-deployable
  * like the other stateless scorers. Clipped counts use per-n
  * hash-multiset intersection inside the kernel (O(tokens) per n). */
object Evaluation {

  /** One row per input row: lengths, per-n (matched, cand-total,
    * ref-total) for n = 1..4, the smoothed log2-precision sum
    * `Σ_n flog2q(m_n+1) − flog2q(t_n+1)` (exact BIGINT), and the
    * floored length ratio `c_len·10⁹ div r_len`. `candCol`/`refCol`
    * are TEXT columns — tokenization (split on single space, keep
    * trailing empties, matching Spark's `split(c, " ")` and DuckDB's
    * `string_split`) happens inside the kernel. r17: the kernel is a
    * native codegen expression
    * ([[graft.functions.BleuComponentsExpr]]) — the r16 ScalaUDF
    * form paid a UTF8String→String converter pass, an
    * Option/case-class encoder on the way out, and two extra
    * `size(split(...))` tokenizations for the length columns; the
    * expression returns lengths and censuses from ONE pass and stays
    * inside the WholeStageCodegen span. */
  def bleuComponents(pairs: DataFrame, idCol: String = "doc_id",
                     candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val b = ColumnShim.column(graft.functions.BleuComponentsExpr(
      ColumnShim.expression(col(candCol)), ColumnShim.expression(col(refCol))))
    val f = (x: String) => Curation.flog2qSql(x)
    val logprec = (1 to 4).map(n =>
      s"(${f(s"m$n + 1")}) - (${f(s"t$n + 1")})").mkString(" + ")
    pairs
      .select(col(idCol), b.as("__b"))
      .filter(col("__b").isNotNull && col("__b.r_len") > 0)
      .select(Seq(col(idCol), col("__b.c_len").as("c_len"),
        col("__b.r_len").as("r_len")) ++
        (1 to 4).flatMap(n => Seq(
          col(s"__b.m$n").as(s"m$n"), col(s"__b.t$n").as(s"t$n"),
          col(s"__b.r$n").as(s"r$n"))): _*)
      .withColumn("logprec_fp", expr(logprec))
      .withColumn("len_ratio_e9", expr("(c_len * 1000000000) div r_len"))
  }

  /** Self-truncation BLEU census (the eval-harness shape q231
    * gates): candidate = each document's max(1, ⌊tokens·num/den⌋)
    * token prefix, reference = the full document. Bit-identical to
    * building the prefix with `concat_ws(" ", slice(split(text," "),
    * 1, k))` and calling [[bleuComponents]] on the pair
    * (spec-pinned), but censused in ONE tokenization + gram pass per
    * row ([[graft.functions.BleuTruncComponentsExpr]]) — no prefix
    * string is ever materialized. Same output schema. */
  def bleuTruncationComponents(docs: DataFrame, idCol: String = "doc_id",
                               textCol: String = "text",
                               num: Int = 8, den: Int = 10): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val b = ColumnShim.column(graft.functions.BleuTruncComponentsExpr(
      ColumnShim.expression(col(textCol)), num, den))
    val f = (x: String) => Curation.flog2qSql(x)
    val logprec = (1 to 4).map(n =>
      s"(${f(s"m$n + 1")}) - (${f(s"t$n + 1")})").mkString(" + ")
    docs
      .select(col(idCol), b.as("__b"))
      .filter(col("__b").isNotNull && col("__b.r_len") > 0)
      .select(Seq(col(idCol), col("__b.c_len").as("c_len"),
        col("__b.r_len").as("r_len")) ++
        (1 to 4).flatMap(n => Seq(
          col(s"__b.m$n").as(s"m$n"), col(s"__b.t$n").as(s"t$n"),
          col(s"__b.r$n").as(s"r$n"))): _*)
      .withColumn("logprec_fp", expr(logprec))
      .withColumn("len_ratio_e9", expr("(c_len * 1000000000) div r_len"))
  }

  /** e6-floored binary-relevance DCG position weights
    * floor(10⁶ / log2(i+1)) for ranks 1..5 — FIXED literals, not
    * runtime logs, so engine and oracle can never drift by a ulp
    * (the q55/q231 portable-exactness split: integer components
    * gate; the float nDCG is display-side division). */
  private val DcgWeightsE6: Seq[Long] =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L)
  private val DcgPrefixE6: Seq[Long] =
    DcgWeightsE6.scanLeft(0L)(_ + _).tail

  /** Retrieval-quality audit (r18 — the ranking-quality axis q127's
    * recall audit doesn't see): per query, compare a SYSTEM ranking
    * (any ANN tier) against a TRUTH ranking (exact top-k) and emit
    * binary-relevance rank metrics as exact integers — overlap
    * count, first-hit rank, e9-floored reciprocal rank, e6 DCG and
    * ideal-DCG masses (nDCG = dcg_e6 / idcg_e6, display-side).
    * Both inputs are `(query_id, neighbor_id, rank)` frames; work is
    * two narrow equi-joins and one per-query aggregate — O(queries
    * × k) rows end to end, composable at any corpus scale because
    * the rankings are inputs, not recomputed here. */
  def retrievalQualityAudit(truth: DataFrame, system: DataFrame,
                            k: Int): DataFrame = {
    require(k >= 1 && k <= DcgWeightsE6.length,
      s"k must be in [1, ${DcgWeightsE6.length}]")
    val wArr = array(DcgWeightsE6.take(k).map(lit): _*)
    val prefArr = array(DcgPrefixE6.take(k).map(lit): _*)
    // One lineage cut: the truth ranking (often an expensive exact
    // top-k subtree) feeds both the relevance join and the per-query
    // count — without the cut Catalyst re-executes it per consumer
    // (the r18 q79/q244 multi-consumer rule). Output is queries × k
    // rows, so the materialization is bounded and cheap.
    val tRanked = truth.select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val t = tRanked.withColumn("__rel", lit(true))
    val tc = tRanked.groupBy(col("query_id"))
      .agg(count(lit(1)).as("__n_truth"))
    val per = system
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
      // The audit depth is k: deeper system rows are out of scope and
      // would also index past the weight array — clamp explicitly.
      .filter(col("rank") <= k)
      .join(t, Seq("query_id", "neighbor_id"), "left")
      .withColumn("__r", coalesce(col("__rel"), lit(false)))
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("__r"), 1L).otherwise(0L)).as("n_hits"),
        min(when(col("__r"), col("rank"))).as("first_hit_rank"),
        sum(when(col("__r"), element_at(wArr, col("rank").cast("int")))
          .otherwise(0L)).as("dcg_e6"))
    per.join(tc, Seq("query_id"))
      .select(col("query_id"), col("n_hits"), col("first_hit_rank"),
        expr("coalesce(CAST(1000000000 AS BIGINT) div first_hit_rank, CAST(0 AS BIGINT))")
          .as("mrr_e9"),
        col("dcg_e6"),
        element_at(prefArr,
          least(col("__n_truth"), lit(k.toLong)).cast("int")).as("idcg_e6"))
  }
}
