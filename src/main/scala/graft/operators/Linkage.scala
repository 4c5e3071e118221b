package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution over STRUCTURED records — the
  * field-level sibling of the text dedup tier: documents near-dup
  * by content similarity, but customer/supplier/product rows
  * near-dup by AGREEMENT PATTERNS across typed fields (same name +
  * same phone + slightly different balance = the same entity
  * re-keyed). The classic Fellegi–Sunter frame: each field
  * comparison contributes a log-odds weight (positive on agreement,
  * negative on disagreement — here caller-supplied INTEGER weights,
  * the precomputed `log(m/u)` quantization, so scores are exact
  * longs and the frame hash-gates), pair scores sum the field
  * weights, and two thresholds split match / possible / non-match.
  *
  * Scale shape — identical to [[Dedup.editDistanceNearDup]]'s
  * record-linkage blocking: candidate pairs come from ONE
  * equi-self-join on the caller's block key (quadratic per block
  * only), an in-plan `raise_error` census guard fails fast past
  * `maxBlockSize`, and only pairs at or above `minScore` are
  * emitted (candidates-sized, usually far smaller). Weights and
  * thresholds are plan literals — no model join.
  */
object Linkage {

  /** One field comparison rule: `agree(aCol, bCol)` must be a
    * deterministic Column predicate over the two sides' values. */
  final case class FieldRule(name: String, agree: (Column, Column) => Column,
                             wAgree: Long, wDisagree: Long)

  /** Exact equality on the field (null-safe: both-null agrees). */
  def exact(field: String, wAgree: Long, wDisagree: Long): FieldRule =
    FieldRule(field, (a, b) => a <=> b, wAgree, wDisagree)

  /** Agreement when the LONG field values differ by at most `tol` —
    * the numeric-fuzz rule (cast cents/epochs upstream). */
  def withinLong(field: String, tol: Long, wAgree: Long, wDisagree: Long): FieldRule =
    FieldRule(field,
      (a, b) => a.isNotNull && b.isNotNull && abs(a - b) <= tol,
      wAgree, wDisagree)

  /** Score all same-block record pairs of `records` against the
    * field rules; emit `(id_a, id_b, score, cls)` for pairs with
    * `score >= minScore`, `cls` ∈ {'match', 'possible'} split at
    * `matchScore`. Pairs orient `id_a < id_b`. */
  def blockedFieldMatch(records: DataFrame, blockCols: Seq[String],
                        rules: Seq[FieldRule], idCol: String,
                        minScore: Long, matchScore: Long,
                        maxBlockSize: Long = 4096L): DataFrame = {
    require(blockCols.nonEmpty, "blockCols must be non-empty")
    require(rules.nonEmpty, "rules must be non-empty")
    require(minScore <= matchScore, "minScore must be <= matchScore")
    val fields = rules.map(_.name).distinct
    val keyed = records
      .select((blockCols ++ (idCol +: fields)).distinct.map(col): _*)
    val guard = keyed.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__bn",
        when(col("__bn") <= maxBlockSize, col("__bn"))
          .otherwise(raise_error(
            lit(s"blockedFieldMatch: a block exceeds $maxBlockSize records — refine blockCols"))
            .cast("long")))
    // Referencing the guard column keeps the raise_error alive.
    val blocked = keyed.join(guard, blockCols).filter(col("__bn") >= 1L)
    val a = blocked.select(blockCols.map(col) ++ (idCol +: fields).map(c =>
      col(c).as(s"__a_$c")): _*)
    val b = blocked.select(blockCols.map(col) ++ (idCol +: fields).map(c =>
      col(c).as(s"__b_$c")): _*)
    val score = rules.map(r =>
        when(r.agree(col(s"__a_${r.name}"), col(s"__b_${r.name}")),
          lit(r.wAgree)).otherwise(lit(r.wDisagree)))
      .reduce(_ + _)
    a.join(b, blockCols)
      .filter(col(s"__a_$idCol") < col(s"__b_$idCol"))
      .select(col(s"__a_$idCol").as("id_a"), col(s"__b_$idCol").as("id_b"),
        score.as("score"))
      .filter(col("score") >= minScore)
      .withColumn("cls",
        when(col("score") >= matchScore, lit("match")).otherwise(lit("possible")))
  }

  /** Golden-record SURVIVORSHIP — the fusion step after linkage has
    * clustered duplicate records: per cluster, elect the golden
    * record by (attribute completeness DESC, recency DESC — id order
    * stands in for ingest time) and fuse each attribute as
    * latest-non-null. The classic MDM rule cascade, expressed as ONE
    * `groupBy(cluster).agg(...)` pass: every rule is a `max_by`
    * column, so adding a rule adds a column, never a scan or a
    * window (no per-cluster row_number — the same
    * one-aggregate-pass shape as the q141 validation report).
    *
    * NULL discipline: `max_by`'s null handling DIVERGES across
    * engines (DuckDB's arg_max skips rows whose ARG is null; Spark
    * keeps them and can return null), so every fusion score is
    * null'd when its attribute is null — a row then skips in both
    * engines identically, and the fused value is the latest NON-NULL
    * in both.
    *
    * Election score = completeness·10⁹ + id: requires distinct ids
    * below 10⁹ (guarded), which makes the argmax unique — no
    * tiebreak ambiguity for either engine.
    */
  def survivorship(records: DataFrame, clusterCols: Seq[String],
                   idCol: String, attrCols: Seq[String]): DataFrame = {
    val completeness = attrCols.map(c =>
      when(col(c).isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    val idGuard = when(col(idCol) >= 0L && col(idCol) < 1000000000L, col(idCol))
      .otherwise(raise_error(
        lit(s"survivorship: $idCol outside [0, 1e9) — election score would collide"))
        .cast("long"))
    val score = completeness * lit(1000000000L) + idGuard
    val fusions = attrCols.map(c =>
      max_by(col(c), when(col(c).isNotNull, col(idCol))).as(s"${c}_fused"))
    val aggs = Seq(
      max_by(col(idCol), score).as(s"golden_$idCol"),
      count(lit(1)).as("n_members"),
      sum(when(completeness === attrCols.size, 1L).otherwise(0L)).as("n_complete")
    ) ++ fusions
    records
      .groupBy(clusterCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
