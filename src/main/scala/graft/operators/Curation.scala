package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{GraftFunctions, HashFunctions, TextFunctions}

/** Corpus-curation operators a training-data pipeline runs between
  * "raw corpus" and "training shards": benchmark decontamination,
  * deterministic stratified sampling, and token-budget sequence
  * packing. All three are designed scan-first: decontamination's
  * only shuffle is over the (small) hit set, sampling is a pure
  * filter, and packing shuffles once on its shard key.
  */
object Curation {

  /** Benchmark decontamination: per-document count of distinct word
    * `n`-gram shingles shared with an evaluation set, plus the
    * resulting flag. The standard pre-training hygiene step — drop
    * (or audit) training documents that contain verbatim benchmark
    * n-grams.
    *
    * Scale shape: eval sets are benchmark-sized (thousands of docs),
    * so their distinct shingle hashes are BROADCAST — the corpus side
    * is a scan + generate + broadcast hash semi-join with no
    * corpus-wide shuffle; only the per-doc hit counts (bounded by
    * matched docs, not corpus size) aggregate, and the final flag
    * join fans counts back over the corpus by id. Shingles are
    * compared by their 60-bit md5-hex form ([[GraftFunctions
    * .shingle_hex_tokens]]) — 8-ish-byte keys instead of full n-gram
    * strings in the broadcast and the join. */
  def flagContaminated(docs: DataFrame, evalDocs: DataFrame, n: Int = 3,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shingles: Column =
      explode(array_distinct(
        GraftFunctions.shingle_hex_tokens(TextFunctions.tokens(col(textCol)), n)))
    val evalShingles = evalDocs.select(shingles.as("sh")).distinct()
    val hits = docs.select(col(idCol), shingles.as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_shingles"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_eval_shingles"), lit(0L)).as("n_eval_shingles"),
        (coalesce(col("n_eval_shingles"), lit(0L)) > 0).as("contaminated"))
  }

  /** Deterministic stratified sampling: keep a row iff
    * `h60(salt:id) mod 1e6 < fraction(stratum) * 1e6`. A pure
    * codegen'd filter — no shuffle, no RNG, no sampling state — so
    * it scales as a scan, re-runs reproducibly (same salt -> same
    * sample), and composes with pushdown. Strata missing from
    * `fractions` are dropped (fraction 0). This is the
    * language/quality-rebalancing step of a corpus pipeline, shaped
    * so the oracle can replay the exact selection. */
  def sampleStratified(docs: DataFrame, strataCol: Column,
                       fractions: Map[String, Double],
                       idCol: String = "doc_id", salt: String = "strat"): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "sampling fractions must be in [0, 1]")
    val thresholds = map(fractions.toSeq.flatMap { case (k, f) =>
      Seq(lit(k), lit(math.floor(f * 1000000.0).toLong))
    }: _*)
    val bucket = pmod(
      HashFunctions.h60(concat(lit(s"$salt:"), col(idCol).cast("string"))),
      lit(1000000L))
    docs.filter(bucket < coalesce(element_at(thresholds, strataCol), lit(0L)))
  }

  /** Token-budget sequence packing: greedy next-fit of documents
    * into training sequences of at most `maxTokens` tokens,
    * sharded for parallelism. Returns one row per document:
    * `(id, shard, seq_id, n_tokens)` where `seq_id` numbers the
    * packed sequences within a shard (a document longer than the
    * budget gets a sequence of its own).
    *
    * Distribution: shard = `id mod shards` (deterministic and
    * oracle-replayable; ids are assumed roughly uniform — a skewed
    * id space would use a hash here), one repartition on the shard
    * key, per-shard order by id, then a single sequential
    * mapPartitions pass — the same one-shuffle stateful-scan shape
    * as [[SentenceGrouping]]. Packing is inherently sequential
    * WITHIN a shard; sharding is what makes it parallel, and the
    * shard count is the parallelism knob. */
  def packSequences(docs: DataFrame, maxTokens: Long, shards: Int = 32,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(shards > 0, "shards must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))
    val sized = docs.select(
        col(idCol).cast("long").as(idCol),
        pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartition(math.min(shards, 200), col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    sized.mapPartitions { rows =>
      // A partition holds one or more complete shards (hash(shard)
      // mod partitions can collide); counters reset on shard change.
      var shard = Long.MinValue
      var seq = 0L
      var cum = 0L
      var first = true
      rows.map { r =>
        val (id, sh, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (first || sh != shard) { shard = sh; seq = 0L; cum = w; first = false }
        else if (cum + w > maxTokens) { seq += 1L; cum = w }
        else cum += w
        Row(id, sh, seq, w)
      }
    }(enc)
  }
}
