package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the real subword segmentation a
  * training-data pipeline needs for token accounting (the engine's
  * q25 `subwordCount` is the cheap length-heuristic stand-in; this
  * is the fitted article). Classic BPE (Sennrich et al. 2016,
  * arXiv:1508.07909): start from characters, repeatedly merge the
  * most frequent adjacent symbol pair over the word-frequency table.
  * Sibling tier: [[graft.operators.Bpe]] trains the SAME algorithm
  * with the dictionary kept distributed and greedy-replace
  * application a DuckDB oracle replays verbatim — the hash-gated
  * path (q158/q159) where this object is the vocab-capped
  * codegen-apply path; see the cross-reference there.
  *
  * Scale shape: the FIT aggregates the corpus once into a word
  * -frequency table (hash groupBy, map-side combinable), takes the
  * `maxVocab` most frequent words via a global top-k (per-partition
  * partial limits — the corpus is never sorted whole), and trains
  * driver-side on that bounded table — the norm for tokenizer
  * training (HF `tokenizers` does the same: merges come from word
  * counts, not raw text). Driver state is O(maxVocab · word length),
  * independent of corpus size. The APPLY is a pure codegen'd
  * projection: the model rides into generated code via
  * `addReferenceObj` (the [[CharLmModel]] deployment pattern), so
  * encoding scales as a scan and works unchanged on a stream.
  *
  * Determinism: merge selection is (count desc, left asc, right asc)
  * — total order, no RNG — so the same corpus always yields the same
  * merge table, and [[BpeModel.encodeWord]] always produces the same
  * segmentation (lowest-rank-pair-first, all occurrences merged
  * left-to-right).
  */
final case class BpeModel(merges: Seq[(String, String)]) extends Serializable {

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Surrogate-safe split into code-point symbols. */
  private def symbols(word: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out
  }

  /** Greedy BPE segmentation: while any adjacent pair is in the
    * merge table, merge the LOWEST-ranked pair (all its occurrences,
    * left to right), exactly reversing the training order. */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var parts = symbols(word)
    var done = false
    while (!done && parts.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.get(parts(i) + " " + parts(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val next = new scala.collection.mutable.ArrayBuffer[String](parts.length)
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
            next += a + b; j += 2
          } else { next += parts(j); j += 1 }
        }
        parts = next
      }
    }
    parts.toArray
  }

  /** Whitespace-split then per-word encode; token concatenation per
    * word reconstructs the input modulo the whitespace. */
  def encode(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty).flatMap(encodeWord)

  /** Catalyst-facing form (UTF8String in, ArrayData of UTF8String
    * out) so [[BpeEncode]]'s generated code calls straight in. */
  def encodeArrayData(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encode(s.toString).map(org.apache.spark.unsafe.types.UTF8String.fromString(_))
        .asInstanceOf[Array[Any]])
}

object Bpe {

  /** Fit `nMerges` BPE merges on the corpus' word-frequency table
    * (top `maxVocab` words by count, count-desc word-asc — a bounded
    * global top-k; ties and ordering deterministic). Stops early
    * when no adjacent pair occurs at least twice. */
  def fit(docs: DataFrame, nMerges: Int, maxVocab: Int = 65536,
          textCol: String = "text"): BpeModel = {
    require(nMerges >= 0, "nMerges must be >= 0")
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val wordCounts = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainDriverSide(wordCounts, nMerges)
  }

  /** The classic training loop over a (word, count) table — exposed
    * for the spec's parity check. */
  private[graft] def trainDriverSide(wordCounts: Seq[(String, Long)],
                                     nMerges: Int): BpeModel = {
    // Words as mutable symbol sequences, counts fixed.
    var words: Seq[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      val m = BpeModel(Nil)
      (m.encodeWord(w), c) // no merges yet = pure code-point split
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      // (count desc, left asc, right asc) — total deterministic order.
      val best = pairCounts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption.filter(_._2 >= 2L)
      best match {
        case None => continue = false
        case Some(((a, b), _)) =>
          merges += ((a, b))
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  next += a + b; j += 2
                } else { next += syms(j); j += 1 }
              }
              (next.toArray, c)
            }
          }
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Subword tokens of a text column under a fitted model — a pure
    * codegen projection (streams too). */
  def encodeTokens(c: Column, model: BpeModel): Column =
    GraftFunctions.bpe_encode(c, model)

  /** Fitted-token count — the honest version of q25's `n_subwords`
    * heuristic. */
  def tokenCount(c: Column, model: BpeModel): Column =
    size(encodeTokens(c, model))
}
