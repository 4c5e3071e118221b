package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, HashFunctions, TextFunctions}

/** Document deduplication operators for large-scale corpus curation:
  * exact, MinHash+LSH, SimHash, and exact set-similarity join with
  * prefix filtering.
  *
  * Scale design (the point of each choice):
  *  - Signatures (minhash/simhash/fingerprints) are computed with
  *    per-row higher-order functions over the token array — one
  *    narrow projection, zero shuffles, embarrassingly parallel.
  *  - LSH banding turns the quadratic all-pairs problem into an
  *    equi-join on band keys — the only shuffle is hash-partitioned
  *    by band key, and Catalyst/AQE handle skewed buckets.
  *  - The exact similarity join uses prefix filtering (PPJoin-style):
  *    only the globally-rarest `|d| - ceil(t*|d|) + 1` tokens of each
  *    document are indexed, so the inverted-index join touches a
  *    small fraction of the corpus instead of every (token, doc)
  *    pair. Candidates are then verified exactly.
  */
object Dedup {

  /** Distinct token set per document, plus its size. */
  def tokenSets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      array_distinct(TextFunctions.tokens(col(textCol))).as("toks"))
      .withColumn("n_toks", size(col("toks")))

  /** Exact dedup by order-invariant content fingerprint: survivors =
    * min doc id per canonical token-set fingerprint. */
  def exactByFingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextFunctions.canonicalFingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** MinHash signature (array of k minima) per document — one
    * projection, no shuffle. */
  def minhashSignatures(docs: DataFrame, k: Int,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hs = transform(
      array_distinct(TextFunctions.tokens(col(textCol))),
      x => HashFunctions.h28(x))
    val sig = array((0 until k).map(i =>
      array_min(transform(hs, h => HashFunctions.minhashPerm(h, i)))): _*)
    docs.select(col(idCol), sig.as("sig"))
  }

  /** LSH candidate pairs from banded minhash signatures.
    * `bands * rowsPerBand` must equal the signature length. The
    * result is distinct (docA < docB) pairs that collide in at least
    * one band. */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                    idCol: String = "doc_id"): DataFrame = {
    val bandKeys = (0 until bands).map { b =>
      concat_ws("_",
        lit(b) +: (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
    }
    val banded = sigs
      .select(col(idCol), explode(array(bandKeys: _*)).as("band"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact token-set Jaccard for given candidate pairs. */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame, threshold: Double,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sets = tokenSets(docs, idCol, textCol)
    candidates
      .join(sets.select(col(idCol).as("doc_a"), col("toks").as("toks_a"), col("n_toks").as("n_a")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("toks").as("toks_b"), col("n_toks").as("n_b")), "doc_b")
      .withColumn("ov", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard_raw", col("ov") / (col("n_a") + col("n_b") - col("ov")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard_raw"), 4).as("jaccard"))
  }

  /** MinHash+LSH near-duplicate pairs, exactly verified at
    * `threshold`. With `rowsPerBand`=2 and `bands`=32 the per-pair
    * miss probability at s=0.8 is (1-0.64)^32 ≈ 7e-15 — and pairs
    * with identical token sets (Jaccard 1.0) are caught with
    * probability exactly 1 since identical sets hash to identical
    * signatures. */
  def minhashNearDupPairs(docs: DataFrame, threshold: Double,
                          bands: Int = 32, rowsPerBand: Int = 2,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = minhashSignatures(docs, bands * rowsPerBand, idCol, textCol)
    val cands = lshCandidates(sigs, bands, rowsPerBand, idCol)
    verifyJaccard(cands, docs, threshold, idCol, textCol)
  }

  /** SimHash signature per document over its distinct-token 60-bit
    * hashes (custom Catalyst expression, single projection). */
  def simhashSignatures(docs: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      GraftFunctions.simhash60(
        transform(array_distinct(TextFunctions.tokens(col(textCol))), x => HashFunctions.h60(x))
      ).as("simhash"))

  /** SimHash near-dup pairs: hamming distance of signatures <= maxHamming.
    * Pairs are generated by banding the 60-bit signature into
    * `maxHamming + 1` chunks (pigeonhole: any pair within the radius
    * shares at least one exact chunk), then verified with bit_count. */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = simhashSignatures(docs, idCol, textCol)
    val nChunks = maxHamming + 1
    val chunkBits = 60 / nChunks
    val chunks = (0 until nChunks).map { i =>
      concat_ws("_", lit(i),
        shiftright(col("simhash"), i * chunkBits).bitwiseAND(lit((1L << chunkBits) - 1)))
    }
    val banded = sigs.select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("chunk"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact set-similarity self-join at `threshold` (token-set
    * Jaccard) with prefix filtering: tokens are ranked by global
    * frequency (rarest first); only the first
    * `n - ceil(t*n) + 1` tokens of each document are indexed.
    * Exact — no probabilistic recall loss — and the standard
    * scalable algorithm for this join (PPJoin / AllPairs family).
    */
  def jaccardSimilarityJoin(docs: DataFrame, threshold: Double,
                            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sets = tokenSets(docs, idCol, textCol)
    val tok = sets.select(col(idCol), col("n_toks"), explode(col("toks")).as("tok"))

    // Global token order: rarest first, ties broken lexicographically.
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("freq"))

    val ranked = tok.join(freq, "tok")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("freq").asc, col("tok").asc)
    val prefixLen = (col("n_toks") - ceil(lit(threshold) * col("n_toks")) + 1).cast("int")
    val prefix = ranked
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= prefixLen)
      .select(col(idCol), col("n_toks"), col("tok"))

    val a = prefix.as("a")
    val b = prefix.as("b")
    val candidates = a.join(b,
        col("a.tok") === col("b.tok") &&
        col(s"a.$idCol") < col(s"b.$idCol") &&
        // Jaccard length bound: |b| >= t * |a| (and symmetrically).
        col("b.n_toks") >= lit(threshold) * col("a.n_toks") &&
        col("a.n_toks") >= lit(threshold) * col("b.n_toks"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()

    verifyJaccard(candidates, docs, threshold, idCol, textCol)
  }
}
