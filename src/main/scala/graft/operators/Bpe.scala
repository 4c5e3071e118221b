package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding merge training — the tokenizer-fit
  * step of a training-data pipeline (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units").
  *
  * Relationship to [[graft.functions.Bpe]] (the earlier, spec-gated
  * tier): that one caps the dictionary at `maxVocab` and trains
  * DRIVER-side with the HF-style lowest-rank-pair-first apply — the
  * right tool for token ACCOUNTING via its codegen'd [[graft
  * .functions.BpeEncode]] expression. THIS one keeps the full
  * dictionary DISTRIBUTED through every merge round and uses
  * greedy-replace application whose semantics a DuckDB oracle can
  * replay verbatim — which is what makes q158/q159 hash-gateable
  * (the driver-side trainer's vocab cap and tie-walk order have no
  * tractable SQL replay). Same algorithm, two deployment points:
  * exact-gated distributed fit here, bounded codegen apply there.
  *
  * Scale shape: the corpus is scanned ONCE to build the
  * word-frequency dictionary; every merge round iterates over the
  * dictionary only (a few million rows at 100 TB corpus scale, never
  * the corpus itself). Per round: one small pair-census shuffle with
  * map-side partial aggregation, a `TakeOrdered(1)` argmax whose
  * single row is the only driver-side state, and one broadcast-free
  * projection applying the merge. The dictionary is
  * `localCheckpoint`ed per round so the plan stays linear instead of
  * stacking K census subtrees (same convention as the connected
  * components / PageRank loops).
  *
  * Determinism: the census counts every adjacent token POSITION
  * (overlapping pairs included, the classic BPE census), ties break
  * on (count DESC, lhs ASC, rhs ASC), and the merge application is
  * greedy left-to-right non-overlapping — `replace` on the
  * separator-joined token string has exactly those semantics in both
  * Spark (`UTF8String.replace`) and the DuckDB oracle, so "aaa"
  * under merge (a,a) becomes [aa, a] in both engines (BpeSpec pins
  * this overlap case).
  *
  * Tokens are character runs of the input words and never contain
  * [[Sep]] (U+0001), so the flat-string representation is unambiguous.
  */
object Bpe {

  /** Token separator inside the flat sequence string. Input words
    * must not contain it (enforced with a filter in [[initDict]]). */
  val Sep = "\u0001"

  private val mergeSchema = StructType(Seq(
    StructField("merge_rank", LongType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))

  /** Word-frequency dictionary → (word, freq, seq) with seq = the
    * word's characters joined by [[Sep]] (a zero-width-boundary
    * regexp_replace, codegen'd — no array materialization). */
  def initDict(words: DataFrame, wordCol: String, freqCol: String): DataFrame =
    words
      .filter(!col(wordCol).contains(Sep) && length(col(wordCol)) > 0)
      .select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"),
        regexp_replace(col(wordCol), "(?<=.)(?=.)", Sep).as("seq"))

  /** Adjacent-position pair census of a dictionary of flat token
    * sequences, weighted by word frequency. Exposed for sweeps. */
  def pairCensus(dict: DataFrame): DataFrame = {
    val toks = split(col("seq"), Sep)
    dict
      .select(col("freq"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i + 1).as("lhs"),
          element_at(col("toks"), i + 2).as("rhs")))).as("pr"))
      .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
      .agg(sum("freq").as("pair_count"))
  }

  /** Learn `numMerges` BPE merges from a word-frequency dictionary.
    * Returns (merge table ordered by rank, final segmented dictionary
    * `(word, freq, seq)`); fewer than `numMerges` rows come back when
    * the dictionary runs out of adjacent pairs. */
  def learnMerges(
      words: DataFrame, wordCol: String, freqCol: String,
      numMerges: Int): (DataFrame, DataFrame) = {
    val spark = words.sparkSession
    var dict = initDict(words, wordCol, freqCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = pairCensus(dict)
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(rank, l, r, l + r, c)
        dict = dict
          .withColumn("seq", replace(col("seq"), lit(l + Sep + r), lit(l + r)))
          .localCheckpoint(true)
        rank += 1L
      }
    }
    val mergeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), mergeSchema)
    (mergeDf, dict)
  }

  /** Stateless BPE segmentation under a COLLECTED merge table — the
    * score-stream half of the fit-batch/score-stream split (the
    * [[graft.streaming.EventStreams]] deployment family): the ranked
    * merge list (driver-bounded, `numMerges` rows) folds into one
    * codegen'd projection — per word, the K merges apply in rank
    * order as chained greedy `replace`s, exactly the training-time
    * application — so arriving documents segment with no dictionary
    * join, no state store, and UNSEEN words segment correctly (BPE
    * application is defined on any word, not just the fit corpus;
    * [[segmentStats]]' dict-join falls back to char counts there).
    * Batch parity on fit-corpus words is exact: applying merges in
    * rank order reproduces the training evolution of every dict
    * word (spec-pinned). */
  def segmentStatsWithMerges(docs: DataFrame, merges: Seq[(String, String)],
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    def applyMerges(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      merges.foldLeft(regexp_replace(word, "(?<=.)(?=.)", Sep)) {
        case (seq, (l, r)) => replace(seq, lit(l + Sep + r), lit(l + r))
      }
    val words = filter(split(col(textCol), " "), w => w =!= "")
    docs.select(col(idCol),
        size(words).cast("long").as("n_words"),
        aggregate(transform(words, w => size(split(applyMerges(w), Sep)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_tokens"),
        aggregate(transform(words, w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_chars"))
      .withColumn("cpt_e4",
        expr("CAST(n_chars * 10000 DIV n_tokens AS BIGINT)"))
  }

  /** Collect a trained merge table into the driver-side ranked list
    * [[segmentStatsWithMerges]] closes over (bounded by numMerges). */
  def collectMerges(mergeDf: DataFrame): Seq[(String, String)] =
    mergeDf.orderBy("merge_rank").select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Segment per-document token statistics under a trained dictionary:
    * every document word is looked up in the segmented dictionary
    * (words absent from the fit corpus fall back to character count).
    * One corpus scan + one dictionary join (AQE broadcasts the dict
    * at small scale; at tokenizer-vocabulary scale it is a standard
    * shuffle join on the word key). `cpt_e4` = chars-per-token scaled
    * by 10^4, exact integer division. */
  def segmentStats(
      docs: DataFrame, idCol: String, textCol: String,
      segmentedDict: DataFrame): DataFrame = {
    val perWord = segmentedDict
      .select(col("word"), size(split(col("seq"), Sep)).cast("long").as("ntok"))
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, Seq("word"), "left")
      .select(col(idCol),
        coalesce(col("ntok"), length(col("word")).cast("long")).as("ntok"),
        length(col("word")).cast("long").as("nchar"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("ntok").as("n_tokens"),
        sum("nchar").as("n_chars"))
      .withColumn("cpt_e4",
        expr("CAST(n_chars * 10000 DIV n_tokens AS BIGINT)"))
  }
}
