package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.TextQueries

/** Dev tool: disjoint-replica scale sweep of the prefix-filter join
  * family — q46 (PPJoin, Zipf word corpus), q43 (shingle-set
  * Jaccard), q90 (directed containment), q81 (delta ingest) — the
  * operators whose prefix-filter selectivity could degrade
  * superlinearly on a different token distribution.
  *
  * Scaling model = [[ScaleCorpus]]'s: m disjoint replicas of each
  * family's OWN corpus (tokens of copy c>0 prefixed `c{c}·`, ids
  * offset), so the true answer grows exactly m× and any
  * super-linearity in time or CANDIDATE COUNT is attributable to
  * the plan, not a larger legitimate answer. Corpora are
  * materialized to parquet first so timings measure the operator,
  * not corpus synthesis.
  *
  * Per (op, m) it reports: corpus row count, candidate-pair count
  * (the operator's own pre-verification stage, via the
  * `private[graft]` code-motion hooks in [[Dedup]]), final pair
  * count, and median-of-N wall seconds for the full operator.
  *
  * Usage: sbt "runMain graft.PrefixJoinSweep [srcDir] [m,m,...]"
  * (defaults: /root/testdata/sf0.1 and 1,2,4,8).
  */
object PrefixJoinSweep {

  /** m disjoint replicas of a `(doc_id, text)` corpus — tokens of
    * copy c>0 prefixed `c{c}·`, ids offset. Shared with
    * `CandidateLinearitySpec`, the in-suite regression gate over the
    * same invariant this sweep measures at scale. */
  private[graft] def replicate(corpus: DataFrame, m: Int): DataFrame =
    (0 until m).map { c =>
      if (c == 0) corpus
      else corpus.select(
        (col("doc_id") + lit(c.toLong * 100000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit(s"c${c}·"), t))).as("text"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ms = args.lift(1).getOrElse("1,2,4,8").split(",").map(_.trim.toInt).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val work = sys.env.getOrElse("SPARK_GRAFT_SWEEP_DIR", "/tmp/prefix_join_sweep")
    val spark = GraftSession("graft-prefixjoinsweep", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    new java.io.File(work).mkdirs()

    def timeNoop(df: => DataFrame): Double = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      times((times.length - 1) / 2)
    }

    // Each family: (base corpus, operator timing frame, candidate frame).
    case class Family(name: String, base: DataFrame,
                      op: DataFrame => DataFrame,
                      candidates: DataFrame => DataFrame)

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def jacCandidates(corpus: DataFrame): DataFrame = {
      val reps = Dedup.collapseIdentical(corpus, "doc_id", "text")
      val (tok, freq) = Dedup.tokFreqOf(reps)
      Dedup.prefixJaccardCandidates(tok, freq, 0.9)
    }

    val families = Seq(
      Family("q46_ppjoin_words", TextQueries.q46Corpus(spark, srcDir),
        c => Dedup.jaccardSimilarityJoin(c, threshold = 0.9), jacCandidates),
      Family("q43_simjoin_ngram", TextQueries.q43Corpus(docs),
        c => Dedup.jaccardSimilarityJoin(c, threshold = 0.9), jacCandidates),
      Family("q90_containment", TextQueries.q90Corpus(spark, srcDir),
        c => Dedup.containmentJoin(c, threshold = 0.9),
        c => Dedup.containmentCandidates(Dedup.containmentPrep(c, "doc_id", "text"), 0.9)),
      Family("q81_delta_ingest", docs,
        c => Dedup.deltaIngest(
          c.filter(pmod(col("doc_id"), lit(17)) =!= 0),
          c.filter(pmod(col("doc_id"), lit(17)) === 0), threshold = 0.9),
        c => Dedup.deltaNearParts(
          c.filter(pmod(col("doc_id"), lit(17)) =!= 0),
          c.filter(pmod(col("doc_id"), lit(17)) === 0),
          0.9, "doc_id", "text", 1 << 20).candidates))

    for (f <- families; m <- ms) {
      val path = s"$work/${f.name}_m$m.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists())
        replicate(f.base, m).repartition(32).write.mode("overwrite").parquet(path)
      val corpus = spark.read.parquet(path)
      val nDocs = corpus.count()
      val nCand = f.candidates(corpus).count()
      val nPairs = f.op(corpus).count()
      val sec = timeNoop(f.op(corpus))
      println(f"""SWEEP {"op":"${f.name}","m":$m,"docs":$nDocs,"candidates":$nCand,"pairs":$nPairs,"sec":$sec%.3f}""")
      Console.out.flush()
    }
    spark.stop()
  }
}
