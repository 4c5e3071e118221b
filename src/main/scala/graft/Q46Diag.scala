package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, TextFunctions}
import graft.operators.Dedup

/** Dev tool: per-stage timing of the q46 word-token Jaccard pipeline
  * (the Zipfian-vocabulary twin of Q43Diag). */
object Q46Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-q46diag", "32")
    val threshold = 0.9
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def mat(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())

    val hs = transform(
      sequence(lit(0), (lit(7) + pmod(col("k"), lit(8))).cast("int")),
      j => HashFunctions.h60(
        concat(col("k").cast("string"), lit(":"), j.cast("string"))))
    val words = transform(hs, h =>
      concat(lit("w"),
        pmod(shiftright(h, 30),
          lit(1L) + pmod(h.bitwiseAND(lit(1073741823L)), lit(30000L)))
          .cast("string")))
    val withToks = Tables.orders(spark, sfDir)
      .filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .select(col("o_orderkey").as("k"))
      .select(col("k"), words.as("toks"))
    val corpus = withToks
      .select(inline(array(
        struct((col("k") * 2).as("doc_id"), array_join(col("toks"), " ").as("text")),
        struct((col("k") * 2 + 1).as("doc_id"),
          when(pmod(col("k"), lit(9)) === 0,
            array_join(slice(col("toks"), lit(1), size(col("toks")) - 1), " "))
            .as("text")))))
      .filter(col("text").isNotNull)
    mat("corpus", corpus)
    time("n_docs")(println("  n=" + corpus.count()))
    val reps = Dedup.collapseIdentical(corpus)
    mat("reps", reps)
    time("n_reps")(println("  n=" + reps.count()))
    val tok = reps.select(col("fp"), col("n_toks"), explode(col("toks")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("freq"))
    mat("freq", freq)
    time("freq_stats")(freq.selectExpr("count(*) as vocab", "max(freq) as max_df",
      "sum(freq*freq) as sum_df2").show())
    val ranked = tok.join(freq, "tok")
    val prefixLen = (col("n_toks") - ceil(lit(threshold) * col("n_toks")) + 1).cast("int")
    val prefix = ranked
      .groupBy(col("fp"))
      .agg(first(col("n_toks")).as("n_toks"),
        array_sort(collect_list(struct(col("freq"), col("tok")))).as("ranked_toks"))
      .select(col("fp"), col("n_toks"),
        posexplode(slice(col("ranked_toks"), lit(1), prefixLen)))
      .select(col("fp"), col("n_toks"), col("pos"),
        xxhash64(col("col").getField("tok")).as("tok"))
    mat("prefix", prefix)
    time("prefix_stats")(prefix.groupBy("tok").count()
      .selectExpr("count(*) as n_prefix_toks", "max(count) as max_posting",
        "sum(count*count) as sum_post2").show())
    val alpha = lit(threshold / (1.0d + threshold)) *
      (col("a.n_toks") + col("b.n_toks")) - lit(1e-9)
    val a = prefix.as("a"); val b = prefix.as("b")
    val joined = a.join(b,
        col("a.tok") === col("b.tok") && col("a.fp") < col("b.fp") &&
        col("b.n_toks") >= lit(threshold) * col("a.n_toks") &&
        col("a.n_toks") >= lit(threshold) * col("b.n_toks") &&
        least(col("a.n_toks") - col("a.pos"), col("b.n_toks") - col("b.pos")) >= alpha)
      .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
    time("raw_matches")(println("  n=" + joined.count()))
    val candidates = joined.distinct()
    time("candidates")(println("  n=" + candidates.count()))
    mat("full_q46", SparkEntry.queries("q46_simjoin_words")(spark, sfDir))
    mat("full_q46_again", SparkEntry.queries("q46_simjoin_words")(spark, sfDir))
    spark.stop()
  }
}
