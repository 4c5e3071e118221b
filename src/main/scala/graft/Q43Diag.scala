package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.Dedup

/** Dev tool: per-stage timing of the q43 shingle-Jaccard pipeline
  * (the prefix-path twin of DedupDiag). */
object Q43Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-q43diag", "32")
    val threshold = 0.9
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def mat(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())

    val shingled = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        array_join(GraftFunctions.shingle_hex_tokens(split(col("text"), " "), 3), " ").as("text"))
    mat("shingled", shingled)
    val reps = Dedup.collapseIdentical(shingled)

    mat("reps", reps)
    val tok = reps.select(col("fp"), col("n_toks"), explode(col("toks")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("freq"))
    mat("freq", freq)
    time("vocabProbe")(println("  vocab65=" +
      freq.select(col("tok")).orderBy("tok").limit(65).count()))
    val ranked = tok.join(freq, "tok")
    val prefixLen = (col("n_toks") - ceil(lit(threshold) * col("n_toks")) + 1).cast("int")
    val prefix = ranked
      .groupBy(col("fp"))
      .agg(first(col("n_toks")).as("n_toks"),
        array_sort(collect_list(struct(col("freq"), col("tok")))).as("ranked_toks"))
      .select(col("fp"), col("n_toks"),
        posexplode(slice(col("ranked_toks"), lit(1), prefixLen)))
      .select(col("fp"), col("n_toks"), col("pos"), col("col").getField("tok").as("tok"))
    mat("prefix", prefix)
    val alpha = lit(threshold / (1.0d + threshold)) *
      (col("a.n_toks") + col("b.n_toks")) - lit(1e-9)
    val a = prefix.as("a"); val b = prefix.as("b")
    val candidates = a.join(b,
        col("a.tok") === col("b.tok") && col("a.fp") < col("b.fp") &&
        col("b.n_toks") >= lit(threshold) * col("a.n_toks") &&
        col("a.n_toks") >= lit(threshold) * col("b.n_toks") &&
        least(col("a.n_toks") - col("a.pos"), col("b.n_toks") - col("b.pos")) >= alpha)
      .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
    time("candidates")(println("  n_cand=" + candidates.count()))
    mat("full_q43", SparkEntry.queries("q43_simjoin_ngram")(spark, sfDir))
    mat("full_q43_again", SparkEntry.queries("q43_simjoin_ngram")(spark, sfDir))
    spark.stop()
  }
}
