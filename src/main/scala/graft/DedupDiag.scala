package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.Dedup

/** Dev tool: per-stage timing of the q22 similarity-join pipeline —
  * materializes each intermediate through the noop sink to localize
  * cost between collapse, prefix build, candidate join, verify, and
  * member expansion. */
object DedupDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-dedupdiag", "32")
    val threshold = 0.9
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def mat(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())

    val docs = Tables.documents(spark, sfDir)
    val reps = Dedup.collapseIdentical(docs)
    mat("collapse.reps", reps)
    val repsC = reps.cache(); repsC.count()

    val tok = repsC.select(col("fp"), col("n_toks"), explode(col("toks")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("freq"))
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
    val prefC = prefix.cache(); prefC.count()

    val alpha = lit(threshold / (1.0d + threshold)) *
      (col("a.n_toks") + col("b.n_toks")) - lit(1e-9)
    val a = prefC.as("a")
    val b = prefC.as("b")
    val candidates = a.join(b,
        col("a.tok") === col("b.tok") &&
        col("a.fp") < col("b.fp") &&
        col("b.n_toks") >= lit(threshold) * col("a.n_toks") &&
        col("a.n_toks") >= lit(threshold) * col("b.n_toks") &&
        least(col("a.n_toks") - col("a.pos"), col("b.n_toks") - col("b.pos")) >= alpha)
      .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
    mat("candidates", candidates)
    val candC = candidates.cache(); println("DIAG n_candidates " + candC.count())

    val verified = candC
      .join(repsC.select(col("fp").as("fp_a"), col("toks").as("toks_a"), col("n_toks").as("n_a")), "fp_a")
      .join(repsC.select(col("fp").as("fp_b"), col("toks").as("toks_b"), col("n_toks").as("n_b")), "fp_b")
      .withColumn("ov", GraftFunctions.sorted_intersect_count(col("toks_a"), col("toks_b")))
      .withColumn("jaccard_raw", col("ov") / (col("n_a") + col("n_b") - col("ov")))
      .filter(col("jaccard_raw") >= threshold && col("jaccard_raw") < 1.0d)
      .select(col("fp_a"), col("fp_b"), round(col("jaccard_raw"), 4).as("jaccard"))
    mat("verify", verified)
    val verC = verified.cache(); println("DIAG n_verified " + verC.count())

    val within = repsC
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(1.0d).as("jaccard"))
    val cross = verC
      .join(repsC.select(col("fp").as("fp_a"), col("ids").as("ids_a")), "fp_a")
      .join(repsC.select(col("fp").as("fp_b"), col("ids").as("ids_b")), "fp_b")
      .select(explode(col("ids_a")).as("id_a"), col("ids_b"), col("jaccard"))
      .select(col("id_a"), explode(col("ids_b")).as("id_b"), col("jaccard"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("jaccard"))
    mat("expand+sort", within.unionByName(cross).orderBy("doc_a", "doc_b"))

    mat("full_q22", SparkEntry.queries("q22_simjoin_jaccard")(spark, sfDir))
    spark.stop()
  }
}
