package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Tables

/** Dev tool: per-stage timing of the q24 simhash pipeline. */
object SimhashDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-simhashdiag", "32")
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val sigs = Dedup.simhashSignatures(docs)
    time("sigs")(sigs.write.format("noop").mode("overwrite").save())
    val sigGroups = sigs.groupBy(col("simhash")).agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    time("sigGroups")(sigGroups.write.format("noop").mode("overwrite").save())
    val reps = sigGroups.select(col("simhash"))
    time("limitProbe")(println("  n=" + reps.limit(32769).count()))
    val a = reps.as("a"); val b = reps.as("b")
    val hamming = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    val sigPairs = a.join(b, col("a.simhash") < col("b.simhash") && hamming <= 5)
      .select(col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"), hamming.as("hamming"))
    time("sigPairs")(sigPairs.write.format("noop").mode("overwrite").save())
    val full = Dedup.simhashNearDupPairs(docs, maxHamming = 5)
    time("full")(full.write.format("noop").mode("overwrite").save())
    time("full+sort")(full.orderBy("doc_a", "doc_b").write.format("noop").mode("overwrite").save())
    time("full+sort2")(full.orderBy("doc_a", "doc_b").write.format("noop").mode("overwrite").save())
    full.orderBy("doc_a", "doc_b").explain("formatted")
    spark.stop()
  }
}
