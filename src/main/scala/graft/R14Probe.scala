package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Similarity}

/** Round-14 regression probe: stage-level timings for q129 (kHopReach)
  * and q84 (trained SemDeDup), the two queries whose r13 artifact
  * minutes read ~2x over their r12 artifact numbers with no plan
  * change. Each stage is timed with the same noop-sink full
  * materialization Bench uses, min-of-3, so the numbers are
  * comparable to bench lines. Throwaway diagnostic — not part of any
  * gate.
  */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession("graft-r14-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time3(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"[probe] $name%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // q129 staged
    time3("q129 full") {
      val m = Tables.orders(spark, d).count() / 8L
      val edges = Tables.orders(spark, d).select(
          pmod(col("o_custkey"), lit(m)).as("src"),
          pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(m)).as("dst"))
        .filter(col("src") =!= col("dst"))
      Graph.kHopReach(edges, "src", "dst", k = 2).orderBy("node")
        .write.format("noop").mode("overwrite").save()
    }
    time3("q129 orders.count") {
      Tables.orders(spark, d).count(); ()
    }
    time3("q129 canonical only") {
      val m = Tables.orders(spark, d).count() / 8L
      val edges = Tables.orders(spark, d).select(
          pmod(col("o_custkey"), lit(m)).as("src"),
          pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(m)).as("dst"))
        .filter(col("src") =!= col("dst"))
      Graph.canonicalUndirected(edges, "src", "dst")
        .write.format("noop").mode("overwrite").save()
    }
    // q84 staged
    def q84corpus = {
      val base = Tables.embeddings(spark, d)
        .select(col("vec_id"),
          functions.VectorFunctions.asDouble(col("embedding")).as("embedding"))
      val twins = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(
            array(element_at(col("embedding"), 1) * lit(1.2)),
            slice(col("embedding"), 2, 63)).as("embedding"))
      base.unionByName(twins)
    }
    time3("q84 full") {
      val corpus = q84corpus
      val model = operators.Clustering.fit(corpus, k = 8, iters = 2)
      Similarity.semanticBlockedPairsWithModel(corpus, threshold = 0.99,
          model = model, nAssign = 2)
        .orderBy("vec_a", "vec_b")
        .write.format("noop").mode("overwrite").save()
    }
    time3("q84 fit only") {
      operators.Clustering.fit(q84corpus, k = 8, iters = 2); ()
    }
    time3("q84 fit on checkpointed") {
      operators.Clustering.fit(q84corpus.localCheckpoint(true), k = 8, iters = 2); ()
    }
    time3("q84 full ckpt corpus") {
      val corpus = q84corpus.localCheckpoint(true)
      val model = operators.Clustering.fit(corpus, k = 8, iters = 2)
      Similarity.semanticBlockedPairsWithModel(corpus, threshold = 0.99,
          model = model, nAssign = 2)
        .orderBy("vec_a", "vec_b")
        .write.format("noop").mode("overwrite").save()
    }
    val m84 = operators.Clustering.fit(q84corpus, k = 8, iters = 2)
    time3("q84 pairs (prefit model)") {
      Similarity.semanticBlockedPairsWithModel(q84corpus, threshold = 0.99,
          model = m84, nAssign = 2)
        .orderBy("vec_a", "vec_b")
        .write.format("noop").mode("overwrite").save()
    }

    time3("q129 hop from canonical") {
      val m = Tables.orders(spark, d).count() / 8L
      val edges = Tables.orders(spark, d).select(
          pmod(col("o_custkey"), lit(m)).as("src"),
          pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(m)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val ue = Graph.canonicalUndirected(edges, "src", "dst")
      Graph.kHopReachCanonical(ue, k = 2).orderBy("node")
        .write.format("noop").mode("overwrite").save()
    }
  }
}
