package graft

import org.apache.spark.sql.functions._

/** Dev probe: decompose the q105 triangle census — checkpoint builds
  * vs intersection join vs final aggregate. */
object Q105Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("q105-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val edges = Tables.orders(spark, sfDir).select(
          pmod(col("o_custkey"), lit(2048)).as("src"),
          pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(2048)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val ue = edges
        .select(least(col("src"), col("dst")).cast("long").as("u"),
          greatest(col("src"), col("dst")).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      val t1 = System.nanoTime()
      val deg = ue.select(col("u").as("node")).union(ue.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val t2 = System.nanoTime()
      val withDeg = ue
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val o = withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"))
        .localCheckpoint()
      val t3 = System.nanoTime()
      val adj = o.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
      val tris = o
        .join(adj.select(col("src"), col("nbrs").as("nx")), Seq("src"))
        .join(adj.select(col("src").as("dst"), col("nbrs").as("ny")), Seq("dst"))
        .select(col("src").as("x"), col("dst").as("y"),
          explode(array_intersect(col("nx"), col("ny"))).as("z"))
      val perNode = tris
        .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      val out = deg.join(perNode, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"))
        .withColumn("clust",
          when(col("deg") >= 2,
            (col("n_tri") * 2L).cast("double") /
              (col("deg") * (col("deg") - 1L)).cast("double")))
        .orderBy("node")
      out.write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      println(f"RUN$i ue=${(t1 - t0) / 1e9}%.3f deg=${(t2 - t1) / 1e9}%.3f o=${(t3 - t2) / 1e9}%.3f tail=${(t4 - t3) / 1e9}%.3f total=${(t4 - t0) / 1e9}%.3f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
