package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: q105 checkpoint-placement variants — which of the three
  * multi-pass materializations actually pay for themselves on the
  * sf0.1 graph. */
object Q105Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("q105-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def edges(): DataFrame = Tables.orders(spark, sfDir).select(
        pmod(col("o_custkey"), lit(2048)).as("src"),
        pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(2048)).as("dst"))
      .filter(col("src") =!= col("dst"))

    def tri(cpUe: Boolean, cpDeg: Boolean, cpO: Boolean): DataFrame = {
      val ue0 = edges()
        .select(least(col("src"), col("dst")).cast("long").as("u"),
          greatest(col("src"), col("dst")).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      val ue = if (cpUe) ue0.localCheckpoint() else ue0
      val deg0 = ue.select(col("u").as("node")).union(ue.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val deg = if (cpDeg) deg0.localCheckpoint() else deg0
      val withDeg = ue
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val o0 = withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"))
      val o = if (cpO) o0.localCheckpoint() else o0
      val adj = o.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
      val tris = o
        .join(adj.select(col("src"), col("nbrs").as("nx")), Seq("src"))
        .join(adj.select(col("src").as("dst"), col("nbrs").as("ny")), Seq("dst"))
        .select(col("src").as("x"), col("dst").as("y"),
          explode(array_intersect(col("nx"), col("ny"))).as("z"))
      val perNode = tris
        .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      deg.join(perNode, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"))
        .withColumn("clust",
          when(col("deg") >= 2,
            (col("n_tri") * 2L).cast("double") /
              (col("deg") * (col("deg") - 1L)).cast("double")))
        .orderBy("node")
    }

    def run(tag: String, cpUe: Boolean, cpDeg: Boolean, cpO: Boolean): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        tri(cpUe, cpDeg, cpO).write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q105VAR $tag%-16s min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    run("ue+deg+o", cpUe = true, cpDeg = true, cpO = true)   // shipped
    run("deg+o", cpUe = false, cpDeg = true, cpO = true)
    run("o-only", cpUe = false, cpDeg = false, cpO = true)
    run("none", cpUe = false, cpDeg = false, cpO = false)
    run("ue+o", cpUe = true, cpDeg = false, cpO = true)
    spark.stop()
  }
}
