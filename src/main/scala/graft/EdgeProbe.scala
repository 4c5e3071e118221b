package graft

import org.apache.spark.sql.functions._

/** Dev probe: cost of the graph tier's synthetic edge frame under
  * (a) the pre-r14 driver-count literal modulus and (b) the in-frame
  * broadcast-join modulus, each timed through the canonical
  * distinct + localCheckpoint materialization the consumers run. */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-edge-probe", "32")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time3(label: String)(body: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        val n = body
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"EDGEPROBE $label min=${ts.map(_._1).min}%.3f runs=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }
    val orders = Tables.orders(spark, sf)
    time3("literal") {
      val m = orders.count() / 8L
      orders.select(
          pmod(col("o_custkey"), lit(m)).as("src"),
          pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(m)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
        .distinct().localCheckpoint(true).count()
    }
    time3("inframe") {
      val m = orders.agg(expr("count(1) div 8").as("__m")).withColumn("__k", lit(1))
      orders.withColumn("__k", lit(1)).join(broadcast(m), "__k")
        .select(
          pmod(col("o_custkey"), col("__m")).as("src"),
          pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, col("__m")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
        .distinct().localCheckpoint(true).count()
    }
    spark.stop()
  }
}
