package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Dev tool: locate q36's Spark-side cost (scan / kernel / sort). */
object ViDiag2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-vidiag2", "32")
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"VIDIAG2 $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def mat(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())
    val orders = Tables.orders(spark, sfDir)
    val input = concat(
      dayofmonth(col("o_orderdate")), lit("/"),
      month(col("o_orderdate")), lit("/"), year(col("o_orderdate")),
      lit(" giá 234,56 đ xem https://example.com/x"))
    mat("scan+concat", orders.select(col("o_orderkey"), input.as("norm")))
    mat("plus_normalize", orders.select(col("o_orderkey"), GraftFunctions.vi_normalize_text(input).as("norm")))
    mat("plus_normalize2", orders.select(col("o_orderkey"), GraftFunctions.vi_normalize_text(input).as("norm")))
    mat("plus_sort", orders.select(col("o_orderkey"), GraftFunctions.vi_normalize_text(input).as("norm")).orderBy("o_orderkey"))
    mat("plus_sort2", orders.select(col("o_orderkey"), GraftFunctions.vi_normalize_text(input).as("norm")).orderBy("o_orderkey"))
    orders.select(col("o_orderkey"), GraftFunctions.vi_normalize_text(input).as("norm")).orderBy("o_orderkey").explain("formatted")
    spark.stop()
  }
}
