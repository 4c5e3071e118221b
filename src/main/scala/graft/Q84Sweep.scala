package graft
object Q84Sweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("q22-hypo", "32")
    def run(dir: String, label: String): Unit = {
      val fn = SparkEntry.queries("q22_simjoin_jaccard")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q22HYPO $label median=${times.sorted.apply(1)}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    run("/tmp/sweep10x", "10x-default-10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
    run("/tmp/sweep10x", "10x-bcast-256MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    run("/tmp/sweep10x", "10x-shuf128")
    spark.stop()
  }
}
