package graft

/** Dev tool: time a named subset of [[SparkEntry.queries]] (all when
  * no args), n runs each (SPARK_GRAFT_RUNS, default 3), through the
  * same noop-sink materialization as [[Bench]]. Prints per-run and
  * median seconds — used while iterating on one query without paying
  * for the whole bench.
  *
  * Usage: sbt "runMain graft.QuickBench q22_simjoin_jaccard q27_langid"
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"Unknown queries: ${unknown.mkString(", ")}\nValid names:\n  " +
          SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val spark = GraftSession("graft-quickbench", cpus)
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(times.length / 2)
      println(f"QUICKBENCH $name%-28s median=$med%8.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
