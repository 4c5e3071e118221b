package graft

import org.apache.spark.sql.functions._

/** Dev tool: adversarial skew sweep for [[operators.Stats.classAuc]]
  * and [[operators.Stats.spearman]] (the [[HotAnchorSweep]] pattern).
  *
  * Synthesizes a corpus where 90% of rows share ONE score value —
  * exactly the shape that made the round-12 `Window.partitionBy(v)`
  * tie-rank formulation buffer a corpus fraction in a single task's
  * sort. The census formulation must instead scale linearly in rows
  * with FLAT peak task memory: the only per-row work is a map-side-
  * combined `(value, label) → count` aggregate, and every window
  * runs over the bounded census.
  *
  * Prints one JSON line per sweep point: rows, auc-row count, rho,
  * wall seconds for each operator, and the peak task execution
  * memory across the point's jobs — the number that must stay flat
  * as rows grow.
  *
  * Usage: sbt "runMain graft.HotValueSweep 1000000,2000000,4000000"
  */
object HotValueSweep {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,2000000,4000000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession("graft-hotvalue", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    val listener = new org.apache.spark.scheduler.SparkListener {
      @volatile var peak: Long = 0L
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peak = math.max(peak, m.peakExecutionMemory)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (n <- sizes) {
      // 90% of rows score 7 (the hot value); the rest spread over
      // 64 cold values. Labels split by a coprime stride so both
      // classes carry hot rows.
      val corpus = spark.range(n.toLong).select(
        col("id"),
        when(pmod(col("id"), lit(10L)) < 9L, lit(7L))
          .otherwise(pmod(col("id") * 37L, lit(64L)) + 100L).as("score"),
        pmod(col("id"), lit(2L)).as("label"))
        .localCheckpoint(true)

      listener.peak = 0L
      val t0 = System.nanoTime()
      val aucRows = operators.Stats.classAuc(corpus, "id", col("score"), "label").count()
      val tAuc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rho = operators.Stats.spearman(corpus, "id", col("score"),
          pmod(col("label") * 11L + col("score"), lit(97L)))
        .collect().head.getDouble(4)
      val tRho = (System.nanoTime() - t1) / 1e9
      Thread.sleep(500) // listener events are async; let the bus drain
      println(f"""{"rows":$n,"auc_rows":$aucRows,"rho":$rho%.6f,"auc_sec":$tAuc%.3f,"spearman_sec":$tRho%.3f,"peak_task_mem_bytes":${listener.peak}}""")
      Console.out.flush()
    }
    spark.stop()
  }
}
