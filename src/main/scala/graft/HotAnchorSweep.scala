package graft

import org.apache.spark.sql.functions._

/** Dev tool: adversarial scale sweep for [[operators.ExactSubstring]].
  *
  * Synthesizes a corpus where EVERY document opens with the same
  * `boilerplate`-token preamble — so each preamble k-gram hash occurs
  * once per document, i.e. the anchor-frequency distribution has
  * `boilerplate − k + 1` hashes that are each `nDocs`-hot. This is
  * exactly the shape that made the round-8 `count over
  * Window.partitionBy(h)` formulation a single-task buffer of the
  * whole occurrence list; the groupBy+semi-join formulation must
  * instead scale linearly in `nDocs` with flat per-task memory
  * (qualifying-hash build side = one row per hash, anchor side
  * streamed).
  *
  * Prints one JSON line per sweep point: docs, spans found, wall
  * seconds, and peak execution memory of the heaviest task
  * (taskMetrics.peakExecutionMemory max over the job's stages) —
  * the number that must stay FLAT as docs grow.
  *
  * Usage: sbt "runMain graft.HotAnchorSweep 20000,40000,80000"
  */
object HotAnchorSweep {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("20000,40000,80000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession("graft-hotanchor", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val boilerplate = 64
    val k = 8
    val preamble = (0 until boilerplate).map(i => s"bp$i").mkString(" ")

    val listener = new org.apache.spark.scheduler.SparkListener {
      @volatile var peak: Long = 0L
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peak = math.max(peak, m.peakExecutionMemory)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (n <- sizes) {
      // Unique 32-token tail per doc: its k-grams are corpus-unique,
      // so the repeated-span answer is exactly the shared preamble.
      val corpus = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        concat(lit(preamble + " "), concat_ws(" ",
          transform(sequence(lit(0), lit(31)),
            i => concat(lit("u"), col("id"), lit("x"), i)))).as("text"))

      listener.peak = 0L
      val t0 = System.nanoTime()
      val spans = operators.ExactSubstring.repeatedSpans(corpus, k = k)
      val cnt = spans.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(500)
      println(f"""{"docs":$n,"spans":$cnt,"sec":$sec%.3f,"peak_task_mem_bytes":${listener.peak}}""")
      Console.out.flush()
    }
    spark.stop()
  }
}
