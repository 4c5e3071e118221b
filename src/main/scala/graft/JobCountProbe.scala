package graft

/** Dev probe (r18 opt): count Spark JOBS a query launches end-to-end
  * (build + noop write). Wall time on a noisy band cannot resolve a
  * one-job delta; the scheduler's job count can — it is exact and
  * load-independent. Usage:
  *   runMain graft.JobCountProbe <q1,q2,...> [sfDir] [reps]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val spark = GraftSession("job-count-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.get("JOB_PROBE_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          starts.put(j.jobId, System.nanoTime())
          if (verbose) println(s"  [job ${j.jobId}] stages=${j.stageInfos.size} " +
            j.stageInfos.map(s => s"${s.name.take(60)}(${s.numTasks}t)").mkString(" | "))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(j.jobId)
          if (verbose && t0 != null)
            println(f"  [job ${j.jobId} end] ${(System.nanoTime() - t0) / 1e9}%.3fs")
        }
      })
    // Drain the asynchronous listener bus ADAPTIVELY (r19, r18
    // advisor): a fixed sleep can under-wait under load, attributing
    // late-arriving job events to the wrong rep. Poll until the
    // counter has been stable for 3 consecutive 100 ms intervals
    // (bounded at 5 s). Still heuristic — the bus exposes no public
    // quiesce hook — so counts on a heavily contended machine carry a
    // small residual race; the stability window makes mis-attribution
    // unlikely rather than impossible, and the probe's output should
    // be read with that caveat.
    def drain(): Unit = {
      var last = jobs.get(); var stable = 0; var waited = 0
      while (stable < 3 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = jobs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    }
    spark.range(1000000L).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    for (n <- names) {
      // warm once (untimed, uncounted toward the reported runs)
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$n WARM-FAIL: ${e.getMessage}") }
      val counts = (1 to reps).map { _ =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        drain()
        val before = jobs.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        drain()
        (jobs.get() - before, sec)
      }
      println(f"JOBS $n%-30s " + counts.map { case (c, s) =>
        f"$c%d jobs ${s}%.3fs" }.mkString(" | "))
    }
    spark.stop()
  }
}
