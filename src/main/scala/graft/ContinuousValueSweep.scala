package graft

import org.apache.spark.sql.functions._

/** Dev tool: adversarial CONTINUOUS-value sweep for the census-space
  * operators ([[HotValueSweep]]'s sibling — that one stresses a hot
  * value, this one stresses an ALL-DISTINCT value column, the input
  * on which a `(group, value) → count` census approaches corpus
  * cardinality and an unbounded census window would buffer a corpus
  * fraction in one task).
  *
  * Two regimes per operator (madOutliers — the q138 shape — and the
  * q62 inline percentile-pick census):
  *
  *  - UNDER the bound (rows ≤ maxBins): the operator must run, and
  *    peak task memory must track the BOUND (the documented
  *    bounded-census-window trade), growing no faster than the
  *    census itself.
  *  - OVER the bound: the [[operators.Stats.boundedCensus]] guard
  *    must fail FAST — wall time ~ one census aggregate, and the
  *    peak task memory of the failing point must stay at the
  *    census-aggregate level (the limit caps materialization at
  *    maxBins + 1 rows; the oversized census never enters block
  *    storage).
  *
  * Prints one JSON line per (operator, rows) point.
  *
  * Usage: sbt "runMain graft.ContinuousValueSweep 250000,500000,1000000 65536"
  *   args(0) = row counts, args(1) = maxBins for the OVER-bound trip
  *   points (default 65536).
  */
object ContinuousValueSweep {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("250000,500000,1000000")
      .split(",").map(_.trim.toInt).toSeq
    val tripBins = args.lift(1).map(_.trim.toInt).getOrElse(1 << 16)
    val spark = GraftSession("graft-continuous", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    val listener = new org.apache.spark.scheduler.SparkListener {
      @volatile var peak: Long = 0L
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peak = math.max(peak, m.peakExecutionMemory)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def point(op: String, rows: Int, regime: String)(f: => Unit): Unit = {
      listener.peak = 0L
      val t0 = System.nanoTime()
      val outcome =
        try { f; "ok" }
        catch {
          case e: IllegalArgumentException
            if Option(e.getMessage).exists(_.contains("census rows")) => "failfast"
        }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener events are async; let the bus drain
      println(f"""{"op":"$op","rows":$rows,"regime":"$regime","outcome":"$outcome","sec":$sec%.3f,"peak_task_mem_bytes":${listener.peak}}""")
      Console.out.flush()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    for (n <- sizes) {
      // All-distinct value column (multiplicative hash is a bijection
      // mod the prime, and n < the prime), 5 groups.
      def corpus = spark.range(n.toLong).select(
        col("id"),
        pmod(col("id") * 2654435761L, lit(1000000007L)).as("v"),
        pmod(col("id"), lit(5L)).as("g"))
        .localCheckpoint(true)

      // Each point rebuilds its corpus: the post-point unpersist
      // (which keeps the sweep's storage flat) would otherwise drop
      // a shared checkpoint's blocks out from under the next point.
      point("madOutliers", n, "under") {
        operators.Stats.madOutliers(corpus, Seq("g"), "id", col("v"),
          maxBins = Int.MaxValue >> 1).count(); ()
      }
      point("madOutliers", n, "over") {
        operators.Stats.madOutliers(corpus, Seq("g"), "id", col("v"),
          maxBins = tripBins).count(); ()
      }
      point("q62census", n, "under") {
        val census = operators.Stats.boundedCensus(
          corpus.groupBy(col("g"), col("v")).agg(count(lit(1)).as("__c")),
          Int.MaxValue >> 1, "sweep census")
        census.count(); ()
      }
      point("q62census", n, "over") {
        val census = operators.Stats.boundedCensus(
          corpus.groupBy(col("g"), col("v")).agg(count(lit(1)).as("__c")),
          tripBins.toLong, "sweep census")
        census.count(); ()
      }
      point("kmLifeTable", n, "over") {
        operators.Stats.kmLifeTable(
          corpus.select(col("v").as("dur"), pmod(col("id"), lit(2L)).as("e")),
          col("dur"), col("e"), bucketWidth = 1L,
          maxBuckets = tripBins.toLong).count(); ()
      }
      // r14 growth waves: every new census-space operator carries the
      // same bound-by-construction contract — the all-distinct column
      // must either run with memory tracking the census (under) or
      // fail fast at the aggregate (over).
      point("ksTwoSample", n, "under") {
        operators.Stats.ksTwoSample(
          corpus.select(col("g"), (pmod(col("id"), lit(2L)) === 1L).as("b"), col("v")),
          Seq("g"), col("b"), col("v"), maxBins = Int.MaxValue >> 1).count(); ()
      }
      point("ksTwoSample", n, "over") {
        operators.Stats.ksTwoSample(
          corpus.select(col("g"), (pmod(col("id"), lit(2L)) === 1L).as("b"), col("v")),
          Seq("g"), col("b"), col("v"), maxBins = tripBins).count(); ()
      }
      point("kruskalWallis", n, "over") {
        operators.Stats.kruskalWallis(corpus.select(col("g"), col("v")),
          "g", col("v"), maxBins = tripBins).count(); ()
      }
      point("winsorize", n, "over") {
        operators.Stats.winsorize(corpus, Seq("g"), "id", col("v"),
          maxBins = tripBins).count(); ()
      }
      point("quantileNormalize", n, "under") {
        operators.Stats.quantileNormalize(corpus, Seq("g"), "id", col("v"),
          maxBins = Int.MaxValue >> 1).count(); ()
      }
      point("quantileNormalize", n, "over") {
        operators.Stats.quantileNormalize(corpus, Seq("g"), "id", col("v"),
          maxBins = tripBins).count(); ()
      }
      point("isotonicCalibrate", n, "over") {
        operators.Stats.isotonicCalibrate(
          corpus.select(col("v").as("b"), pmod(col("id"), lit(2L)).as("l")),
          col("b"), col("l"), maxBins = tripBins).count(); ()
      }
      point("ksOneVsRest", n, "over") {
        operators.Stats.ksOneVsRest(corpus.select(col("g"), col("v")),
          "g", col("v"), maxBins = tripBins).count(); ()
      }
      point("bestSplit", n, "over") {
        operators.Stats.bestSplit(
          corpus.select(col("g"), col("v"), pmod(col("id"), lit(2L)).as("l")),
          Seq("g"), col("v"), col("l"), maxBins = tripBins).count(); ()
      }
      point("psiDrift", n, "over") {
        operators.Stats.psiDrift(
          corpus.select(col("g"), (pmod(col("id"), lit(2L)) === 1L).as("b"), col("v")),
          Seq("g"), col("b"), col("v"), maxBins = tripBins).count(); ()
      }
      point("cohenKappa", n, "over") {
        operators.Stats.cohenKappa(
          corpus.select(col("g"), col("v").as("a"), pmod(col("id"), lit(3L)).as("b")),
          Seq("g"), col("a"), col("b"), maxBins = tripBins).count(); ()
      }
      // r15: the jackknife's bucket census — all-distinct buckets is
      // exactly the adversarial input (every row its own replicate).
      point("jackknifeMeanVar", n, "under") {
        operators.Stats.jackknifeMeanVar(
          corpus.select(col("g"), col("v").as("b"), pmod(col("id"), lit(97L)).as("x")),
          Seq("g"), col("b"), col("x"), maxBuckets = Int.MaxValue >> 1).count(); ()
      }
      point("jackknifeMeanVar", n, "over") {
        operators.Stats.jackknifeMeanVar(
          corpus.select(col("g"), col("v").as("b"), pmod(col("id"), lit(97L)).as("x")),
          Seq("g"), col("b"), col("x"), maxBuckets = tripBins.toLong).count(); ()
      }
      // r15: the v-optimal DP's bin census — all-distinct bins would
      // make the B² interval-cell stage quadratic in the corpus.
      point("vOptimalHist", n, "over") {
        operators.Stats.vOptimalHist(
          corpus.select(col("v").as("b"), pmod(col("id"), lit(97L)).as("x")),
          col("b"), col("x"), k = 4, maxBins = tripBins.toLong).count(); ()
      }
    }
    spark.stop()
  }
}
