package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Dev probe: decompose q214's wall time into micro-batch phases
  * (via StreamingQueryProgress.durationMs) under variant configs, to
  * locate the structural floor the round-15 verdict flagged. */
object Q214Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("q214-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def run(tag: String, thin: Boolean, watermark: String, parts: Option[Int]): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      parts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
      try {
        val t0 = System.nanoTime()
        val path = s"$sfDir/events.parquet"
        val batchSchema = spark.read.parquet(path).schema
        val raw = spark.readStream.schema(batchSchema)
          .option("maxFilesPerTrigger", 1 << 20)
          .option("pathGlobFilter", "events.parquet")
          .parquet(sfDir)
        val ev0 = (batchSchema("ts").dataType match {
          case LongType => raw
          case TimestampNTZType | TimestampType =>
            raw.withColumn("ts",
              (unix_micros(col("ts").cast(TimestampType)) * 1000L).cast(LongType))
          case other => throw new IllegalStateException(s"$other")
        }).filter(col("ts").isNotNull && col("user_id").isNotNull)
        val ev = if (thin)
          ev0.filter(col("event_type").isin("view", "click"))
            .select("event_id", "user_id", "event_type", "ts")
        else ev0
        val joined = graft.streaming.EventStreams.attributionJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          keyCol = "user_id", horizon = "30 minutes", watermark = watermark)
        val sink = s"probe_${System.nanoTime()}"
        val q = joined.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        val t1 = System.nanoTime()
        try q.processAllAvailable() finally {
          val t2 = System.nanoTime()
          val progs = q.recentProgress
          q.stop()
          val t3 = System.nanoTime()
          val n = spark.table(sink).count()
          println(f"== $tag rows=$n start=${(t1 - t0) / 1e9}%.3f drain=${(t2 - t1) / 1e9}%.3f stop=${(t3 - t2) / 1e9}%.3f")
          progs.foreach { p =>
            println(s"   batch=${p.batchId} numInput=${p.numInputRows} durations=${p.durationMs}")
          }
        }
      } finally { spark.conf.set("spark.sql.shuffle.partitions", prev) }
    }

    run("warm(thin,31m,32p)", thin = true, "31 minutes", None)
    run("fat-2h-32p", thin = false, "2 hours", None)
    run("thin-31m-32p", thin = true, "31 minutes", None)
    run("thin-31m-8p", thin = true, "31 minutes", Some(8))
    run("thin-31m-4p", thin = true, "31 minutes", Some(4))
    run("fat-2h-32p-again", thin = false, "2 hours", None)
    spark.stop()
  }
}
