package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory so Verify, Bench, and the test suite
  * run with identical semantics-relevant configuration.
  *
  * Notable settings:
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: kept for
  *    events.parquet generations that carry `ts` as TIMESTAMP(NANOS),
  *    which Spark 4 otherwise rejects at schema inference
  *    ([PARQUET_TYPE_ILLEGAL]). With the flag that generation reads
  *    as BIGINT epoch-nanos; newer `timestamp[us]` generations read
  *    as TIMESTAMP_NTZ, and [[Tables.events]] normalizes either shape
  *    to the BIGINT-nanos contract.
  *  - shuffle partitions sized to the local core count rather than the
  *    200 default: at sf0.1 each partition stays comfortably
  *    in-memory, and on a real cluster this is the knob that must
  *    track executor count anyway.
  *  - UTC session timezone so timestamp rendering matches the DuckDB
  *    oracle byte-for-byte.
  */
object GraftSession {
  def apply(appName: String, cpus: String): SparkSession = {
    val builder = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Dev knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overlays session
    // conf for A/B experiments (e.g. AQE on/off sweeps). The driver
    // never sets it; semantics-relevant settings above are defaults,
    // not law, under an explicit experiment.
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k.trim, v.trim) }
    extra.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    // getOrCreate silently IGNORES builder configs when a session
    // already exists in the JVM (tests, notebook reuse) — an A/B
    // experiment would then record results under the wrong config.
    // Verify the overlay actually took and shout if it did not.
    extra.foreach { case (k, v) =>
      val actual = spark.conf.getOption(k)
      if (!actual.contains(v))
        System.err.println(
          s"[GraftSession] WARNING: SPARK_GRAFT_EXTRA_CONF '$k=$v' did NOT take " +
            s"(session already exists; effective value: ${actual.getOrElse("<unset>")}) — " +
            "results from this session must not be attributed to the overlay")
    }
    spark.sparkContext.setLogLevel("WARN")
    // SQL surface parity: spark.sql callers get the same custom
    // expressions as the Column API.
    graft.functions.GraftFunctions.registerAll(spark)
    spark
  }
}
