package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Tables.events]]' schema-adaptive `ts` ingestion against the
  * two parquet generations the driver has actually shipped:
  *
  *   - BIGINT epoch-nanos (the TIMESTAMP(NANOS)-under-`nanosAsLong`
  *     shape of rounds ≤7),
  *   - standard `timestamp[us]` with `isAdjustedToUTC=false`
  *     (TIMESTAMP_NTZ to Spark; the shape since round 8 — its silent
  *     arrival cost round 8 all ten temporal query gates).
  *
  * Both fixtures encode the SAME instants; the spec asserts the two
  * ingestion paths produce byte-identical BIGINT-nanos output and
  * pins the exact epoch values, so the next driver-side type drift
  * fails here in `sbt test` instead of in the round artifact.
  */
class TsFixtureSpec extends SparkSuite {

  /** 2024-01-01T00:00:07.179575Z and two later instants, as micros. */
  private val epochMicros = Seq(1704067207179575L, 1704070800000000L, 1706659032194062L)

  private def writeFixtures(): (String, String) = {
    val dir = Files.createTempDirectory("ts-fixture").toFile
    dir.deleteOnExit()
    val nanosDir = new java.io.File(dir, "nanos").getAbsolutePath
    val microsDir = new java.io.File(dir, "micros").getAbsolutePath

    def rows(mk: Long => Any) = epochMicros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, mk(us), i.toLong % 2, "click", 1.0, "{}")
    }
    def schema(tsType: DataType) = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // Old generation: ts as BIGINT epoch-nanos (what nanosAsLong yields).
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows(us => us * 1000L), 1),
        schema(LongType))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    // New generation: ts as TIMESTAMP_NTZ; Spark writes NTZ as parquet
    // `timestamp[us]` isAdjustedToUTC=false — exactly the driver's
    // round-8+ shape. Build the wall-clock via UTC so the fixture
    // encodes the intended instant regardless of JVM default zone.
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows(us =>
          LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000,
            java.time.ZoneOffset.UTC)), 1),
        schema(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    (nanosDir, microsDir)
  }

  test("micros-timestamp and nanos-long events fixtures ingest identically") {
    val (nanosDir, microsDir) = writeFixtures()
    // Confirm the micros fixture really round-trips as NTZ (the
    // driver's shape) — if Spark ever writes it adjusted-to-UTC the
    // fixture would no longer model the regression.
    assert(spark.read.parquet(s"$microsDir/events.parquet").schema("ts").dataType ===
      TimestampNTZType)

    val fromNanos = Tables.events(spark, nanosDir)
    val fromMicros = Tables.events(spark, microsDir)
    assert(fromNanos.schema("ts").dataType === LongType)
    assert(fromMicros.schema("ts").dataType === LongType)

    val a = fromNanos.orderBy("event_id").collect().toSeq
    val b = fromMicros.orderBy("event_id").collect().toSeq
    assert(a === b)
  }

  test("adjusted-to-UTC TIMESTAMP parquet ingests identically (the third branch)") {
    // A generator could also ship ts as instant-semantics TIMESTAMP
    // (isAdjustedToUTC=true). Write one via outputTimestampType=
    // TIMESTAMP_MICROS and pin that Tables.events' TimestampType
    // branch lands on the same epochs as the other two generations.
    val dir = Files.createTempDirectory("ts-fixture-utc").toFile
    dir.deleteOnExit()
    val utcDir = new java.io.File(dir, "utc").getAbsolutePath
    val rows = epochMicros.zipWithIndex.map { case (us, i) =>
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      Row(i.toLong, t, i.toLong % 2, "click", 1.0, "{}")
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // Whatever parquet physical form the session writes TimestampType
    // as (INT96 or adjusted-to-UTC micros), it reads back as
    // TimestampType — the branch under test — at micros precision.
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$utcDir/events.parquet")
    val got = Tables.events(spark, utcDir)
      .orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got === epochMicros.map(_ * 1000L))
  }

  test("ingested ts pins the exact UTC epoch values") {
    val (_, microsDir) = writeFixtures()
    val got = Tables.events(spark, microsDir)
      .orderBy("event_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got === epochMicros.map(_ * 1000L))
  }

  test("driver testdata ts matches the DuckDB-oracle epoch convention") {
    // The oracle computes epoch_ns(ts) treating the naive timestamp as
    // UTC; min(ts) at sf0.001 is a stable generator output. Pin the
    // engine's ingested minimum to the same convention: it must be a
    // plausible 2024 epoch-nanos value and exactly divisible by 1000
    // (micros precision — no fabricated sub-microsecond digits).
    val minTs = Tables.events(spark, sfDir).agg(min("ts")).collect()(0).getLong(0)
    assert(minTs % 1000L === 0L)
    assert(minTs > 1704067200L * 1000000000L) // ≥ 2024-01-01T00:00:00Z
    assert(minTs < 1735689600L * 1000000000L) // < 2025-01-01T00:00:00Z
  }
}
