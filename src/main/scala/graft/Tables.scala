package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives a scale-factor
  * directory and reads only through these helpers so that the scan
  * always goes through the vectorized parquet reader with pushdown
  * enabled (column pruning + predicate pushdown are verified in
  * `PlanSpec`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Events with `ts` normalized to the engine-wide contract: BIGINT
    * epoch-NANOSECONDS, UTC. The driver's generator has shipped this
    * column as TIMESTAMP(NANOS) (read as long via the legacy
    * `nanosAsLong` flag), and since round 8 as standard parquet
    * `timestamp[us]` with `isAdjustedToUTC=false` — which Spark 4
    * resolves as TIMESTAMP_NTZ. All downstream temporal queries
    * (`PipelineQueries` q35/q51/.../q87) contract on the nanos-long
    * shape, so normalization happens here, once, schema-adaptively:
    *
    *  - LongType           → already epoch-nanos, pass through;
    *  - TIMESTAMP_NTZ      → the generator's wall-clock IS UTC, and
    *    `GraftSession` pins `spark.sql.session.timeZone=UTC`, so a
    *    cast to TIMESTAMP reinterprets the same wall-clock on the UTC
    *    epoch; `unix_micros * 1000` then yields exact nanos (micros
    *    precision carries no sub-microsecond digits to lose);
    *  - TIMESTAMP (tz-adjusted) → already an epoch instant,
    *    `unix_micros * 1000` directly.
    *
    * The DuckDB oracle side reads the same parquet timestamp-natively
    * (`epoch_ns(ts)`), which treats naive timestamps as UTC — the
    * `TsFixtureSpec` fixture pair pins both paths to identical epoch
    * values so the next driver-side type drift fails `sbt test`, not
    * the round artifact. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    val nanos: Option[Column] = raw.schema("ts").dataType match {
      case LongType         => None
      case TimestampNTZType => Some(unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case TimestampType    => Some(unix_micros(col("ts")) * 1000L)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected epoch-nanos LONG or a parquet timestamp")
    }
    nanos.map(c => raw.withColumn("ts", c.cast(LongType))).getOrElse(raw)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
