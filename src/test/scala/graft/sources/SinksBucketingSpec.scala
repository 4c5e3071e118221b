package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the whole point of [[Sinks.bucketedTable]]: once two tables
  * are bucketed on the join key with the same bucket count, the
  * equi-join and the per-key aggregation plan with ZERO Exchange —
  * the shuffle was paid at write time. */
class SinksBucketingSpec extends SparkSuite {

  test("bucketed tables co-join and aggregate with zero Exchange; results match unbucketed") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val base = Files.createTempDirectory(Paths.get("target"), "buckets").toAbsolutePath
    Sinks.bucketedTable(orders, "b_orders", s"$base/orders", buckets = 8, keyCol = "o_custkey")
    Sinks.bucketedTable(customer, "b_customer", s"$base/customer", buckets = 8, keyCol = "c_custkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force the SMJ shape under test
    try {
      val bo = spark.table("b_orders")
      val bc = spark.table("b_customer")
      // The join and the per-custkey revenue agg share the bucket key:
      // the whole stage up to the (different-key) mktsegment re-agg
      // must be Exchange-free.
      val perKey = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
        .groupBy(col("o_custkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
      val jPlan = perKey.queryExecution.executedPlan.toString
      assert(!jPlan.contains("Exchange"),
        s"bucketed equi-join + bucket-key agg must not shuffle:\n${jPlan.take(1500)}")
      val joined = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))

      val agg = bo.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n${aPlan.take(1500)}")

      // Same answers as the unbucketed plan (revenue to 1e-9 relative
      // — a double sum's accumulation order legitimately differs
      // between the bucketed and shuffled partitionings).
      def collectBySeg(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val want = collectBySeg(
        orders.join(customer, orders("o_custkey") === customer("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev")))
      val got = collectBySeg(joined)
      assert(got.keySet === want.keySet)
      for ((seg, (n, rev)) <- want; (gn, grev) = got(seg)) {
        assert(gn === n, s"count for $seg")
        assert(math.abs(grev - rev) <= 1e-9 * math.abs(rev), s"revenue for $seg")
      }
      assert(agg.collect().map(_.getLong(1)).sum === orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
