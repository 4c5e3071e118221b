package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Scale-mechanics proofs: bucketed tables join without a shuffle,
  * and the skew-salting operators produce exactly the unsalted
  * results. */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed tables co-locate: sort-merge join with zero exchanges") {
    val n = 1000
    // DROP on the in-memory catalog does not remove a previous JVM's
    // orphaned warehouse directory — clear both.
    for (t <- Seq("bt1", "bt2")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    (1 to n).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt1")
    (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt2")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bt1").join(spark.table("bt2"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1000))
      // the whole point of bucketing: both sides arrive pre-hashed,
      // so the join plans with NO shuffle exchange at all
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(joined.count() == n)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals the unsalted aggregate") {
    // one hot key carrying 90% of rows
    val rows = (1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 37}", i.toLong))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedSumCount(df, "k", "v", col("v"), salts = 16)
      .select("k", "sum_v", "n").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(salted == plain)
  }

  test("salted join equals the plain join") {
    val probe = ((1 to 5000).map(_ => ("hot", 1.0)) ++
      (1 to 100).map(i => (s"k$i", 2.0))).toDF("k", "v")
    val build = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map(k => (k, k.length)).toDF("k", "len")
    val salted = Skew.saltedJoin(probe, build, "k", col("v") * monotonically_increasing_id(), 8)
    val plain = probe.join(build, "k")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().as[(String, Long)].collect().toMap ==
      plain.groupBy("k").count().as[(String, Long)].collect().toMap)
  }
}
