package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The bounded top-k Aggregator must rank identically to the
  * `row_number` window it replaces (sim desc, id asc). */
class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("perGroup equals window ranking, including ties") {
    val rng = new scala.util.Random(7)
    // coarse sims force plenty of exact ties -> tiebreak by id matters
    val rows = for (g <- 1 to 20; i <- 1 to 50)
      yield (g.toLong, (g * 1000 + i).toLong, (rng.nextInt(10) / 10.0))
    val scored = rows.toDF("query_id", "cand_id", "sim_raw")

    val viaAgg = TopK.perGroup(scored, "query_id", "cand_id", "sim_raw", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq

    val w = Window.partitionBy($"query_id").orderBy($"sim_raw".desc, $"cand_id".asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"cand_id".as("neighbor_id"), $"rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq

    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k emit all members") {
    val scored = Seq((1L, 10L, 0.5), (1L, 11L, 0.7)).toDF("query_id", "cand_id", "sim_raw")
    val got = TopK.perGroup(scored, "query_id", "cand_id", "sim_raw", 5)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(got == Seq((11L, 1), (10L, 2)))
  }
}
