package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual fallback when AQE's
  * skew-join splitting cannot apply (aggregations, or joins whose
  * build side AQE will not replicate).
  *
  * Both operators derive the salt deterministically (hash of a
  * discriminator column, never `rand()`), so results are stable
  * across retries and replays — a task re-run with a fresh random
  * salt would double-count rows on speculative execution.
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (key, salt)
    * spreads a hot key over `salts` reducers, the final aggregate
    * merges the partials. Use for algebraic aggregates (sum/count/
    * min/max) over heavily skewed keys; a hot key's rows land on
    * `salts` tasks instead of one. */
  def saltedSumCount(df: DataFrame, keyCol: String, valCol: String,
                     discriminator: Column, salts: Int): DataFrame =
    df
      .withColumn("__salt", pmod(xxhash64(discriminator), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as(s"sum_$valCol"), sum(col("__pcnt")).as("n"))

  /** Salted equi-join: the (small, replicable) build side is
    * exploded across all salt values, the probe side picks one salt
    * per row — the hot key's probe rows spread over `salts` join
    * tasks while every one of them still finds the build row.
    * Build-side cost: ×salts rows, the standard replication trade. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keyCol: String,
                 discriminator: Column, salts: Int): DataFrame = {
    val p = probe.withColumn("__salt", pmod(xxhash64(discriminator), lit(salts)))
    val b = build.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    p.join(b, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Key-skew DIAGNOSTICS: the report an operator chooses a salting /
    * AQE strategy FROM — the `topK` heaviest keys of `keyCol` with
    * row counts and corpus share in parts-per-million (integer
    * floor division of scaled longs, so the report hash-gates; PMI-
    * style floats are the caller's derivation). One map-side-combined
    * aggregate + a bounded TakeOrdered — the corpus never globally
    * sorts — and the total attaches via a one-row broadcast cross
    * join, never a driver collect. Ordering (n desc, key asc) is a
    * total order, so the top-k cut is deterministic under ties. */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("n"),
        expr("n * 1000000L div __total").as("ppm"))
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(topK)
  }
}
