package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames. Companion to the
  * connected-components resolution in [[Dedup.connectedComponents]]:
  * same per-round shape (equi-join + aggregate), same lineage
  * discipline (each round is cut with a localCheckpoint so the plan
  * does not grow with the iteration count).
  */
object Graph {

  /** Fixed-point PageRank over an edge list, in scaled INTEGER
    * arithmetic: ranks are maintained as `rank * scale` longs and
    * every per-edge contribution is the floor division
    * `(dampNum * r(u)) div (dampDen * outdeg(u))`, so each
    * iteration is exact integer arithmetic end-to-end — sums are
    * order-independent, results are identical on any engine that
    * replays the recurrence (q60's DuckDB oracle unrolls it in
    * SQL), and no float summation ever enters the loop. The
    * float-rank formulation would tie the result to Spark's
    * nondeterministic aggregation order; the classic
    * fixed-point-arithmetic trade accepts ~1/scale rounding per
    * edge for bit-reproducibility.
    *
    * Semantics: nodes = distinct endpoints; initial rank
    * `scale div N`; per iteration
    * `r'(v) = base + sum over in-edges of contrib(u, v)` with
    * `base = ((dampDen - dampNum) * scale) div (dampDen * N)`.
    * Dangling nodes (no out-edges) leak their damped mass — the
    * simple-variant convention, documented rather than
    * redistributed; ranks are relative ordering scores, not a
    * probability simplex.
    *
    * Scale shape: the out-degree join is precomputed once onto the
    * edge list (static across iterations); each iteration is one
    * equi-join of the rank table onto that edge list (shuffle on
    * src) plus one map-side-combinable aggregation (shuffle on dst)
    * — the canonical distributed PageRank step. Rank state is
    * localCheckpoint'd per round: without the cut the logical plan
    * doubles every iteration (the q47 lesson). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, "iters must be nonnegative")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen, "damping must be in [0, 1]")
    require(scale > 0, "scale must be positive")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank_scaled", lit(0L))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Static across iterations: every edge already carries its
    // source's out-degree, so the loop never re-joins the degree
    // table.
    val edgesDeg = e.join(deg, "src").localCheckpoint(true)
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var ranks = nodes.withColumn("rank_scaled", lit(scale / n))
    for (i <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        // `div`, not `/`: Column./ on longs is DOUBLE division, which
        // would reintroduce the float rounding this operator exists
        // to avoid.
        .select(col("dst"),
          expr(s"($dampNum * rank_scaled) div ($dampDen * outdeg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("rank_scaled"))
      // Cut lineage every OTHER round (and always before returning):
      // the plan doubles per uncut round, so a cadence of 2 caps the
      // depth at two join/agg layers while halving the eager
      // materialization barriers — which, not data volume, dominate
      // wall time between checkpoints.
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
