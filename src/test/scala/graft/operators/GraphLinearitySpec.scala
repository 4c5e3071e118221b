package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Extends the [[CandidateLinearitySpec]] disjoint-replica
  * methodology to the graph tier (round-10 ask #6): m node-disjoint
  * replicas of a base graph must cost and weigh EXACTLY m× — wedge
  * censuses and per-round joins are where superlinearity would hide
  * (a cross-replica candidate is impossible without a join-key bug,
  * so any deviation is a pruning/orientation defect caught at spec
  * scale, not in a production graph).
  *
  * Two invariants, chosen per op:
  *  - SHIFT invariance (kCore, LPA, kHopReach, Adamic–Adar): outputs
  *    depend on structure only (or on ids only via order/identity,
  *    which a uniform offset preserves), so the combined run's rows
  *    for replica c must equal the base rows shifted by c·offset —
  *    and the total row/pair mass is exactly m× the base.
  *  - LOCALITY (HyperBall, TrustRank): outputs depend on the ids
  *    themselves (md5 registers) or on a seed normalization, so each
  *    replica's rows in the combined run must instead equal a
  *    STANDALONE run on that replica's edges alone — disjoint
  *    components cannot exchange registers or rank mass.
  */
class GraphLinearitySpec extends SparkSuite {

  private val M = 3
  private val offset = 1000000L

  private def baseEdges: DataFrame =
    graft.Tables.orders(spark, sfDir).select(
        pmod(col("o_custkey"), lit(256)).as("src"),
        pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(256)).as("dst"))
      .filter(col("src") =!= col("dst"))

  private def replicaEdges(c: Int): DataFrame =
    baseEdges.select((col("src") + lit(c * offset)).as("src"),
      (col("dst") + lit(c * offset)).as("dst"))

  private def scaledEdges: DataFrame =
    (0 until M).map(replicaEdges).reduce(_ unionByName _)

  /** Collects (node, rest-of-row) keyed maps for shift comparison. */
  private def byNode(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map(r => r.getLong(0) -> (1 until r.length).map(r.get)).toMap

  private def assertShiftLinear(name: String, base: DataFrame, scaled: DataFrame): Unit = {
    val b = byNode(base)
    val s = byNode(scaled)
    assert(b.nonEmpty, s"$name: base output empty — vacuous gate")
    assert(s.size === M * b.size, s"$name: row count not linear (${b.size} → ${s.size})")
    for (c <- 0 until M; (node, v) <- b)
      assert(s(node + c * offset) === v,
        s"$name: replica $c node $node drifted from base")
  }

  test("q114-shape kCore is shift-linear on disjoint graph replicas") {
    assertShiftLinear("q114 kCore",
      Graph.kCore(baseEdges, "src", "dst", k = 4, rounds = 3),
      Graph.kCore(scaledEdges, "src", "dst", k = 4, rounds = 3))
  }

  test("q118-shape label propagation is shift-linear (labels shift with the ids)") {
    val b = Graph.labelPropagation(baseEdges, "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = Graph.labelPropagation(scaledEdges, "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b.nonEmpty && s.size === M * b.size)
    for (c <- 0 until M; (node, label) <- b)
      assert(s(node + c * offset) === label + c * offset,
        s"q118: replica $c node $node label drifted")
  }

  test("q129-shape kHopReach is shift-linear; reach mass is exactly m×") {
    val b = Graph.kHopReach(baseEdges, "src", "dst", k = 2)
    val s = Graph.kHopReach(scaledEdges, "src", "dst", k = 2)
    assertShiftLinear("q129 kHopReach", b, s)
    val bm = b.agg(sum("n_reach")).collect()(0).getLong(0)
    val sm = s.agg(sum("n_reach")).collect()(0).getLong(0)
    assert(sm === M * bm, s"q129: reach mass not linear ($bm → $sm)")
  }

  test("q130-shape HyperBall is replica-local: combined run ≡ per-replica standalone runs") {
    val combined = Graph.hyperBall(scaledEdges, "src", "dst", k = 2, p = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    var seen = 0
    for (c <- 0 until M) {
      val alone = Graph.hyperBall(replicaEdges(c), "src", "dst", k = 2, p = 6)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(alone.nonEmpty)
      seen += alone.size
      for ((node, est) <- alone)
        assert(combined(node) === est,
          s"q130: replica $c node $node estimate drifted — registers leaked across replicas")
    }
    assert(combined.size === seen, "q130: combined run has nodes no replica owns")
  }

  test("q140-shape TrustRank is replica-local: seeds in one replica starve the others") {
    import spark.implicits._
    val seeds = (0L until 256L by 7L).toDF("seed")
    val standalone = Graph.personalizedPageRank(
        baseEdges, "src", "dst", seeds, "seed", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val combined = Graph.personalizedPageRank(
        scaledEdges, "src", "dst", seeds, "seed", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(standalone.nonEmpty && combined.size === M * standalone.size)
    for ((node, rank) <- standalone)
      assert(combined(node) === rank,
        s"q140: replica-0 node $node rank drifted with disjoint replicas present")
    // Seedless replicas can neither receive nor emit mass.
    for (c <- 1 until M; node <- standalone.keys)
      assert(combined(node + c * offset) === 0L,
        s"q140: unseeded replica $c node $node acquired rank mass")
  }

  test("q181-shape Adamic–Adar is shift-linear; pair mass is exactly m×") {
    def pairs(e: DataFrame): Map[(Long, Long), Seq[Any]] =
      Graph.adamicAdar(e, "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (2 until r.length).map(r.get)).toMap
    val b = pairs(baseEdges)
    val s = pairs(scaledEdges)
    assert(b.nonEmpty, "q181: base produced no candidate pairs — vacuous gate")
    assert(s.size === M * b.size, s"q181: candidate pairs not linear (${b.size} → ${s.size})")
    for (c <- 0 until M; ((u, v), score) <- b)
      assert(s((u + c * offset, v + c * offset)) === score,
        s"q181: replica $c pair ($u,$v) score drifted")
  }
}
