package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Dev tool: disjoint-replica scale sweep of the GRAPH tier — the
  * [[PrefixJoinSweep]] methodology on the q105/q114/q118/q129/q130/
  * q140/q181 graph: m node-disjoint replicas (ids offset by c·10⁶)
  * make the true answer grow exactly m×, so any superlinearity in
  * wall time or intermediate mass is attributable to the plan (a
  * wedge blow-up, a frontier that stopped being a frontier), not to
  * a larger legitimate answer. GraphLinearitySpec pins the VALUE
  * side of the same model at spec scale; this sweep reports the
  * counts and timings at bench scale for COVERAGE.md.
  *
  * Per (op, m) it reports the dominant intermediate count (wedges /
  * frontier-candidate rows / reach mass / register rows) and
  * median-of-3 wall seconds.
  *
  * Usage: sbt "runMain graft.GraphSweep [srcDir] [m,m,...]"
  * (defaults: /root/testdata/sf0.1 and 1,2,4).
  */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ms = args.lift(1).getOrElse("1,2,4").split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession("graft-graph-sweep", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val offset = 10000000L

    val base = {
      val n = Tables.orders(spark, srcDir).count() / 8L
      Tables.orders(spark, srcDir).select(
          pmod(col("o_custkey"), lit(n)).as("src"),
          pmod(col("o_custkey") * 7 + col("o_orderkey") * 13, lit(n)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint(true)
    }

    def replicas(m: Int): DataFrame =
      (0 until m).map(c => base.select((col("src") + lit(c * offset)).as("src"),
          (col("dst") + lit(c * offset)).as("dst")))
        .reduce(_ unionByName _).localCheckpoint(true)

    def timed(f: => Long): (Long, Double) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }

    case class Op(name: String, massName: String, run: DataFrame => Long)
    val seeds = spark.range(0, 4000, 7).select(col("id").as("seed"))
    val ops = Seq(
      Op("q105 triangles", "2*tri+deg mass", e =>
        Graph.triangleCount(e, "src", "dst")
          .agg(sum(col("n_tri") * 2 + col("deg"))).collect()(0).getLong(0)),
      Op("q114 kCore(4,3)", "surviving deg mass", e =>
        Graph.kCore(e, "src", "dst", k = 4, rounds = 3)
          .agg(coalesce(sum("deg"), lit(0L))).collect()(0).getLong(0)),
      Op("q118 LPA(2)", "label census", e =>
        Graph.labelPropagation(e, "src", "dst", rounds = 2)
          .select(col("label")).distinct().count()),
      Op("q129 kHopReach(2)", "reach mass", e =>
        Graph.kHopReach(e, "src", "dst", k = 2)
          .agg(sum("n_reach")).collect()(0).getLong(0)),
      Op("q130 hyperBall(2)", "node rows", e =>
        Graph.hyperBall(e, "src", "dst", k = 2, p = 6).count()),
      Op("q140 trustRank(2)", "nonzero-rank rows", e =>
        Graph.personalizedPageRank(e, "src", "dst", seeds, "seed", iters = 2)
          .filter(col("trust_scaled") > 0).count()),
      Op("q181 adamicAdar", "candidate pairs", e =>
        Graph.adamicAdar(e, "src", "dst").count()))

    println(f"GRAPH-SWEEP src=$srcDir base_edges=${base.count()}")
    for (op <- ops) {
      val rows = ms.map { m =>
        val e = replicas(m)
        val (mass, sec) = timed(op.run(e))
        (m, mass, sec)
      }
      val (m1, mass1, sec1) = rows.head
      val line = rows.map { case (m, mass, sec) =>
        val massRatio = if (mass1 == 0) 0.0 else mass.toDouble / mass1
        val timeRatio = if (sec1 == 0) 0.0 else sec / sec1
        f"m=$m mass=$mass (${massRatio}%.2f×) sec=$sec%.2f (${timeRatio}%.2f×)"
      }.mkString(" | ")
      println(f"GRAPH-SWEEP ${op.name}%-22s [${op.massName}] $line")
    }
    spark.stop()
  }
}
