package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Quantization, Similarity}

/** Dev tool: disjoint-replica floor sweep for the round-15 verdict's
  * non-graph >2× rows (q59 repetition stats, q79 semantic-blocked
  * near-dup, q111 PQ-code dedup) — the [[GraphSweep]] methodology on
  * the text/vector tiers. The sf0.1 inputs behind these queries are
  * tiny (documents 5k rows, embeddings 2k rows), so if wall time
  * stays ~flat while the input and the true answer grow m×, the
  * DuckDB gap is Spark's fixed job/stage floor, not the plan.
  *
  * q79 scales `nCentroids` with m (the operator's own √n sizing
  * rule) so block size — and therefore per-pair work — stays
  * constant across replicas; q111 refits its PQ model per replica
  * set (training cost is part of the gated query). Ids are offset
  * by c·10⁷ per replica so replicas are disjoint and the answer
  * mass must scale exactly m×.
  *
  * Usage: sbt "runMain graft.FloorSweep [srcDir] [m,m,...]"
  * (defaults: /root/testdata/sf0.1 and 1,2,4). */
object FloorSweep {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ms = args.lift(1).getOrElse("1,2,4").split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession("graft-floor-sweep", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val offset = 10000000L

    def timed(f: => Long): (Long, Double) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }

    def report(op: String, massName: String, rows: Seq[(Int, Long, Double)]): Unit = {
      val (m0, n0, s0) = rows.head
      val cells = rows.map { case (m, n, sec) =>
        f"m=$m mass=$n (${n.toDouble / n0}%.2fx) sec=$sec%.2f (${sec / s0}%.2fx)"
      }
      println(f"FLOOR-SWEEP $op%-24s [$massName] " + cells.mkString(" | "))
    }

    // Shared replica builders --------------------------------------
    val docsBase = Tables.documents(spark, srcDir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def docReplicas(m: Int): DataFrame =
      (0 until m).map(c => docsBase.select(
          (col("doc_id") + lit(c * offset)).as("doc_id"), col("text")))
        .reduce(_ unionByName _).localCheckpoint(true)

    val asDouble = (c: org.apache.spark.sql.Column) => c.cast("array<double>")
    val embBase = Tables.embeddings(spark, srcDir)
      .select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
      .localCheckpoint(true)
    // The q57/q79/q111 synthesized-twin corpus, replicated disjointly.
    // Replicating VECTORS verbatim would create real cross-replica
    // near-dups (identical vectors under new ids have cosine 1.0 —
    // the m=2 answer grew 15×, not 2×, in the first cut of this
    // sweep), so each replica applies its own deterministic SIGN
    // PATTERN: flipping dimension signs is an isometry, so every
    // within-replica similarity — twins included — is exactly
    // unchanged, while a cross-replica pair's cosine becomes a
    // ±-scrambled sum that collapses toward 0 (patterns differ in
    // ~half the dimensions). The true answer is therefore exactly
    // m× the replica answer.
    def corpusReplicas(m: Int): DataFrame = {
      val twins = embBase.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(element_at(col("embedding"), 1) * lit(1.2)),
            slice(col("embedding"), 2, 63)).as("embedding"))
      val one = embBase.unionByName(twins)
      (0 until m).map { c =>
        val signed = transform(col("embedding"), (x, i) =>
          when(pmod(xxhash64(lit(c), i), lit(2)) === 0, -x).otherwise(x))
        one.select((col("vec_id") + lit(c * offset)).as("vec_id"),
          signed.as("embedding"))
      }.reduce(_ unionByName _).localCheckpoint(true)
    }

    // q59: per-row codegen kernel over documents — expect flat.
    report("q59 repetitionStats", "output rows", ms.map { m =>
      val d = docReplicas(m)
      val lined = d.withColumn("text",
        regexp_replace(col("text"), "(\\S+ \\S+) ", "$1\n"))
      val (n, sec) = timed(Curation.repetitionStats(lined).count())
      (m, n, sec)
    })

    // q79: semantic blocking with √n-rule centroid scaling.
    report("q79 semanticBlocked", "pairs >= 0.99", ms.map { m =>
      val corp = corpusReplicas(m)
      val (n, sec) = timed(
        Similarity.semanticBlockedPairs(corp, threshold = 0.99,
          nCentroids = 16 * m, nAssign = 2).count())
      (m, n, sec)
    })

    // q111: PQ train + encode + code-bucket dedup, refit per replica.
    report("q111 pqCodeNearDup", "pairs >= 0.99", ms.map { m =>
      val corp = corpusReplicas(m)
      val (n, sec) = timed {
        val model = Quantization.fitPq(corp, m = 8, ksub = 8, iters = 1)
        Quantization.pqCodeNearDup(corp, model, threshold = 0.99).count()
      }
      (m, n, sec)
    })

    // q230 (r16): Aho–Corasick blocklist — per-row kernel, expect
    // flat-to-sublinear like q59.
    report("q230 blocklistHits", "hit rows", ms.map { m =>
      val d = docReplicas(m)
      val (n, sec) = timed(Curation.blocklistHits(d,
        Seq("scan", "an", "hash join", "slow", "table t",
          "merge batch", "w s", "a a")).count())
      (m, n, sec)
    })

    // q231 (r16): BLEU components — per-row kernel over the
    // truncation pair, expect flat-to-sublinear.
    report("q231 bleuComponents", "output rows", ms.map { m =>
      val d = docReplicas(m)
      val pairs = d
        .select(col("doc_id"), split(col("text"), " ").as("rt"), col("text"))
        .filter(size(col("rt")) > 0)
        .select(col("doc_id"),
          concat_ws(" ", slice(col("rt"), lit(1),
            greatest(expr("(size(rt) * 8) div 10"), lit(1)).cast("int"))).as("ct"),
          col("text").as("rtext"))
      val (n, sec) = timed(
        graft.operators.Evaluation.bleuComponents(pairs, "doc_id", "ct", "rtext").count())
      (m, n, sec)
    })

    spark.stop()
  }
}
