package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: disjoint-replica scale sweep of the sixth round-10
  * session's census-shaped additions — the runtime check behind
  * each operator's "never corpus-quadratic" claim:
  *
  *  - q158 BPE: replicas share no words (`c{c}·` prefixes), so the
  *    word dictionary grows ~m× and each merge round's pair census
  *    must track it linearly (the corpus is scanned once either
  *    way). Merges themselves DIFFER from the base run (the global
  *    argmax sees all replicas) — time is the gated claim, the
  *    merge count is printed for visibility.
  *  - q162 memorization risk: eval set and train both grow m×; the
  *    broadcast-probe semi-join must stay linear (the post-probe
  *    distinct is O(eval), the claim under test).
  *  - q167 JSD: sources stay 20, vocab grows ~m× → the strata×vocab
  *    grid grows m×; KL sums must track it.
  *  - q173 vocab growth: first-occurrence census grows m×.
  *
  * Usage: first materialize replica dirs, then run:
  *   sbt "runMain graft.ScaleCorpus /root/testdata/sf0.1 /tmp/s6sweep2x 2"
  *   sbt "runMain graft.ScaleCorpus /root/testdata/sf0.1 /tmp/s6sweep4x 4"
  *   sbt "runMain graft.Session6Sweep"
  */
object Session6Sweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-s6-sweep", "32")
    val dirs = Seq(1 -> "/root/testdata/sf0.1",
      2 -> "/tmp/s6sweep2x", 4 -> "/tmp/s6sweep4x")

    def time3(body: => DataFrame): (Double, Long) = {
      var rows = 0L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = body.count()
        (System.nanoTime() - t0) / 1e9
      }
      (times.sorted.apply(1), rows)
    }

    for ((m, d) <- dirs) {
      val docs = Tables.documents(spark, d)

      val (tBpe, nMerges) = time3 {
        val words = docs.select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("word").agg(count(lit(1)).as("freq"))
        graft.operators.Bpe.learnMerges(words, "word", "freq", 10)._1
      }
      println(f"S6SWEEP q158_bpe m=$m merges=$nMerges median=$tBpe%.2f")

      val (tMem, nEval) = time3 {
        graft.operators.Curation.memorizationRisk(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(97)) === 0), n = 3)
      }
      println(f"S6SWEEP q162_memrisk m=$m eval_docs=$nEval median=$tMem%.2f")

      val (tJsd, nSrc) = time3 {
        graft.operators.Stats.jsDivergence(docs, "source",
          filter(split(col("text"), " "), w => w =!= ""))
      }
      println(f"S6SWEEP q167_jsd m=$m sources=$nSrc median=$tJsd%.2f")

      val (tVg, nBands) = time3 {
        graft.operators.Curation.vocabGrowth(docs, "doc_id",
          filter(split(col("text"), " "), w => w =!= ""), checkpoints = 10)
      }
      println(f"S6SWEEP q173_vocab m=$m bands=$nBands median=$tVg%.2f")
    }
    spark.stop()
  }
}
