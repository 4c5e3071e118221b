package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed BLEU/ROUGE component pins, including the clipping
  * case the unclipped precision gets wrong ("a a a" vs "a" must
  * match once, not three times — Papineni et al. §2.1). */
class EvaluationSpec extends SparkSuite {

  test("bleuComponents: truncation pair, clipping, degenerate lengths") {
    import spark.implicits._
    val pairs = Seq(
      // cand = 3-token prefix of a 4-token ref.
      (1L, "a b c", "a b c d"),
      // the clipping canonical: candidate repeats a token the
      // reference has once.
      (2L, "a a a", "a"),
      // no overlap at all.
      (3L, "x y", "p q r")).toDF("doc_id", "cand", "ref")
    val got = Evaluation.bleuComponents(pairs, "doc_id", "cand", "ref")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert((r1.getAs[Long]("c_len"), r1.getAs[Long]("r_len")) === (3L, 4L))
    assert((r1.getAs[Long]("m1"), r1.getAs[Long]("t1"), r1.getAs[Long]("r1")) === (3L, 3L, 4L))
    assert((r1.getAs[Long]("m2"), r1.getAs[Long]("t2"), r1.getAs[Long]("r2")) === (2L, 2L, 3L))
    assert((r1.getAs[Long]("m3"), r1.getAs[Long]("t3"), r1.getAs[Long]("r3")) === (1L, 1L, 2L))
    assert((r1.getAs[Long]("m4"), r1.getAs[Long]("t4"), r1.getAs[Long]("r4")) === (0L, 0L, 1L))
    // perfect prefix precision: every smoothed term is f(m+1)-f(t+1)
    // with m = t for n ≤ 3 → 0; n = 4 contributes f(1)-f(1) = 0.
    assert(r1.getAs[Long]("logprec_fp") === 0L)
    assert(r1.getAs[Long]("len_ratio_e9") === 750000000L)
    val r2 = got(1)
    assert((r2.getAs[Long]("m1"), r2.getAs[Long]("t1"), r2.getAs[Long]("r1")) === (1L, 3L, 1L),
      "clipping must cap repeated-token matches at the reference count")
    val r3 = got(2)
    assert(r3.getAs[Long]("m1") === 0L && r3.getAs[Long]("m2") === 0L)
    // ROUGE-1 recall falls out: m1 / r1 = 3/4 for the first pair.
  }

  test("bleuComponents ≡ brute-force string-gram census on random small-vocab pairs") {
    import spark.implicits._
    // Small vocabulary maximizes repeated grams — the clipping and
    // packed-key paths the kernel can get wrong. 40 random pairs,
    // deterministic seed, checked against a naive string-gram census.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "ab")
    def txt(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val cases = (1L to 40L).map(i => (i, txt(1 + rnd.nextInt(12)), txt(1 + rnd.nextInt(12))))
    def brute(cand: String, ref: String, n: Int): (Long, Long, Long) = {
      val c = cand.split(" ", -1).toSeq
      val r = ref.split(" ", -1).toSeq
      val cg = c.sliding(n).filter(_.size == n).map(_.mkString("\u0000")).toSeq
      val rg = r.sliding(n).filter(_.size == n).map(_.mkString("\u0000")).toSeq
      val rc = rg.groupBy(identity).view.mapValues(_.size).toMap
      val m = cg.groupBy(identity).map { case (g, occ) =>
        math.min(occ.size, rc.getOrElse(g, 0))
      }.sum
      (m.toLong, math.max(0, c.size - n + 1).toLong, math.max(0, r.size - n + 1).toLong)
    }
    val got = Evaluation.bleuComponents(
        cases.toDF("doc_id", "cand", "ref"), "doc_id", "cand", "ref")
      .orderBy("doc_id").collect()
    for ((row, (id, cand, ref)) <- got.zip(cases)) {
      assert(row.getAs[Long]("doc_id") === id)
      for (n <- 1 to 4) {
        val (m, tc, tr) = brute(cand, ref, n)
        assert((row.getAs[Long](s"m$n"), row.getAs[Long](s"t$n"), row.getAs[Long](s"r$n"))
          === ((m, tc, tr)), s"n=$n cand='$cand' ref='$ref'")
      }
    }
  }

  test("bleuTruncationComponents ≡ build-the-prefix-pair bleuComponents (r17 single-pass)") {
    import spark.implicits._
    // Random texts including repeated tokens, empties (consecutive
    // spaces), and 1-token docs (the greatest(...,1) edge); the
    // single-pass truncation census must be bit-identical to
    // materializing the prefix string and scoring the pair.
    val rnd = new scala.util.Random(17)
    val vocab = Vector("a", "b", "c", "ab", "")
    def txt(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = ((1L to 60L).map(i => (i, txt(1 + rnd.nextInt(15)))) :+ (99L, "solo"))
      .toDF("doc_id", "text")
    for ((num, den) <- Seq((8, 10), (1, 2), (10, 10))) {
      val pairs = docs
        .select(col("doc_id"), split(col("text"), " ").as("rt"), col("text"))
        .select(col("doc_id"),
          concat_ws(" ", slice(col("rt"), lit(1),
            greatest(expr(s"(size(rt) * $num) div $den"), lit(1)).cast("int"))).as("ct"),
          col("text").as("rtext"))
      val expected = Evaluation.bleuComponents(pairs, "doc_id", "ct", "rtext")
        .orderBy("doc_id").collect().toSeq
      val got = Evaluation.bleuTruncationComponents(docs, "doc_id", "text", num, den)
        .orderBy("doc_id").collect().toSeq
      assert(got === expected, s"num=$num den=$den")
    }
  }
}
