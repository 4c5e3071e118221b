package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-evaluation statistics for eval-data pipelines: exact
  * integer sufficient components of BLEU (Papineni et al., ACL 2002)
  * and ROUGE-n recall (Lin, 2004) per (candidate, reference) pair.
  *
  * The portable-exactness split (the q55 BM25 precedent): the gated
  * frame carries the INTEGER components — clipped n-gram matches,
  * candidate/reference totals, lengths — plus the add-one-smoothed
  * log-precision sum in [[Curation.flog2qSql]] 1/16-bit log2 units;
  * the float BLEU (exp of the mean, brevity penalty e^(1−r/c)) is a
  * display-side transform of these columns, because exp/ln are not
  * bit-portable across engines. ROUGE-n recall is matches/ref-total
  * from the same frame.
  *
  * Scale shape: both texts live in the row, so the whole census is
  * one per-row kernel — no explode, no shuffle, stream-deployable
  * like the other stateless scorers. Clipped counts use per-n
  * hash-multiset intersection inside the kernel (O(tokens) per n). */
object Evaluation {

  private case class BleuCounts(m1: Long, t1: Long, r1: Long,
                                m2: Long, t2: Long, r2: Long,
                                m3: Long, t3: Long, r3: Long,
                                m4: Long, t4: Long, r4: Long)

  private def clipped(cand: Seq[String], ref: Seq[String], n: Int): (Long, Long, Long) = {
    val tc = math.max(0, cand.length - n + 1)
    val tr = math.max(0, ref.length - n + 1)
    if (tc == 0 || tr == 0) return (0L, tc.toLong, tr.toLong)
    val refCounts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < tr) {
      val g = ref.slice(i, i + n).mkString(" ")
      refCounts.merge(g, 1L, _ + _)
      i += 1
    }
    var m = 0L
    i = 0
    while (i < tc) {
      val g = cand.slice(i, i + n).mkString(" ")
      val left = refCounts.getOrDefault(g, 0L)
      if (left > 0L) { m += 1L; refCounts.put(g, left - 1L) }
      i += 1
    }
    (m, tc.toLong, tr.toLong)
  }

  /** One row per input row: lengths, per-n (matched, cand-total,
    * ref-total) for n = 1..4, the smoothed log2-precision sum
    * `Σ_n flog2q(m_n+1) − flog2q(t_n+1)` (exact BIGINT), and the
    * floored length ratio `c_len·10⁹ div r_len`. `candCol`/`refCol`
    * are token arrays. */
  def bleuComponents(pairs: DataFrame, idCol: String = "doc_id",
                     candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    val kernel = udf { (cand: Seq[String], ref: Seq[String]) =>
      if (cand == null || ref == null) None
      else {
        val Seq((m1, t1, r1), (m2, t2, r2), (m3, t3, r3), (m4, t4, r4)) =
          (1 to 4).map(n => clipped(cand, ref, n))
        Some(BleuCounts(m1, t1, r1, m2, t2, r2, m3, t3, r3, m4, t4, r4))
      }
    }
    val f = (x: String) => Curation.flog2qSql(x)
    val logprec = (1 to 4).map(n =>
      s"(${f(s"m$n + 1")}) - (${f(s"t$n + 1")})").mkString(" + ")
    pairs
      .select(col(idCol),
        size(col(candCol)).cast("long").as("c_len"),
        size(col(refCol)).cast("long").as("r_len"),
        kernel(col(candCol), col(refCol)).as("__b"))
      .filter(col("__b").isNotNull && col("r_len") > 0)
      .select(Seq(col(idCol), col("c_len"), col("r_len")) ++
        (1 to 4).flatMap(n => Seq(
          col(s"__b.m$n").as(s"m$n"), col(s"__b.t$n").as(s"t$n"),
          col(s"__b.r$n").as(s"r$n"))): _*)
      .withColumn("logprec_fp", expr(logprec))
      .withColumn("len_ratio_e9", expr("(c_len * 1000000000) div r_len"))
  }
}
