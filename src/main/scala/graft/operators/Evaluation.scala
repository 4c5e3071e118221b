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

  /** All four clip censuses in one pass: tokens are interned ONCE
    * per row into ≤16-bit ids (shared across the two sides and all
    * n — the fail-fast bounds per-row distinct tokens at 65,536, far
    * above any real document), so an n-gram is an exact packed Long
    * key and the multiset intersection runs over a primitive-keyed
    * map with zero per-gram string allocation — the first cut built
    * a string per gram and measured 6× slower than the oracle. */
  private def allCounts(cand: Seq[String], ref: Seq[String]): BleuCounts = {
    val dict = new java.util.HashMap[String, Integer]()
    def ids(t: Seq[String]): Array[Long] = {
      val a = new Array[Long](t.length)
      var i = 0
      val it = t.iterator
      while (it.hasNext) {
        val s = it.next()
        var id = dict.get(s)
        if (id == null) { id = Integer.valueOf(dict.size()); dict.put(s, id) }
        a(i) = id.longValue(); i += 1
      }
      a
    }
    val c = ids(cand)
    val r = ids(ref)
    require(dict.size < 65536,
      "bleuComponents: more than 65535 distinct tokens in one row")
    def gram(a: Array[Long], i: Int, n: Int): Long = {
      var k = 0L; var j = 0
      while (j < n) { k = (k << 16) | a(i + j); j += 1 }
      k
    }
    val out = new Array[Long](12)
    var n = 1
    while (n <= 4) {
      val tc = math.max(0, c.length - n + 1)
      val tr = math.max(0, r.length - n + 1)
      var m = 0L
      if (tc > 0 && tr > 0) {
        // Min-multiplicity intersection as a two-pointer merge over
        // sorted primitive gram keys — no boxing, no hash churn.
        val cg = new Array[Long](tc)
        val rg = new Array[Long](tr)
        var i = 0
        while (i < tc) { cg(i) = gram(c, i, n); i += 1 }
        i = 0
        while (i < tr) { rg(i) = gram(r, i, n); i += 1 }
        java.util.Arrays.sort(cg)
        java.util.Arrays.sort(rg)
        i = 0; var j = 0
        while (i < tc && j < tr) {
          if (cg(i) == rg(j)) { m += 1L; i += 1; j += 1 }
          else if (cg(i) < rg(j)) i += 1
          else j += 1
        }
      }
      out((n - 1) * 3) = m; out((n - 1) * 3 + 1) = tc; out((n - 1) * 3 + 2) = tr
      n += 1
    }
    BleuCounts(out(0), out(1), out(2), out(3), out(4), out(5),
      out(6), out(7), out(8), out(9), out(10), out(11))
  }

  /** One row per input row: lengths, per-n (matched, cand-total,
    * ref-total) for n = 1..4, the smoothed log2-precision sum
    * `Σ_n flog2q(m_n+1) − flog2q(t_n+1)` (exact BIGINT), and the
    * floored length ratio `c_len·10⁹ div r_len`. `candCol`/`refCol`
    * are TEXT columns — tokenization (split on single space, keep
    * trailing empties, matching Spark's `split(c, " ")` and DuckDB's
    * `string_split`) happens inside the kernel: one UTF8String
    * crosses the UDF boundary per side. (Measured equal to the
    * token-array input form at sf0.1 — the string API is kept
    * because text columns are the natural input, not for speed.) */
  def bleuComponents(pairs: DataFrame, idCol: String = "doc_id",
                     candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    val kernel = udf { (cand: String, ref: String) =>
      if (cand == null || ref == null) None
      else Some(allCounts(cand.split(" ", -1).toSeq, ref.split(" ", -1).toSeq))
    }
    val f = (x: String) => Curation.flog2qSql(x)
    val logprec = (1 to 4).map(n =>
      s"(${f(s"m$n + 1")}) - (${f(s"t$n + 1")})").mkString(" + ")
    pairs
      .select(col(idCol),
        size(split(col(candCol), " ")).cast("long").as("c_len"),
        size(split(col(refCol), " ")).cast("long").as("r_len"),
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
