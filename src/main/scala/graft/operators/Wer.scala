package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.functions.StringOps

/** Corpus-level word error rate (reference A8,
  * `alignment/post_process.py:322-329`): jiwer-style *weighted*
  * corpus WER — sum of word-level edit distances divided by the sum
  * of reference word counts, NOT the mean of per-utterance WERs.
  *
  * Implemented as a typed `Aggregator[(ref, hyp), (errors, refWords),
  * Double]`: partial aggregation (map-side combine) applies, so at
  * scale each partition ships exactly two longs.
  */
object Wer {

  case class Buf(errors: Long, refWords: Long)

  val aggregator: Aggregator[(String, String), Buf, Double] =
    new Aggregator[(String, String), Buf, Double] {
      override def zero: Buf = Buf(0L, 0L)

      override def reduce(b: Buf, in: (String, String)): Buf = {
        val ref = tokenize(in._1)
        val hyp = tokenize(in._2)
        Buf(b.errors + StringOps.wordLevenshtein(ref, hyp), b.refWords + ref.length)
      }

      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.errors + b.errors, a.refWords + b.refWords)

      override def finish(b: Buf): Double =
        if (b.refWords == 0) 0.0 else b.errors.toDouble / b.refWords * 100.0

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

      private def tokenize(s: String): Array[String] =
        if (s == null || s.trim.isEmpty) Array.empty else s.trim.split("\\s+")
    }

  /** Untyped column form: corpus_wer(ref, hyp) usable in DataFrame agg. */
  def corpusWer(ref: Column, hyp: Column): Column = {
    import org.apache.spark.sql.functions.{struct, udaf}
    // Registered per-call; cheap and keeps the Aggregator typed.
    val f = udaf(aggregator, Encoders.tuple(Encoders.STRING, Encoders.STRING))
    f(ref, hyp)
  }
}
