package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The reference's E5 QC pipeline (`alignment/post_process.py:125-376`):
  * sample utterances per book (W5), transcribe them (X8 — pluggable;
  * the reference runs Whisper on GPU), normalize both sides (F11),
  * compute the weighted corpus WER per book (A8), and reject whole
  * books at the threshold (P9).
  *
  * The transcriber is the declared external-model boundary — a trait
  * whose production implementation wraps an ASR model; tests inject
  * a deterministic mock. Everything around it is native Catalyst.
  */
object Qc {

  /** X8 boundary (`post_process.py:286-307`). */
  trait Transcriber extends Serializable {
    def transcribe(samples: Array[Float], sampleRate: Int): String
  }

  /** QC result: per-book stats + the reject decision. */
  def runQc(utterances: DataFrame, transcriber: Transcriber,
            samplePct: Double = 0.05, werThresholdPct: Double = 50.0,
            bookCol: String = "book_id", textCol: String = "text",
            samplesCol: String = "samples", srCol: String = "sr"): DataFrame = {

    // W5 (`post_process.py:231-242`): int(n*pct) per book, min 1 —
    // deterministic md5 order so QC runs are reproducible.
    val w = Window.partitionBy(col(bookCol))
      .orderBy(md5(concat_ws("_", col(bookCol), col("idx"))), col("idx"))
    val cw = Window.partitionBy(col(bookCol))
    val sampled = utterances
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .filter(col("rn") <= greatest(lit(1), (col("n") * samplePct).cast("int")))

    // X8: transcribe the sampled audio.
    val asr = udf((s: Seq[Float], sr: Int) =>
      Option(s).map(x => transcriber.transcribe(x.toArray, sr)))
    val transcribed = sampled
      .withColumn("hyp_raw", asr(col(samplesCol), col(srCol)))

    // F11 on both sides (`post_process.py:244-245,310-311`).
    val normalized = transcribed
      .withColumn("ref_n", GraftFunctions.vi_process_text(col(textCol)))
      .withColumn("hyp_n", GraftFunctions.vi_process_text(col("hyp_raw")))

    // A8 weighted corpus WER + P9 book reject.
    normalized
      .groupBy(col(bookCol))
      .agg(
        count(lit(1)).as("n_sampled"),
        Wer.corpusWer(col("ref_n"), col("hyp_n")).as("wer"))
      .withColumn("rejected", col("wer") >= werThresholdPct)
  }

  /** P9 tail (`post_process.py:332-347`): drop every utterance of a
    * rejected book — the anti-join the reference implements as a
    * file move. */
  def filterRejected(utterances: DataFrame, qc: DataFrame,
                     bookCol: String = "book_id"): DataFrame =
    utterances.join(
      qc.filter(col("rejected")).select(bookCol),
      Seq(bookCol), "left_anti")
}
