package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Reference F10 (`pre_processing/process_all.py:305-335`): greedy
  * order-dependent sentence grouping — accumulate sentences until the
  * running word count reaches `minWords` (a sentence that crosses the
  * threshold is *included* in the closing group), emit the joined
  * group, reset; the final partial group survives only if it holds at
  * least `minWords / 2` words.
  *
  * Not expressible as a window function (the group boundary depends
  * on the running state), so this is the one place the engine drops
  * to `mapPartitions` — after `repartition(key)` +
  * `sortWithinPartitions(key, seq)`, which preserves per-key
  * clustering with exactly one shuffle and no driver collection.
  */
object SentenceGrouping {

  def apply(df: DataFrame, keyCol: String, seqCol: String, textCol: String,
            minWords: Int, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("key", df.schema(keyCol).dataType, nullable = true),
      StructField("group_idx", IntegerType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("word_count", IntegerType, nullable = false)))

    val parted =
      (if (numPartitions > 0) df.repartition(numPartitions, col(keyCol))
       else df.repartition(col(keyCol)))
        .sortWithinPartitions(col(keyCol), col(seqCol))
        .select(col(keyCol), col(textCol))

    implicit val enc = RowEncoder.encoderFor(outSchema)
    parted.mapPartitions { rows =>
      new Iterator[Row] {
        private val it = rows.buffered
        private var out: Iterator[Row] = Iterator.empty

        private def refill(): Unit = {
          while (!out.hasNext && it.hasNext) {
            val key = it.head.get(0)
            val groups = ArrayBuffer.empty[Row]
            val cur = ArrayBuffer.empty[String]
            var curWords = 0
            var gi = 0
            while (it.hasNext && it.head.get(0) == key) {
              val sent = it.next().getString(1)
              if (sent != null && sent.nonEmpty) {
                val w = sent.split("\\s+").length
                cur += sent
                curWords += w
                if (curWords >= minWords) {
                  groups += Row(key, gi, cur.mkString(" "), curWords)
                  gi += 1
                  cur.clear()
                  curWords = 0
                }
              }
            }
            if (cur.nonEmpty && curWords >= minWords / 2) {
              groups += Row(key, gi, cur.mkString(" "), curWords)
            }
            out = groups.iterator
          }
        }

        override def hasNext: Boolean = { refill(); out.hasNext }
        override def next(): Row = { refill(); out.next() }
      }
    }(enc).toDF("key", "group_idx", "text", "word_count")
  }
}
