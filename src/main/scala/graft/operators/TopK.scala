package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k selection as a typed Aggregator, so per-group
  * ranking runs as a partial aggregate: each input partition reduces
  * to at most k candidates per group *before* the shuffle, and the
  * exchange moves O(groups × k) rows — not every scored row, which
  * is what a `row_number().over(Window.partitionBy(...))` plan
  * shuffles. At corpus × queries scoring volume that is the
  * difference between a merge of tiny states and re-shuffling the
  * whole cross product.
  *
  * Ordering is (sim desc, id asc) — identical to the window form's
  * `orderBy(desc(sim), asc(id))`, so results are bit-compatible.
  */
object TopK {

  /** One scored candidate. */
  case class Scored(id: Long, sim: Double)

  private def insert(buf: List[Scored], s: Scored, k: Int): List[Scored] = {
    // buf is sorted (sim desc, id asc) and at most k long.
    if (buf.sizeIs >= k && !better(s, buf.last)) buf
    else {
      val (hi, lo) = buf.span(b => better(b, s))
      (hi ::: s :: lo).take(k)
    }
  }

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  def aggregator(k: Int): Aggregator[Scored, List[Scored], Seq[Scored]] =
    new Aggregator[Scored, List[Scored], Seq[Scored]] {
      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: Scored): List[Scored] = insert(b, a, k)
      override def merge(x: List[Scored], y: List[Scored]): List[Scored] =
        y.foldLeft(x)((acc, s) => insert(acc, s, k))
      override def finish(b: List[Scored]): Seq[Scored] = b
      override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    }

  /** `scored` must carry (groupCol, idCol, simCol). Returns one row
    * per (group, rank<=k): (groupCol, neighbor_id, rank, sim_raw). */
  def perGroup(scored: DataFrame, groupCol: String, idCol: String, simCol: String,
               k: Int): DataFrame = {
    val agg = topkUdaf(k)(col(idCol), col(simCol))
    scored
      .groupBy(col(groupCol))
      .agg(agg.as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .withColumnRenamed("col", "s")
      .select(
        col(groupCol),
        col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("s.sim").as("sim_raw"))
  }

  private def topkUdaf(k: Int): (Column, Column) => Column = {
    val f = udaf(aggregator(k), Encoders.product[Scored])
    (id, sim) => f(id, sim)
  }
}
