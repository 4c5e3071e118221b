package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered parts assembly (SURVEY A12 + W1, reference
  * `process_all.py:409-438,566-617`): per key, part filenames sorted
  * by their numeric sequence (natural order — part_10 after part_9)
  * and concatenated in that order, with the group's part count.
  *
  * Plan shape (r15, measured in Q38Sweep at sf0.1): ONE range
  * exchange + partition-local (key, seq, fname) sort + a streaming
  * mapPartitions group-assemble. RangePartitioning on the key means
  * the in-partition sort doubles as both group clustering AND the
  * global output order — no second exchange; groups assemble in a
  * single forward pass with a StringBuilder (O(1) live state, no
  * per-group array). The hash-aggregate alternative
  * (collect_list(struct) → array_sort → array_join → orderBy) paid a
  * second exchange plus per-group array materialization and measured
  * 2.26× DuckDB. mapPartitions is justified per the SURVEY
  * preference order: the composition-of-builtins plans were measured
  * slower (Q38Sweep `cur`/`stragg`/`rangeagg` variants). At 1000
  * executors this is the shape of a sort-merge aggregation: one wide
  * exchange of narrow rows, then linear per-partition work.
  *
  * Output: (keyCol, n_parts, assembled), globally ordered by key by
  * construction. */
object OrderedConcat {

  def assemble(rows: DataFrame, keyCol: String = "l_orderkey",
               fnameCol: String = "fname", seqCol: String = "seq"): DataFrame = {
    import rows.sparkSession.implicits._
    val sorted = rows
      .repartitionByRange(col(keyCol))
      // (seq, fname) not just seq: deterministic tie order matches
      // array_sort's struct comparator if a name ever repeats a seq.
      .sortWithinPartitions(col(keyCol), col(seqCol), col(fnameCol))
      .select(col(keyCol), col(fnameCol))
    sorted.mapPartitions { it =>
      // Streaming ordered-group assembly: rows arrive clustered by
      // key and pre-sorted by seq, so each group folds into a
      // StringBuilder and emits when the key changes.
      new Iterator[(Long, Long, String)] {
        private var cur: Option[(Long, Long, java.lang.StringBuilder)] = None
        private var pending: Option[(Long, Long, String)] = None
        private def roll(): Unit = {
          while (pending.isEmpty && it.hasNext) {
            val r = it.next()
            val k = r.getLong(0); val f = r.getString(1)
            cur match {
              case Some((ck, n, sb)) if ck == k =>
                cur = Some((ck, n + 1, sb.append(',').append(f)))
              case Some((ck, n, sb)) =>
                pending = Some((ck, n, sb.toString))
                cur = Some((k, 1L, new java.lang.StringBuilder(f)))
              case None =>
                cur = Some((k, 1L, new java.lang.StringBuilder(f)))
            }
          }
          if (pending.isEmpty && !it.hasNext && cur.isDefined) {
            val (ck, n, sb) = cur.get
            pending = Some((ck, n, sb.toString)); cur = None
          }
        }
        def hasNext: Boolean = { roll(); pending.isDefined }
        def next(): (Long, Long, String) = {
          roll(); val p = pending.get; pending = None; p
        }
      }
    }.toDF(keyCol, "n_parts", "assembled")
  }
}
