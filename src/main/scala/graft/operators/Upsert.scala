package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL-MERGE-style upsert (reference J4,
  * `pre_processing/process_all.py:797-839`): for each update row,
  * overwrite the matching base row's columns (update wins, but a null
  * update value keeps the base value, mirroring the reference's
  * column-wise assignment); unmatched update rows are appended;
  * unmatched base rows pass through.
  *
  * Implemented as a single full-outer equi-join on the key plus a
  * `coalesce` projection — one shuffle, no driver loop, and with a
  * small update set Catalyst broadcasts it automatically.
  */
object Upsert {

  def apply(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val allCols = (base.columns ++ updates.columns.filterNot(base.columns.contains)).toSeq
    val joined = base.as("base").join(updates.as("upd"), keys, "full_outer")
    val projected = allCols.map { c =>
      val inBase = base.columns.contains(c)
      val inUpd = updates.columns.contains(c)
      if (keys.contains(c)) col(c).as(c)
      else if (inBase && inUpd) coalesce(col(s"upd.$c"), col(s"base.$c")).as(c)
      else if (inUpd) col(s"upd.$c").as(c)
      else col(s"base.$c").as(c)
    }
    joined.select(projected: _*)
  }
}
