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

  /** Snapshot diff — the read side of CDC, completing the tier
    * around [[apply]] (MERGE) and the content-defined chunkers: given
    * two versions of a keyed table, emit the CHANGESET — one row per
    * key whose state differs, tagged `added` / `removed` / `changed`.
    * Unchanged keys are dropped: at scale the output is churn-sized,
    * not corpus-sized, which is what makes version-over-version
    * monitoring of a 100 TB table feasible at all.
    *
    * Each side is reduced in-scan to `(keys, fingerprint)` — the md5
    * of the compare columns with a control-char field separator and
    * a distinct null sentinel (so `null` vs `''` vs a shifted field
    * boundary all fingerprint differently) — then ONE full-outer
    * equi-join on the key decides the tag. The wide payload never
    * enters the exchange; the shuffle moves ~50 bytes/row regardless
    * of row width, and column pruning keeps the scan at
    * keys+compareCols. Same-fingerprint ⇒ same-content stands on
    * md5 collision resistance (the exact-dedup tier's standing
    * assumption). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    def fp(df: DataFrame, out: String): DataFrame = df.select(
      keyCols.map(col) :+
        md5(concat_ws("\u0001",
          compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))
          .as(out): _*)
    fp(oldDf, "__old_fp").join(fp(newDf, "__new_fp"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__old_fp").isNull, lit("added"))
          .when(col("__new_fp").isNull, lit("removed"))
          .when(col("__old_fp") =!= col("__new_fp"), lit("changed"))
          .as("status"): _*)
      .filter(col("status").isNotNull)
  }
}
