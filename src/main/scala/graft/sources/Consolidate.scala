package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions

/** The reference's metadata-consolidation job (E1 tail,
  * `crawler/metadata.py:242-300`): per-book JSON directory → one
  * wide frame ready for the books CSV.
  *
  * Steps, in the reference's order:
  *  1. string durations → `duration_hours` (convert_duration(…,
  *     "hour"), `metadata.py:256-257` — only when the column is
  *     string-typed; the shipped JSONs already carry float hours),
  *  2. narrator three-shape normalization (`:261-266`),
  *  3. wide expand to `narrator_{i}_{name,url}` sized by the max
  *     narrator count (A4/F14, `:274-291`),
  *  4. `process_book_df`: tvshows filter + six null QC columns
  *     (P3/P4, `:227-239`).
  *
  * The max-narrator count is a driver-side scalar (one tiny
  * aggregate) — the same two-pass shape as the reference; the wide
  * projection itself is narrow and shuffle-free.
  */
object Consolidate {

  def apply(spark: SparkSession, jsonDir: String): DataFrame = {
    val books = Readers.bookJsonDir(spark, jsonDir)

    // 1. duration_hours — only for string-typed duration columns.
    val withDuration = books.schema("duration").dataType match {
      case StringType =>
        books.withColumn("duration_hours",
          round(GraftFunctions.duration_seconds(col("duration")) / 3600.0, 4))
      case _ => books
    }

    // 2. narrator is already normalized to array<struct> by the reader.

    // 3. wide expand: size the schema from the data (A4).
    val maxNarrators = withDuration
      .agg(max(size(col("narrator")))).head().getInt(0) max 0
    val wideCols = (1 to maxNarrators).flatMap { i =>
      Seq(
        try_element_at(col("narrator"), lit(i)).getField("name").as(s"narrator_${i}_name"),
        try_element_at(col("narrator"), lit(i)).getField("url").as(s"narrator_${i}_url"))
    }
    val base = withDuration.columns.filterNot(_ == "narrator").map(col).toSeq
    val wide = withDuration.select(base ++ wideCols: _*)

    // 4. process_book_df: tvshows filter + null QC columns.
    val filtered = wide.filter(!coalesce(col("audio_url"), lit("")).contains("tvshows"))
    Seq("sample_rate", "quality", "word_count", "num_sentences", "audio_size", "text_size")
      .foldLeft(filtered)((df, c) => df.withColumn(c, lit(null).cast(StringType)))
  }
}
