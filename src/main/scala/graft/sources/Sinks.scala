package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-format sinks matching the reference's outputs (SURVEY §2.1
  * S13–S15, S17 dictionary-encode, S18): header CSV, headerless TSV,
  * per-row JSON, text lines, and the speaker-partitioned dataset
  * layout. Literal columns are serialized back to JSON text before
  * CSV write so a round trip through [[Readers.booksCsv]] is
  * lossless at the JSON level. */
object Sinks {

  /** S13: header CSV (pandas `to_csv(index=False)` shape). Array and
    * struct columns are JSON-encoded — CSV cannot carry them natively. */
  def csv(df: DataFrame, path: String): Unit =
    flattenComplex(df).write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)

  /** S15: headerless TSV (alignment rewrite shape,
    * `aeneas_batch_align.py:225`). */
  def tsv(df: DataFrame, path: String): Unit =
    flattenComplex(df).write.mode("overwrite")
      .option("sep", "\t").option("header", "false")
      .csv(path)

  /** S14: one JSON document per row (`Book.save_json`,
    * `__init__.py:331-340`; one physical file per task partition). */
  def jsonPerRow(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S18: one text line per row (normalized sentence-group lines,
    * `process_all.py:351-356`). */
  def textLines(df: DataFrame, column: String, path: String): Unit =
    df.select(col(column).cast("string").as("value")).write.mode("overwrite").text(path)

  /** S17-shape: dataset partitioned by a key column (the
    * `dataset/{speaker_id}/...` layout + HF `class_encode_column`
    * analogue — the dictionary is a dense_rank dimension a consumer
    * can join back). */
  def partitionedDataset(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  private def flattenComplex(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
