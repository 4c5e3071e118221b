package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions

/** File-format readers for every source the reference ingests
  * (SURVEY §2.1 S1–S6, S9 text fixture, alignment TSV):
  *
  *  - the consolidated metadata CSV whose cells embed Python-literal
  *    lists/dicts (`crawler/utils.py:53-59`, repair via the PyLiteral
  *    expression),
  *  - the per-book JSON directory (`crawler/metadata.py:248-271`),
  *  - the `"audio, text, source"` url line file
  *    (`crawler/metadata.py:80-91`),
  *  - the aeneas alignment TSV (`alignment/aeneas_batch_align.py:215-225`).
  *
  * All readers declare explicit schemas (or repair inferred ones) so
  * downstream plans keep column pruning and predicate pushdown.
  */
object Readers {

  /** Narrator record as the reference's sheet/JSON carries it
    * (`__init__.py:76-191` — all fields strings, dtype=str). */
  val narratorStruct: StructType = StructType(Seq(
    "id", "name", "dialect", "gender", "age", "url",
    "tone", "volume", "speed", "pitch").map(StructField(_, StringType)))

  val narratorArray: ArrayType = ArrayType(narratorStruct)

  /** Normalize a JSON-text narrator cell to list-of-struct, the
    * reference's three-shape rule (`crawler/metadata.py:261-266`):
    * dict → [dict]; list → list; other scalar → [{name: str(x), url: ""}]. */
  def normalizeNarratorJson(js: Column): Column =
    when(js.isNull, lit(null).cast(narratorArray))
      .when(js.startsWith("["), from_json(js, narratorArray))
      .when(js.startsWith("{"), array(from_json(js, narratorStruct)))
      .otherwise(array(struct(
        Seq(lit(null).cast(StringType).as("id"),
          get_json_object(js, "$").as("name")) ++
          Seq("dialect", "gender", "age").map(f => lit(null).cast(StringType).as(f)) ++
          Seq(lit("").as("url")) ++
          Seq("tone", "volume", "speed", "pitch").map(f => lit(null).cast(StringType).as(f)): _*)))

  /** S1/S2/S3: the consolidated books CSV with Python-literal cells
    * repaired to typed columns (narrator → array<struct>,
    * audio_download_url → array<string>, text_url → [url, source]). */
  def booksCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")     // pandas doubles embedded quotes
      .option("multiLine", "true")
      .csv(path)
    val py = GraftFunctions.pyliteral_to_json _
    raw
      .withColumn("narrator", normalizeNarratorJson(py(col("narrator"))))
      .withColumn("audio_download_url", from_json(py(col("audio_download_url")), ArrayType(StringType)))
      .withColumn("text_url", from_json(py(col("text_url")), ArrayType(StringType)))
      .withColumn("duration", col("duration").cast("double"))
  }

  /** S4: per-book JSON directory. Narrator arrives as dict in some
    * files and list in others — inference falls back to string for
    * the column, which [[normalizeNarratorJson]] then lifts to the
    * canonical array<struct>. */
  def bookJsonDir(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .option("multiLine", "true")
      .option("primitivesAsString", "false")
      .json(s"$dir/*.json")
    val narr = raw.schema("narrator").dataType match {
      case StringType => normalizeNarratorJson(col("narrator"))
      case _ => normalizeNarratorJson(to_json(col("narrator")))
    }
    raw.withColumn("narrator", narr)
  }

  /** S5: `"audio, text, source"` line file → three-column frame. */
  def urlsTxt(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), ", ").as("parts"))
      .select(
        col("parts").getItem(0).as("audio_url"),
        col("parts").getItem(1).as("text_url"),
        col("parts").getItem(2).as("source"))

  /** Alignment TSV `(start, end, id)` in seconds with the reference's
    * derived columns: id strings like "12f" cleaned to a float (F17)
    * and 4-dp duration (F18, `aeneas_batch_align.py:219-222`). */
  def alignmentTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .schema(StructType(Seq(
        StructField("start", DoubleType),
        StructField("end", DoubleType),
        StructField("id", StringType))))
      .csv(path)
      .withColumn("line_id", regexp_replace(col("id"), "f", "").cast("double"))
      .withColumn("duration", round(col("end") - col("start"), 4))
}
