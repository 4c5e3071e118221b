package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-asset scans (SURVEY §2.1 S9–S12) over the `binaryFile`
  * source: the multimodal pattern is an opaque `content` column plus
  * typed metadata extracted from the path, with decode deferred to
  * the last projection so metadata-only queries never read payloads.
  */
object Assets {

  /** Raw binary scan: (path, modificationTime, length, content). */
  def binaryDir(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** File stem (name minus directory and extension). */
  private def stem(c: org.apache.spark.sql.Column) =
    regexp_replace(element_at(split(c, "/"), -1), "\\.[^.]+$", "")

  /** S11 (`post_process.py:33-76`, `push_to_hf.py:107-141`): walk the
    * `dataset/{speaker}/{book}_{idx}.wav` tree, pair each wav with
    * its sibling `.txt` (J3 suffix-swap lookup join), and derive
    * (speaker_id, book_id, idx) from the path convention. Unpaired
    * wavs — the reference deletes them — come back from
    * [[orphanWavs]] as a left-anti join. */
  def datasetTree(spark: SparkSession, root: String): DataFrame = {
    val wavs = binaryDir(spark, s"$root/*/*.wav")
      .select(col("path"), col("content").as("wav"), stem(col("path")).as("stemname"),
        element_at(split(col("path"), "/"), -2).as("speaker_id"))
    val txts = spark.read.format("binaryFile").load(s"$root/*/*.txt")
      .select(stem(col("path")).as("stemname"),
        decode(col("content"), "UTF-8").as("text"))
    wavs.join(txts, Seq("stemname"))
      .withColumn("book_id", regexp_extract(col("stemname"), "^(.*)_(\\d+)$", 1))
      .withColumn("idx", regexp_extract(col("stemname"), "^(.*)_(\\d+)$", 2).cast("int"))
      .filter(col("book_id") =!= "") // P10: drop non-conforming names
      .select("speaker_id", "book_id", "idx", "stemname", "path", "wav", "text")
  }

  /** The J3 delete branch: wavs with no sibling txt. */
  def orphanWavs(spark: SparkSession, root: String): DataFrame = {
    val wavs = binaryDir(spark, s"$root/*/*.wav")
      .select(col("path"), stem(col("path")).as("stemname"))
    val txts = spark.read.format("binaryFile").load(s"$root/*/*.txt")
      .select(stem(col("path")).as("stemname"))
    wavs.join(txts, Seq("stemname"), "left_anti")
  }

  /** S12/A1/A2 (`crawler/utils.py:85-122`,
    * `process_all.py:544-617`): group part files into books. Key
    * derivation order matches the reference: prefix before the last
    * underscore when the name carries a numeric suffix, else the
    * leading non-digit run; parts are ordered by their extracted
    * sequence number (W1/F15). */
  def audioGroups(files: DataFrame, pathCol: String = "path"): DataFrame = {
    val name = stem(col(pathCol))
    val key = when(name.rlike("_\\d+$"), regexp_extract(name, "^(.*)_\\d+$", 1))
      .otherwise(regexp_extract(name, "^(\\D*)", 1))
    // ANSI mode: cast('' as int) throws, so gate the extraction on a
    // digits-present check instead of coalescing afterwards.
    val seq = when(name.rlike("\\d+$"), regexp_extract(name, "(\\d+)$", 1).cast("int"))
      .otherwise(lit(0))
    files
      .withColumn("book", key)
      .withColumn("seq", seq)
      .groupBy("book")
      .agg(
        transform(
          array_sort(collect_list(struct(col("seq"), col(pathCol).as("p")))),
          x => x.getField("p")).as("parts"),
        count(lit(1)).as("n_parts"))
  }

  /** S9: per-document text extraction from binary content. The
    * reference uses PyMuPDF (`process_all.py:265-279`); here PDF
    * payloads go through the pure-JVM [[graft.functions.PdfOps]]
    * extractor (object scan, FlateDecode + PNG predictors, PDF 1.5
    * object streams, page-tree walk, content-stream text operators,
    * ToUnicode CMaps — see its scaladoc for the declared
    * approximations), and anything else decodes as UTF-8. Still
    * pluggable for other binary formats. */
  trait TextExtractor extends Serializable {
    def extract(content: Array[Byte]): String
  }

  /** Plain-UTF8 extractor (for known-text corpora). */
  object PlainTextExtractor extends TextExtractor {
    def extract(content: Array[Byte]): String =
      new String(content, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Real PDF text extraction ([[graft.functions.PdfOps]]). */
  object PdfTextExtractor extends TextExtractor {
    def extract(content: Array[Byte]): String =
      graft.functions.PdfOps.extractText(content)
  }

  /** Graceful PDF extraction (r17): NULL for documents declaring
    * features the extractor can't handle (encryption, undecodable
    * content filters — [[graft.functions.PdfOps.unsupportedFeature]])
    * instead of best-effort degraded text — the explicit
    * quarantine-routing contract for lake scans. */
  object GracefulPdfTextExtractor extends TextExtractor {
    def extract(content: Array[Byte]): String =
      graft.functions.PdfOps.extractTextOrNull(content)
  }

  /** Magic-sniffing default: `%PDF-` payloads through the PDF
    * extractor, everything else as UTF-8 text. */
  object AutoTextExtractor extends TextExtractor {
    def extract(content: Array[Byte]): String =
      if (graft.functions.PdfOps.isPdf(content)) graft.functions.PdfOps.extractText(content)
      else new String(content, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** S9: binary docs → (path, text) through a pluggable extractor. */
  def extractText(docs: DataFrame, extractor: TextExtractor = AutoTextExtractor): DataFrame = {
    val ex = udf((b: Array[Byte]) => Option(b).map(extractor.extract))
    docs.select(col("path"), ex(col("content")).as("text"))
  }
}
