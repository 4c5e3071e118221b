package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Golden-file tests against the reference's own shipped data
  * (read-only under /root/reference/data): the consolidated books
  * CSV (3,386 rows with Python-literal cells), the url line file
  * (3,462 lines — wc undercounts both: unterminated last lines), and the per-book JSON directory (1,335 files,
  * mixed dict/list narrator shapes) driven through the
  * consolidation job. */
class GoldenSourcesSpec extends SparkSuite {
  import spark.implicits._

  private val refData = "/root/reference/data"

  private lazy val bookDir: String = {
    val target = Paths.get("target/golden-books")
    if (!Files.exists(target.resolve("book"))) {
      Files.createDirectories(target)
      val zis = new java.util.zip.ZipInputStream(
        Files.newInputStream(Paths.get(s"$refData/metadata/book.zip")))
      Iterator.continually(zis.getNextEntry).takeWhile(_ != null).foreach { e =>
        val out = target.resolve(e.getName)
        if (e.isDirectory) Files.createDirectories(out)
        else { Files.createDirectories(out.getParent); Files.copy(zis, out) }
      }
      zis.close()
    }
    target.resolve("book").toString
  }

  test("books CSV: 3386 rows, literal columns repaired to typed arrays") {
    val df = Readers.booksCsv(spark, s"$refData/metadata/metadata_book.csv").cache()
    assert(df.count() == 3386)

    val first = df.filter(col("id") === "9600eefb")
      .select(col("name"),
        transform(col("narrator"), n => n.getField("name")).as("narrators"),
        size(col("audio_download_url")).as("n_urls"),
        col("text_url"))
      .as[(String, Seq[String], Int, Seq[String])].head()
    assert(first._1 == "chut-phan-linh-đinh")
    assert(first._2 == Seq("Quốc Thịnh", "Thanh Trúc", "Trần Ngọc San"))
    assert(first._3 >= 2)
    assert(first._4 == Seq("https://thuviensachpdf.com/chut-phan-linh-dinh", "thuviensach"))

    // Every non-null narrator cell must parse (no silent nulls from
    // the literal repair).
    val bad = df.filter(col("narrator").isNull).count()
    assert(bad == 0, s"$bad narrator cells failed to parse")
    df.unpersist()
  }

  test("urls txt: 3462 rows of (audio, text, source)") {
    val df = Readers.urlsTxt(spark, s"$refData/valid_book_urls.txt").cache()
    assert(df.count() == 3462)
    val first = df.orderBy("audio_url").limit(1)
      .as[(String, String, String)].head()
    assert(first._1.startsWith("https://") && first._3.nonEmpty)
    assert(df.filter(col("source") === "invalid").count() >= 0) // P11 path exists
    df.unpersist()
  }

  test("consolidation reproduces the reference job on the book JSON dir") {
    val out = Consolidate(spark, bookDir).cache()
    // 1335 JSONs, exactly one tvshows row filtered (P3).
    assert(out.count() == 1334)
    // wide expand sized by the real max narrator count (A4)
    assert(out.columns.contains("narrator_1_name"))
    val maxN = out.columns.count(_.matches("narrator_\\d+_name"))
    assert(maxN >= 2, s"max narrators $maxN")
    // the six QC columns exist and are all null (P4)
    for (c <- Seq("sample_rate", "quality", "word_count", "num_sentences", "audio_size", "text_size"))
      assert(out.filter(col(c).isNotNull).count() == 0, s"$c should be all null")
    // golden row: dict-narrator book normalizes to a 1-element list
    val row = out.filter(col("id") === "17d9ba0c")
      .select("name", "author", "narrator_1_name", "narrator_1_url")
      .as[(String, String, String, String)].head()
    assert(row == ((
      "10-bai-hoc-tren-chiec-khan-an", "Don Failla",
      "Trần Huỳnh Phương Trang",
      "https://sachnoiviet.net/giong-doc/tran-huy-phuong-trang")))
    out.unpersist()
  }

  test("sinks round-trip: csv / tsv / json / text") {
    val tmp = Files.createTempDirectory(Paths.get("target"), "sinks").toString
    val df = Seq(
      (1L, "a b", Seq("u1", "u2")),
      (2L, "c", Seq("u3"))).toDF("id", "txt", "urls")

    Sinks.csv(df, s"$tmp/csv")
    val csvBack = spark.read.option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(s"$tmp/csv")
      .withColumn("urls", from_json(col("urls"), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
    assert(csvBack.count() == 2)
    assert(csvBack.filter(col("id") === "1").select(size(col("urls"))).as[Int].head() == 2)

    Sinks.tsv(df.select("id", "txt"), s"$tmp/tsv")
    val tsvBack = spark.read.option("sep", "\t").csv(s"$tmp/tsv")
    assert(tsvBack.count() == 2 && tsvBack.columns.length == 2)

    Sinks.jsonPerRow(df, s"$tmp/json")
    assert(spark.read.json(s"$tmp/json").count() == 2)

    Sinks.textLines(df, "txt", s"$tmp/text")
    assert(spark.read.text(s"$tmp/text").as[String].collect().toSet == Set("a b", "c"))

    Sinks.partitionedDataset(df.withColumn("speaker_id", col("id") % 2), "speaker_id", s"$tmp/ds")
    val ds = spark.read.parquet(s"$tmp/ds")
    assert(ds.count() == 2 && ds.columns.contains("speaker_id"))
  }

  test("ORC round-trip preserves rows and keeps pushdown + pruning on the scan") {
    val tmp = Files.createTempDirectory(Paths.get("target"), "orc").toString
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    Sinks.orc(df, s"$tmp/docs")
    val back = spark.read.orc(s"$tmp/docs")
    assert(back.count() === df.count())
    assert(back.schema === df.schema)
    val q = back.filter(col("lang") === "vi").select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lang"),
      s"ORC scan lost predicate pushdown:\n${plan.take(1200)}")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"),
      s"ORC scan lost column pruning: $read")
    assert(q.count() === df.filter(col("lang") === "vi").count())
  }

  test("alignment TSV reader: schema, id clean (F17), duration (F18)") {
    val tmp = Files.createTempDirectory(Paths.get("target"), "align")
    Files.writeString(tmp.resolve("book1.tsv"), "0.0\t2.5\t1f\n2.5\t6.125\t2f\n")
    val df = Readers.alignmentTsv(spark, tmp.toString)
    val rows = df.select("start", "end", "line_id", "duration")
      .as[(Double, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((0.0, 2.5, 1.0, 2.5), (2.5, 6.125, 2.0, 3.625)))
  }
}
