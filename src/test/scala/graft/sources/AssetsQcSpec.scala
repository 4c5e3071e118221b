package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.AudioOps
import graft.operators.{Audio, Qc}

/** E5 end to end over a synthesized dataset tree: binary scan (S11)
  * → pairing (J3) → decode → QC with a mock transcriber (W5+X8+F11+
  * A8+P9) → segment sink (S19) → dictionary encode (S17). */
class AssetsQcSpec extends SparkSuite {
  import spark.implicits._

  private def ramp(n: Int): Array[Float] = Array.tabulate(n)(i => (i % 50) / 50.0f)

  /** dataset/{speaker}/{book}_{idx}.wav + .txt; book "bad" gets a
    * transcript the mock transcriber will butcher. */
  private lazy val root: String = {
    val dir = Files.createTempDirectory(Paths.get("target"), "dstree")
    // good_2 gets a distinct sample length so the mock transcriber
    // can "recognize" it (it keys on waveform length).
    for ((spk, book, idx, text, n) <- Seq(
      ("s1", "good", 1, "xin chào các bạn", 1600),
      ("s1", "good", 2, "hẹn gặp lại", 3200),
      ("s2", "bad", 1, "một văn bản dài hơn nhiều", 1600),
      ("s2", "bad", 2, "và một câu nữa", 1600))) {
      val d = dir.resolve(spk)
      Files.createDirectories(d)
      Files.write(d.resolve(s"${book}_$idx.wav"), AudioOps.toWavBytes(ramp(n), 16000))
      Files.writeString(d.resolve(s"${book}_$idx.txt"), text)
    }
    // orphan wav without txt — must be excluded from the tree and
    // reported by orphanWavs
    Files.write(dir.resolve("s1").resolve("stray_9.wav"), AudioOps.toWavBytes(ramp(100), 8000))
    dir.toString
  }

  test("S11 dataset tree pairs wav+txt and derives ids; orphans split off") {
    val tree = Assets.datasetTree(spark, root)
    val rows = tree.select("speaker_id", "book_id", "idx", "text")
      .as[(String, String, Int, String)].collect().toSet
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Set(("s1", "good", 1), ("s1", "good", 2), ("s2", "bad", 1), ("s2", "bad", 2)))
    assert(rows.find(r => r._2 == "good" && r._3 == 1).get._4 == "xin chào các bạn")
    val orphans = Assets.orphanWavs(spark, root).as[(String, String)].collect()
    assert(orphans.length == 1 && orphans.head._2.endsWith("stray_9.wav"))
  }

  test("S12 audio grouping by prefix with natural order") {
    val files = Seq(
      "/x/booka_2.mp3", "/x/booka_1.mp3", "/x/booka_10.mp3", "/x/solo.mp3")
      .toDF("path")
    val groups = Assets.audioGroups(files)
      .select("book", "parts", "n_parts")
      .as[(String, Seq[String], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // natural order: 1, 2, 10 (lexicographic would give 1, 10, 2)
    assert(groups("booka")._1 == Seq("/x/booka_1.mp3", "/x/booka_2.mp3", "/x/booka_10.mp3"))
    assert(groups("solo")._2 == 1L)
  }

  test("S9 pluggable text extraction over binary docs") {
    val dir = Files.createTempDirectory(Paths.get("target"), "docs")
    Files.writeString(dir.resolve("a.txt"), "nội dung tài liệu")
    val out = Assets.extractText(Assets.binaryDir(spark, s"$dir/*.txt"))
      .select("text").as[String].collect()
    assert(out.toSeq == Seq("nội dung tài liệu"))
  }

  test("S9 end-to-end: a real PDF payload decodes through the distributed scan") {
    val dir = Files.createTempDirectory(Paths.get("target"), "pdfs")
    val content = "BT (page one of the scanned book) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    Files.write(dir.resolve("doc.pdf"), pdf)
    Files.writeString(dir.resolve("plain.txt"), "chữ thường")
    val out = Assets.extractText(Assets.binaryDir(spark, s"$dir/*"))
      .select("text").as[String].collect().toSet
    // the magic-sniffing default routes the PDF through PdfOps and the
    // text file through UTF-8 in the same scan
    assert(out == Set("page one of the scanned book", "chữ thường"))
  }

  test("E5 QC rejects the book the transcriber butchers") {
    val tree = Assets.datasetTree(spark, root)
      .withColumn("samples", Audio.decode(col("wav")))
      .withColumn("sr", lit(16000))
    // Mock X8: "recognizes" good's two utterances by waveform
    // length; everything else comes out as good_1's text, so book
    // "bad" is 100% wrong.
    val mock = new Qc.Transcriber {
      def transcribe(samples: Array[Float], sr: Int): String =
        if (samples.length == 3200) "hẹn gặp lại" else "xin chào các bạn"
    }
    val qc = Qc.runQc(tree, mock, samplePct = 1.0, werThresholdPct = 50.0)
      .select("book_id", "rejected").as[(String, Boolean)].collect().toMap
    assert(qc == Map("good" -> false, "bad" -> true))

    val kept = Qc.filterRejected(tree, Qc.runQc(tree, mock, 1.0, 50.0))
      .select("book_id").distinct().as[String].collect().toSeq
    assert(kept == Seq("good"))
  }

  test("S19 segment sink writes the dataset layout; S17 encodes speakers") {
    val tree = Assets.datasetTree(spark, root)
    val out = Files.createTempDirectory(Paths.get("target"), "segout").toString
    Sinks.segmentFiles(tree, out)
    assert(Files.exists(Paths.get(out, "s1", "good_1.wav")))
    assert(Files.readString(Paths.get(out, "s2", "bad_2.txt")) == "và một câu nữa")

    val (encoded, dim) = Sinks.dictionaryEncode(tree, "speaker_id")
    val ids = dim.as[(String, Int)].collect().toMap
    assert(ids == Map("s1" -> 0, "s2" -> 1))
    assert(encoded.filter(col("speaker_id_id") === 1).count() == 2)
  }

  test("dictionaryEncode: ids are 0..n-1 in key order at cardinality >> partitions") {
    import spark.implicits._
    // 1,000 distinct keys over 8 range partitions: the per-partition
    // rank + collected-offset re-base must compose to a dense global
    // 0..n-1 id in key order (this is the scale path that replaced
    // the single-partition dense_rank window).
    val keys = (0 until 1000).map(i => f"spk_$i%04d")
    val df = (keys ++ keys.take(200)).toDF("k") // duplicates too
    val (encoded, dim) = graft.sources.Sinks.dictionaryEncode(df, "k", numPartitions = 8)
    val ids = dim.as[(String, Int)].collect().sortBy(_._1)
    assert(ids.map(_._2).toSeq === (0 until 1000))
    assert(ids.map(_._1).toSeq === keys)
    assert(encoded.count() === 1200)
    assert(encoded.filter(col("k_id") === 0).count() === 2)
  }
}
