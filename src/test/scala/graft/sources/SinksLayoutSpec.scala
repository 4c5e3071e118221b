package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the physical-layout sinks: range-sorted files own disjoint
  * key ranges (the property min/max pruning depends on), and
  * compaction consolidates small files losslessly. */
class SinksLayoutSpec extends SparkSuite {

  test("rangeSortedParquet: disjoint per-file ranges, lossless, sorted within files") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val out = Files.createTempDirectory(Paths.get("target"), "rangesorted").toAbsolutePath
    Sinks.rangeSortedParquet(orders, "o_orderdate", s"$out/data", nFiles = 8)

    val files = new java.io.File(s"$out/data").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length >= 2, "need several files for a disjointness claim")
    // Per-file (min, max) of the sort column, via a per-file read —
    // exactly the statistics a scan's file-level pruning consults.
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col("o_orderdate")), max(col("o_orderdate"))).head()
      (r.get(0).toString, r.get(1).toString)
    }.sortBy(_._1)
    for (Seq((_, hi), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi <= lo2, s"file ranges overlap: $ranges")
    // Lossless round-trip.
    val back = spark.read.parquet(s"$out/data")
    assert(back.count() === orders.count())
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) ===
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))
  }

  test("compactParquet: many small files -> few target-sized files, lossless") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val base = Files.createTempDirectory(Paths.get("target"), "compact").toAbsolutePath
    // Fragment: one file per ~40 rows.
    orders.repartition(40).write.parquet(s"$base/small")
    val smallFiles = new java.io.File(s"$base/small").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(smallFiles.length >= 30)
    val totalBytes = smallFiles.map(_.length()).sum
    Sinks.compactParquet(spark, s"$base/small", s"$base/big",
      targetFileBytes = totalBytes / 3)
    val bigFiles = new java.io.File(s"$base/big").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(bigFiles.length <= 4, s"expected ~3-4 compacted files, got ${bigFiles.length}")
    val back = spark.read.parquet(s"$base/big")
    assert(back.count() === orders.count())
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) ===
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))
  }
}
