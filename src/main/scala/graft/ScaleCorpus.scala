package graft

import org.apache.spark.sql.functions._

/** Dev tool: materialize an m× scaled copy of a test SF's
  * `documents` and `embeddings` tables, for sweeping the heavy
  * dedup/similarity family beyond the largest shipped SF.
  *
  * Scaling model — m disjoint replicas, not m-way duplication:
  * every token of copy c>0 is prefixed `c{c}·` (and vec elements get
  * a deterministic per-copy jitter), so each replica keeps the
  * ORIGINAL corpus's internal duplicate/near-dup structure while
  * sharing no shingles (or near-neighbors) across replicas. The true
  * result size of a dedup query therefore grows exactly m×, which is
  * what makes a runtime sweep interpretable: measured time vs m
  * against a known-linear workload, with any super-linearity
  * attributable to the PLAN (band blowup, quadratic candidate
  * growth), not to a legitimately larger answer. Copy 0 is byte-
  * identical to the source corpus.
  *
  * Remaining tables are symlinked from the source dir so
  * `SPARK_GRAFT_SF_DIR=<outDir>` works for every registered query.
  *
  * Usage: sbt "runMain graft.ScaleCorpus /root/testdata/sf0.1 /tmp/sweep10x 10"
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, mStr) = args
    val m = mStr.toInt
    require(m >= 1, "scale factor must be >= 1")
    val spark = GraftSession("graft-scalecorpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    new java.io.File(outDir).mkdirs()

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docCopies = (0 until m).map { c =>
      if (c == 0) docs
      else docs.select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit(s"c${c}·"), t))).as("text"),
        col("lang"), col("source"),
        length(concat_ws(" ", transform(split(col("text"), " "),
          t => concat(lit(s"c${c}·"), t)))).cast("long").as("n_chars"))
    }
    docCopies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val embCopies = (0 until m).map { c =>
      if (c == 0) embs
      else embs.select(
        (col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        // deterministic per-copy jitter, ±0.05 per element: intra-copy
        // geometry is near-preserved, cross-copy neighbors break.
        transform(col("embedding"),
          (x, i) => x + (pmod(xxhash64(col("vec_id"), lit(c), i), lit(1000L))
            .cast("double") / 10000.0 - 0.05).cast("float")).as("embedding"),
        col("label"))
    }
    embCopies.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // Symlink everything else so the out dir serves any query.
    val src = new java.io.File(srcDir)
    for (f <- Option(src.listFiles()).getOrElse(Array.empty)
         if !Set("documents.parquet", "embeddings.parquet").contains(f.getName)) {
      val link = java.nio.file.Paths.get(outDir, f.getName)
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link, f.toPath.toAbsolutePath)
    }
    println(s"""{"scaled":"$outDir","m":$m}""")
    spark.stop()
  }
}
