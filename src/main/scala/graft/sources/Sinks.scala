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

  /** Columnar interchange beyond parquet: ORC write, same writer
    * semantics (overwrite, partition-parallel). ORC is the other
    * columnar lakehouse format a consumer may demand; it keeps the
    * engine's scale story intact — the round-trip spec pins that
    * filters still push into the ORC scan and column pruning still
    * reaches it, so switching format costs no pruning. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** S17-shape: dataset partitioned by a key column (the
    * `dataset/{speaker_id}/...` layout + HF `class_encode_column`
    * analogue — the dictionary is a dense_rank dimension a consumer
    * can join back). */
  def partitionedDataset(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** S19 (`aeneas_batch_align.py:261-299`): one wav + txt file per
    * utterance under `outDir/{speaker}/{book}_{idx}.{wav,txt}` —
    * binary writes run inside foreachPartition on the executors, so
    * the fan-out scales with partitions, not the driver. */
  def segmentFiles(df: DataFrame, outDir: String,
                   speakerCol: String = "speaker_id", bookCol: String = "book_id",
                   idxCol: String = "idx", wavCol: String = "wav",
                   textCol: String = "text"): Unit = {
    val cols = df.select(
      col(speakerCol).cast("string"), col(bookCol).cast("string"),
      col(idxCol).cast("string"), col(wavCol), col(textCol))
    cols.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach { r =>
        val dir = java.nio.file.Paths.get(outDir, r.getString(0))
        java.nio.file.Files.createDirectories(dir)
        val base = s"${r.getString(1)}_${r.getString(2)}"
        java.nio.file.Files.write(dir.resolve(s"$base.wav"), r.getAs[Array[Byte]](3))
        java.nio.file.Files.writeString(dir.resolve(s"$base.txt"), r.getString(4))
      }
    }
  }

  /** S17 dictionary encode (`push_to_hf.py:16-24`
    * `class_encode_column` analogue): ids are 0..n-1 in key order +
    * the encoded fact column. Returns (encoded, dimension).
    *
    * Scale shape: the distinct keys are range-partitioned, ranked
    * within each range partition, and re-offset by the per-partition
    * counts (a bucket-count collect of `numPartitions` longs, never
    * the keys themselves) — a global `dense_rank().over(orderBy(key))`
    * window would move every distinct key to one partition, which is
    * fine for thousands of speakers and fatal for a high-cardinality
    * dictionary column. */
  def dictionaryEncode(df: DataFrame, keyCol: String,
                       numPartitions: Int = 32,
                       maxBroadcastKeys: Long = 4L << 20): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // Range-partition boundaries come from a random sample whose seed
    // varies per COMPILED PLAN, so the bucket-count collect and the id
    // projection MUST read one materialization of `ranked`: persist it
    // (the collect below is the job that fills the cache), then pin
    // `dim` with its own persist+count before releasing the parent.
    // Persist keeps lineage (unlike a localCheckpoint, whose
    // executor-local blocks make any later executor loss fatal to both
    // returned frames): a lost dim block recomputes through the cached
    // plan, whose RangePartitioner object — boundaries included — is
    // fixed in the RDD graph, so recovery cannot re-bucket keys.
    val ranked = df.select(col(keyCol)).distinct()
      .repartitionByRange(numPartitions, col(keyCol))
      .withColumn("__b", spark_partition_id())
      .withColumn("__r",
        row_number().over(Window.partitionBy(col("__b")).orderBy(col(keyCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = ranked.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offsets = counts.scanLeft((0, 0L)) {
        case ((_, acc), (b, n)) => (b, acc + n)
      }.init.map { case (_, off) => off } // offsets aligned with counts order
      val offsetOf = map(counts.map(_._1).zip(offsets).flatMap {
        case (b, off) => Seq(lit(b), lit(off))
      }.toSeq: _*)
      val dim = ranked
        .withColumn(s"${keyCol}_id",
          (col("__r") - 1 + coalesce(element_at(offsetOf, col("__b")), lit(0L))).cast("int"))
        .select(col(keyCol), col(s"${keyCol}_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Materializes the cache while the parent is still hot AND
      // yields the exact cardinality for free — which gates the
      // broadcast below: a speaker-id-sized dictionary broadcasts, a
      // high-cardinality one (url-level keys) would OOM an executor
      // as a forced broadcast, so past `maxBroadcastKeys` the encode
      // join runs as an ordinary shuffled equi-join instead.
      val nKeys = dim.count()
      val dimSide =
        if (nKeys <= maxBroadcastKeys) org.apache.spark.sql.functions.broadcast(dim)
        else dim
      (df.join(dimSide, Seq(keyCol)), dim)
    } finally ranked.unpersist(blocking = false)
  }

  /** Bucketed parquet table — the co-located-join layout for keys
    * that are joined or aggregated repeatedly at scale: the write
    * pays the shuffle ONCE (hash(keyCol) mod buckets decides the
    * file, sortBy orders within each bucket), and every later
    * equi-join or groupBy on `keyCol` between tables bucketed the
    * same way plans with ZERO Exchange — at 100 TB that converts the
    * nightly fact-to-fact join from a full-cluster shuffle into a
    * per-bucket merge. `path` makes the table external, so the data
    * lands where the caller says and only bucketing metadata lives
    * in the session catalog (read back via `spark.table(table)` —
    * bucket metadata does NOT survive a plain `spark.read.parquet`).
    * Bucket counts must match across tables meant to co-join; pick
    * them so one bucket of the LARGEST table fits an executor
    * (SinksBucketingSpec pins the Exchange-free plans). */
  def bucketedTable(df: DataFrame, table: String, path: String,
                    buckets: Int, keyCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .option("path", path)
      .saveAsTable(table)

  /** Range-sorted parquet layout: globally range-partition on
    * `sortCol` into `nFiles` files, sorted within each. Every file
    * then owns a DISJOINT value range (SinksLayoutSpec reads the
    * footers back and proves it), which is what makes file- and
    * row-group-level min/max pruning effective: a `sortCol`
    * predicate at read time skips whole files instead of sampling
    * every one — on a 100 TB time-ordered table the difference
    * between touching one day's files and touching all of them.
    * The range exchange samples `sortCol` to pick balanced
    * boundaries (skew-tolerant, no manual split points). */
  def rangeSortedParquet(df: DataFrame, sortCol: String, path: String,
                         nFiles: Int): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a parquet dataset into
    * `ceil(bytes / targetFileBytes)` files (size probed from the
    * source files, never hardcoded). The operational janitor every
    * long-lived table needs — streaming sinks and fine-grained
    * partitions accumulate kilobyte files whose per-file
    * open/footer/seek overhead dominates scans at scale (the classic
    * small-files problem); compaction restores scan-sized files.
    * Round-trips the data unchanged (spec-gated); pair with
    * [[rangeSortedParquet]] to restore pruning order in the same
    * rewrite. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
                     outPath: String, targetFileBytes: Long = 128L << 20): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    // Recursive walk: a partitioned dataset (the streaming file sink
    // this compacts writes partition SUBDIRECTORIES) keeps its data
    // files below the root, so a non-recursive listing would sum 0
    // bytes and silently compact everything into one file. A missing
    // or non-directory path is a caller error — fail loudly instead
    // of NPE-ing on listFiles()'s null.
    def walk(f: java.io.File): Iterator[java.io.File] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.iterator.flatMap(k => if (k.isDirectory) walk(k) else Iterator.single(k))
    }
    val root = new java.io.File(path)
    require(root.isDirectory, s"compactParquet: $path is not a directory")
    val bytes = walk(root)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
  }

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
