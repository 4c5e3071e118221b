package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature preprocessing for the vector tier: per-dimension corpus
  * statistics and the standardization ("whitening" without rotation)
  * transform that [[Clustering]] / [[Quantization]] quality depends
  * on — k-means and PQ both measure unweighted euclidean distance,
  * so a dimension with 10× the variance silently dominates unless
  * the corpus is standardized first.
  */
object Features {

  /** Per-dimension `(n, mean, std)` of an `array<float>` column —
    * the fit census. Exactness recipe is q82's integer quantization:
    * each element is quantized to `floor(x·scale + 0.5)` (one
    * correctly-rounded multiply + floor, identical cross-engine) and
    * the sufficient statistics are LONG sums — order-independent,
    * partitioning-independent, hash-exact. The mean/std derivation
    * then uses correctly-rounded double ops only (the q109 rule), so
    * the whole frame gates bit-for-bit. Degenerate dimensions
    * (n < 2 or zero variance) yield null std.
    *
    * Scale shape: one posexplode scan into a map-side-combinable
    * aggregate bounded by the dimensionality — the shuffle moves
    * O(dims × partitions) rows. The quantized squares bound: with
    * |x| ≤ 1 and scale 1e6, svv grows ~1e12 per element; beyond
    * ~9e6 elements per dimension the long sum nears 2^63 — at that
    * corpus size drop `scale` a digit (the classic fixed-point
    * trade, documented rather than silently saturated). */
  def dimensionStats(embeddings: DataFrame, vecCol: String = "embedding",
                     scale: Long = 1000000L): DataFrame = {
    require(scale > 0, "scale must be positive")
    val nd = col("n").cast("double")
    val svd = col("sv").cast("double")
    val svvd = col("svv").cast("double")
    val variance = (nd * svvd - svd * svd) / (nd * (nd - 1.0d))
    embeddings
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"),
        floor(col("x") * scale + 0.5d).cast("long").as("qv"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("sv"),
        sum(col("qv") * col("qv")).as("svv"))
      .select(col("dim"), col("n"),
        (svd / nd / scale.toDouble).as("mean"),
        when(col("n") >= 2 && variance > 0d, sqrt(variance) / scale.toDouble)
          .as("std"))
  }

  /** Fitted per-dimension statistics, collected for broadcast-free
    * projection deployment (the collectModel convention: the table
    * is dimensionality-sized, not corpus-sized). */
  final case class StandardizerModel(means: Array[Double], stds: Array[Double]) {
    require(means.length == stds.length && means.nonEmpty, "empty model")
  }

  /** Fit a [[StandardizerModel]] — fails fast if any dimension is
    * degenerate (a zero-variance dimension cannot be scaled; drop it
    * upstream) or the dimensionality exceeds `maxDims`. */
  def fitStandardizer(embeddings: DataFrame, vecCol: String = "embedding",
                      scale: Long = 1000000L, maxDims: Int = 4096): StandardizerModel = {
    val rows = dimensionStats(embeddings, vecCol, scale)
      .orderBy("dim").limit(maxDims + 1).collect()
    require(rows.length <= maxDims, s"more than $maxDims dimensions")
    require(rows.nonEmpty, "empty corpus")
    require(rows.forall(!_.isNullAt(3)),
      "degenerate (zero-variance) dimension — drop it before standardizing")
    StandardizerModel(rows.map(_.getDouble(2)), rows.map(_.getDouble(3)))
  }

  /** `(x − mean) / std` per element — a stateless codegen projection
    * over literal arrays (no join, no shuffle, no state), so the
    * same expression deploys on a batch frame or an ingest stream,
    * like every other collectModel scorer. */
  def standardize(df: DataFrame, model: StandardizerModel,
                  vecCol: String = "embedding",
                  outCol: String = "standardized"): DataFrame = {
    val means = array(model.means.map(lit): _*)
    val stds = array(model.stds.map(lit): _*)
    val z: Column = zip_with(
      zip_with(col(vecCol).cast("array<double>"), means, (x, m) => x - m),
      stds, (c, s) => c / s)
    df.withColumn(outCol, z)
  }
}
