package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate / exact nearest-neighbor search over an embedding
  * column (`array<float>`).
  *
  * Scale design:
  *  - Norms are precomputed once per row in a narrow projection.
  *  - The exact path broadcasts the (small) query set, so the "cross
  *    join" is a broadcast nested loop over each corpus partition —
  *    no shuffle of the corpus, and top-k is cut down per partition
  *    by the window before anything is collected.
  *  - The LSH path buckets vectors by random-hyperplane sign bits so
  *    each query only scans its own bucket(s) — an equi-join on
  *    bucket id instead of a cross product. Recall is tunable with
  *    the number of planes (fewer planes → bigger buckets → higher
  *    recall, more compute).
  */
object Similarity {

  /** Corpus with cast-to-double embedding and precomputed L2 norm. */
  def prepared(embeddings: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.select(
      col(idCol),
      asDouble(col(vecCol)).as("vec"),
      l2Norm(asDouble(col(vecCol))).as("norm"))

  /** Exact top-k cosine neighbors for each query vector (brute
    * force). Queries are broadcast; `sim` is rounded to 6 dp for
    * cross-engine stability, ranking happens on the raw value with
    * id tiebreak. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, idCol)
    val q = prepared(queries, idCol)
      .select(col(idCol).as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val scored = c.join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("sim_raw", cosinePrenormed(dot(col("vec"), col("qvec")), col("norm"), col("qnorm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim_raw").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim_raw"), 6).as("sim"))
  }

  /** All pairs with cosine >= threshold (exact, self-join).
    * Quadratic — appropriate as ground truth and for bounded
    * partitions; the LSH variant below is the scale path. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double,
                   idCol: String = "vec_id"): DataFrame = {
    val p = prepared(embeddings, idCol)
    val a = p.select(col(idCol).as("vec_a"), col("vec").as("va"), col("norm").as("na"))
    val b = p.select(col(idCol).as("vec_b"), col("vec").as("vb"), col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim_raw", cosinePrenormed(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("sim_raw") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim_raw"), 6).as("sim"))
  }

  /** LSH-bucketed approximate nearest neighbor: vectors are bucketed
    * by `nPlanes` random-hyperplane sign bits; each query is joined
    * only with its bucket and ranked within it. Deterministic
    * (planes derive from md5) but approximate: neighbors in other
    * buckets are not seen. */
  def lshAnn(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int, nPlanes: Int,
             idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, idCol)
      .withColumn("bucket", hyperplaneBucket(col("vec"), dim, nPlanes))
    val q = prepared(queries, idCol)
      .withColumn("bucket", hyperplaneBucket(col("vec"), dim, nPlanes))
      .select(col(idCol).as("query_id"), col("vec").as("qvec"),
        col("norm").as("qnorm"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim_raw", cosinePrenormed(dot(col("vec"), col("qvec")), col("norm"), col("qnorm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim_raw").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim_raw"), 6).as("sim"))
  }

  /** IVF-style ANN: corpus is assigned to the nearest of `nCentroids`
    * deterministic seed centroids (hash-selected corpus vectors);
    * queries probe their `nProbe` closest centroids. Classic
    * inverted-file layout: the corpus is partitioned by centroid id,
    * so a query touches nProbe/nCentroids of the data. */
  def ivfAnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nCentroids: Int, nProbe: Int,
             idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, idCol)
    // Deterministic "training": pick centroid vectors by id hash.
    val wSeed = Window.orderBy(col("cid"), col(idCol))
    val centroids = c
      .withColumn("cid", pmod(col(idCol) * 2654435761L, lit(1000000007L)))
      .withColumn("centroid_id", row_number().over(wSeed))
      .filter(col("centroid_id") <= nCentroids)
      .select(col("centroid_id"), col("vec").as("cvec"), col("norm").as("cnorm"))

    def assign(df: DataFrame, keep: Int): DataFrame = {
      val scored = df.join(broadcast(centroids), lit(true))
        .withColumn("csim", cosinePrenormed(dot(col("vec"), col("cvec")), col("norm"), col("cnorm")))
      val w = Window.partitionBy(df.columns.head).orderBy(col("csim").desc, col("centroid_id").asc)
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cvec", "cnorm", "csim", "crank")
    }

    val cAssigned = assign(c, 1)
    val qAssigned = assign(
      prepared(queries, idCol).withColumnRenamed(idCol, "query_id"), nProbe)
      .select(col("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"), col("centroid_id"))

    val scored = cAssigned.join(broadcast(qAssigned), Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim_raw", cosinePrenormed(dot(col("vec"), col("qvec")), col("norm"), col("qnorm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim_raw").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"),
        round(col("sim_raw"), 6).as("sim"))
  }
}
