package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity search over the `embeddings` table (`array<float>`,
  * 64-dim): exact brute-force top-k (ground truth), exact near-dup
  * pairs, and the LSH / IVF approximate scale paths.
  *
  * Oracle float policy: the dot product is computed left-to-right in
  * double precision on both sides (Spark `aggregate`/`zip_with` HOFs
  * vs DuckDB `list_inner_product` on DOUBLE[]), and displayed
  * similarity is rounded to 6 dp with ranking done on the raw value
  * with an id tie-break — empirically bit-stable across engines.
  */
object VectorQueries {

  private val oracleProlog = """
    WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
               FROM embeddings)"""

  val qs: Seq[Q] = Seq(

    // ---- q30: exact top-5 cosine neighbors for queries vec_id < 10.
    // Queries broadcast; corpus scanned once, top-k cut per query.
    Q("q30_knn_cosine", Some(oracleProlog + """,
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_inner_product(c.v, q.v) / (c.nrm * q.nrm) AS sim_raw
        FROM p c JOIN p q ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim_raw DESC, neighbor_id) AS BIGINT) AS rank,
               round(sim_raw, 6) AS sim
        FROM scored)
      SELECT query_id, neighbor_id, rank, sim FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank""")) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // ---- q31: exact embedding near-duplicate pairs (cosine >= 0.99).
    Q("q31_embedding_neardup", Some(oracleProlog + """
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
      FROM p a JOIN p b ON a.vec_id < b.vec_id
      WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.99
      ORDER BY vec_a, vec_b""")) { (s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), threshold = 0.99)
        .orderBy("vec_a", "vec_b")
    },

    // ---- q32: LSH-bucketed ANN (16 tables × 6 hyperplanes = 64
    // buckets/table). Approximate by design (bucket-local) —
    // rows-only gate; recall vs the exact q30 is asserted in
    // SimilaritySpec.
    Q("q32_ann_lsh", None) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshAnn(emb, emb.filter(col("vec_id") < 10), k = 5, dim = 64,
        nPlanes = 6, nTables = 16)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // ---- q33: IVF-style ANN (16 centroids, 4 probes).
    Q("q33_ann_ivf", None) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfAnn(emb, emb.filter(col("vec_id") < 10), k = 5,
        nCentroids = 16, nProbe = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    })
}
