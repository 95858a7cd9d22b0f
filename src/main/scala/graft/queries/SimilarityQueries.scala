package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Similarity search over the `embeddings` table (array<float>, dim 64).
  *
  * `sim_cosine_topk` carries a full DuckDB oracle: both engines compute
  * cosine in double (the oracle casts the float lists to DOUBLE[] first)
  * and the result surfaces as REAL, so a 1-ulp reduction-order divergence
  * cannot survive the downcast. The hash/seed-derived entries (LSH
  * buckets, IVF probes) stay rows-only — their signatures are
  * engine-specific by construction — with ScalaTest covering semantics
  * (SimilaritySpec).
  */
object SimilarityQueries {

  val dim = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "sim_lsh_buckets" -> ((s, dir) =>
      Similarity.lshSignature(Tables.embeddings(s, dir), "embedding", dim, bits = 16)
        .select(col("vec_id"), col("lsh_bucket"))
        .orderBy(col("vec_id"))),

    // rows-only: IVF probes a subset of centroid lists (approximate by design)
    "sim_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          dim = dim, k = 5, nCentroids = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // rows-only: one Lloyd pass over the seeded centroids before probing
    // (the index-build collect is k×dim doubles, not data)
    "sim_ivf_refined_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.refineCentroids(emb, "embedding", dim, k = 16)
      Similarity.ivfTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          dim = dim, k = 5, nCentroids = 16, nprobe = 4,
          centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Fully-oracled IVF: centroids are the first 16 corpus vectors, so
    // DuckDB can rebuild the identical index and probe path in SQL —
    // ANN semantics verified end-to-end on the hard signal.
    "sim_ivf_data_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      Similarity.ivfTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          dim = dim, k = 5, nCentroids = 16, nprobe = 4,
          centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "emb_near_dup" -> ((s, dir) =>
      Similarity.nearDupInBuckets(Tables.embeddings(s, dir),
          id = "vec_id", vec = "embedding", dim = dim, bits = 8, perBucket = 3)
        .select(col("lsh_bucket"), col("id_a"), col("id_b"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("lsh_bucket"), col("rank"), col("id_a"), col("id_b")))
  )

  val oracle: Map[String, String] = Map(
    "sim_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 8),
        | c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |       FROM embeddings),
        | s AS (SELECT query_id, neighbor_id,
        |         list_cosine_similarity(qv, cv) AS cos
        |       FROM q JOIN c ON query_id <> neighbor_id),
        | r AS (SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cos DESC, neighbor_id) AS rank
        |       FROM s)
        |SELECT query_id, neighbor_id, CAST(cos AS REAL) AS cosine,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // Mirrors ivfTopK with dataCentroids exactly: the assignment argmax is
    // array_max over (cos, id) structs — highest cosine, ties to the
    // HIGHER centroid id — hence ORDER BY cos DESC, centroid_id DESC;
    // the probe list uses the same ordering; zero vectors coalesce to -2.
    "sim_ivf_data_topk" ->
      """WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |              FROM embeddings WHERE vec_id < 16),
        | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | assign AS (SELECT vec_id, centroid_id, dv,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
        |       centroid_id DESC) AS rn
        |   FROM v CROSS JOIN cent),
        | idx AS (SELECT vec_id AS neighbor_id, centroid_id, dv AS cv
        |         FROM assign WHERE rn = 1),
        | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
        | probes AS (SELECT query_id, qv, centroid_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY
        |       COALESCE(list_cosine_similarity(qv, cvec), -2) DESC,
        |       centroid_id DESC) AS pr
        |   FROM q CROSS JOIN cent),
        | scored AS (SELECT p.query_id, i.neighbor_id,
        |     list_cosine_similarity(p.qv, i.cv) AS cos
        |   FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
        |   JOIN idx i USING (centroid_id)
        |   WHERE p.query_id <> i.neighbor_id),
        | r AS (SELECT query_id, neighbor_id, cos,
        |     row_number() OVER (PARTITION BY query_id
        |       ORDER BY cos DESC, neighbor_id) AS rank
        |   FROM scored)
        |SELECT query_id, neighbor_id, CAST(cos AS REAL) AS cosine,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin
  )
}
