package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Similarity search over the `embeddings` table (array<float>, dim 64).
  *
  * These are rows-only checks for the driver: cross-engine float
  * reduction order makes a bit-exact SQL oracle for cosine top-k
  * meaningless, so correctness is instead covered by ScalaTest unit
  * tests against hand-computed vectors (SimilaritySpec).
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

    "emb_near_dup" -> ((s, dir) =>
      Similarity.nearDupInBuckets(Tables.embeddings(s, dir),
          id = "vec_id", vec = "embedding", dim = dim, bits = 8, perBucket = 3)
        .select(col("lsh_bucket"), col("id_a"), col("id_b"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("lsh_bucket"), col("rank"), col("id_a"), col("id_b")))
  )

  val oracle: Map[String, String] = Map.empty
}
