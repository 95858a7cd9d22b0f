package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index LIFECYCLE: build once, persist to the lake, load and probe
  * many times — the shape of any production ANN service, where the
  * expensive pass (centroid selection + corpus assignment) runs in a
  * build job and query jobs only read.
  *
  * Layout under `path`:
  *  - `centroids.parquet` — (centroid_id int, cv array<double>), k rows;
  *  - `postings.parquet`  — (neighbor_id, cv, centroid_id), one row per
  *    corpus vector, written PARTITIONED BY centroid_id so a probe that
  *    touches `nprobe` lists prunes the rest at the file level (the
  *    on-disk analogue of the broadcast-probe plan: the corpus is never
  *    shuffled, and now never even fully scanned).
  *
  * Determinism: centroids are data-derived ([[Similarity.dataCentroids]])
  * and parquet round-trips doubles/floats bit-exactly, so a loaded index
  * probes identically to the in-memory one — which is what lets the
  * persisted path share the in-memory path's oracle. */
object IvfIndex {

  /** Build the index from `df` and persist it; returns the centroids. */
  def save(df: DataFrame, id: String, vec: String, k: Int,
           path: String): Array[Array[Double]] = {
    val spark = df.sparkSession
    val cents = Similarity.dataCentroids(df, id, vec, k)
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "cv")
      .repartition(1) // k rows — one file, not one per shuffle partition
      .write.mode("overwrite").parquet(s"$path/centroids.parquet")
    Similarity.ivfAssignWith(df, vec, cents)
      .select(col(id).as("neighbor_id"), col(vec).as("cv"), col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/postings.parquet")
    cents
  }

  /** Append a new vector batch to a persisted index WITHOUT rebuilding:
    * the batch is assigned against the EXISTING centroids (k×dim to the
    * driver, never data) and its postings append into the partitioned
    * layout — the continual-ingest shape, where per-batch work is
    * O(|batch|·k) and the historical postings are never rewritten.
    * Centroid drift under sustained ingest is the documented trade:
    * handle it with periodic [[save]] rebuilds, not per-batch. The
    * caller must not append ids already present — postings are an
    * append-only log, and a duplicate id would surface twice in probes
    * (exactly as in any production ANN ingest without a tombstone
    * layer). */
  def append(df: DataFrame, id: String, vec: String, path: String): Unit = {
    val cents = loadCentroids(df.sparkSession, path)
    Similarity.ivfAssignWith(df, vec, cents)
      .select(col(id).as("neighbor_id"), col(vec).as("cv"), col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$path/postings.parquet")
  }

  /** The k×dim centroid matrix, ordered by centroid_id (an index-load
    * action: k rows to the driver, not data). */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/centroids.parquet")
      .orderBy(col("centroid_id")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** The postings frame, partition-pruned by `centroid_id` at scan time
    * when a probe filters on it. */
  def loadPostings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/postings.parquet")
}
