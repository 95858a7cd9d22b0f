package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics: global top-k token frequencies and
  * per-document TF-IDF — the "what is this corpus made of" pass every
  * training-data pipeline runs before filtering.
  *
  * Shapes chosen for 100 TB:
  *  - token counting is explode → groupBy(token), which Spark executes
  *    with map-side partial aggregation — the reduce side sees one row
  *    per (partition, distinct token), not one per token occurrence;
  *  - the global top-k goes through `orderBy().limit(k)` — a
  *    TakeOrdered, each partition contributes only its local top-k to
  *    the driver-side merge, never a full-vocabulary single-reducer
  *    window;
  *  - TF-IDF's per-document ranking partitions by doc_id (cardinality =
  *    corpus size, no hot reducer), and the corpus-size scalar joins in
  *    as a broadcast single row, not a driver-side collect.
  */
object Vocab {

  /** (token) rows from whitespace-tokenized lowercased text, empties
    * dropped — the same tokenizer as [[TextAnalysis.tokens]] so vocab
    * stats line up with the quality/langid passes. */
  private def tokenRows(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), explode(TextAnalysis.tokens(col(text))).as("token"))
      .filter(length(col("token")) > 0)

  /** Global top-k tokens by occurrence count (ties → lexicographic).
    * The final rank window runs over k rows only. */
  def topKTokens(df: DataFrame, text: String, k: Int, id: String = "doc_id"): DataFrame = {
    val counts = tokenRows(df, id, text)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    counts.orderBy(col("n").desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
  }

  /** Per-document TF-IDF, top `perDoc` terms per document:
    * tf(d,t) · ln(N / df(t)), plain (unsmoothed) idf — both factors are
    * exact integer counts so the double score is deterministic; ties
    * break lexicographically. */
  def tfIdf(df: DataFrame, id: String, text: String, perDoc: Int): DataFrame = {
    val toks = tokenRows(df, id, text)
    val tf = toks.groupBy(col(id), col("token")).agg(count(lit(1)).as("tf"))
    // (id, token) is distinct in tf, so count(*) per token IS document frequency
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("n_docs").cast("double") / col("df_t")))
    val w = Window.partitionBy(col(id)).orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perDoc)
      .select(col(id), col("token"), col("tf"), col("df_t"), col("tfidf"), col("rank"))
  }
}
