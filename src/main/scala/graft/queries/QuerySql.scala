package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers shared by the query files: money and
  * measure sums go through DECIMAL(18,2) so reduction order cannot change
  * the hash the driver compares. */
private[queries] object QuerySql {
  val dec: DecimalType = DecimalType(18, 2)
  def d2(c: Column): Column = c.cast(dec)
  /** Scratch dir for side-effectful entries, deleted on JVM exit so
    * repeated bench/verify runs leak nothing. */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }))
    p.toString
  }

  /** English stopword list as a SQL IN-list (shared by oracle fragments). */
  val stopListEn: String =
    graft.ops.TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")

  /** BM25 rank-list CTE block (k1 = 1.25, b = 0.75 — binary-exact
    * constants; parenthesization mirrors [[graft.ops.Retrieval.bm25TopK]]
    * token-for-token; the ln term is quantized to DECIMAL(20,12) before
    * the per-doc sum, the repo's ln-quantization pattern). Exposes CTE
    * `bm25r(query_id, doc_id, score DOUBLE, rank)` over probe documents
    * `probeIds` querying the whole corpus, self-hits excluded. Shared by
    * the text_bm25_topk and retrieval_rrf_fusion oracles so the replay
    * cannot drift from itself. */
  def bm25Ctes(probeIds: String): String =
    s"""tok AS (SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
       |    FROM documents) WHERE len(token) > 0),
       | tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
       | dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       | dfq AS (SELECT token, count(*) AS df_t FROM tf GROUP BY 1),
       | tot AS (SELECT sum(dl) AS tot_len, count(*) AS n_docs FROM dl),
       | qt AS (SELECT DISTINCT doc_id AS query_id, token FROM tok
       |        WHERE doc_id IN ($probeIds)),
       | bm25sc AS (SELECT q.query_id, tf.doc_id,
       |     CAST(ln((CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5)
       |             / (CAST(df_t AS DOUBLE) + 0.5) + 1.0)
       |       * ((CAST(tf AS DOUBLE) * 2.25)
       |          / (CAST(tf AS DOUBLE) + 1.25 * (0.25
       |             + ((0.75 * CAST(dl AS DOUBLE)) * CAST(n_docs AS DOUBLE))
       |               / CAST(tot_len AS DOUBLE))))
       |       AS DECIMAL(20,12)) AS ts
       |   FROM qt q JOIN tf ON q.token = tf.token
       |   JOIN dl ON tf.doc_id = dl.doc_id
       |   JOIN dfq ON tf.token = dfq.token CROSS JOIN tot
       |   WHERE tf.doc_id <> q.query_id),
       | bm25agg AS (SELECT query_id, doc_id, CAST(sum(ts) AS DOUBLE) AS score
       |             FROM bm25sc GROUP BY 1, 2),
       | bm25r AS (SELECT query_id, doc_id, score,
       |     row_number() OVER (PARTITION BY query_id
       |       ORDER BY score DESC, doc_id) AS rank
       |   FROM bm25agg)""".stripMargin
}
