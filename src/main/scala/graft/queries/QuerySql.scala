package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers shared by the query files: money and
  * measure sums go through DECIMAL(18,2) so reduction order cannot change
  * the hash the driver compares. */
private[queries] object QuerySql {
  val dec: DecimalType = DecimalType(18, 2)
  def d2(c: Column): Column = c.cast(dec)
  /** English stopword list as a SQL IN-list (shared by oracle fragments). */
  val stopListEn: String =
    graft.ops.TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")
}
