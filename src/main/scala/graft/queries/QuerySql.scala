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
}
