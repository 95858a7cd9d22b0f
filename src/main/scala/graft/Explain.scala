package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println(s"== embeddings rows: " + Tables.embeddings(s, dir).count())
    println(s"== documents rows: " + Tables.documents(s, dir).count())
    for (q <- args) {
      println(s"\n========== $q ==========")
      SparkEntry.queries(q)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
