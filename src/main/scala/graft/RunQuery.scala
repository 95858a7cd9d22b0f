package graft

/** Dev tool: run ONE SparkEntry query by name and show rows/sample.
  *
  * Usage: runMain graft.RunQuery <queryName> [sfDir] [showN]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val showN = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"[runquery] $name rows=${df.count()}")
    df.show(showN, truncate = false)
    spark.stop()
  }
}
