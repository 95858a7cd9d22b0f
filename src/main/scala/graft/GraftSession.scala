package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession entry point for the engine.
  *
  * Encapsulates the configuration the rest of the library assumes:
  * graft's function extensions, UTC session time, AQE (with skew-join
  * handling), shuffle parallelism sized to the executor cores instead of
  * the 200 default, and nanosecond-parquet compatibility.
  *
  * On a real cluster, pass `master = None` and size
  * `shufflePartitions` to ~2-3× total executor cores; AQE coalesces
  * the excess at runtime.
  */
object GraftSession {

  def builder(appName: String = "graft",
              master: Option[String] = Some(s"local[${Runtime.getRuntime.availableProcessors}]"),
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(Runtime.getRuntime.availableProcessors)
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    master.fold(b)(b.master)
  }

  def local(appName: String = "graft"): SparkSession = builder(appName).getOrCreate()
}
