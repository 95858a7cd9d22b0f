package graft

import java.sql.Timestamp

import graft.pipeline.StockPipeline

/** CLI pipeline driver (reference: scripts/run_pipeline.py — the
  * sequential subprocess chain, here one process, three Spark jobs).
  *
  * Usage: runMain graft.RunPipeline <barsParquet> <rawPath> <enrichedPath>
  *        <warehousePath> [ingestTs=yyyy-MM-dd HH:mm:ss]
  *
  * `ingestTs` defaults to the current time for interactive use; pass it
  * explicitly for reproducible/replayable runs (the engine never stamps
  * wall-clock time on its own inside the plan).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: RunPipeline <barsParquet> <rawPath> <enrichedPath> <warehousePath> [ingestTs]")
    val Array(barsPath, rawPath, enrichedPath, warehousePath) = args.take(4)
    val ingestTs = args.lift(4).map(Timestamp.valueOf)
      .getOrElse(new Timestamp(System.currentTimeMillis()))

    val spark = GraftSession.local("stock-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    val bars = spark.read.parquet(barsPath)
    StockPipeline.run(spark, bars, ingestTs, rawPath, enrichedPath, warehousePath) match {
      case Right(n) =>
        println(s"[pipeline] loaded warehouse: $n rows")
      case Left(violations) =>
        System.err.println(s"[pipeline] DQ gate rejected the batch:")
        violations.foreach(v => System.err.println(s"  - ${v.detail}"))
        sys.exit(1)
    }
    spark.stop()
  }
}
