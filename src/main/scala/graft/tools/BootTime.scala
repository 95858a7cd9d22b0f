package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.Experiment

/** One-off diagnostic: the per-B cost model of ab_bootstrap_ci (the
  * suite's most expensive single query at ~6.9 s min-composite, sf0.1).
  * The Poisson bootstrap's declared price is the ×B row expansion with
  * one md5 draw per (row, replica) — everything downstream is
  * ≤ |groups|·2·B rows. If the measured scaling is ~linear in B with a
  * small fixed intercept, B=64 IS the price and the cost stays
  * declared; a super-linear curve would instead indict the combine.
  * Behind the BENCH_NOTES r18 cost-model line. */
object BootTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("boot-time")
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(col("event_type"),
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B")
          .as("variant"),
        col("value"), col("event_id"))
      .localCheckpoint() // isolate the bootstrap from the scan cost
    val n = ev.count()
    println(s"[boot] input rows=$n")
    for (b <- Seq(8, 16, 32, 64, 128)) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Experiment.bootstrapMeanDiffCi(ev, group = "event_type",
          variant = "variant", value = "value", id = "event_id",
          replicas = b).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[boot] B=$b%3d median=${ts(1)}%.3fs min=${ts.head}%.3fs " +
        f"max=${ts.last}%.3fs")
    }
    spark.stop()
  }
}
