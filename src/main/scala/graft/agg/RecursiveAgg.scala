package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** ORDER-DEPENDENT recursive window aggregates: the industry-default
  * smoothing folds whose value at row t is defined by recursion on the
  * value at row t−1, not by any algebraic combination of the frame —
  * recursive EMA (ema_t = α·x_t + (1−α)·ema_{t−1}) and Wilder's
  * smoothed average (avg_t = (avg_{t−1}·(n−1) + x_t)/n, seeded by the
  * n-SMA), the smoothing under the classic RSI
  * (reference: the returns/vol analytics tier, scripts/app.py:50-75;
  * [[graft.ops.Indicators]] holds the exact finite-window/Cutler forms).
  *
  * Over a running frame (UNBOUNDED PRECEDING..CURRENT ROW) Spark feeds
  * `reduce` one row at a time IN FRAME ORDER — the same evaluation
  * contract [[ProductAgg]]'s windowed cumprod already relies on — so
  * the recursion folds exactly. `merge` (never called on that path) is
  * identity-tolerant and otherwise FAILS LOUDLY: merging two partial
  * order-dependent folds has no correct answer, and a quiet wrong one
  * is the worst outcome. Both folds are plain IEEE-double chains, so an
  * engine replaying the same recursion (e.g. a SQL recursive CTE)
  * reproduces them bit-for-bit — which is what lets these sit on the
  * hard hash-equality oracle signal despite being "recursive".
  *
  * Null inputs are ignored (SQL aggregate semantics) — they advance
  * neither the seed count nor the recursion.
  */
object RecursiveAgg {

  /** Wilder fold state. Public: the state encoder's generated code
    * must construct it. */
  final case class WilderState(sum: Double, cnt: Long, avg: Double)

  /** Wilder's smoothed average over the first-to-current running
    * frame: null until `n` non-null inputs arrived, then seeded at
    * their mean and advanced by avg = (avg·(n−1) + x)/n. */
  final class WilderAvgAgg(n: Int)
      extends Aggregator[java.lang.Double, WilderState, java.lang.Double] {
    require(n >= 1, s"n must be at least 1, got $n")
    override def zero: WilderState = WilderState(0.0, 0L, 0.0)
    override def reduce(b: WilderState, x: java.lang.Double): WilderState =
      if (x == null) b
      else if (b.cnt < n) {
        val s = b.sum + x.doubleValue()
        val c = b.cnt + 1
        WilderState(s, c, if (c == n) s / n else 0.0)
      } else
        WilderState(b.sum, b.cnt + 1,
          (b.avg * (n - 1) + x.doubleValue()) / n)
    override def merge(b1: WilderState, b2: WilderState): WilderState =
      if (b1.cnt == 0) b2
      else if (b2.cnt == 0) b1
      else throw new UnsupportedOperationException(
        "WilderAvgAgg is order-dependent — running-window frames only " +
          "(a grouped/merged aggregation of it has no correct answer)")
    override def finish(b: WilderState): java.lang.Double =
      if (b.cnt >= n) java.lang.Double.valueOf(b.avg) else null
    override def bufferEncoder: Encoder[WilderState] =
      Encoders.product[WilderState]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Recursive-EMA fold state (public, as [[WilderState]]). */
  final case class EmaState(ema: Double, cnt: Long)

  /** Recursive EMA seeded on the first non-null input:
    * ema_1 = x_1; ema_t = α·x_t + (1−α)·ema_{t−1}. */
  final class EmaRecursiveAgg(alpha: Double)
      extends Aggregator[java.lang.Double, EmaState, java.lang.Double] {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    override def zero: EmaState = EmaState(0.0, 0L)
    override def reduce(b: EmaState, x: java.lang.Double): EmaState =
      if (x == null) b
      else if (b.cnt == 0) EmaState(x.doubleValue(), 1L)
      else EmaState(alpha * x.doubleValue() + (1 - alpha) * b.ema, b.cnt + 1)
    override def merge(b1: EmaState, b2: EmaState): EmaState =
      if (b1.cnt == 0) b2
      else if (b2.cnt == 0) b1
      else throw new UnsupportedOperationException(
        "EmaRecursiveAgg is order-dependent — running-window frames only")
    override def finish(b: EmaState): java.lang.Double =
      if (b.cnt == 0) null else java.lang.Double.valueOf(b.ema)
    override def bufferEncoder: Encoder[EmaState] = Encoders.product[EmaState]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** `wilderAvg(n)(col)` as a Column for `over(runningFrame)`. */
  def wilderAvg(n: Int)(c: Column): Column =
    functions.udaf(new WilderAvgAgg(n)).apply(c)

  /** `emaRecursive(alpha)(col)` as a Column for `over(runningFrame)`. */
  def emaRecursive(alpha: Double)(c: Column): Column =
    functions.udaf(new EmaRecursiveAgg(alpha)).apply(c)
}
