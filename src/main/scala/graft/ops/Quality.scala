package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-quality gate.
  *
  * Reference: `data_quality_checks` (scripts/transform.py:81-111) —
  * column presence, dtype equality, and non-null critical columns, with
  * quarantine-on-failure (scripts/transform.py:133-136).
  *
  * Schema checks are analysis-time (free); the null check is ONE
  * aggregate over the frame (a single scan with map-side partial
  * aggregation — no per-column passes).
  */
object Quality {

  sealed trait Violation { def detail: String }
  final case class MissingColumn(detail: String) extends Violation
  final case class TypeMismatch(detail: String) extends Violation
  final case class NullsInCritical(detail: String) extends Violation

  /** Validate `df` against an expected schema and critical non-null
    * columns. Returns Right(df) when clean, Left(violations) otherwise —
    * callers quarantine on Left, mirroring the reference's skip-and-log. */
  /** The reference stores naive (timezone-less) datetimes
    * (scripts/transform.py:82-87); parquet lakes surface those as either
    * TIMESTAMP or TIMESTAMP_NTZ depending on writer flags — the gate
    * treats them as the same logical type. */
  private def norm(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case org.apache.spark.sql.types.TimestampNTZType => org.apache.spark.sql.types.TimestampType
      case other => other
    }

  def check(df: DataFrame, expected: StructType,
            criticalNonNull: Seq[String]): Either[Seq[Violation], DataFrame] = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap

    val missing = expected.fields.collect {
      case f if !actual.contains(f.name) => MissingColumn(f.name)
    }.toSeq
    val mismatched = expected.fields.collect {
      case f if actual.get(f.name).exists(a => norm(a) != norm(f.dataType)) =>
        TypeMismatch(s"${f.name}: expected ${f.dataType.simpleString}, got ${actual(f.name).simpleString}")
    }.toSeq

    val structural = missing ++ mismatched
    if (structural.nonEmpty) return Left(structural)

    val present = criticalNonNull.filter(actual.contains)
    val nullViolations = if (present.isEmpty) Seq.empty else {
      val aggs = present.map(c => count(when(col(c).isNull, 1)).as(c))
      val counts = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      present.zipWithIndex.collect {
        case (c, i) if counts.getLong(i) > 0 =>
          NullsInCritical(s"$c: ${counts.getLong(i)} null rows")
      }
    }
    if (nullViolations.nonEmpty) Left(nullViolations) else Right(df)
  }

  /** Column-level null/row audit as a one-row DataFrame — the queryable
    * form of the gate (reference: transform.py:104-109). */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => count(when(col(c).isNull, 1)).as(s"null_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
