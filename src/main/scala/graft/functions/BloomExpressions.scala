package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain_bloom(key, filter_bytes)` — membership probe against a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] (public Spark
  * sketch API), evaluated INSIDE whole-stage codegen.
  *
  * This is the executable half of a runtime join filter: the filter is
  * built once from the small side of a join (an index-build action — the
  * sketch, not the data, comes to the driver: ~1.2 MB per million keys
  * at 1% fpp), embedded as a foldable binary literal, and probed per big-
  * side row BEFORE the join's shuffle. No false negatives, so a semi-join
  * after the probe returns exactly the un-filtered semi-join's rows
  * ([[graft.ops.RuntimeFilter]]); false positives only cost shuffle bytes.
  * Catalyst's own InjectRuntimeFilter does this automatically for some
  * shuffle-join shapes; this expression gives the pipeline author the
  * same lever explicitly — decontamination against a known id set, delta
  * loads against a watermark key set — where the optimizer's pattern
  * match or size thresholds would decline.
  *
  * The filter deserializes ONCE per expression instance (lazy, shared by
  * the generated code via a reference object), never per row. Key types:
  * integral (probed as long — matching `BloomFilter.put`'s widening) or
  * string (probed over UTF-8 bytes, matching `putString`).
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bloom"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ByteType | ShortType | IntegerType | LongType | StringType, BinaryType)
      if right.foldable =>
      if (right.eval(null) == null)
        TypeCheckResult.TypeCheckFailure(s"$prettyName filter bytes must not be null")
      else
        try { filter; TypeCheckResult.TypeCheckSuccess }
        catch { case e: Exception =>
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName could not deserialize filter: ${e.getMessage}")
        }
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (integral or string key, foldable binary filter), got ($l, $r)")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(key: Any, bytesIgnored: Any): Any = left.dataType match {
    case StringType => filter.mightContainString(key.toString)
    case _ => filter.mightContainLong(key.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (x, _) => left.dataType match {
      case StringType => s"${ev.value} = $ref.mightContainString($x.toString());"
      case _ => s"${ev.value} = $ref.mightContainLong((long) $x);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
