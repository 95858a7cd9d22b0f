package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `pq_encode(vec, codebooks)` — product-quantization encoding as ONE
  * generated loop nest.
  *
  * The composable form (a slice + 16 dot-struct scores + array_max per
  * subspace) exceeds the codegen field budget and falls back to
  * interpreted per-row evaluation with an allocation per codeword score
  * (measured ~6s for 50k×64-dim at local[32]). This expression embeds the
  * flattened codebook as a reference object and emits a tight
  * m×k×sub primitive loop — the PQ index build stays inside whole-stage
  * codegen, which is what makes encoding 100 TB of embeddings a pure
  * scan-speed map stage.
  *
  * Semantics (bit-identical to the composable form, which the DuckDB
  * oracle replays): per subspace s, code = argmax_j 2·x_s·c_sj − ‖c_sj‖²
  * (the −‖x‖² term of squared-L2 is constant per row and dropped), dot
  * accumulated left-to-right, ties to the HIGHER code id, elements past
  * the vector's end (or null) contribute 0.
  *
  * `right` must be a foldable array<array<array<double>>> literal of
  * shape [m][k][sub] — the data-derived codebooks of
  * [[graft.ops.Similarity.pqCodebooks]].
  */
case class PqEncodeExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(ArrayType(ArrayType(DoubleType, _), _), _))
      if (lt == FloatType || lt == DoubleType) && right.foldable =>
      // the codebook is foldable, so its SHAPE is also checkable now:
      // an empty or ragged literal would otherwise surface as NPE/AIOOBE
      // from the lazy flattening at execution time
      val arr = right.eval(null).asInstanceOf[ArrayData]
      if (arr == null || arr.numElements() == 0)
        TypeCheckResult.TypeCheckFailure(s"$prettyName codebook must have m > 0 subspaces")
      else if (arr.getArray(0) == null ||
        (arr.getArray(0).numElements() > 0 && arr.getArray(0).getArray(0) == null))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName codebook contains a null subspace or codeword")
      else {
        val m = arr.numElements()
        val k0 = arr.getArray(0).numElements()
        val sub0 = if (k0 == 0) 0 else arr.getArray(0).getArray(0).numElements()
        var bad: String = null
        var s = 0
        while (bad == null && s < m) {
          val ks = arr.getArray(s)
          if (ks == null || ks.numElements() != k0)
            bad = s"subspace $s has ${if (ks == null) "null" else ks.numElements().toString} codewords, expected $k0"
          else {
            var j = 0
            while (bad == null && j < k0) {
              val cw = ks.getArray(j)
              if (cw == null || cw.numElements() != sub0)
                bad = s"codeword ($s,$j) has length ${if (cw == null) "null" else cw.numElements().toString}, expected $sub0"
              j += 1
            }
          }
          s += 1
        }
        if (k0 == 0) TypeCheckResult.TypeCheckFailure(s"$prettyName codebook must have k > 0 codewords per subspace")
        else if (sub0 == 0) TypeCheckResult.TypeCheckFailure(s"$prettyName codewords must be non-empty")
        else if (bad != null) TypeCheckResult.TypeCheckFailure(s"$prettyName codebook is ragged: $bad")
        else TypeCheckResult.TypeCheckSuccess
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<array<double>>>), " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Codebook flattened to primitives once per plan: (flat[m·k·sub],
    * norms[m·k], m, k, sub). */
  @transient private lazy val cb: (Array[Double], Array[Double], Int, Int, Int) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val m = arr.numElements()
    val k = arr.getArray(0).numElements()
    val sub = arr.getArray(0).getArray(0).numElements()
    val flat = new Array[Double](m * k * sub)
    val norms = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val ks = arr.getArray(s)
      var j = 0
      while (j < k) {
        val cw = ks.getArray(j)
        var n2 = 0.0
        var t = 0
        while (t < sub) {
          val v = cw.getDouble(t)
          flat((s * k + j) * sub + t) = v
          n2 += v * v
          t += 1
        }
        norms(s * k + j) = n2
        j += 1
      }
      s += 1
    }
    (flat, norms, m, k, sub)
  }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cbIgnored: Any): Any = {
    val (flat, norms, m, k, sub) = cb
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isFloat = leftIsFloat
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.NegativeInfinity
      var bi = 0
      var j = 0
      while (j < k) {
        var d = 0.0
        val base = (s * k + j) * sub
        var t = 0
        while (t < sub) {
          val xi = s * sub + t
          val xv =
            if (xi < n && !x.isNullAt(xi))
              (if (isFloat) x.getFloat(xi).toDouble else x.getDouble(xi))
            else 0.0
          d += xv * flat(base + t)
          t += 1
        }
        val sc = 2 * d - norms(s * k + j)
        if (sc >= best) { best = sc; bi = j }  // >= : ties to the higher code
        j += 1
      }
      codes(s) = bi
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, norms, m, k, sub) = cb
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    val getX =
      if (leftIsFloat) (i: String) => s"(double) %s.getFloat($i)"
      else (i: String) => s"%s.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (x, _) => {
      val Seq(codes, n, s, j, t, d, sc, best, bi, xi, xv) =
        Seq("codes", "n", "s", "j", "t", "d", "sc", "best", "bi", "xi", "xv")
          .map(ctx.freshName)
      s"""
         |int[] $codes = new int[$m];
         |int $n = $x.numElements();
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.NEGATIVE_INFINITY; int $bi = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $sub; $t++) {
         |      int $xi = $s * $sub + $t;
         |      double $xv = ($xi < $n && !$x.isNullAt($xi))
         |        ? ${getX(xi).format(x)} : 0.0;
         |      $d += $xv * $flatRef[($s * $k + $j) * $sub + $t];
         |    }
         |    double $sc = 2 * $d - $normRef[$s * $k + $j];
         |    if ($sc >= $best) { $best = $sc; $bi = $j; }
         |  }
         |  $codes[$s] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}
