package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd asymmetric-distance (ADC) probe: given a query's per-subspace
  * distance lookup table `lut: array<array<double>>` (m × k) and a
  * neighbor's PQ codes `codes: array<bigint>` (m 0-based centroid ids),
  * returns Σ_m lut[m][codes[m]] — the approximate squared L2 distance.
  *
  * This runs once per (query, candidate) pair in `Similarity.pqSearch`,
  * the operator's hot loop; the composable form — m chained dynamic
  * `element_at`s reduced with `+` — is interpreted per probe with boxed
  * array access. Here it is one primitive loop inside whole-stage codegen.
  * Fold order is the same strict sequential left sum the column form and
  * the DuckDB oracle's `list_reduce` replay use, so results are
  * bit-identical. Mismatched m (|lut| ≠ |codes|) → NULL, like
  * [[DotProduct]]'s unequal-length contract; an out-of-range code also
  * yields NULL — identically in eval and codegen (CodegenGuardSpec pins
  * the parity), matching `element_at`'s out-of-bounds-is-NULL semantics
  * in the composable column form this expression replaces.
  */
case class AdcDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on subspace-count mismatch even for non-null inputs (see DotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_distance expects (array<array<double>>, array<bigint>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (lut.numElements() != codes.numElements()) null
    else {
      val m = codes.numElements()
      var acc = 0.0
      var i = 0
      while (i < m) {
        val code = codes.getLong(i)
        val row = lut.getArray(i)
        // out-of-range code → NULL (the PqDistances family discipline): a
        // corrupt row must not throw and kill a corpus-wide encode job
        if (code < 0 || code >= row.numElements()) return null
        acc += row.getDouble(code.toInt)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      val lutRow = ctx.freshName("lutRow")
      val ad = classOf[ArrayData].getName
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = $b.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $code = $b.getLong($i);
         |    $ad $lutRow = $a.getArray($i);
         |    if ($code < 0 || $code >= $lutRow.numElements()) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc += $lutRow.getDouble((int) $code);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  /** Column-API entry point: `AdcDistance($"qlut", $"codes")`. */
  def apply(lut: Column, codes: Column): Column =
    ColumnBridge.column(
      AdcDistance(ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
}
