package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` —
  * is a higher-order function: Catalyst evaluates it interpreted (boxed
  * element access, a closure call per element, a GenericArrayData
  * allocation per row for the zipped array). For pairwise similarity the
  * dot product runs once per *candidate pair*, so at corpus scale that
  * interpreter overhead — not I/O — dominates the stage. This expression
  * compiles to a primitive loop inside whole-stage codegen: no boxing, no
  * intermediate array, no closure dispatch.
  *
  * Semantics match the HOF form exactly: a strict sequential left fold
  * `((0 + a₁b₁) + a₂b₂) + …` — the same association order the DuckDB
  * oracle's `list_reduce` replays, so results are bit-identical across
  * engines and partitionings. Unequal-length arrays yield NULL, matching
  * the `aggregate(zip_with(a, b, _ * _), …)` form it replaced (zip_with
  * null-pads and null poisons the fold) — a mismatched-dim pair signals a
  * broken embedding pipeline and must not score as a plausible number.
  * Null input array → null; null *elements* are read as 0-contributing
  * (the embedding pipeline never produces them).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL is produced for unequal-length inputs even when both inputs are
  // provably non-null, so nullability cannot be inherited from the children.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point: `DotProduct($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
