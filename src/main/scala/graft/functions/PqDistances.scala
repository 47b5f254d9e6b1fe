package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd product-quantization distance matrix: given a vector
  * `v: array<double>` (m × sub wide) and a flat codebook
  * `cb: array<double>` laid out as `cb[(mi·k + ci)·sub + d]`, returns the
  * m × k matrix of squared L2 distances from each subvector to every
  * centroid — `Similarity.pqTable`'s `dss` column.
  *
  * The fully-unrolled column-algebra form this replaces — m × k × sub
  * literal subtraction/square terms as one expression tree — blew Janino's
  * 64 KB method limit at the DEFAULT m = 8, k = 16 (observed: every
  * embed_pq/pq_search run logged `Code grows beyond 64 KB` and fell back
  * to interpreted evaluation, boxing every term). Here the generated code
  * is three short primitive loops REGARDLESS of m/k/dim — whole-stage
  * codegen always holds, and a trained k = 256 codebook compiles the same
  * 20 lines as the default k = 16.
  *
  * Arithmetic is bit-identical to the unrolled form and the DuckDB
  * oracle's replay: per (subspace, centroid) a strict sequential sum of
  * `(v[mi·sub+d] − cb[…])²` over d (squares are non-negative, so the
  * `0.0 +` seed cannot even flip a −0.0). Vector width ≠ m × sub → NULL,
  * [[DotProduct]]'s mismatched-width contract.
  */
case class PqDistances(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(ArrayType(DoubleType, false), false)

  // NULL on width mismatch even for non-null inputs (see DotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      if (m > 0 && k > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"pq_distances needs m > 0, k > 0; got ($m, $k)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_distances expects (array<double>, array<double>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val sub = cb.numElements() / (m * k)
    if (cb.numElements() != m * k * sub || v.numElements() != m * sub) null
    else {
      val outer = new Array[Any](m)
      var mi = 0
      while (mi < m) {
        val ds = new Array[Double](k)
        var ci = 0
        while (ci < k) {
          var acc = 0.0
          var d = 0
          while (d < sub) {
            val diff = v.getDouble(mi * sub + d) - cb.getDouble((mi * k + ci) * sub + d)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gad = classOf[GenericArrayData].getName
      val sub = ctx.freshName("sub")
      val outer = ctx.freshName("outer")
      val ds = ctx.freshName("ds")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val mi = ctx.freshName("mi")
      val ci = ctx.freshName("ci")
      val d = ctx.freshName("d")
      s"""
         |int $sub = $b.numElements() / ${m * k};
         |if ($b.numElements() != ${m * k} * $sub || $a.numElements() != $m * $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $outer = new Object[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    double[] $ds = new double[$k];
         |    for (int $ci = 0; $ci < $k; $ci++) {
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $sub; $d++) {
         |        double $diff = $a.getDouble($mi * $sub + $d)
         |          - $b.getDouble(($mi * $k + $ci) * $sub + $d);
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

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDistances =
    copy(left = newLeft, right = newRight)
}

object PqDistances {
  /** Column-API entry point: `PqDistances($"v", codebookCol, m, k)`. */
  def apply(v: Column, codebook: Column, m: Int, k: Int): Column =
    ColumnBridge.column(
      PqDistances(ColumnBridge.expression(v), ColumnBridge.expression(codebook), m, k))
}
