package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd cosine-to-every-centroid array: given a vector
  * `v: array<double>` (dim wide), its precomputed norm `nrm: double`,
  * the coarse codebook as ONE flat literal `cents: array<double>`
  * (nc × dim, row-major) and the per-centroid norms
  * `cnorms: array<double>` (nc wide), returns the nc-wide array
  * `[ dot(v, cents[ci]) / (nrm · cnorms[ci]) ]` — `Similarity.centCos`'s
  * `css` column, the cell-assignment scores of the whole IVF family.
  *
  * The column-algebra form this replaces — nc separate
  * `DotProduct(v, literal)/(nrm·cn)` expressions inside one `array(…)` —
  * grows the generated method linearly with nc: at nc = 256 × dim 64 it
  * already exceeds what Janino accepts and the encode stage silently
  * runs interpreted (observed in the r20 refound scale run; the exact
  * failure class [[PqDistances]] closed for the m × k × sub unroll).
  * Here the generated code is two short primitive loops REGARDLESS of
  * nc — a FAISS-guideline nlist ≈ √corpus (thousands of cells at 10⁹
  * vectors) compiles the same ~15 lines as the 4-cell spec geometry,
  * and the literal matrix rides the plan as array DATA (a constant
  * reference), not as code.
  *
  * Arithmetic is BIT-IDENTICAL to the unrolled form: per centroid the
  * dot is [[DotProduct]]'s strict sequential `acc += v[d]·c[d]` loop and
  * the divide is by the single product `(nrm · cnorms[ci])` — same ops,
  * same order, so every persisted cell id, cdist and oracle hash is
  * unchanged. Width mismatch (v ≠ dim) → NULL, the [[DotProduct]]
  * contract (the unrolled form nulled per element; the only callers
  * guard widths with `probeDim` requires).
  */
case class CentCosines(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, false)

  // NULL on width mismatch even for non-null inputs (see DotProduct)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType,
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "cent_cosines expects (array<double>, double, array<double>, " +
          s"array<double>), got ($a, $b, $c, $d)")
    }

  override def nullSafeEval(a: Any, b: Any, c: Any, e: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val cents = c.asInstanceOf[ArrayData]
    val cnorms = e.asInstanceOf[ArrayData]
    val nc = cnorms.numElements()
    if (nc == 0 || cents.numElements() != nc * (cents.numElements() / nc) ||
        v.numElements() != cents.numElements() / nc) null
    else {
      val dim = cents.numElements() / nc
      val out = new Array[Double](nc)
      var ci = 0
      while (ci < nc) {
        var acc = 0.0
        var d = 0
        while (d < dim) {
          acc += v.getDouble(d) * cents.getDouble(ci * dim + d)
          d += 1
        }
        out(ci) = acc / (nrm * cnorms.getDouble(ci))
        ci += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, e) => {
      val gad = classOf[GenericArrayData].getName
      val nc = ctx.freshName("nc")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val ci = ctx.freshName("ci")
      val d = ctx.freshName("d")
      s"""
         |int $nc = $e.numElements();
         |int $dim = $nc == 0 ? -1 : $c.numElements() / $nc;
         |if ($nc == 0 || $c.numElements() != $nc * $dim ||
         |    $a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$nc];
         |  for (int $ci = 0; $ci < $nc; $ci++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $a.getDouble($d) * $c.getDouble($ci * $dim + $d);
         |    }
         |    $out[$ci] = $acc / ($b * $e.getDouble($ci));
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): CentCosines =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object CentCosines {
  /** Column-API entry point: `CentCosines($"v", $"nrm", centsCol, normsCol)`. */
  def apply(v: Column, nrm: Column, cents: Column, cnorms: Column): Column =
    ColumnBridge.column(CentCosines(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm),
      ColumnBridge.expression(cents), ColumnBridge.expression(cnorms)))
}
