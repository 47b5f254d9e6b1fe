package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** The rolling-hash document fingerprint's whole reduction —
  * (fp_min, fp_max, fp_xor, n_shingles) over the shingle-hash array — as
  * ONE compiled pass. The column-algebra form walks the array four times:
  * `array_min` + `array_max` (each a full comparator pass), an
  * interpreted higher-order `aggregate` for the xor fold (per-element
  * boxed lambda dispatch — HOFs never enter codegen), and `size`. Same
  * null contract as the algebra, spec-pinned: empty array → null struct
  * (docFingerprint's `when(size(sh) > 0, …)` arm), null elements are
  * skipped by min/max exactly as array_min/array_max skip them, and any
  * null element nulls fp_xor exactly as a null poisons the fold's
  * accumulator.
  */
case class FingerprintAgg(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fp_min", LongType, nullable = true),
    StructField("fp_max", LongType, nullable = true),
    StructField("fp_xor", LongType, nullable = true),
    StructField("n_shingles", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fingerprint_agg expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    FingerprintAgg.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.functions.FingerprintAgg.fold($a);
      |${ev.isNull} = (${ev.value} == null);
    """.stripMargin)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): FingerprintAgg =
    copy(child = newChild)
}

object FingerprintAgg {
  /** Column-API entry point over an array<bigint> of shingle hashes. */
  def apply(hashes: Column): Column =
    ColumnBridge.column(FingerprintAgg(ColumnBridge.expression(hashes)))

  /** Public because generated code calls it; null for an empty array. */
  def fold(hs: ArrayData): InternalRow = {
    val n = hs.numElements()
    if (n == 0) return null
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var x = 0L
    var sawNull = false
    var sawVal = false
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) sawNull = true
      else {
        val h = hs.getLong(i)
        sawVal = true
        if (h < mn) mn = h
        if (h > mx) mx = h
        x ^= h
      }
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    if (sawVal) { row.update(0, mn); row.update(1, mx) }
    else { row.update(0, null); row.update(1, null) }
    if (sawNull) row.update(2, null) else row.update(2, x)
    row.update(3, n.toLong)
    row
  }
}
