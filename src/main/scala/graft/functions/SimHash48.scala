package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd 48-bit SimHash signature over an `array<bigint>` of token
  * hashes: bit b of the result is set iff Σ over tokens of (±1 for hash
  * bit b) is positive — the Charikar'02 construction.
  *
  * The column-algebra form (nested `transform`/`aggregate` over
  * `sequence(0, 47)`) walks the token array 48 times through interpreted
  * lambda dispatch; this expression makes one pass with a primitive
  * counter array — same result, O(T × 48) primitive ops inside
  * whole-stage codegen. Sums are order-independent integers, so the
  * signature is exact and partition-invariant, matching the DuckDB
  * oracle's list_transform/list_sum bit for bit.
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  private val Bits = 48

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash48 expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val cnt = new Array[Long](Bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < Bits) {
        cnt(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (cnt(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $cnt = new long[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $Bits; $b++) {
         |    $cnt[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $Bits; $b++) {
         |  if ($cnt[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  /** Column-API entry point over an array<bigint> of token hashes. */
  def apply(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash48(ColumnBridge.expression(tokenHashes)))
}
