package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over a token array — the codegen'd form
  * of TextAnalysis.shingles' column algebra
  * (`array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(tk, i, n))))`), which evaluates an interpreted lambda per
  * position, each allocating a slice array and re-walking concat_ws's
  * argument plumbing. Here each window is joined by the same
  * `UTF8String.concatWs` the builtin bottoms out in (nulls skipped
  * identically) and first-occurrence distinctness comes from one
  * LinkedHashSet pass — byte-identical output order and values
  * (parity spec vs the algebra).
  *
  * Fewer than `n` tokens yields the same EMPTY array the algebra's
  * `otherwise(array())` arm produces.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Shingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tk =>
      s"${ev.value} = graft.functions.Shingles.shingle($tk, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  /** Column-API entry point: distinct n-gram shingles of a token array. */
  def apply(toks: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(toks), n))

  private val Sep = UTF8String.fromString(" ")

  /** Public because generated code calls it. */
  def shingle(tk: ArrayData, n: Int): GenericArrayData = {
    val t = tk.numElements()
    if (t < n) return new GenericArrayData(new Array[Any](0))
    // materialize once; concatWs skips nulls exactly like the builtin
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      toks(i) = if (tk.isNullAt(i)) null else tk.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= t - n) {
      val win = new Array[UTF8String](n)
      var j = 0
      while (j < n) { win(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Sep, win: _*)): Unit
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
