package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared tokenizer `filter(split(lower(text), "\\s+"), len > 0)`
  * (TextAnalysis.tokens) as ONE codegen'd expression. The column-algebra
  * form pays an interpreted higher-order `filter` pass — per-token lambda
  * dispatch outside whole-stage codegen — plus an intermediate array for
  * the pre-filter splits, on the single most ubiquitous path in the
  * library (every text operator tokenizes first).
  *
  * EXACT-EQUIVALENCE by construction: the helper calls the same
  * `UTF8String.toLowerCase` and `UTF8String.split(pattern, -1)` the
  * builtin `Lower` and `StringSplit` expressions bottom out in, then
  * drops empties — parity spec covers ASCII, unicode case pairs and
  * whitespace variants against the algebra.
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tokens expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Tokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Tokens.tokenize($s);")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {
  /** Column-API entry point: lowercased whitespace tokens, empties dropped. */
  def apply(c: Column): Column =
    ColumnBridge.column(Tokens(ColumnBridge.expression(c)))

  private val Ws = UTF8String.fromString("\\s+")

  /** Public because generated code calls it. */
  def tokenize(s: UTF8String): GenericArrayData = {
    // the same primitives the builtin Lower/StringSplit chain uses
    val parts = s.toLowerCase.split(Ws, -1)
    var n = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).numChars() > 0) n += 1
      i += 1
    }
    val out = new Array[Any](n)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).numChars() > 0) { out(j) = parts(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}
