package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Strided duplicated-span window hashes over a token array — the
  * codegen'd form of Dedup.dupSpans' column algebra
  * (`transform(sequence(1, size(tk) - (w-1), stride), p =>
  * struct(p, hexHash(concat_ws(" ", slice(tk, p, w)))))` under a
  * `size(tk) >= w` guard), which evaluates an interpreted lambda per
  * position, each allocating a slice array, re-walking concat_ws's
  * argument plumbing and re-entering the md5 machinery through three
  * expressions. Here each window is joined by the same
  * `UTF8String.concatWs` the builtin bottoms out in (nulls skipped
  * identically) and hashed by [[HexHash60.hash60]] — bit-identical
  * span_start/span_hash pairs (parity spec vs the algebra).
  *
  * Fewer than `w` tokens yields the same EMPTY array the algebra's
  * `otherwise(array())` arm produces.
  */
case class SpanHashes(child: Expression, w: Int, stride: Int)
    extends UnaryExpression {

  require(w >= 2 && stride >= 1,
    s"need w >= 2, stride >= 1, got w=$w stride=$stride")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("span_start", IntegerType, nullable = false),
    StructField("span_hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"spanhashes expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SpanHashes.spans(input.asInstanceOf[ArrayData], w, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tk =>
      s"${ev.value} = graft.functions.SpanHashes.spans($tk, $w, $stride);")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {
  /** Column-API entry point: (span_start, span_hash) structs for every
    * `w`-token window sampled at `stride`.
    */
  def apply(toks: Column, w: Int, stride: Int): Column =
    ColumnBridge.column(SpanHashes(ColumnBridge.expression(toks), w, stride))

  private val Sep = UTF8String.fromString(" ")

  /** Public because generated code calls it. */
  def spans(tk: ArrayData, w: Int, stride: Int): GenericArrayData = {
    val t = tk.numElements()
    if (t < w) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      toks(i) = if (tk.isNullAt(i)) null else tk.getUTF8String(i)
      i += 1
    }
    // positions 1, 1+stride, … ≤ t-w+1 (1-based), exactly sequence()'s set
    val out = new Array[Any]((t - w) / stride + 1)
    var p = 0
    var k = 0
    while (p <= t - w) {
      val win = new Array[UTF8String](w)
      var j = 0
      while (j < w) { win(j) = toks(p + j); j += 1 }
      out(k) = new GenericInternalRow(Array[Any](
        p + 1, HexHash60.hash60(UTF8String.concatWs(Sep, win: _*))))
      p += stride
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** The REMOVAL kernel paired with [[SpanHashes]] — the codegen'd form of
  * Dedup.stripDupSpans' per-token algebra (`filter(tk, (t, i) =>
  * !exists(st, s => s <= i+1 && i+1 < s+w))` + `array_join(kept, " ")` +
  * the two size counters), which dispatches an interpreted lambda per
  * token with a nested exists walk per call. `starts` is the per-doc
  * sorted hot-span offset array (callers coalesce the left-join miss to
  * an empty array, exactly like the algebra); sortedness makes coverage
  * a two-pointer sweep instead of a per-token scan. Output is the same
  * struct: (text_clean, n_tokens, n_tokens_removed) — null tokens count
  * in the sizes and are skipped by the join, both exactly as the
  * builtins behave.
  */
case class StripSpans(left: Expression, right: Expression, w: Int)
    extends BinaryExpression {

  require(w >= 2, s"need w >= 2, got w=$w")

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_tokens_removed", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"stripspans expects (array<string>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(tk: Any, st: Any): Any =
    StripSpans.strip(tk.asInstanceOf[ArrayData], st.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tk, st) =>
      s"${ev.value} = graft.functions.StripSpans.strip($tk, $st, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripSpans =
    copy(left = newLeft, right = newRight)
}

object StripSpans {
  /** Column-API entry point: strip every token covered by a hot span. */
  def apply(toks: Column, starts: Column, w: Int): Column =
    ColumnBridge.column(StripSpans(
      ColumnBridge.expression(toks), ColumnBridge.expression(starts), w))

  private val Sep = UTF8String.fromString(" ")

  /** Public because generated code calls it. `starts` must be ascending
    * (the callers' sort_array contract); token at 1-based position p is
    * covered iff some start s satisfies s <= p < s + w.
    */
  def strip(tk: ArrayData, st: ArrayData, w: Int): GenericInternalRow = {
    val t = tk.numElements()
    val ns = st.numElements()
    val kept = new Array[UTF8String](t)
    var nKept = 0
    // two-pointer sweep: starts before (p - w + 1) can never cover p again
    var si = 0
    var p = 1
    while (p <= t) {
      while (si < ns && st.getLong(si) + w <= p) si += 1
      val covered = si < ns && st.getLong(si) <= p
      if (!covered) {
        kept(nKept) = if (tk.isNullAt(p - 1)) null else tk.getUTF8String(p - 1)
        nKept += 1
      }
      p += 1
    }
    // concatWs skips nulls — kept null tokens AND the unfilled tail alike,
    // exactly array_join's no-replacement behavior
    val joined = UTF8String.concatWs(Sep, kept.toIndexedSeq: _*)
    new GenericInternalRow(Array[Any](
      joined, t.toLong, (t - nKept).toLong))
  }
}
