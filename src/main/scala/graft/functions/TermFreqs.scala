package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies for a FIXED term list, in one token
  * pass: `array<long>` of exact-match counts, index-aligned with
  * `terms`.
  *
  * Replaces the `size(filter(tokens, _ === term_i))` column family in
  * [[graft.operators.TextAnalysis.bm25TopKBatch]], which walks (and
  * allocates a filtered copy of) the token array ONCE PER TERM —
  * O(tokens × |T|) per row with |T| lambda-filter plan nodes, and
  * Spark's higher-order `filter` evaluates INTERPRETED besides. Here
  * the term set is a driver-built UTF8String hash map referenced from
  * generated code (the [[BpeEncode]] discipline), so the cost is
  * O(tokens) hash probes + one |T|-long counts array per row, from ONE
  * plan node of constant size — a 300-term query batch no longer grows
  * the projection past what Janino will compile.
  *
  * Semantics match the replaced form exactly: counts are exact string
  * matches (callers lowercase both sides), null token entries count
  * nowhere (`filter`'s null-predicate-is-false contract), a null token
  * array is NULL out. Terms must be distinct — a duplicate would
  * silently split its counts across indices, so it fails loudly.
  *
  * Reference anchor: reference/xdump has no search surface; this backs
  * the BM25 batch-serving tier (Robertson/Zaragoza '09 §3.2 statistics).
  */
case class TermFreqs(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "term_freqs needs at least one term")
  require(terms.distinct.size == terms.size,
    "term_freqs terms must be distinct — a duplicate splits its counts")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_freqs expects array<string>, got $t")
  }

  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  /** One pass: hash-probe each token, bump its term's slot. Public —
    * the generated code calls it through a reference object.
    */
  def countsOf(toks: ArrayData): ArrayData = {
    val counts = new Array[Long](terms.size)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val idx = lookup.get(toks.getUTF8String(i))
        if (idx != null) counts(idx.intValue()) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(a: Any): Any = countsOf(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termFreqs", this, classOf[TermFreqs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqs =
    copy(child = newChild)
}

object TermFreqs {
  /** Column-API entry point: `TermFreqs(tokens($"text"), terms)`. */
  def apply(toks: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermFreqs(ColumnBridge.expression(toks), terms))
}
