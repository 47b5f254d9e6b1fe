package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row greedy BPE work loop, shared by [[BpeEncode]]'s
  * interpreted eval and its generated code (the expression's codegen
  * emits ONE call into this object — the `RegExpReplace` discipline of
  * referencing driver-built state from generated code, so the compiled
  * method size is constant in the merge count and whole-stage codegen
  * always holds).
  *
  * Encodes the standard trained-tokenizer way (Sennrich '16 / GPT-2
  * encoder): per word, segment to marked code points, then repeatedly
  * merge the LOWEST-RANK adjacent pair present (leftmost on rank ties)
  * until none remains — rank lookups against a hash map built once from
  * the merge table. Per-word cost is O(len²) hash probes and independent
  * of the merge count, vs the replaced stacked-replace fold's
  * O(merges × doc-length) string rebuilds: a 30k-merge production
  * vocabulary costs the same per word as the 8-merge demo table.
  *
  * For a WELL-FORMED merge table — every non-initial symbol a merge
  * references is produced by a strictly earlier-ranked merge, which is
  * true of every table [[graft.operators.Bpe.bpeTrain]] can emit, since
  * a pair must exist in the step-j vocabulary to be learned at rank j —
  * greedy lowest-rank encoding is identical to replaying the merges in
  * rank order (`Bpe.bpeApplyFold`, parity spec-asserted at 100+ trained
  * merges): a later merge can never create an occurrence of an
  * earlier-ranked pair, so rank order IS ascending-rank greedy order.
  */
final class BpeEncoder(merges: Array[(String, String)]) extends Serializable {

  /** `left + ' ' + right` → rank. Symbols are required space-free at
    * construction — the same invariant the padded-string fold form rests
    * on (symbols come from whitespace-split tokens, and the fold's own
    * padded representation breaks on space-bearing symbols) — which makes
    * the flat key unambiguous.
    */
  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val (l, r) = merges(i)
      require(l.indexOf(' ') < 0 && r.indexOf(' ') < 0,
        s"BPE merge symbols must not contain spaces: rank $i ('$l', '$r')")
      // first (lowest) rank wins on duplicate pairs, matching rank-order replay
      m.putIfAbsent(l + ' ' + r, Integer.valueOf(i))
      i += 1
    }
    m
  }


  /** End-of-word marker; must match [[graft.operators.Bpe.Eow]]. */
  private val Eow = "</w>"

  // Well-formedness gate: greedy lowest-rank encoding ≡ rank-order replay
  // ONLY when every non-initial symbol a merge references is produced by a
  // strictly earlier-ranked merge (true of everything bpeTrain emits — a
  // pair must exist in the step-j vocabulary to be learned at rank j). A
  // hand-crafted or imported table violating it would tokenize DIFFERENTLY
  // here than under replay, so fail loudly at construction instead of
  // silently diverging. Initial symbols are one code point, optionally
  // marker-suffixed (what segmentation emits), or the bare marker (empty
  // word); everything else must appear as an earlier merge's output.
  locally {
    def initial(s: String): Boolean = {
      val core = if (s != Eow && s.endsWith(Eow)) s.dropRight(Eow.length) else s
      core == Eow ||
        (core.nonEmpty && core.codePointCount(0, core.length) == 1)
    }
    val produced = new java.util.HashSet[String]()
    var i = 0
    while (i < merges.length) {
      val (l, r) = merges(i)
      for (s <- Seq(l, r))
        require(initial(s) || produced.contains(s),
          s"malformed BPE merge table: rank $i references symbol '$s' that " +
            "is neither an initial symbol (one code point, optional " +
            s"'$Eow' suffix) nor produced by an earlier merge — greedy " +
            "encoding would diverge from rank-order replay; fix the table " +
            "or replay it explicitly via Bpe.bpeApplyFold")
      produced.add(l + r)
      i += 1
    }
  }

  /** Encode one document's word array to its subword-token array: each
    * word independently (the marker guarantees merges never cross word
    * boundaries), outputs concatenated in order. Null words are skipped —
    * the fold form's `array_join` drops them the same way.
    */
  def encodeWords(words: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val syms = new java.util.ArrayList[String]()
    val n = words.numElements()
    var wi = 0
    while (wi < n) {
      if (!words.isNullAt(wi)) {
        val w = words.getUTF8String(wi).toString
        syms.clear()
        // one symbol per code point (what `regexp_replace(w, "(.)", " $1 ")`
        // segments), the last carrying the marker; empty word → bare marker
        if (w.isEmpty) syms.add(Eow)
        else {
          var ci = 0
          val len = w.length
          while (ci < len) {
            val cp = w.codePointAt(ci)
            val next = ci + Character.charCount(cp)
            val s = w.substring(ci, next)
            syms.add(if (next >= len) s + Eow else s)
            ci = next
          }
        }
        // greedy: merge the lowest-rank adjacent pair (leftmost on ties)
        // until no pair is in the table
        var continue = syms.size() > 1
        while (continue) {
          var best = -1
          var bestRank = Int.MaxValue
          var i = 0
          val m = syms.size() - 1
          while (i < m) {
            val r = rank.get(syms.get(i) + ' ' + syms.get(i + 1))
            if (r != null && r.intValue() < bestRank) {
              bestRank = r.intValue()
              best = i
            }
            i += 1
          }
          if (best < 0) continue = false
          else {
            syms.set(best, syms.get(best) + syms.get(best + 1))
            syms.remove(best + 1)
            if (syms.size() < 2) continue = false
          }
        }
        var i = 0
        val sn = syms.size()
        while (i < sn) {
          out.add(UTF8String.fromString(syms.get(i)))
          i += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd single-pass greedy BPE encoder: `words: array<string>` →
  * the document's subword tokens as `array<string>`, under a
  * plan-literal merge table (a bounded trained artifact, like
  * [[PqDistances]]' codebook). Replaces the stacked-replace fold whose
  * plan size and per-row cost grew with the merge count — generated
  * code here is one call into the shared [[BpeEncoder]] regardless of
  * whether the table has 8 merges or 30,000, so whole-stage codegen
  * always holds and production vocabularies compile identically to the
  * demo table. Semantics and the fold-equivalence contract: see
  * [[BpeEncoder]].
  *
  * Reference anchor: the reference has no tokenizer surface
  * (xdump is a dump utility); this implements the Sennrich '16 encode
  * step the LLM-pipeline tier mandates.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects array<string>, got $t")
  }

  @transient private lazy val encoder = new BpeEncoder(merges.toArray)

  override def nullSafeEval(words: Any): Any =
    encoder.encodeWords(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $enc.encodeWords($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Column-API entry point: `BpeEncode(tokens($"text"), merges)`. */
  def apply(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(words), merges))
}
