package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The full k-wide MinHash signature over an `array<string>` of shingles
  * in ONE compiled pass — the fused form of Dedup.minhashSignature's
  * column algebra:
  *
  *   hs    = transform(sh, x => hexHash(x) % base)
  *   sig_i = array_min(transform(hs, h => (h * a_i + b_i) % prime))
  *
  * which walks the shingle array k + 1 times through interpreted lambda
  * dispatch (HOFs never enter whole-stage codegen) and allocates a boxed
  * long array per walk. Here each shingle is digested once
  * ([[HexHash60.hash60]] — same 60-bit md5 value) and its k affine hashes
  * update k primitive running minima in place: O(S × k) fused
  * multiply-mods per document, zero intermediate arrays.
  *
  * EXACT-EQUIVALENCE contract (spec-asserted element-wise against the
  * column algebra, compiled and interpreted): same base/prime arithmetic
  * in non-negative longs (h < 2³⁰, a < prime < 2³¹, so h·a + b < 2⁶² —
  * no overflow), null shingles skipped exactly as the lambda maps them
  * to nulls array_min then ignores, and an array with no non-null
  * shingle yields all-null minima exactly as array_min over an empty or
  * all-null array does. The (a_i, b_i) come in as plain Seq parameters —
  * driver-derived constants (Dedup.mhParam), never data.
  */
case class MinHashSig(
    child: Expression, base: Long, prime: Long,
    as: Seq[Long], bs: Seq[Long]) extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty,
    s"minhashsig needs matching non-empty (a, b) params: ${as.length}/${bs.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhashsig expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        any = true
        val h = HexHash60.hash60(sh.getUTF8String(i)) % base
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    if (any) { var j = 0; while (j < k) { out(j) = mins(j); j += 1 } }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = as.length
    val aRef = ctx.addReferenceObj("mhAs", as.toArray, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, sh => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val out = ctx.freshName("out")
      s"""
         |int $n = $sh.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$sh.isNullAt($i)) {
         |    $any = true;
         |    long $h = graft.functions.HexHash60.hash60($sh.getUTF8String($i)) % ${base}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$k];
         |if ($any) {
         |  for (int $j = 0; $j < $k; $j++) $out[$j] = (Long) $mins[$j];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point: the k-wide MinHash signature of a shingle
    * array under the universal family h_i(x) = (a_i·h(x) + b_i) mod prime
    * over the shared 60-bit md5 base hash reduced mod `base`.
    */
  def apply(sh: Column, base: Long, prime: Long,
      as: Seq[Long], bs: Seq[Long]): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(sh), base, prime, as, bs))
}
