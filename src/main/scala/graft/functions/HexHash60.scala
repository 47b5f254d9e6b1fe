package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The codebase's shared 60-bit md5 hash
  * (`conv(substring(md5(x), 1, 15), 16, 10)` — TextAnalysis.hexHash) as
  * ONE codegen'd expression over the digest BYTES.
  *
  * The column-algebra form is semantically three expressions per value:
  * `md5` (a fresh MessageDigest lookup per call plus a 32-char lowercase
  * hex STRING allocation), `substring` (a UTF8String slice) and `conv`
  * (NumberConverter's per-digit parse back out of the hex string into a
  * decimal string, then a long cast). The first 15 hex digits are just
  * the first 7.5 digest bytes read big-endian, so this expression takes
  * the 60-bit value straight off the digest with a per-thread reused
  * MessageDigest — no hex string, no base conversion, no per-call
  * getInstance. Bit-identical by construction (spec-asserted against
  * the column algebra, compiled AND interpreted): every persisted
  * fingerprint, MinHash band, shingle key and DuckDB oracle hash is
  * unchanged.
  */
case class HexHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hexhash60 expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HexHash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HexHash60.hash60($s);")

  override protected def withNewChildInternal(newChild: Expression): HexHash60 =
    copy(child = newChild)
}

object HexHash60 {
  /** Column-API entry point: 60-bit md5 hash of a string column. */
  def apply(c: Column): Column =
    ColumnBridge.column(HexHash60(ColumnBridge.expression(c)))

  // One MessageDigest per thread, reset per call: getInstance("MD5") per
  // value (what DigestUtils does under the builtin md5 expression) is a
  // provider lookup + allocation on the hottest per-token path.
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(bytes) as a non-negative long: digest
    * bytes 0..6 big-endian, then the high nibble of byte 7 — exactly the
    * value `conv(substring(md5(x),1,15),16,10)` parses out of the hex
    * string. Public because generated code calls it.
    */
  def hash60(s: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}

/** [[HexHash60]] mapped over an `array<string>` in one compiled loop —
  * the replacement for `transform(arr, x => hexHash(x))` on the shingle/
  * token hot paths (doc fingerprints, the SimHash vote input, the n-gram
  * inverted-index keys): a higher-order `transform` evaluates its lambda
  * through interpreted dispatch per element, which at corpus scale means
  * millions of boxed expression-tree walks per partition on top of the
  * md5 machinery itself. Null elements map to null elements, exactly as
  * the transform does.
  */
case class HexHash60All(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hexhash60all expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = HexHash60.hash60(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = graft.functions.HexHash60.hash60($a.getUTF8String($i));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexHash60All =
    copy(child = newChild)
}

object HexHash60All {
  /** Column-API entry point over an array<string>. */
  def apply(c: Column): Column =
    ColumnBridge.column(HexHash60All(ColumnBridge.expression(c)))
}
