package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Compile guard for every custom Catalyst expression in the library.
  *
  * Spark NEVER fails a query when an expression's `doGenCode` emits Java
  * that Janino rejects — it logs one warning and silently runs the whole
  * stage interpreted. That failure mode shipped twice (PqDistances' 64 KB
  * history; PqResidualDistances' r16 null guard), each time voiding a
  * measured codegen claim while every correctness hash stayed green. This
  * spec closes the class: it Janino-compiles each expression's generated
  * projection DIRECTLY — `GenerateUnsafeProjection.generate` throws on a
  * compile error instead of falling back — at the exact parameters the
  * SparkEntry queries use AND at the largest parameters any operator
  * documents, then cross-checks the compiled output against the
  * interpreted `eval` bit-for-bit on non-trivial rows.
  */
class CodegenGuardSpec extends AnyFunSuite {

  private val arrD = ArrayType(DoubleType)
  private val arrL = ArrayType(LongType)
  private val arrS = ArrayType(StringType)
  private val arrArrD = ArrayType(ArrayType(DoubleType))

  private def d(xs: Double*): ArrayData = new GenericArrayData(xs.toArray)
  private def l(xs: Long*): ArrayData = new GenericArrayData(xs.toArray)
  private def s(xs: String*): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray)

  /** Janino-compiles `expr` (throws on invalid generated Java — the whole
    * point: no silent interpreted fallback at this layer) and asserts the
    * compiled projection matches interpreted `eval` on every row.
    */
  private def assertCompilesAndMatchesEval(expr: Expression, rows: Seq[InternalRow]): Unit = {
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws if Janino rejects
    rows.foreach { row =>
      val compiled = proj(row)
      val interpreted = expr.eval(row)
      if (interpreted == null) assert(compiled.isNullAt(0), s"codegen non-null, eval null: $expr")
      else {
        assert(!compiled.isNullAt(0), s"codegen null, eval non-null: $expr")
        assertSame(expr.dataType, compiled.get(0, expr.dataType), interpreted)
      }
    }
  }

  /** Structural bit-equality across the value shapes our expressions emit. */
  private def assertSame(dt: DataType, a: Any, b: Any): Unit = dt match {
    case DoubleType =>
      assert(java.lang.Double.doubleToRawLongBits(a.asInstanceOf[Double]) ===
        java.lang.Double.doubleToRawLongBits(b.asInstanceOf[Double]))
    case LongType => assert(a.asInstanceOf[Long] === b.asInstanceOf[Long])
    case ArrayType(et, _) =>
      val (aa, ba) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      assert(aa.numElements() === ba.numElements(), s"array length under $dt")
      (0 until aa.numElements()).foreach { i =>
        assertSame(et, aa.get(i, et), ba.get(i, et))
      }
    case StringType => assert(a.toString === b.toString)
    case IntegerType => assert(a.asInstanceOf[Int] === b.asInstanceOf[Int])
    case StructType(fields) =>
      val (ar, br) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
      fields.zipWithIndex.foreach { case (f, i) =>
        assert(ar.isNullAt(i) === br.isNullAt(i), s"field ${f.name} nullness")
        if (!ar.isNullAt(i))
          assertSame(f.dataType, ar.get(i, f.dataType), br.get(i, f.dataType))
      }
    case other => fail(s"unhandled type in guard: $other")
  }

  test("DotProduct codegen compiles and matches eval (incl. length-mismatch null)") {
    val e = DotProduct(BoundReference(0, arrD, nullable = true),
      BoundReference(1, arrD, nullable = true))
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(d(1.0, 2.0, 3.0), d(4.0, 5.0, 6.0)),
      InternalRow(d(1.0), d(1.0, 2.0)), // mismatch → null
      InternalRow(d(0.1, -2.5e300, 3.3), d(7.0, 1.0e-300, -1.0))))
  }

  test("SimHash48 codegen compiles and matches eval") {
    val e = SimHash48(BoundReference(0, arrL, nullable = true))
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(l(5L, 5L, 2L)),
      InternalRow(l()),
      InternalRow(l(0xFFFFFFFFFFFFL, 0x800000000000L, -1L))))
  }

  test("AdcDistance codegen compiles and matches eval (incl. out-of-range null)") {
    val e = AdcDistance(BoundReference(0, arrArrD, nullable = true),
      BoundReference(1, arrL, nullable = true))
    val lut = new GenericArrayData(Array[Any](d(1.0, 2.0), d(10.0, 20.0)))
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(lut, l(1L, 0L)),
      InternalRow(lut, l(0L)), // m mismatch → null
      InternalRow(lut, l(0L, 5L)))) // code out of range → null
  }

  test("BpeEncode codegen compiles and matches eval") {
    val e = BpeEncode(BoundReference(0, arrS, nullable = true),
      Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(s("low", "lower", "newest")),
      InternalRow(s())))
  }

  test("TermFreqs codegen compiles and matches eval at demo and 300-term parameters") {
    val small = TermFreqs(BoundReference(0, arrS, nullable = true), Seq("a", "b"))
    assertCompilesAndMatchesEval(small, Seq(
      InternalRow(s("a", "c", "a", "b")),
      InternalRow(s())))
    // largest documented: a 300-term batch union (bm25TopKBatch maxTerms dial)
    val terms = (1 to 300).map(i => f"term$i%03d")
    val big = TermFreqs(BoundReference(0, arrS, nullable = true), terms)
    assertCompilesAndMatchesEval(big, Seq(
      InternalRow(s("term001", "term300", "term001", "nope", "term150"))))
  }

  test("PqDistances codegen compiles and matches eval at demo and production (m,k)") {
    // demo shape: m=2, k=2, sub=2
    val small = PqDistances(BoundReference(0, arrD, nullable = true),
      BoundReference(1, arrD, nullable = true), m = 2, k = 2)
    assertCompilesAndMatchesEval(small, Seq(
      InternalRow(d(1.0, 2.0, 3.0, 4.0), d(0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0)),
      InternalRow(d(1.0, 2.0), d(0.0, 0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0)))) // width → null
    // largest documented: IVFPQ m=8, k=256 (VectorIndexStore production dial);
    // the codebook is 8*256*sub doubles — code size must stay constant.
    val m = 8; val k = 256; val sub = 8
    val rnd = new scala.util.Random(42)
    val v = d(Array.fill(m * sub)(rnd.nextDouble()).toIndexedSeq: _*)
    val cb = d(Array.fill(m * k * sub)(rnd.nextDouble()).toIndexedSeq: _*)
    val big = PqDistances(BoundReference(0, arrD, nullable = true),
      BoundReference(1, arrD, nullable = true), m = m, k = k)
    assertCompilesAndMatchesEval(big, Seq(InternalRow(v, cb)))
  }

  test("PqResidualDistances codegen compiles and matches eval at demo and production (m,k)") {
    val rnd = new scala.util.Random(7)
    def run(m: Int, k: Int, sub: Int, nCells: Int): Unit = {
      val cents = Array.fill(nCells)(Array.fill(m * sub)(rnd.nextDouble()))
      val cb = Array.fill(m * k * sub)(rnd.nextDouble())
      val e = PqResidualDistances(BoundReference(0, arrD, nullable = true),
        BoundReference(1, IntegerType, nullable = true), cents, cb, m, k)
      val v = d(Array.fill(m * sub)(rnd.nextDouble()).toIndexedSeq: _*)
      assertCompilesAndMatchesEval(e, Seq(
        InternalRow(v, 0),
        InternalRow(v, nCells - 1),
        InternalRow(v, nCells), // out-of-range cell → null
        InternalRow(v, -1), // negative cell → null
        InternalRow(d(1.0), 0))) // width mismatch → null
    }
    run(m = 2, k = 2, sub = 2, nCells = 3) // demo shape
    run(m = 8, k = 256, sub = 8, nCells = 64) // production IVFPQ dial
  }

  test("CentCosines codegen compiles and matches eval at demo and production nlist") {
    val dbl = DoubleType
    def run(nc: Int, dim: Int): Unit = {
      val rnd = new scala.util.Random(11)
      val cents = Array.fill(nc * dim)(rnd.nextDouble())
      val cnorms = Array.fill(nc)(0.5 + rnd.nextDouble())
      val e = CentCosines(
        BoundReference(0, arrD, nullable = true),
        BoundReference(1, dbl, nullable = true),
        BoundReference(2, arrD, nullable = true),
        BoundReference(3, arrD, nullable = true))
      val v = d(Array.fill(dim)(rnd.nextDouble()).toIndexedSeq: _*)
      assertCompilesAndMatchesEval(e, Seq(
        InternalRow(v, 1.7, d(cents.toIndexedSeq: _*), d(cnorms.toIndexedSeq: _*)),
        // width mismatch → null (the DotProduct contract)
        InternalRow(d(1.0), 1.7, d(cents.toIndexedSeq: _*), d(cnorms.toIndexedSeq: _*))))
    }
    run(nc = 4, dim = 8) // spec geometry
    // the nc = 256 × dim 64 shape whose nc-wide array(dot/…) unroll
    // outgrew Janino in the r20 refound run, and the FAISS-guideline
    // nlist ≈ √corpus shape (2048 cells) — code size must stay constant
    run(nc = 256, dim = 64)
    run(nc = 2048, dim = 64)
  }

  test("HexHash60 codegen compiles and matches eval") {
    val e = HexHash60(BoundReference(0, StringType, nullable = true))
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(UTF8String.fromString("hello world")),
      InternalRow(UTF8String.fromString("")),
      InternalRow(UTF8String.fromString("na\u00efve caf\u00e9 \u4e2d\u6587 token")),
      InternalRow(UTF8String.fromString("a" * 5000))))
  }

  test("HexHash60All codegen compiles and matches eval (incl. null elements)") {
    val e = HexHash60All(BoundReference(0, arrS, nullable = true))
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(s("one two three", "dup row", "")),
      InternalRow(s()),
      InternalRow(new GenericArrayData(Array[Any](
        UTF8String.fromString("x"), null, UTF8String.fromString("y"))))))
  }

  test("MinHashSig codegen compiles and matches eval at the operator's k = 16") {
    val k = 16
    val as = (0 until k).map(i => (0x3f00000L + 17L * i) % 2147483646L + 1)
    val bs = (0 until k).map(i => (0x1234567L * (i + 1)) % 2147483647L)
    val e = MinHashSig(BoundReference(0, arrS, nullable = true),
      1073741824L, 2147483647L, as, bs)
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(s("a b c", "b c d", "c d e", "a b c")),
      InternalRow(s()), // empty shingle set: k nulls
      InternalRow(new GenericArrayData(Array[Any](null, null))), // all-null: k nulls
      InternalRow(s("solo"))))
  }

  test("Tokens codegen compiles and matches eval") {
    val e = Tokens(BoundReference(0, StringType, nullable = true))
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(UTF8String.fromString("  The Quick\tBrown\nFOX  ")),
      InternalRow(UTF8String.fromString("")),
      InternalRow(UTF8String.fromString("   ")),
      InternalRow(UTF8String.fromString("\u4e2d\u6587 T\u00d6KEN Stra\u00dfe"))))
  }

  test("Shingles codegen compiles and matches eval") {
    val e = Shingles(BoundReference(0, arrS, nullable = true), 3)
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(s("a", "b", "c", "d", "a", "b", "c", "d")),
      InternalRow(s("a", "b")), // fewer than n -> empty
      InternalRow(s()),
      InternalRow(new GenericArrayData(Array[Any](
        UTF8String.fromString("x"), null, UTF8String.fromString("y"),
        UTF8String.fromString("z"))))))
  }

  test("SpanHashes codegen compiles and matches eval at the operator's w/stride") {
    val e = SpanHashes(BoundReference(0, arrS, nullable = true), 15, 5)
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(s((1 to 40).map(i => s"w$i"): _*)),
      InternalRow(s((1 to 15).map(i => s"w$i"): _*)), // exactly w: one span
      InternalRow(s((1 to 14).map(i => s"w$i"): _*)), // fewer than w: empty
      InternalRow(s()),
      InternalRow(new GenericArrayData(
        (UTF8String.fromString("x") +: Array.fill[Any](20)(null))
          .toArray[Any])))) // null tokens skipped by concatWs
    // stride 1 tail behavior
    assertCompilesAndMatchesEval(
      SpanHashes(BoundReference(0, arrS, nullable = true), 2, 1),
      Seq(InternalRow(s("a", "b", "c", "d"))))
  }

  test("StripSpans codegen compiles and matches eval") {
    val e = StripSpans(BoundReference(0, arrS, nullable = true),
      BoundReference(1, arrL, nullable = true), 15)
    assertCompilesAndMatchesEval(e, Seq(
      InternalRow(s((1 to 40).map(i => s"w$i"): _*), l(1L, 6L, 26L)),
      InternalRow(s((1 to 40).map(i => s"w$i"): _*), l()),
      InternalRow(s((1 to 15).map(i => s"w$i"): _*), l(1L)), // fully covered
      InternalRow(s(), l()),
      InternalRow(new GenericArrayData(Array[Any](
        UTF8String.fromString("x"), null, UTF8String.fromString("y"))), l())))
  }

  test("FingerprintAgg codegen compiles and matches eval") {
    val e = FingerprintAgg(BoundReference(0, arrL, nullable = true))
    // struct-typed: compare through a row-level equality on the projection
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    Seq(
      InternalRow(l(5L, -3L, 12L, 5L)),
      InternalRow(l(7L)),
      InternalRow(l())).foreach { row =>
      val compiled = proj(row)
      val interpreted = e.eval(row)
      if (interpreted == null) assert(compiled.isNullAt(0))
      else {
        val c = compiled.getStruct(0, 4)
        val i = interpreted.asInstanceOf[InternalRow]
        (0 until 4).foreach { f =>
          assert(c.isNullAt(f) === i.isNullAt(f), s"field $f nullness")
          if (!c.isNullAt(f)) assert(c.getLong(f) === i.getLong(f), s"field $f")
        }
      }
    }
  }
}
