package graft.tools

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

import graft.functions.PqResidualDistances

/** Isolates what the r18 codegen fix actually buys: the
  * [[PqResidualDistances]] ENCODE pass timed compiled vs interpreted on
  * the SAME bound expression and rows, no Spark stages around it. The
  * end-to-end `ivfpq_ingest_residual` wall is a 15–20-stage store loop
  * where the encode expression is one slice, so the r16→r18 claim ("the
  * residual family runs codegen'd again") needs this per-row isolate —
  * the whole-query bench can't resolve it under host variance.
  *
  * Interpreted = `expr.eval` per row, exactly the path Spark's silent
  * fallback ran while the emitted Java didn't compile (r16→r17).
  * Compiled = the `GenerateUnsafeProjection` the fixed emission yields.
  *
  * Usage: `runMain graft.tools.ResidualCodegenIsolate` — one JSON line,
  * min-of-reps seconds per (dial, path) at the SparkEntry dial
  * (m=8, k=16) and the production dial (m=8, k=256).
  */
object ResidualCodegenIsolate {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ISOLATE_ROWS", "1000000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val rnd = new scala.util.Random(13)

    def measure(m: Int, k: Int, sub: Int, cells: Int): (Double, Double) = {
      val cents = Array.fill(cells)(Array.fill(m * sub)(rnd.nextDouble()))
      val cb = Array.fill(m * k * sub)(rnd.nextDouble())
      val expr = PqResidualDistances(
        BoundReference(0, ArrayType(DoubleType), nullable = true),
        BoundReference(1, IntegerType, nullable = true), cents, cb, m, k)
      val rows: Array[InternalRow] = Array.tabulate(n) { i =>
        InternalRow(
          new GenericArrayData(Array.fill(m * sub)(rnd.nextDouble())),
          i % cells)
      }
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      def timed(fn: () => Unit): Double = {
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }
      var sink = 0L // consume outputs so the JIT can't elide the loops
      def compiledPass(): Unit = {
        var i = 0
        while (i < n) { sink += proj(rows(i)).getSizeInBytes; i += 1 }
      }
      def interpretedPass(): Unit = {
        var i = 0
        while (i < n) {
          val v = expr.eval(rows(i))
          if (v != null) sink += 1
          i += 1
        }
      }
      compiledPass(); interpretedPass() // JIT warmup, untimed
      val c = (0 until reps).map(_ => timed(compiledPass _)).min
      val t = (0 until reps).map(_ => timed(interpretedPass _)).min
      if (sink == Long.MinValue) println(sink) // keep sink live
      (c, t)
    }

    val (c16, i16) = measure(m = 8, k = 16, sub = 8, cells = 125)
    val (c256, i256) = measure(m = 8, k = 256, sub = 8, cells = 125)
    println(
      s"""{"rows":$n,"reps":$reps,""" +
      s""""m8k16":{"compiled":$c16,"interpreted":$i16,"speedup":${i16 / c16}},""" +
      s""""m8k256":{"compiled":$c256,"interpreted":$i256,"speedup":${i256 / c256}}}""")
  }
}
