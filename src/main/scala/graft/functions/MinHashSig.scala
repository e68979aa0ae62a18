package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash-signature expression: input is an array<long> of
  * pre-hashed shingles, output the k-slot signature
  * `min_i((a_j*h_i + b_j) mod p)`.
  *
  * Why a custom Expression: the same computation phrased with built-in
  * higher-order functions (`aggregate` + `zip_with` over a k-wide
  * accumulator) is interpreted per-element with boxing — measured ~100 s
  * for 500 docs × ~300 shingles × k=64 at sf0.01. This eval is two tight
  * primitive `while` loops over unboxed longs: the same work in
  * milliseconds, and the cost model a 100 TB corpus needs (linear in
  * Σ shingles, zero allocation beyond the k-slot output).
  *
  * Inputs are reduced `Math.floorMod(h, p)` defensively: the function is
  * SQL-registered (`minhash_sig`), so a caller passing raw xxhash64
  * values (negative / full 64-bit) must get correct permutation math,
  * not silent overflow from `h*a` and negative Java `%` results. For
  * already-reduced inputs (the library's own callers) floorMod is the
  * identity, so signatures are unchanged.
  *
  * Coefficients derive from `seed` so the plan is deterministic across
  * executors, runs, and engines. Codegen emits a call to [[signature]]
  * through a reference object — the loop body stays JIT-compiled Scala
  * while the expression participates in whole-stage codegen (a
  * CodegenFallback would knock the entire stage out of WSCG).
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  private val Prime = 2147483647L // 2^31-1: keeps a*h+b < 2^62, no overflow

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(k)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** Shared by eval and codegen. */
  def signature(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val (a, b) = coeffs
    val sig = Array.fill(k)(Prime)
    var i = 0
    while (i < n) {
      val h = java.lang.Math.floorMod(arr.getLong(i), Prime)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % Prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.signature($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fused MinHash + LSH banding: same input as [[MinHashSig]], but the k-slot
  * signature never materializes — the output is directly the `bands` band
  * hashes (`rows` signature slots mixed per band, band index folded in so
  * buckets never collide across bands).
  *
  * Fusing matters: if the signature is its own projected column, every
  * `element_at(sig, i)` reference in a following projection invites the
  * optimizer to collapse projections and re-evaluate the full signature per
  * reference (observed: ~12 s for 500 docs at sf0.01). One expression, one
  * evaluation, O(shingles·k) per row.
  *
  * Same defensive floorMod and same codegen strategy as [[MinHashSig]]. */
case class MinHashBands(child: Expression, k: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  private val Prime = 2147483647L
  private val rows = k / bands
  require(bands * rows == k, s"bands ($bands) must divide k ($k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<bigint>, got ${other.simpleString}")
  }

  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(k)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** Shared by eval and codegen. */
  def bandHashes(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val (a, b) = coeffs
    val sig = Array.fill(k)(Prime)
    var i = 0
    while (i < n) {
      val h = java.lang.Math.floorMod(arr.getLong(i), Prime)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % Prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var acc = 1125899906842597L + bnd // FNV-ish mix, band index folded in
      var r = 0
      while (r < rows) {
        acc = acc * 31L + sig(bnd * rows + r)
        r += 1
      }
      out(bnd) = acc
      bnd += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    bandHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashBands", this, classOf[MinHashBands].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.bandHashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
