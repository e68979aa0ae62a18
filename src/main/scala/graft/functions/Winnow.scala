package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints over a Rabin-Karp ROLLING hash
  * (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD'03) — the rolling-hash fingerprint family the
  * md5 bottom-sketch (MinMd5Hex, q49) does not cover: winnowing guarantees
  * that any shared substring of length ≥ k+w−1 between two documents
  * yields at least one shared fingerprint, which makes the fingerprint
  * sets usable for copy-span DETECTION, not just whole-document sketching.
  *
  * Definition (replicated verbatim by q104's DuckDB oracle):
  *  - char k-gram hashes: h(g) = fold over code units, h = (h·257 + c) mod
  *    (2³¹−1); computed here with the O(n) rolling update
  *    h' = ((h − c_old·257^(k−1)) · 257 + c_new) mod M — the polynomial
  *    VALUE is identical however it is computed, so the oracle's direct
  *    per-gram fold agrees bit-for-bit
  *  - selection: the minimum hash VALUE of every w-wide window of
  *    consecutive gram hashes (one window covering everything when there
  *    are fewer than w grams)
  *  - fingerprint set: selected values, distinct, ascending
  *
  * Per row this is O(n) time (monotonic-deque sliding min), O(w) extra
  * space — embarrassingly parallel scalar work, no shuffle. Codegen calls
  * the shared eval through a reference object so the stage keeps
  * whole-stage codegen.
  *
  * Hash unit: Unicode CODE POINTS (one gram symbol per code point, with
  * supplementary-plane characters counting once) — the same unit as
  * DuckDB's `ord`/`length`, so the cross-engine oracle agrees on every
  * plane, and the same unit a training corpus needs (astral chars —
  * emoji, rare CJK — are exactly where web text lives). A UTF-16
  * code-unit variant would silently split each astral char into two
  * surrogate grams and shift every window boundary after it. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow_fingerprints: k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.simpleString}")
  }

  private val M = 2147483647L // 2^31 - 1
  private val B = 257L

  /** Shared by eval and codegen. */
  def fingerprints(text: UTF8String): ArrayData = {
    // one pass UTF-16 -> code points; an unpaired surrogate hashes as its
    // own (deterministic) value, same as String#codePoints
    val cp: Array[Int] = text.toString.codePoints().toArray
    val n = cp.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1 // gram count
    // B^(k-1) mod M for the rolling eviction term
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % M; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cp(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = Math.floorMod(h - cp(i - 1) * bk % M, M) // evict old symbol
      h = (h * B + cp(i + k - 1)) % M              // admit new symbol
      hs(i) = h
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var mn = hs(0); i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      sel.add(mn)
    } else {
      // sliding-window min via monotonic index deque
      val deque = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      i = 0
      while (i < m) {
        while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hs(deque(head)))
        i += 1
      }
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    fingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.fingerprints($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
