package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused random-hyperplane (sign) LSH banding for dense double vectors:
  * input an array<double> embedding, output `bands` band hashes where band
  * b packs the sign bits of hyperplanes [b*rows, (b+1)*rows) as
  * `Σ bit_r << r`. Like [[MinHashBands]], the per-plane signature never
  * materializes as a column — one expression, one evaluation, no
  * re-evaluation trap when several band references follow.
  *
  * The hyperplanes are Rademacher (±1 entries) — a standard choice for
  * sign-LSH — derived from md5 so they are reproducible not just across
  * executors and runs but across ENGINES: weight(j, d) = +1 iff the first
  * hex digit of md5("hp_<tag>_<j>_<d>") is ≥ '8' (i.e. the top bit of the
  * first digest byte is set). The DuckDB oracle rebuilds the identical
  * matrix from the same md5 strings, which is what makes the whole LSH
  * pipeline hash-checkable end to end (q89).
  *
  * The dot product folds left-to-right in dimension order — the same
  * order the oracle's list comprehension sums in — so the sign decision
  * is reproducible (float addition is order-sensitive; sign flips only
  * matter within ~1e-16 of zero, but we don't rely on luck for the
  * order).
  *
  * Cost: O(dim · planes) multiply-adds per row over unboxed doubles, with
  * whole-stage codegen (the weight matrix is referenced from the generated
  * code, not re-derived).
  */
case class HyperplaneBands(child: Expression, planes: Int, bands: Int, tag: String)
    extends UnaryExpression {

  private val rows = planes / bands
  require(bands * rows == planes, s"bands ($bands) must divide planes ($planes)")
  require(rows <= 62, s"rows per band ($rows) must fit a long band hash")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands expects array<double>, got ${other.simpleString}")
  }

  /** Rademacher weights for the observed dimensionality, built on first
    * use and cached (the matrix depends only on (tag, planes, dim)). */
  @transient private var cached: Array[Array[Double]] = _

  private def weights(dim: Int): Array[Array[Double]] = {
    var m = cached
    if (m == null || m(0).length != dim) {
      val md = MessageDigest.getInstance("MD5")
      m = Array.tabulate(planes) { j =>
        Array.tabulate(dim) { d =>
          md.reset()
          val digest = md.digest(s"hp_${tag}_${j}_${d}".getBytes(StandardCharsets.UTF_8))
          if (digest(0) < 0) 1.0 else -1.0 // top bit of first byte = hex digit >= '8'
        }
      }
      cached = m
    }
    m
  }

  /** Shared by eval and codegen: band hashes for one vector. */
  def bandHashes(arr: ArrayData): GenericArrayData = {
    val dim = arr.numElements()
    val w = weights(dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) {
        val wj = w(b * rows + r)
        var dot = 0.0
        var i = 0
        while (i < dim) {
          dot += arr.getDouble(i) * wj(i)
          i += 1
        }
        if (dot >= 0) acc |= 1L << r
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    bandHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneBands", this, classOf[HyperplaneBands].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.bandHashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}
