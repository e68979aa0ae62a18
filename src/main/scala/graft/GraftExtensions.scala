package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Concat, Divide, EqualTo, Expression, ExpressionInfo, If, Literal, Size}
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import graft.functions._

/** SparkSessionExtensions module: registers the engine's native
  * expressions as SQL functions and installs the fusion optimizer rule —
  * the supported way to ship custom Catalyst work in a library
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)` at session build).
  *
  * After registration the whole native tier is reachable from pure SQL:
  * `SELECT array_jaccard(a, b)`, `word_shingles(text, 3)`,
  * `parse_cookies(c)`, `simhash16(words)`, `cosine_sim(x, y)`,
  * `minhash_bands(hashes, 64, 16, 42)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => JaccardFusion)
  }
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }
  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("array_jaccard", info("array_jaccard", classOf[ArrayJaccard]),
      es => ArrayJaccard(es(0), es(1))),
    ("cosine_sim", info("cosine_sim", classOf[CosineSim]),
      es => CosineSim(es(0), es(1))),
    ("parse_cookies", info("parse_cookies", classOf[ParseCookies]),
      es => ParseCookies(es(0))),
    ("simhash16", info("simhash16", classOf[SimHash16]),
      es => SimHash16(es(0))),
    ("word_shingles", info("word_shingles", classOf[WordShingles]),
      es => WordShingles(es(0), intArg(es(1), "n"))),
    ("minhash_sig", info("minhash_sig", classOf[MinHashSig]),
      es => MinHashSig(es(0), intArg(es(1), "k"), longArg(es(2), "seed"))),
    ("minhash_bands", info("minhash_bands", classOf[MinHashBands]),
      es => MinHashBands(es(0), intArg(es(1), "k"), intArg(es(2), "bands"), longArg(es(3), "seed"))),
    ("hyperplane_bands", info("hyperplane_bands", classOf[HyperplaneBands]),
      es => HyperplaneBands(es(0), intArg(es(1), "planes"), intArg(es(2), "bands"), strArg(es(3), "tag"))),
    ("mean_byte", info("mean_byte", classOf[MeanByte]),
      es => MeanByte(es(0))),
    ("min_md5_hex", info("min_md5_hex", classOf[MinMd5Hex]),
      es => MinMd5Hex(es(0))),
    ("winnow_fingerprints", info("winnow_fingerprints", classOf[WinnowFingerprints]),
      es => WinnowFingerprints(es(0), intArg(es(1), "k"), intArg(es(2), "w"))))
}

/** Optimizer rule: rewrite the naive built-in Jaccard composition
  *
  *   size(array_intersect(a, b)) / size(array_distinct(concat(a, b)))
  *
  * (any cast placement) into the fused single-pass [[ArrayJaccard]] when
  * both sides are string arrays — users write the declarative form, the
  * engine runs the native one. The classic "recognize the idiom, swap the
  * physical computation" rewrite.
  *
  * Semantics preservation on the union==0 edge: when BOTH inputs are
  * empty the composed form divides zero by zero (whatever the session's
  * division semantics make of that — NaN, null, or an ANSI error), while
  * ArrayJaccard returns 0.0. The rewrite therefore emits a literal
  * `0.0 / 0.0` with the ORIGINAL divide's evalMode on that branch,
  * guarded by two O(1) size() checks (an empty union can only arise from
  * two empty arrays), so the rule never changes observable behavior —
  * the fused path runs on every non-degenerate row. (The branch must not
  * keep the original divide subtree: the rule runs to fixpoint and would
  * re-match its own guard branch forever.) */
object JaccardFusion extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case other => other
  }

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case d @ Divide(num, den, _) =>
      (strip(num), strip(den)) match {
        case (Size(ArrayIntersect(a, b), _),
              Size(ArrayDistinct(Concat(Seq(a2, b2))), _))
            if a.semanticEquals(a2) && b.semanticEquals(b2)
              && isStringArray(a) && isStringArray(b) =>
          val bothEmpty = And(
            EqualTo(Size(a, legacySizeOfNull = false), Literal(0)),
            EqualTo(Size(b, legacySizeOfNull = false), Literal(0)))
          val zeroOverZero = d.withNewChildren(Seq(
            Cast(Literal(0), DoubleType), Cast(Literal(0), DoubleType)))
          If(bothEmpty, zeroOverZero, Cast(ArrayJaccard(a, b), DoubleType))
        case _ => d
      }
  }
}
