package graft.functions

import java.net.URLDecoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F9 as a native expression — the reference's parse-cookies
  * (/root/reference/src/kinesis3/db.clj:136-144): split on ';', split each
  * pair at the FIRST '=', trim both sides, URL-decode the value; a
  * malformed %-sequence yields a NULL value (one bad cookie must never
  * kill an ingest job); duplicate keys resolve last-wins (assoc
  * semantics).
  *
  * Why native: the built-in composition (str_to_map + transform_keys +
  * transform_values(try_url_decode)) is three interpreted passes, and a
  * projection extracting several keys re-evaluates the whole chain per
  * reference (measured 25 s for 100k rows × 5 keys at sf0.1). This eval
  * is one pass over the string, ~1 µs — re-evaluation noise-level.
  * Codegen (here and in every native expression below) emits a call to
  * the shared eval method through a reference object, so the stage keeps
  * whole-stage codegen — a CodegenFallback expression disables WSCG for
  * its whole stage. */
case class ParseCookies(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = true)
  override def prettyName: String = "parse_cookies"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"parse_cookies expects string, got ${other.simpleString}")
  }

  /** Shared by eval and codegen. */
  def parse(str: UTF8String): MapData = {
    val s = str.toString
    // LinkedHashMap: insertion order preserved, duplicate keys last-wins
    val out = new java.util.LinkedHashMap[UTF8String, UTF8String]()
    s.split(";").foreach { pair =>
      if (pair.nonEmpty) {
        val eq = pair.indexOf('=')
        val (k, v) =
          if (eq < 0) (pair.trim, null)
          else (pair.substring(0, eq).trim, pair.substring(eq + 1).trim)
        if (k.nonEmpty) {
          val decoded =
            if (v == null) null
            else try UTF8String.fromString(URLDecoder.decode(v, "UTF-8"))
            catch { case _: IllegalArgumentException => null }
          out.put(UTF8String.fromString(k), decoded)
        }
      }
    }
    val keys = new Array[Any](out.size)
    val vals = new Array[Any](out.size)
    var i = 0
    val it = out.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); keys(i) = e.getKey; vals(i) = e.getValue; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("parseCookies", this, classOf[ParseCookies].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.parse($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseCookies =
    copy(child = newChild)
}

/** Distinct word n-gram shingles as one native pass: split on single
  * spaces, emit the `n`-word windows, dedup preserving first-seen order
  * (matches split+transform+array_distinct built-in composition
  * bit-for-bit, at interpreted-HOF-free cost — shingling feeds every
  * near-dup/fingerprint operator so it runs 2-3× per doc per query). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${other.simpleString}")
  }

  /** Shared by eval and codegen. */
  def shingles(text: UTF8String): ArrayData = {
    // split(text, " ") semantics: Java split with -1 limit keeps empties
    val words = text.toString.split(" ", -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.shingles($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Bottom-1 md5 sketch over a string array: lowercase hex of the smallest
  * digest (byte-order == hex-order, both unsigned-lexicographic). One
  * digest per element in a tight loop — the built-in
  * array_min(transform(sh, md5)) phrasing allocates a hex string per
  * element and walks interpreted lambda machinery (~15M md5+alloc at
  * sf0.1 for q49). */
case class MinMd5Hex(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "min_md5_hex"
  override def nullable: Boolean = true // empty array -> null

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_md5_hex expects array<string>, got ${other.simpleString}")
  }

  /** Shared by eval and codegen; null for an empty array. */
  def minMd5(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      if (min == null || unsignedLess(digest, min)) min = digest
      i += 1
    }
    val sb = new java.lang.StringBuilder(32)
    min.foreach { b => sb.append(f"${b & 0xff}%02x") }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    minMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minMd5Hex", this, classOf[MinMd5Hex].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $self.minMd5($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): MinMd5Hex =
    copy(child = newChild)
}

/** Mean byte value of a binary column (multimodal feature-extract stand-in,
  * Multimodal.meanByte): the built-in phrasing walks a generated position
  * array with conv(hex(substring(...))) per byte — three allocations per
  * byte, ~14 s at sf0.1; this is one primitive loop over the byte array. */
case class MeanByte(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "mean_byte"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mean_byte expects binary, got ${other.simpleString}")
  }

  /** Shared by eval and codegen. */
  def mean(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) 0.0
    else {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      sum.toDouble / bytes.length
    }
  }

  override def nullSafeEval(input: Any): Any =
    mean(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("meanByte", this, classOf[MeanByte].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.mean($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MeanByte =
    copy(child = newChild)
}

/** Fused cosine similarity over two array<double> columns: one pass,
  * primitive accumulation — the SURVEY §4 candidate ("fused
  * CosineSimilarity Expression if zip_with+aggregate proves too slow for
  * similarity scans"); it does: all-pairs near-dup at sf0.1 is ~25M
  * cosines, minutes interpreted vs seconds here. Accumulation order is
  * index-sequential, matching DuckDB's list_cosine_similarity fold, so
  * oracle comparisons stay bit-stable. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double>, got ${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot, na, nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Whole-stage-codegen body: the same primitive loop, inlined into the
    * generated stage (no per-row expression-tree walk, no boxing). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** 16-bit SimHash over distinct words, md5-derived (same definition as the
  * built-in composition in Dedup.q43's oracle: bit b set iff the majority
  * of distinct words have hex digit b+1 of md5(word) in 8..f). One md5
  * per word instead of 16 (the composed form recomputes the digest per
  * bit — measured 3.5 s at sf0.1). */
/** Johnson–Lindenstrauss Rademacher projection (dIn → dOut dims) fused
  * into one pass per vector: component_j = double(Σᵢ sign(j,i)·dec10(xᵢ))
  * where dec10 is the decimal-accumulator convention (HALF_UP 10-dp
  * rounding of the double's shortest decimal representation — exactly
  * Spark's `cast(x as decimal(28,10))`, so the output is bit-identical
  * to the composed posexplode→weight-join→decimal-sum formulation and
  * to the DuckDB oracle) and sign(j,i) = +1 iff the first hex digit of
  * md5("j:i") is ≥ 8 (the q43/q89 Rademacher trick). Signs are
  * precomputed once per executor. Replaces a 64×-row explode, a
  * broadcast join against a dOut·dIn weight table, and two keyed
  * aggregations (one shuffle each) with zero shuffles — at 100 TB the
  * projection becomes a pure map stage. Decimal addition is associative,
  * so the index-ordered fold equals the aggregate's any-order sum.
  *
  * Range note: this accumulator is unbounded java.math.BigDecimal, while
  * the composed formulation sums as Spark DECIMAL(28,10), whose overflow
  * yields null under ANSI-off. The bit-identity claim therefore holds for
  * sums within DECIMAL(28,10) range (|Σ| < 10¹⁸) — embeddings are
  * unit-scale, so a 64-term signed sum sits ~16 orders of magnitude
  * inside it; beyond that the composed form would null where this
  * returns a value. */
case class JlProject(child: Expression, dOut: Int, dIn: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jl_project expects array<double>, got ${other.simpleString}")
  }

  @transient private lazy val signs: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut, dIn) { (j, i) =>
      md.reset()
      val digest = md.digest(s"$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (((digest(0) >> 4) & 0xF) >= 8) 1 else -1
    }
  }

  /** Shared by eval and codegen. */
  def project(input: ArrayData): ArrayData = {
    val n = math.min(dIn, input.numElements())
    val out = new Array[Any](dOut)
    var j = 0
    while (j < dOut) {
      val row = signs(j)
      var acc = java.math.BigDecimal.ZERO
      var i = 0
      while (i < n) {
        val d = java.math.BigDecimal.valueOf(input.getDouble(i))
          .setScale(10, java.math.RoundingMode.HALF_UP)
        acc = if (row(i) > 0) acc.add(d) else acc.subtract(d)
        i += 1
      }
      out(j) = acc.doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jlProject", this, classOf[JlProject].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.project($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

/** Primitive-loop integer dot product over two dense `array<bigint>`
  * vectors — the codegen'd pair-scoring kernel behind q239/q291 (the
  * `aggregate`/`zip_with` HOF form is CodegenFallback, interpreted per
  * pair, and pair counts are quadratic).
  *
  * Contract (SQL-registered, so enforced rather than assumed):
  *  - inputs must be `containsNull = false` arrays — the type check
  *    rejects nullable elements, so "null element read as 0" can never
  *    happen silently (q239/q291 build dense non-null vectors);
  *  - arithmetic is EXACT-or-fail: `multiplyExact`/`addExact` raise
  *    ArithmeticException on i64 overflow instead of wrapping — the
  *    fail-stop convention every exact-integer kernel in this repo
  *    follows. Callers keep magnitudes in range (event counts:
  *    Σ aᵢ·bᵢ ≤ ‖a‖·‖b‖, far inside i64 for any real behavior vector);
  *    if a corpus ever violates that, the query dies loudly, not with a
  *    silently wrong similarity. Overflow checks are JIT intrinsics —
  *    no measurable cost next to the array reads. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "dot_long expects two array<bigint> with non-null elements, got " +
        s"${l.simpleString} (containsNull must be false), ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot = Math.addExact(dot, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot = java.lang.Math.addExact($dot,
         |    java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

case class SimHash16(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string> of distinct words, got ${other.simpleString}")
  }

  /** Shared by eval and codegen. */
  def simhash(words: ArrayData): Long = {
    val n = words.numElements()
    val votes = new Array[Int](16)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(words.getUTF8String(i).getBytes)
      // hex digit j of the digest = high/low nibble of byte j/2; "high"
      // hex chars 8..f <=> nibble value >= 8
      var b = 0
      while (b < 16) {
        val byteVal = digest(b / 2) & 0xff
        val nibble = if (b % 2 == 0) byteVal >>> 4 else byteVal & 0xf
        if (nibble >= 8) votes(b) += 1
        b += 1
      }
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < 16) {
      if (2 * votes(b) >= n) hash |= (1L << b)
      b += 1
    }
    hash
  }

  override def nullSafeEval(input: Any): Any =
    simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash16", this, classOf[SimHash16].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Exact Jaccard similarity between two string-array columns as one native
  * pass (hash-set intersection/union). The built-in
  * `size(array_intersect)/size(array_distinct(concat))` walks both arrays
  * three times and re-evaluates per reference; this is the verify-stage
  * hot path of the LSH pipeline (candidate pairs × ~hundreds of shingles
  * each), so it earns the same treatment as MinHashBands. */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_jaccard"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"array_jaccard expects two array<string>, got ${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String]()
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val x = b.getUTF8String(i)
      if (setB.add(x) && setA.contains(x)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Codegen body: same hash-set algorithm emitted into the stage. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val setA = ctx.freshName("setA")
      val setB = ctx.freshName("setB")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |java.util.HashSet<UTF8String> $setA = new java.util.HashSet<UTF8String>();
         |for (int $i = 0; $i < $a.numElements(); $i++) $setA.add($a.getUTF8String($i));
         |java.util.HashSet<UTF8String> $setB = new java.util.HashSet<UTF8String>();
         |int $inter = 0;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  UTF8String $x = $b.getUTF8String($i);
         |  if ($setB.add($x) && $setA.contains($x)) $inter++;
         |}
         |int $union = $setA.size() + $setB.size() - $inter;
         |${ev.value} = $union == 0 ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization (canonical composition) — the first pass of
  * any text-dedup pipeline that must not treat "é" (U+00E9) and
  * "e"+combining-acute (U+0065 U+0301) as different documents: exact
  * dedup (q40), paragraph dedup (q121) and every hash-keyed operator are
  * blind to canonically-equivalent spellings unless the corpus is
  * normalized first. Spark ships no normalization builtin (DuckDB has
  * nfc_normalize); this wraps java.text.Normalizer — pure JDK, no
  * dependency — as a codegen'd unary expression. A fast-path skips
  * allocation entirely for strings Normalizer confirms are already NFC
  * (the overwhelming majority of real corpora), so the normalized-input
  * case costs one quick-check scan and zero copies. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  /** Shared by eval and codegen. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.nfc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
