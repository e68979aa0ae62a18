package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Dedup, Similarity}

/** Property tests pinning each native expression against an independent
  * plain-Scala reference implementation on randomized inputs — the
  * native expressions carry the hot paths, so they get the same
  * adversarial treatment as the oracles give the queries. */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rnd = new scala.util.Random(7L)

  test("ArrayJaccard == set-based reference on random string arrays") {
    import spark.implicits._
    val cases = Seq.fill(300) {
      val vocab = Vector("a", "b", "cc", "dd", "e f", "", "g", "hh", "i", "jj")
      (Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))),
        Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val got = cases.toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((x, y), j) =>
      val (sx, sy) = (x.toSet, y.toSet)
      val expect =
        if (sx.union(sy).isEmpty) 0.0
        else sx.intersect(sy).size.toDouble / sx.union(sy).size
      assert(j == expect, s"x=$x y=$y")
    }
  }

  test("CosineSim == plain-Scala reference on random vectors") {
    import spark.implicits._
    val cases = Seq.fill(200)(
      (Seq.fill(16)(rnd.nextDouble() * 2 - 1), Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val got = cases.toDF("x", "y")
      .select(Similarity.cosine(col("x"), col("y")).as("c"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((x, y), c) =>
      var dot, na, nb = 0.0
      x.indices.foreach { i => dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i) }
      val expect = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(c == expect, s"x=$x y=$y")
    }
  }

  test("DotLong == BigInt reference on random long arrays incl. length mismatch") {
    import spark.implicits._
    val cases = Seq.fill(200) {
      val n = rnd.nextInt(10)
      val m = if (rnd.nextBoolean()) n else rnd.nextInt(10)
      (Seq.fill(n)(rnd.nextInt(100000).toLong - 50000),
        Seq.fill(m)(rnd.nextInt(100000).toLong - 50000))
    }
    val got = cases.toDF("x", "y")
      .select(org.apache.spark.sql.GraftBridge.column(
        graft.functions.DotLong(
          org.apache.spark.sql.GraftBridge.expression(col("x")),
          org.apache.spark.sql.GraftBridge.expression(col("y")))).as("d"))
      .collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((x, y), d) =>
      val expect = x.zip(y).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
      assert(BigInt(d) == expect, s"x=$x y=$y")
    }
  }

  test("JlProject == composed decimal-sum reference on random vectors") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Int = {
      md.reset()
      val dg = md.digest(s"$j:$i".getBytes("UTF-8"))
      if (((dg(0) >> 4) & 0xF) >= 8) 1 else -1
    }
    val cases = Seq.fill(100)(Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val got = cases.toDF("x")
      .select(org.apache.spark.sql.GraftBridge.column(
        graft.functions.JlProject(
          org.apache.spark.sql.GraftBridge.expression(col("x")), 4, 8)).as("p"))
      .collect().map(_.getSeq[Double](0))
    cases.zip(got).foreach { case (x, p) =>
      val expect = (0 until 4).map { j =>
        x.indices.map { i =>
          val d = java.math.BigDecimal.valueOf(x(i))
            .setScale(10, java.math.RoundingMode.HALF_UP)
          if (sign(j, i) > 0) BigDecimal(d) else -BigDecimal(d)
        }.sum.toDouble
      }
      assert(p == expect, s"x=$x")
    }
  }

  test("native expressions: interpreted eval path == codegen path") {
    // Every native carries two execution paths — doGenCode into the
    // generated stage and nullSafeEval for interpreted fallback (e.g.
    // codegen compilation failure, constant folding at plan time). The
    // paths are written once each and can drift independently; this pins
    // them equal on a composite exercising each registered function.
    // inputs depend on range(1)'s id so neither ConstantFolding nor
    // ConvertToLocalRelation can pre-evaluate them at plan time — the
    // default run really goes through the generated code
    val sql =
      """SELECT
        |  array_jaccard(array(concat('a', id), 'b', 'c'), array('b', 'c', 'd')) AS j,
        |  cosine_sim(array(cast(id as double) + 0.3d, 0.4d, 0.1d), array(0.2d, 0.9d, 0.5d)) AS c,
        |  parse_cookies(concat('uid=', id, '; sess=%2Fa%20b; bad=%zz'))['sess'] AS pc,
        |  word_shingles(concat('w x y z ', id), 2) AS sh,
        |  simhash16(array('p', concat('q', id), 'r')) AS sim,
        |  min_md5_hex(array('m', concat('n', id))) AS mh,
        |  winnow_fingerprints(concat('some text ', id, ' for winnowing'), 5, 8) AS wf,
        |  dot_long(array(3L + id, -4L, 5L), array(7L, 11L, -13L)) AS dl,
        |  jl_project(array(cast(id as double) + 0.25d, -1.5d, 2.75d), 3, 3) AS jp,
        |  nfc_normalize(concat('\u00e9clair', id)) AS nf
        |FROM range(1)
        |""".stripMargin
    def run(): Seq[org.apache.spark.sql.Row] = spark.sql(sql).collect().toSeq
    val codegen = run()
    val conf = spark.conf
    val (ws0, fm0) = (conf.get("spark.sql.codegen.wholeStage", "true"),
      conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() == codegen)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", ws0)
      conf.set("spark.sql.codegen.factoryMode", fm0)
    }
  }

  test("WordShingles == naive reference incl. empty-word and short-text edges") {
    import spark.implicits._
    val texts = Seq("", "a", "a b", "a b c", "a b c d", "a  b c", " a b c ",
      "x y z x y z", "w1 w2 w3 w4 w5") ++
      Seq.fill(100)(Seq.fill(rnd.nextInt(20))(s"w${rnd.nextInt(6)}").mkString(" "))
    val got = texts.toDF("t")
      .select(Dedup.wordShingles(col("t"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    texts.zip(got).foreach { case (t, sh) =>
      val words = t.split(" ", -1)
      val expect = words.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct
      assert(sh == expect, s"text='$t'")
    }
  }

  test("MinHash signature: deterministic, and more-similar sets share more slots") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"sh$i")
    val similar = base.drop(10) ++ (1 to 10).map(i => s"x$i")   // J ~ 0.9
    val dissimilar = (1 to 200).map(i => s"z$i")                 // J = 0
    val df = Seq(("a", base), ("a2", base), ("b", similar), ("c", dissimilar))
      .toDF("id", "sh")
      .select(col("id"), Dedup.minHashSignature(col("sh"), 64, 42L).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("a") == sigs("a2"), "same input, same signature")
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count { case (p, q) => p == q }
    assert(agree(sigs("a"), sigs("b")) > agree(sigs("a"), sigs("c")),
      "signature agreement tracks Jaccard similarity")
    assert(agree(sigs("a"), sigs("b")) >= 40, "J~0.9 should agree on most of 64 slots")
  }

  test("WinnowFingerprints == naive reference; winnowing guarantee on shared substrings") {
    import spark.implicits._
    val (k, w, m, b) = (8, 16, 2147483647L, 257L)
    // reference operates on CODE POINTS (DuckDB ord semantics), like the impl
    def reference(text: String): Seq[Long] = {
      val cps = text.codePoints().toArray.toSeq
      if (cps.length < k) return Seq.empty
      val hs = cps.sliding(k).map(_.foldLeft(0L)((h, c) => (h * b + c) % m)).toVector
      val sel =
        if (hs.length <= w) Set(hs.min)
        else hs.sliding(w).map(_.min).toSet
      sel.toSeq.sorted
    }
    def winnow(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(graft.functions.WinnowFingerprints(
        org.apache.spark.sql.GraftBridge.expression(c), k, w))
    val astral = Array("😀", "😁", "🤣", "𝕊", "𠀀", "🚀")
    val texts = Seq("", "short", "exactly8!", "a" * 30,
      "the quick brown fox jumps over the lazy dog",
      // supplementary-plane coverage: pure-astral and mixed corpora
      astral.mkString ++ astral.reverse.mkString,
      "mixed 😀 emoji 🚀 and ascii 𝕊 text with astral chars 𠀀 inline") ++
      Seq.fill(150)(Seq.fill(5 + rnd.nextInt(60))(s"w${rnd.nextInt(8)}").mkString(" ")) ++
      Seq.fill(50)(Seq.fill(4 + rnd.nextInt(30))(
        if (rnd.nextBoolean()) astral(rnd.nextInt(astral.length)) else s"x${rnd.nextInt(8)}"
      ).mkString(" "))
    val got = texts.toDF("t").select(winnow(col("t")).as("f"))
      .collect().map(_.getSeq[Long](0))
    texts.zip(got).foreach { case (t, f) =>
      assert(f == reference(t), s"text='$t'")
    }
    // the winnowing guarantee: documents sharing a substring of length
    // >= k+w-1 share at least one fingerprint
    val shared = "zqxjkvbnmpwlrtysgfdhcea" // 23 = k+w-1 chars
    val doc1 = s"prefix one $shared suffix alpha"
    val doc2 = s"completely different preamble $shared and tail"
    val fps = Seq(doc1, doc2).toDF("t").select(winnow(col("t")).as("f"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(fps(0).intersect(fps(1)).nonEmpty,
      "shared span of k+w-1 chars must produce a shared fingerprint")
    // code-point pin: 8 astral chars = exactly k symbols = ONE gram = one
    // fingerprint (a UTF-16 code-unit hasher would see 16 units / 9 grams)
    val oneGram = Seq("😀😁😂🤣😃😄😅😆").toDF("t")
      .select(winnow(col("t")).as("f")).collect()(0).getSeq[Long](0)
    assert(oneGram.length == 1, s"8 astral chars must yield 1 fingerprint, got $oneGram")
  }
}
