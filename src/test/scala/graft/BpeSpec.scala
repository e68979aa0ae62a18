package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Bpe

/** Correctness pins for the distributed BPE trainer (q134): the merge
  * table must equal an INDEPENDENT single-threaded reference
  * implementation (different data structures, same algorithm definition)
  * on both a literal fixture and the sf0.001 corpus vocabulary — the
  * AnnSpec pattern for operators whose iterative semantics no SQL oracle
  * can express. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Plain-Scala reference BPE: greedy left-to-right merges, election by
    * (count desc, left, right). */
  private def referenceBpe(vocab: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      vocab.groupBy { case (w, _) => w.split("").toVector :+ Bpe.Eow }
        .map { case (syms, m) => syms -> m.values.sum }
    val out = Seq.newBuilder[(String, String, Long)]
    var go = true
    var round = 0
    while (go && round < k) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.isEmpty) go = false
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < 2) go = false
        else {
          out += ((l, r, c))
          words = words.groupBy { case (syms, _) =>
            val acc = Vector.newBuilder[String]
            var res = Vector.empty[String]
            for (s <- syms)
              res =
                if (res.nonEmpty && res.last == l && s == r) res.init :+ (l + r)
                else res :+ s
            res
          }.map { case (syms, m) => syms -> m.values.sum }
          round += 1
        }
      }
    }
    out.result()
  }

  test("classic fixture: low/lower/lowest learns the textbook merge sequence") {
    import spark.implicits._
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val df = vocab.toSeq.toDF("word", "freq")
    val got = Bpe.trainMerges(df, 6).map(m => (m.left, m.right, m.count))
    val want = referenceBpe(vocab, 6)
    assert(got == want, s"distributed $got != reference $want")
    // the famous first merges for this vocab: (e,s)=9 then (es,t)=9 then (est,</w>)=9
    assert(got.take(3) == Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)))
  }

  test("overlapping pairs merge greedily left-to-right (aaa -> [aa, a])") {
    import spark.implicits._
    val merged = Seq(Tuple1(Seq("a", "a", "a", "a", "a")))
      .toDF("syms")
      .select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(merged == Seq("aa", "aa", "a"))
  }

  test("q135 laws: tokenization is lossless and strictly compressive on sf0.001") {
    import spark.implicits._
    val vocabDf = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val (merges, state) = Bpe.train(vocabDf, 10)
    assert(merges.nonEmpty)
    // losslessness: concatenating a word's symbols reproduces word + </w>
    val broken = state.filter(
      concat_ws("", col("syms")) =!= concat(col("word"), lit(Bpe.Eow)))
    assert(broken.isEmpty, "merge application must never alter content")
    // compression: the census row is internally consistent and strict
    val r = Bpe.q135.fn(spark, "/root/testdata/sf0.001").head()
    val (tokChar, tokBpe) = (r.getLong(r.fieldIndex("tokens_char")),
      r.getLong(r.fieldIndex("tokens_bpe")))
    assert(tokBpe < tokChar, "10 productive merges must strictly compress")
    assert(r.getDouble(r.fieldIndex("compression")) > 0)
  }

  test("mergePair equals the reference fold on seeded random symbol arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "ab", "ba", "</w>")
    val cases = Vector.fill(200)(
      Vector.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size))))
    def refMerge(syms: Vector[String], l: String, r: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
        else acc :+ s
      }
    for ((l, r) <- Seq(("a", "b"), ("b", "a"), ("a", "a"), ("ab", "ba"))) {
      val got = cases.toDF("syms")
        .select(Bpe.mergePair(col("syms"), l, r).as("m"))
        .collect().map(_.getSeq[String](0).toVector).toVector
      val want = cases.map(refMerge(_, l, r))
      assert(got == want, s"merge ($l,$r) diverged from the reference fold")
    }
  }

  test("sf0.001 corpus: distributed merge table equals the independent reference") {
    import spark.implicits._
    val vocabDf = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val vocab = vocabDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.trainMerges(vocabDf, 10).map(m => (m.rank, m.left, m.right, m.count))
    val want = referenceBpe(vocab, 10).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
    assert(got == want)
    assert(got.size == 10, "corpus vocabulary supports at least 10 productive merges")
  }
}
