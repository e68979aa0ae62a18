package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics

/** Adversarial cross-checks for the curation/event-analytics tier
  * (q114-q118): the corpus-shaped behavior is the DuckDB oracle's job;
  * these pin the LOGIC on shapes the driver corpus cannot produce —
  * strict-ordering funnel edge cases, quality-rule threshold boundaries,
  * cross-doc n-gram sharing laws, and the q114 claim that the scaled
  * integer score ranks identically to true PMI. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("q117 funnel law: strict > ordering — equal timestamps and out-of-order events don't advance") {
    import spark.implicits._
    val ev = Seq(
      // u1: clean view -> click -> purchase
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // u2: click before view, click AT tv (== excluded by strict >),
      // purchase present but no qualifying click -> stops at stage 1
      (2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "click", ts(10)),
      (2L, "purchase", ts(50)),
      // u3: view only
      (3L, "view", ts(10)),
      // u4: never views -> counted nowhere
      (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      // u5: two views; click after the SECOND view — min(tv) is the entry,
      // so the click still qualifies (ts > min tv)
      (5L, "view", ts(10)), (5L, "view", ts(40)), (5L, "click", ts(45))
    ).toDF("user_id", "event_type", "ts")

    val Seq(v, c, p) = EventAnalytics.funnelStages(ev, Seq("view", "click", "purchase"))
    assert(v.select("user_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 5L))
    assert(c.select("user_id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    assert(p.select("user_id").as[Long].collect().sorted.toSeq == Seq(1L))
    // stage entry is the MIN qualifying ts
    val entries = c.collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(entries(1L) == ts(20) && entries(5L) == ts(45))
  }

  test("q115 rule boundaries: each fixture fails exactly the rule it targets; len bounds inclusive") {
    import spark.implicits._
    // 18 distinct 4-char filler words + 2 stopwords = 20 words, 76 letters
    // (mean 3.8 in [3,9]), 20 distinct, 2 stopwords — passes every rule.
    def fill(n: Int, len: Int) = (1 to n).map(i => ("w%0" + (len - 1) + "d").format(i))
    val base20 = fill(18, 4) ++ Seq("the", "a")
    val rows = Seq(
      ("pass-at-min-len", (base20, true)),
      ("fail-below-min-len", (fill(17, 4) ++ Seq("the", "a"), false)), // 19 words
      ("pass-at-max-len", (fill(78, 4) ++ Seq("the", "a"), true)),     // 80 words
      ("fail-above-max-len", (fill(79, 4) ++ Seq("the", "a"), false)), // 81 words
      ("fail-short-words", (('a' to 'r').map(c => s"a$c") ++ Seq("the", "a"), false)), // 40 letters < 3*20
      ("fail-long-words", (fill(18, 10) ++ Seq("the", "and"), false)), // 186 letters > 9*20
      ("fail-one-stopword", (fill(19, 4) ++ Seq("the"), false)),
      ("fail-low-distinct", (Seq.fill(13)("thing") ++ Seq.fill(5)("stuff") ++ Seq("the", "a"), false)) // 4 distinct
    ).map { case (src, (words, keep)) => (0L, words.mkString(" "), "en", src, keep) }
    val df = rows.toDF("doc_id", "text", "lang", "source", "expect_keep")

    val w = split(col("text"), " ")
    val nW = size(w).cast("long")
    val letters = (length(col("text")) - (size(w) - 1)).cast("long")
    val stop = size(filter(w, t => t.isin("the", "a", "of", "and", "to"))).cast("long")
    val keep = (nW >= 20 && nW <= 80) &&
      (letters >= nW * 3 && letters <= nW * 9) &&
      (stop >= 2) && (size(array_distinct(w)).cast("long") >= 8)
    df.select(col("source"), keep.as("keep"), col("expect_keep")).collect().foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2), s"rule verdict for ${r.getString(0)}")
    }
  }

  test("q116 sharing law: within-doc repeats count once; only cross-doc grams are shared") {
    import spark.implicits._
    // doc1 contains 'v w x y z' TWICE (11 raw grams, 10 distinct); doc2
    // shares exactly that one gram; doc3 shares nothing.
    val rows = Seq(
      (1L, "v w x y z v w x y z p q r s t"),
      (2L, "a b c d v w x y z"),
      (3L, "k l m n o p")).toDF("doc_id", "text")

    val grams = rows
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(0), size(col("w")) - 5), i =>
          concat_ws(" ", slice(col("w"), i + 1, lit(5)))))).as("g"))
    val counts = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs_with"))
    val frac = grams.join(counts, "g").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_docs_with") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    assert(frac(1L) == ((10L, 1L)))
    assert(frac(2L) == ((5L, 1L)))
    assert(frac(3L) == ((2L, 0L)))
  }

  test("q119 greedy law: the straddling doc is kept, the one after the full budget is not") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // budget 25: cum-before 0/10/20 -> all three kept (documented overshoot)
    // budget 20: third doc starts AT the full budget -> excluded
    // budget 0: nothing, including a first doc of size 0? size>0 -> excluded
    val rows = Seq(
      ("b25", 1L, 10L, 0.9, 25L), ("b25", 2L, 10L, 0.8, 25L), ("b25", 3L, 10L, 0.7, 25L),
      ("b20", 4L, 10L, 0.9, 20L), ("b20", 5L, 10L, 0.8, 20L), ("b20", 6L, 10L, 0.7, 20L),
      ("b0", 7L, 10L, 0.9, 0L),
      // low quality doc sorts LAST even with the smallest doc_id
      ("ord", 9L, 10L, 0.1, 20L), ("ord", 10L, 10L, 0.9, 20L), ("ord", 11L, 10L, 0.8, 20L)
    ).toDF("source", "doc_id", "n_tok", "quality", "budget")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = rows.withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") - col("n_tok") < col("budget"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L))
  }

  test("q114 score law: integer-scaled ratio ranks identically to true PMI where scores differ") {
    val rnd = new scala.util.Random(11)
    val nUni = 100000.0
    val nBi = 99000.0
    val tuples = Seq.fill(300) {
      val cx = 1 + rnd.nextInt(5000)
      val cy = 1 + rnd.nextInt(5000)
      val cxy = 1 + rnd.nextInt(math.min(cx, cy))
      (cxy.toLong, cx.toLong, cy.toLong)
    }
    def score(t: (Long, Long, Long)) =
      (BigInt(t._1) * BigInt(1000000000000L) / (BigInt(t._2) * BigInt(t._3))).toLong
    def pmi(t: (Long, Long, Long)) =
      math.log((t._1 / nBi) / ((t._2 / nUni) * (t._3 / nUni)))
    // floor is weakly monotone, so a strictly larger integer score must
    // mean a strictly larger true ratio, hence larger PMI
    for (a <- tuples; b <- tuples if score(a) > score(b))
      assert(pmi(a) > pmi(b),
        s"score order ${score(a)}>${score(b)} must imply pmi order for $a vs $b")
  }

  test("q126 conservation law: transitions total = events - distinct users") {
    val sf = "/root/testdata/sf0.001"
    val out = EventAnalytics.q126.fn(spark, sf)
    val nTrans = out.agg(sum(col("n"))).head().getLong(0)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(nTrans == expected,
      "every user contributes exactly (their events - 1) transitions")
    // each row's share is its exact integer ratio of the prev-type total
    val badShare = out.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("np"), sum(col("n") * col("p")).as("chk"))
      // Σ n·round(n/np, 6) ≈ Σ n²/np; loose bound just pins share ∈ (0,1]
      .filter(col("chk") > col("np") + 1 || col("chk") <= 0)
    assert(badShare.isEmpty)
  }

  test("q127 cross-check: integer z-test verdict matches the float 2-sigma rule") {
    val sf = "/root/testdata/sf0.001"
    val out = EventAnalytics.q127.fn(spark, sf).cache()
    try {
      // recompute with population stddev in doubles; away from the exact
      // boundary (no |z| lands within 1e-9 of 2.0 in this corpus) both
      // verdicts must agree row for row
      val byT = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      val floatFlag = out
        .select(col("event_type"), col("day"), col("c"), col("is_outlier"),
          avg(col("c")).over(byT).as("mu"),
          stddev_pop(col("c")).over(byT).as("sd"))
        .select(col("event_type"), col("day"), col("is_outlier"),
          (abs(col("c") - col("mu")) > col("sd") * 2).as("f"),
          (abs(abs(col("c") - col("mu")) - col("sd") * 2) < 1e-9).as("boundary"))
      assert(floatFlag.filter(!col("boundary") && col("is_outlier") =!= col("f")).isEmpty,
        "integer and float 2-sigma verdicts must agree off the boundary")
      assert(out.count() > 0)
    } finally out.unpersist()
  }

  test("q272 temperature law: quotas conserve the budget (floor loss < n_sources); α=0.5 flattens head vs tail") {
    val rows = graft.ext.CurationQueries.q272.fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val nSources = rows.length
    // integer-floor conservation: shares/quotas sum to just under the budget
    val quotaSum = rows.map(_._5).sum
    assert(quotaSum <= 100000L && quotaSum > 100000L - nSources,
      s"quota floor loss must be < 1 doc per source: $quotaSum")
    val ppmSum = rows.map(_._4).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - nSources)
    // w = floor(sqrt(n)) recomputed independently
    rows.foreach { case (_, nDocs, w, _, _, _) =>
      assert(w == math.floor(math.sqrt(nDocs.toDouble)).toLong)
    }
    // temperature flattening: iff sources differ in size, the smallest
    // gains share (boost > 1000) and the largest loses (boost < 1000)
    val bySize = rows.sortBy(_._2)
    if (bySize.head._2 < bySize.last._2) {
      assert(bySize.head._6 >= 1000L, s"smallest source must not lose share: ${bySize.head}")
      assert(bySize.last._6 <= 1000L, s"largest source must not gain share: ${bySize.last}")
    }
  }
}
