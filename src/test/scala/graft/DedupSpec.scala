package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup

/** Correctness gates for the probabilistic dedup operators at sf0.001:
  * LSH must find exactly the pairs exact all-pairs Jaccard finds (recall 1
  * at these similarity levels by the banding S-curve; precision 1 by the
  * exact-verify stage), and SimHash must separate planted near-dups from
  * random pairs. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def exactPairs(): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
    docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("LSH near-dup output == exact all-pairs Jaccard>=0.6 pairs (recall and precision 1)") {
    val exact = exactPairs()
    val lsh = Dedup.q41.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}; missing=${(exact -- lsh).take(5)}; extra=${(lsh -- exact).take(5)}")
  }

  test("SimHash: planted near-dups have smaller Hamming distance than random pairs on average") {
    val sim = Dedup.q43.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearPairs = exactPairs().toSeq
    assert(nearPairs.nonEmpty)
    val nearAvg = nearPairs.map { case (a, b) => hamming(sim(a), sim(b)) }.sum.toDouble / nearPairs.size
    val ids = sim.keys.toSeq.sorted
    val randomPairs = ids.zip(ids.drop(ids.size / 2)).take(200)
      .filterNot(p => nearPairs.contains(p))
    val randAvg = randomPairs.map { case (a, b) => hamming(sim(a), sim(b)) }.sum.toDouble / randomPairs.size
    assert(nearAvg < randAvg,
      s"near-dup avg hamming $nearAvg should be < random-pair avg $randAvg")
  }

  test("exact dedup collapses a doubled corpus back to one row per text") {
    val out = Dedup.q40.fn(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.length == n)
    assert(out.forall(_.getLong(1) == 2L), "every text appears exactly twice in the doubled input")
  }

  test("connected components: chains propagate transitively, singletons self-label, canonical = min") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs multiple star rounds),
    // pair 7-8, singleton 9
    val nodes = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L).toDF("node")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("connected components == exact union-find on a 64-chain and seeded random graphs") {
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to component minimum (roots are minima by the
      // min-directed union above)
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val cases: Seq[(String, Int, Seq[(Long, Long)])] = Seq(
      ("64-chain (adversarial diameter)", 64,
        (0 until 63).map(i => (i.toLong, i.toLong + 1))),
      ("seeded random sparse", 100, {
        val rnd = new scala.util.Random(7)
        Seq.fill(60)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
          .filter { case (a, b) => a != b }
      }),
      ("seeded random dense + dup edges", 40, {
        val rnd = new scala.util.Random(13)
        Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
          .filter { case (a, b) => a != b }
      }))
    for ((name, n, edges) <- cases) {
      val nodes = (0L until n.toLong).toDF("node")
      val pairs = edges.toDF("a_id", "b_id")
      val got = Dedup.connectedComponents(nodes, pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == unionFind(n, edges), s"case: $name")
    }
  }

  test("q40 plan partitions the shuffle on the 8-byte text hash, not on full text") {
    val plan = Dedup.q40.fn(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(th#"),
      s"expected Exchange keyed on th (xxhash64(text)):\n$plan")
    assert(!plan.contains("hashpartitioning(text#"),
      s"full-text shuffle key must not appear:\n$plan")
  }

  test("collision guard: a forced group-key collision still raises (guardHash mechanism)") {
    import spark.implicits._
    // Two DISTINCT texts forced into one dedup group (the key is a
    // constant — the worst-case 64-bit collision). The exact guard shape
    // every family member uses: min/max of the second independent digest
    // disagree → raise_error. Buffers are 8-byte longs, never text.
    val collided = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
      .withColumn("th", lit(42L)) // simulated xxhash64 collision
    val guarded = collided.groupBy(col("th"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"),
        min(Dedup.guardHash(col("text"))).as("g1"),
        max(Dedup.guardHash(col("text"))).as("g2"))
      .select(when(col("g1") =!= col("g2"),
        raise_error(lit("collision")).cast("long")).otherwise(col("n")).as("n"))
    val e = intercept[Exception](guarded.collect())
    assert(e.getMessage.contains("collision"), s"guard must fail-stop: ${e.getMessage}")
    // and the same shape over NON-colliding keys passes through untouched
    val clean = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
      .withColumn("th", xxhash64(col("text")))
      .groupBy(col("th"))
      .agg(count(lit(1)).as("n"),
        min(Dedup.guardHash(col("text"))).as("g1"),
        max(Dedup.guardHash(col("text"))).as("g2"))
      .select(when(col("g1") =!= col("g2"),
        raise_error(lit("collision")).cast("long")).otherwise(col("n")).as("n"))
    assert(clean.collect().map(_.getLong(0)).toSeq == Seq(1L, 1L))
  }

  test("guardHash is independent of the xxhash64 group key (salted domain separation)") {
    import spark.implicits._
    val df = Seq("a", "b", "c", "d").toDF("t")
      .select(xxhash64(col("t")).as("h1"), Dedup.guardHash(col("t")).as("h2"))
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)),
      "salted digest must not equal the unsalted group key")
  }
}
