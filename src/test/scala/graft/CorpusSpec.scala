package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CorpusMain: the packaged curation chain — config contract, stage
  * monotonicity, split layout, and determinism across runs. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("config: required args, split validation, unknown option") {
    assert(CorpusMain.parse(Seq()).isLeft)
    assert(CorpusMain.parse(Seq("--input", "a")).isLeft, "--output required")
    assert(CorpusMain.parse(Seq("--input", "a", "--output", "b"))
      .map(c => (c.minWords, c.nearDedup, c.trainPct)) == Right((10, true, 80)))
    assert(CorpusMain.parse(Seq("--input", "a", "--output", "b", "--splits", "70/20"))
      .map(c => (c.trainPct, c.valPct)) == Right((70, 20)))
    assert(CorpusMain.parse(Seq("--input", "a", "--output", "b", "--splits", "80/30")).isLeft)
    assert(CorpusMain.parse(Seq("--wat")).isLeft)
  }

  test("the chain narrows monotonically, keeps gate bounds, and is deterministic") {
    val bench = Files.createTempDirectory("graft_corpus_bench_").toString
    Tables.documents(spark, sf).filter(col("doc_id") < 5)
      .select(col("text")).write.mode("overwrite").parquet(bench)
    val cfg = CorpusMain.CorpusConfig(
      input = sf, output = "unused", minWords = 10, maxWords = 80,
      benchmark = Some(bench))
    val (out, report) = CorpusMain.run(spark, cfg)
    val n = out.count()
    // stage counts only ever shrink, and the final frame matches
    assert(report("input") >= report("gated"))
    assert(report("gated") >= report("exact_deduped"))
    assert(report("exact_deduped") >= report("near_deduped"))
    assert(report("near_deduped") >= report("decontaminated"))
    assert(report("decontaminated") == n)
    assert(n > 0, "the chain must not empty the corpus at default settings")
    // gate bounds hold on the survivors
    val bounds = out.select(size(split(col("text"), " ")).as("w"))
      .agg(min(col("w")), max(col("w"))).head()
    assert(bounds.getInt(0) >= 10 && bounds.getInt(1) <= 80)
    // the decontaminated frame no longer contains the benchmark seeds
    assert(out.filter(col("doc_id") < 5).count() == 0)
    // split column covers every row with the three labels
    val splits = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.values.sum == n)
    assert(splits.getOrElse("train", 0L) > splits.getOrElse("val", 0L),
      "80/10/10 must put most docs in train")
    // deterministic: a second run reproduces counts and split assignment
    val (out2, report2) = CorpusMain.run(spark, cfg)
    assert(report2 == report)
    assert(out2.select(col("doc_id"), col("split")).except(
      out.select(col("doc_id"), col("split"))).count() == 0)
  }

  test("near-dedup stage actually removes near-duplicates (and --no-near-dedup keeps them)") {
    import spark.implicits._
    // plant: two near-identical docs (one word differs) + one unrelated
    val base = "the quick brown fox jumps over a lazy dog of winter and " +
      "spring while the cold rain keeps falling on those quiet hills"
    val docs = Seq(
      (1L, base, "src0"),
      (2L, base.replace("winter", "summer"), "src0"),
      (3L, "a completely different document about parquet scans and of " +
        "shuffle exchanges inside the spark engine plans for today", "src0"))
      .toDF("doc_id", "text", "source")
    val dir = Files.createTempDirectory("graft_corpus_in_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val withNd = CorpusMain.run(spark,
      CorpusMain.CorpusConfig(input = dir, output = "unused"))._1
    assert(withNd.count() == 2, "one of the near-dup pair must be dropped")
    // survivor selection keeps the longest member (tie -> smallest id):
    // both have equal length here, so doc 1 survives
    assert(withNd.filter(col("doc_id") === 3L).count() == 1)
    val noNd = CorpusMain.run(spark,
      CorpusMain.CorpusConfig(input = dir, output = "unused", nearDedup = false))._1
    assert(noNd.count() == 3, "--no-near-dedup must keep the near-dup pair")
  }

  test("semantic-dedup stage drops embedding near-dups, keeps vectorless docs, and is off without --embeddings") {
    import spark.implicits._
    // three lexically DISTINCT docs; 1 and 2 are paraphrases (near-equal
    // vectors, cosine ≈ 1), 3 is semantically unrelated (orthogonal-ish
    // vector), 4 has no vector at all and must pass through untouched
    def doc(id: Long, text: String) = (id, text + " plus the filler words " +
      "of a corpus gate and some more to clear the minimum easily", "src0")
    val docs = Seq(
      doc(1L, "the cat sat on a warm mat"),
      doc(2L, "a feline rested upon the heated rug"),
      doc(3L, "quarterly parquet shuffle plans of the spark engine"),
      doc(4L, "this document never got an embedding at all today"))
      .toDF("doc_id", "text", "source")
    val v1 = Array.tabulate(64)(i => if (i < 8) 1.0f else 0.01f * i)
    val v2 = v1.updated(63, v1(63) + 0.001f) // cosine(v1, v2) ≈ 1
    val v3 = Array.tabulate(64)(i => if (i >= 56) 1.0f else -0.01f * i)
    val emb = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_corpus_sem_").toString
    val embDir = Files.createTempDirectory("graft_corpus_semv_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emb.write.mode("overwrite").parquet(embDir)
    val (out, report) = CorpusMain.run(spark, CorpusMain.CorpusConfig(
      input = dir, output = "unused", embeddings = Some(embDir)))
    assert(report("semantic_deduped") == 3L,
      s"one of the paraphrase pair must drop, got $report")
    // survivor = longest text of the pair (doc 2 here); 3 and 4 survive
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L, 4L))
    val (noSem, report2) = CorpusMain.run(spark,
      CorpusMain.CorpusConfig(input = dir, output = "unused"))
    assert(report2("semantic_deduped") == 4L && noSem.count() == 4,
      "without --embeddings the stage must be a no-op")
  }

  test("NFC stage collapses canonically-equivalent duplicates (and --no-normalize keeps them)") {
    import spark.implicits._
    // doc 2 is doc 1 with every 'e' decomposed to e+U+0301's base-e — the
    // texts differ byte-wise but are canonically equivalent after NFC
    val composed = "caf\u00e9 stories of the r\u00e9sum\u00e9 trade and " +
      "a dozen more words to clear the gate minimum for this fixture"
    val decomposed = composed
      .replace("\u00e9", "e\u0301")
    val docs = Seq(
      (1L, composed, "src0"),
      (2L, decomposed, "src0"))
      .toDF("doc_id", "text", "source")
    val dir = Files.createTempDirectory("graft_corpus_nfc_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (out, report) = CorpusMain.run(spark,
      CorpusMain.CorpusConfig(input = dir, output = "unused", nearDedup = false))
    assert(report("nfc_changed") == 1L, "exactly the decomposed doc must normalize")
    assert(out.count() == 1, "exact dedup must collapse the pair after NFC")
    val (kept, report2) = CorpusMain.run(spark,
      CorpusMain.CorpusConfig(input = dir, output = "unused",
        nearDedup = false, normalize = false))
    assert(report2("nfc_changed") == 0L)
    assert(kept.count() == 2, "--no-normalize must keep both byte-distinct docs")
  }

  test("--incremental: second run merges into the lake; only changed docs rewrite") {
    import spark.implicits._
    def mkDoc(i: Long, marker: String) =
      (i, s"doc $marker number $i with the plain words needed to clear the " +
        s"gate minimum of this fixture run set $i", s"src${i % 2}")
    val dir = Files.createTempDirectory("graft_corpus_inc_").toString
    val out = Files.createTempDirectory("graft_corpus_inc_out_").toString

    (1L to 20L).map(i => mkDoc(i, "v1")).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cfg = CorpusMain.CorpusConfig(input = dir, output = out,
      nearDedup = false, incremental = true)
    val (o1, _) = CorpusMain.run(spark, cfg)
    CorpusMain.write(o1, cfg)
    val lake = s"$out/corpus_lake"
    assert(graft.sinks.ManifestUpsertSink.read(spark, lake).count() == 20)

    // run 2: doc 3 re-curated with new text, docs 21-22 are new
    ((1L to 20L).map(i => if (i == 3) mkDoc(i, "v2") else mkDoc(i, "v1"))
      ++ Seq(mkDoc(21L, "v1"), mkDoc(22L, "v1")))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (o2, _) = CorpusMain.run(spark, cfg)
    CorpusMain.write(o2, cfg)
    val merged = graft.sinks.ManifestUpsertSink.read(spark, lake)
    assert(merged.count() == 22, "new docs append, unchanged docs stay single")
    assert(merged.filter(col("doc_id") === 3L).select("text").as[String]
      .head().contains("v2"), "re-curated doc must carry the new version")
    // replaying the same curated frame as the same batch id is a no-op
    val before = graft.sinks.ManifestUpsertSink.latestManifest(lake).get
    new graft.sinks.ManifestUpsertSink(lake, "doc_id", buckets = 64)
      .upsertBatch(o2, "doc_id", before.batchId)
    assert(graft.sinks.ManifestUpsertSink.latestManifest(lake).get.version
      == before.version)
  }
}
