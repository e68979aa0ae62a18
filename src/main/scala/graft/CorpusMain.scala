package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus curation CLI — the batch-side sibling of the collector's
  * [[Main]]: one command that runs the curation tier's standard chain
  * over a documents parquet and writes a split-partitioned corpus plus
  * a machine-readable run report.
  *
  * Stages (each one is the corresponding registered operator's layout,
  * so the CLI inherits their oracle-checked semantics and 100 TB plan
  * shapes):
  *   0. NFC normalize  — q243's native nfc_normalize (canonically-
  *                       equivalent spellings must collide in the dedup
  *                       hashes; already-NFC text fast-paths, zero copy)
  *   1. rule gate      — q115's integer-exact length/stopword rules
  *   2. exact dedup    — q40's 8-byte-hash keep-first (+ guardHash
  *                       collision fail-stop)
  *   3. near dedup     — q41 LSH candidates → exact verify → q100 CC →
  *                       q106 longest-member survivor selection
  *   3.5 semantic dedup— q260's sign-LSH candidates → exact cosine →
  *                       CC → survivor, over a user-supplied embeddings
  *                       parquet (optional; SemDeDup-style — catches
  *                       paraphrases the lexical stages cannot)
  *   4. decontaminate  — q101's inverted-index 5-gram containment
  *                       against a benchmark file (optional)
  *   5. split          — q166's salted content-hash 80/10/10 assignment
  *   6. write          — parquet partitioned by split + report JSON
  *
  * Every stage narrows the frame the next one reads; the only
  * corpus-sized exchanges are the dedup hash-aggs and the LSH band
  * join. The report counts are computed from ONE pass over the final
  * frame plus per-stage counts (each a cheap agg on an already-needed
  * intermediate). */
object CorpusMain {

  final case class CorpusConfig(
      input: String = "",
      output: String = "",
      minWords: Int = 10,
      maxWords: Int = 200,
      normalize: Boolean = true,
      nearDedup: Boolean = true,
      jaccard: Double = 0.6,
      embeddings: Option[String] = None, // parquet (vec_id, embedding) keyed by doc_id
      cosine: Double = 0.92,
      benchmark: Option[String] = None, // parquet of benchmark docs (text col)
      trainPct: Int = 80,
      valPct: Int = 10,
      incremental: Boolean = false)

  val usage: String =
    """graft-corpus [options]
      |  --input DIR        documents parquet (REQUIRED; schema: doc_id, text, source, ...)
      |  --output DIR       output root (REQUIRED)
      |  --min-words N      gate: minimum words (default 10)
      |  --max-words N      gate: maximum words (default 200)
      |  --no-normalize     skip the Unicode NFC normalization stage
      |  --no-near-dedup    skip the LSH near-dup stage
      |  --jaccard X        near-dup threshold (default 0.6)
      |  --embeddings PATH  parquet of (vec_id, embedding) keyed by doc_id; enables semantic dedup
      |  --cosine X         semantic-dup threshold (default 0.92)
      |  --benchmark PATH   parquet of benchmark docs to decontaminate against
      |  --splits A/B       train/val percents, rest = test (default 80/10)
      |  --incremental      MERGE into the manifest-log lake at OUTPUT/corpus_lake
      |                     instead of overwriting OUTPUT/corpus: re-curated docs
      |                     replace their previous version, new docs append, and
      |                     only the key buckets the run touches rewrite (upsert-
      |                     only; deletions go through the erasure path or a full
      |                     rebuild)
      |""".stripMargin

  def parse(args: Seq[String]): Either[String, CorpusConfig] = {
    def go(rest: List[String], c: CorpusConfig): Either[String, CorpusConfig] = rest match {
      case Nil => Right(c)
      case "--input" :: v :: t      => go(t, c.copy(input = v))
      case "--output" :: v :: t     => go(t, c.copy(output = v))
      case "--min-words" :: v :: t  => go(t, c.copy(minWords = v.toInt))
      case "--max-words" :: v :: t  => go(t, c.copy(maxWords = v.toInt))
      case "--no-normalize" :: t    => go(t, c.copy(normalize = false))
      case "--no-near-dedup" :: t   => go(t, c.copy(nearDedup = false))
      case "--incremental" :: t     => go(t, c.copy(incremental = true))
      case "--jaccard" :: v :: t    => go(t, c.copy(jaccard = v.toDouble))
      case "--embeddings" :: v :: t => go(t, c.copy(embeddings = Some(v)))
      case "--cosine" :: v :: t     => go(t, c.copy(cosine = v.toDouble))
      case "--benchmark" :: v :: t  => go(t, c.copy(benchmark = Some(v)))
      case "--splits" :: v :: t     => v.split("/") match {
        case Array(a, b) => go(t, c.copy(trainPct = a.toInt, valPct = b.toInt))
        case _ => Left(s"--splits expects A/B, got: $v")
      }
      case other :: _ => Left(s"unknown option: $other")
    }
    go(args.toList, CorpusConfig()).flatMap { c =>
      if (c.input.isEmpty || c.output.isEmpty) Left("--input and --output are required")
      else if (c.trainPct + c.valPct > 100) Left("--splits percents exceed 100")
      else Right(c)
    }
  }

  /** The full chain as a library call (Main is a thin shell around it).
    * Returns (final frame with `split` column, stage-count report). */
  def run(spark: SparkSession, c: CorpusConfig): (DataFrame, Map[String, Long]) = {
    val stop = Seq("the", "a", "of", "and", "to")
    val raw = spark.read.parquet(s"${c.input}/documents.parquet")
    val nRaw = raw.count()

    // 0. Unicode NFC normalization (q243's native expression): the dedup
    // stages key on hashes of text, and canonically-equivalent spellings
    // must collide there. Already-normalized text takes the zero-copy
    // fast path, so a clean corpus pays one quick-check scan.
    val (preGate, nNfcChanged) =
      if (!c.normalize) (raw, 0L)
      else {
        val nfc = org.apache.spark.sql.GraftBridge.column(
          graft.functions.NfcNormalize(
            org.apache.spark.sql.GraftBridge.expression(col("text"))))
        val normed = raw.withColumn("norm_text", nfc)
        val changed = normed.filter(col("norm_text") =!= col("text")).count()
        (normed.withColumn("text", col("norm_text")).drop("norm_text"), changed)
      }

    // 1. rule gate (q115 semantics: integer comparisons only)
    val words = split(col("text"), " ")
    val gated = preGate.filter(size(words).between(c.minWords, c.maxWords) &&
      size(filter(words, w => lower(w).isin(stop: _*))) >= 1)
    val nGated = gated.count()

    // 2. exact dedup keep-first (q40 layout + guardHash fail-stop)
    val keep = gated
      .select(xxhash64(col("text")).as("th"), col("doc_id"))
      .groupBy(col("th")).agg(min(col("doc_id")).as("keep_id"))
    val exact = gated.withColumn("th", xxhash64(col("text")))
      .join(keep, "th").filter(col("doc_id") === col("keep_id"))
      .drop("th", "keep_id")
    val nExact = exact.count()

    // 3. near dedup: LSH pairs -> CC clusters -> longest-member survivor
    val near =
      if (!c.nearDedup) exact
      else {
        val sh = exact.filter(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id"), graft.ext.Dedup.wordShingles(col("text"), 3).as("sh"))
        val buckets = sh.select(col("doc_id"),
            posexplode(graft.ext.Dedup.minHashBandHashes(col("sh"), 64, 16, 42L))
              .as(Seq("band", "bh")))
        val cand = buckets.as("x").join(buckets.as("y"),
            col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()
        val pairs = cand
          .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
          .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
          .filter(graft.ext.Dedup.jaccard(col("sha"), col("shb")) >= c.jaccard)
          .select(col("a_id"), col("b_id"))
        val labels = graft.ext.Dedup.connectedComponents(
            exact.select(col("doc_id").as("node")), pairs)
          .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
        val survivors = exact
          .join(labels, "doc_id")
          .withColumn("len", length(col("text")).cast("long"))
          .groupBy(col("cluster_id"))
          .agg(max_by(col("doc_id"), struct(col("len"), col("doc_id") * -1))
            .as("survivor_id"))
        exact.join(survivors.select(col("survivor_id").as("doc_id")), "doc_id")
      }
    val nNear = near.count()

    // 3.5 semantic dedup (SemDeDup shape, q260's layout): sign-LSH
    // candidates over the SURVIVING docs' embeddings → exact cosine ≥
    // threshold → CC → longest-text survivor (the q106 convention, same
    // as stage 3). Catches paraphrased/re-encoded duplicates the lexical
    // stages cannot see; runs after them so the candidate stage scores
    // the already-shrunk frame. Docs without a vector pass through
    // untouched — an embedding join must never silently drop text.
    val sem = c.embeddings match {
      case None => near
      case Some(p) =>
        val emb = spark.read.parquet(p)
          .select(col("vec_id").as("doc_id"),
            col("embedding").cast("array<double>").as("emb"))
        val nd = near.select(col("doc_id")).join(emb, "doc_id")
          .select(col("doc_id").as("vec_id"), col("emb"))
        val pairs = graft.ext.Similarity.signLshCandidatePairsOf(nd)
          .filter(col("c") >= c.cosine)
          .select(col("a_id"), col("b_id"))
        val labels = graft.ext.Dedup.connectedComponents(
            nd.select(col("vec_id").as("node")), pairs)
          .select(col("node").as("doc_id"), col("lbl").as("sem_cluster"))
        val survivors = near.join(labels, "doc_id")
          .withColumn("len", length(col("text")).cast("long"))
          .groupBy(col("sem_cluster"))
          .agg(max_by(col("doc_id"), struct(col("len"), col("doc_id") * -1))
            .as("survivor_id"))
          .select(col("survivor_id").as("doc_id"))
        // keep: semantic survivors + docs that had no vector at all
        near.join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(near.join(survivors, "doc_id"))
      }
    val nSem = sem.count()

    // 4. decontamination (q101 layout: benchmark 5-grams broadcast)
    val clean = c.benchmark match {
      case None => sem
      case Some(p) =>
        val benchGrams = broadcast(spark.read.parquet(p)
          .filter(size(split(col("text"), " ")) >= 5)
          .select(explode(graft.ext.Dedup.wordShingles(col("text"), 5)).as("g"))
          .distinct())
        val hit = sem.filter(size(split(col("text"), " ")) >= 5)
          .select(col("doc_id"), explode(graft.ext.Dedup.wordShingles(col("text"), 5)).as("g"))
          .join(benchGrams, "g")
          .select(col("doc_id")).distinct()
        sem.join(hit, Seq("doc_id"), "left_anti")
    }
    val nClean = clean.count()

    // 5. split assignment (q166: salted content hash -> stable buckets)
    val bucket = pmod(
      conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long"), lit(100))
    val withSplit = clean.withColumn("split",
      when(bucket < c.trainPct, "train")
        .when(bucket < c.trainPct + c.valPct, "val")
        .otherwise("test"))

    val report = Map(
      "input" -> nRaw, "nfc_changed" -> nNfcChanged, "gated" -> nGated,
      "exact_deduped" -> nExact, "near_deduped" -> nNear,
      "semantic_deduped" -> nSem, "decontaminated" -> nClean)
    (withSplit, report)
  }

  /** Stage 6: full overwrite of `output/corpus`, or — with --incremental —
    * a [[graft.sinks.ManifestUpsertSink]] MERGE into `output/corpus_lake`
    * keyed by doc_id: the re-curation workflow over a GROWING corpus, where
    * each run rewrites only the key buckets it touches and the manifest log
    * keeps every prior corpus version time-travel readable (q294/q295
    * machinery). Each CLI run commits as the next batch id. orderCol =
    * doc_id is sound here: the curation chain ends in exact dedup, so
    * doc_id is unique within a run (in-batch LWW never has to choose),
    * cross-run conflicts resolve by replacement regardless of orderCol,
    * and lastWriteWins' payload-hash tiebreak makes even a pathological
    * duplicate-id batch deterministic. */
  def write(out: DataFrame, c: CorpusConfig): Unit =
    if (c.incremental) {
      val root = s"${c.output}/corpus_lake"
      val sink = new graft.sinks.ManifestUpsertSink(root, "doc_id", buckets = 64)
      val nextId = graft.sinks.ManifestUpsertSink.latestManifest(root)
        .map(_.batchId + 1).getOrElse(0L)
      sink.upsertBatch(out, "doc_id", nextId)
    } else
      out.write.mode("overwrite").partitionBy("split").parquet(s"${c.output}/corpus")

  def main(args: Array[String]): Unit =
    parse(args.toIndexedSeq) match {
      case Left(err) =>
        System.err.println(err); System.err.println(usage); sys.exit(1)
      case Right(c) =>
        Log.init()
        val spark = SparkSession.builder()
          .appName("graft-corpus")
          .config("spark.sql.session.timeZone", "UTC")
          .config(Tables.sessionConf)
          .withExtensions(new GraftExtensions)
          .getOrCreate()
        val (out, report) = run(spark, c)
        write(out, c)
        val splitCounts = out.groupBy(col("split")).count().collect()
          .map(r => s""""${r.getString(0)}": ${r.getLong(1)}""").sorted.mkString(", ")
        val stages = report.toSeq.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"${c.output}/report.json"),
          s"""{"stages": {$stages}, "splits": {$splitCounts}}""")
        spark.stop()
    }
}
