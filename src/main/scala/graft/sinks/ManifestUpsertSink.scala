package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K3's semantics on an object store: last-write-wins MERGE into
  * bucket-partitioned parquet under a versioned manifest log — the
  * Delta-style lakehouse upsert without the dependency, closing the gap
  * between the JDBC sink (row store, fine for dimension-sized state) and
  * the 100-TB reality where mutable keyed state lives as parquet on
  * object storage.
  *
  * Layout under `root`:
  * {{{
  *   data/v<N>/__bucket=<b>/part-*.parquet   (copy-on-write data files)
  *   _manifest/v<N>.manifest                 (committed versions)
  * }}}
  *
  * A manifest version is the table: a list of (bucket → file) entries
  * plus the streaming batch id that produced it. Readers list the
  * manifest dir, take the max committed version, and read exactly its
  * files — data files are immutable once a manifest references them, so
  * reads are snapshot-consistent without locking.
  *
  * MERGE shape (the part that must survive 100 TB):
  *  - rows hash into `buckets` stable partitions by key
  *    (`pmod(xxhash64(key), buckets)`);
  *  - an incoming batch REWRITES ONLY THE BUCKETS IT TOUCHES — survivors
  *    of a touched bucket (current rows whose key is not replaced) union
  *    the deduped incoming rows and write as that bucket's new files;
  *    untouched buckets carry their file entries forward verbatim, zero
  *    I/O. Merge cost is ∝ touched-bucket bytes, never table bytes —
  *    the copy-on-write contract every lakehouse MERGE lives by. Bucket
  *    count is the granularity knob (more buckets → finer rewrites,
  *    more files; compaction is a rewrite-all-buckets merge of an empty
  *    batch away).
  *  - within a batch, LWW per key via [[JdbcUpsertSink.lastWriteWins]]
  *    (the one K3 dedup — JDBC and manifest sinks cannot drift).
  *
  * Exactly-once over an at-least-once source: the manifest records the
  * micro-batch id; replaying a committed batch (foreachBatch redelivery
  * after a crash-restart) is a NO-OP — same contract the JDBC sink gets
  * from idempotent delete+insert, here from the version log. Commit is
  * an atomic rename of a temp manifest into `v<N>.manifest` with
  * create-new semantics: a concurrent writer racing the same version
  * loses the rename and fails loudly (single-writer optimistic
  * concurrency — the Delta model; multi-writer coordination is a
  * catalog/lock service's job, out of scope as it is for Delta OSS on
  * plain object stores without a LogStore).
  *
  * Local-FS paths use java.nio (atomic rename); the same layout on s3a
  * would swap the two nio calls for the object store's
  * put-if-absent — the contract (immutable data files + versioned
  * manifest + batch-id replay guard) is storage-agnostic.
  */
class ManifestUpsertSink(root: String, keyCol: String, buckets: Int = 16)
    extends Serializable {
  import ManifestUpsertSink._

  /** MERGE a micro-batch: LWW-dedupe on `orderCol` within the batch,
    * replace current rows sharing a key, append the rest. `batchId` is
    * the replay guard — a batch id already committed is skipped. */
  def upsertBatch(batch: DataFrame, orderCol: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val cur = latestManifest(root)
    if (cur.exists(_.batchId >= batchId)) return // replayed batch: no-op
    val version = cur.map(_.version + 1).getOrElse(0L)
    val deduped = JdbcUpsertSink.lastWriteWins(batch, keyCol, col(orderCol))
      .withColumn(BucketCol, pmod(xxhash64(col(keyCol)), lit(buckets.toLong)))
    // touched buckets: bounded driver set (≤ `buckets` rows by construction)
    val touched = deduped.select(col(BucketCol)).distinct()
      .collect().map(_.getLong(0)).toSet
    val carried = cur.toSeq.flatMap(_.files).filterNot(f => touched(f.bucket))
    val survivors = cur match {
      case Some(m) =>
        val touchedFiles = m.files.filter(f => touched(f.bucket)).map(_.path)
        if (touchedFiles.isEmpty) deduped
        else spark.read.option("mergeSchema", "true").parquet(touchedFiles: _*)
          .withColumn(BucketCol, pmod(xxhash64(col(keyCol)), lit(buckets.toLong)))
          .join(deduped.select(col(keyCol)), Seq(keyCol), "left_anti")
          // additive schema evolution: a batch may carry columns the
          // current snapshot lacks (and vice versa after evolution) —
          // missing sides read as null, the lakehouse ADD COLUMN contract
          .unionByName(deduped, allowMissingColumns = true)
      case None => deduped
    }
    val dataDir = s"$root/data/v$version"
    // overwrite: a crash AFTER the data write but BEFORE the manifest
    // commit leaves an orphaned v<N> dir no manifest references; the
    // replayed batch must be able to reclaim it
    survivors.write.mode("overwrite").partitionBy(BucketCol).parquet(dataDir)
    // list what was just written (driver-side, ≤ touched buckets × files)
    val written = listParquet(dataDir)
    commit(root, Manifest(version, batchId, carried ++ written))
  }

  /** Snapshot read of the latest committed version. */
  def read(spark: SparkSession): DataFrame = ManifestUpsertSink.read(spark, root)

  /** Compact the current snapshot: rewrite EVERY bucket's live rows as a
    * fresh one-file-per-bucket set and commit it as a new version. The
    * small-file answer for sustained micro-batch ingest — each merge
    * leaves one part-file set per touched bucket per batch; compaction
    * folds a bucket back to a single file (`repartition` by bucket → one
    * task → one file). Data content is unchanged, so the committed
    * manifest KEEPS the last merged batch id — the replay guard still
    * refers to data batches, and a compaction between a crash and a
    * redelivery cannot un-guard it. */
  def compact(spark: SparkSession): Unit = {
    val cur = latestManifest(root).getOrElse(return)
    if (cur.files.isEmpty) return
    val version = cur.version + 1
    val all = spark.read.option("mergeSchema", "true").parquet(cur.files.map(_.path): _*)
      .withColumn(BucketCol, pmod(xxhash64(col(keyCol)), lit(buckets.toLong)))
      .repartition(buckets, col(BucketCol))
    val dataDir = s"$root/data/v$version"
    all.write.mode("overwrite").partitionBy(BucketCol).parquet(dataDir)
    commit(root, Manifest(version, cur.batchId, listParquet(dataDir)))
  }

  /** Delete data files no manifest in the newest `keepVersions` versions
    * references, then the superseded manifests themselves. Bounds storage
    * after compaction at the cost of time travel past the horizon — the
    * standard lakehouse VACUUM trade. Never touches the live version. */
  def vacuum(keepVersions: Int = 1): Unit =
    ManifestUpsertSink.vacuum(root, math.max(1, keepVersions))
}

object ManifestUpsertSink {
  private val BucketCol = "__bucket"

  final case class FileEntry(bucket: Long, path: String)
  final case class Manifest(version: Long, batchId: Long, files: Seq[FileEntry])

  /** Snapshot read: latest manifest's files, bucket column dropped (it is
    * derivable from the key and re-derived on the next merge). An empty
    * or absent table raises — callers create state by merging a batch. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val m = latestManifest(root).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $root"))
    if (m.files.isEmpty)
      throw new IllegalStateException(s"manifest v${m.version} lists no files")
    // mergeSchema: after additive evolution a snapshot's buckets can carry
    // different vintages until the next compaction unifies them
    spark.read.option("mergeSchema", "true").parquet(m.files.map(_.path): _*)
      .drop(BucketCol)
  }

  /** Time-travel read: the snapshot AS OF a committed version — the
    * manifest log keeps every version until [[ManifestUpsertSink.vacuum]]
    * reclaims it, so any un-vacuumed version reads exactly as it
    * committed (data files are immutable once referenced). */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val path = Paths.get(root, "_manifest", s"v$version.manifest")
    if (!Files.exists(path))
      throw new IllegalStateException(s"version $version not committed (or vacuumed) under $root")
    val m = decode(Files.readString(path))
    spark.read.option("mergeSchema", "true").parquet(m.files.map(_.path): _*)
      .drop(BucketCol)
  }

  private def vacuum(root: String, keep: Int): Unit = {
    val dir = Paths.get(root, "_manifest")
    if (!Files.isDirectory(dir)) return
    val versions = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      .toSeq.sorted
    if (versions.size <= keep) return
    val (drop, hold) = versions.splitAt(versions.size - keep)
    val live: Set[String] = hold.flatMap(v =>
      decode(Files.readString(dir.resolve(s"v$v.manifest"))).files.map(_.path)).toSet
    // delete data files only the dropped versions reference, then their
    // manifests; version dirs left empty disappear with their last file
    for (v <- drop) {
      val m = decode(Files.readString(dir.resolve(s"v$v.manifest")))
      for (f <- m.files if !live(f.path)) Files.deleteIfExists(Paths.get(f.path))
      Files.deleteIfExists(dir.resolve(s"v$v.manifest"))
    }
  }

  /** Plain-text manifest codec — one `bucket<TAB>path` line per file
    * after a `version`/`batchId` header. Deliberately not JSON: zero
    * parser dependencies, diff-able, and append-order stable. */
  private def encode(m: Manifest): String =
    (s"version=${m.version}" +: s"batchId=${m.batchId}" +:
      m.files.map(f => s"${f.bucket}\t${f.path}")).mkString("\n")

  private def decode(text: String): Manifest = {
    // header is positionally the first two lines — file PATHS can contain
    // '=' (the __bucket=N partition segment), so no content sniffing
    val lines = text.linesIterator.toSeq
    val header = lines.take(2).map { l =>
      val Array(k, v) = l.split("=", 2); k -> v.toLong
    }.toMap
    val files = lines.drop(2).filter(_.nonEmpty).map { l =>
      val Array(b, p) = l.split("\t", 2); FileEntry(b.toLong, p)
    }
    Manifest(header("version"), header("batchId"), files)
  }

  private[graft] def latestManifest(root: String): Option[Manifest] = {
    val dir = Paths.get(root, "_manifest")
    if (!Files.isDirectory(dir)) return None
    val versions = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      .toSeq
    if (versions.isEmpty) None
    else Some(decode(Files.readString(dir.resolve(s"v${versions.max}.manifest"))))
  }

  /** Atomic commit: temp write + ATOMIC_MOVE onto the version path. A
    * racing writer committing the same version loses the move and fails
    * loudly — never a silently merged/partial manifest. */
  private def commit(root: String, m: Manifest): Unit = {
    val dir = Paths.get(root, "_manifest")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-v${m.version}-${java.util.UUID.randomUUID()}")
    Files.write(tmp, encode(m).getBytes(StandardCharsets.UTF_8))
    val target = dir.resolve(s"v${m.version}.manifest")
    if (Files.exists(target))
      throw new IllegalStateException(s"concurrent commit of v${m.version} under $root")
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Bucket→file entries for every parquet part under a version dir. */
  private def listParquet(dataDir: String): Seq[FileEntry] = {
    val base = Paths.get(dataDir)
    if (!Files.isDirectory(base)) return Seq.empty
    val out = Seq.newBuilder[FileEntry]
    val stream = Files.walk(base)
    try stream.iterator().asScala.foreach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") && !name.startsWith(".") && !name.startsWith("_")) {
        val rel = base.relativize(p).toString
        val bucket = rel.split("/").collectFirst {
          case seg if seg.startsWith(s"$BucketCol=") =>
            seg.stripPrefix(s"$BucketCol=").toLong
        }.getOrElse(throw new IllegalStateException(s"unbucketed data file $p"))
        out += FileEntry(bucket, p.toString)
      }
    } finally stream.close()
    out.result()
  }
}
