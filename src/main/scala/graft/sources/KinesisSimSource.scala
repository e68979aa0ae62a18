package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 — `format("graft-kinesis-sim")`: a wire-shaped Kinesis test double.
  *
  * The real ingestion path (reference core.clj:165-173) binds a Kinesis
  * connector whose artifact cannot ship here, so until round 4 the
  * production SCHEMA path — a stream of Kinesis-shaped records entering
  * the engine — was exercised by no test. This source closes that seam:
  * a DSv2 micro-batch source that replays the K2 seq-named chunk log
  * while emitting the exact record schema the public Kinesis connectors
  * present (`data` binary payload, `streamName`, `partitionKey`,
  * `sequenceNumber`, `approximateArrivalTimestamp` — the KCL record
  * surface the reference's processor consumes via `:data`/`:partition`/
  * `:sequence-number`), so `Engine`/`Main` run end-to-end over the
  * production shape with only [[Sources.fromKinesisWire]] between the
  * wire and the parse pipeline — the same one-line adapter a real
  * connector binding uses.
  *
  * Determinism: every emitted field is a pure function of the stored
  * record (`partitionKey` = shard index hashed from the sequence number,
  * arrival timestamp = micros decoded from the sequence number's digit
  * suffix), so a replayed run produces byte-identical downstream sink
  * output — which is exactly what EngineSpec asserts against the
  * graft-records run of the same log.
  *
  * Scale notes: offset/partition planning is the graft-records
  * machinery (file-name seqs as offsets, one task per immutable chunk);
  * per-record work is O(bytes). The double intentionally has no
  * admission control — backfill rate limiting is the graft-records
  * connector's job; this source exists to exercise the wire schema. */
final class KinesisSimSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kinesis-sim"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisSimSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisSimTable(properties.get("path"),
      Option(properties.get("streamName")).getOrElse("events"),
      Option(properties.get("nShards")).map(_.toInt).getOrElse(4))
}

object KinesisSimSource {
  /** The public Kinesis connector record schema (KCL record surface). */
  val Schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))

  /** Deterministic arrival time: micros from the seq's numeric suffix
    * (fixed-width digit strings; 18 digits stay within Long). */
  private[sources] def arrivalMicros(seq: String): Long = {
    val digits = seq.filter(_.isDigit).takeRight(18)
    if (digits.isEmpty) 0L else digits.toLong
  }

  /** Deterministic shard assignment from the sequence number. */
  private[sources] def shardOf(seq: String, nShards: Int): String =
    s"shard-${math.floorMod(seq.hashCode, nShards)}"
}

private final class KinesisSimTable(path: String, streamName: String, nShards: Int)
    extends Table with SupportsRead {
  require(path != null, "graft-kinesis-sim requires a path (.load(path))")
  override def name(): String = s"graft-kinesis-sim($path)"
  override def schema(): StructType = KinesisSimSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KinesisSimSource.Schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            RecordsSource.listChunks(path)
              .map(c => KinesisSimPartition(c.path): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new KinesisSimReaderFactory(streamName, nShards)
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KinesisSimMicroBatchStream(path, streamName, nShards)
      }
    }
}

/** Offset = max committed file-name seq, same contract as graft-records. */
private final case class KinesisSimOffset(maxSeq: String) extends Offset {
  override def json(): String = {
    val b = new StringBuilder("{\"maxSeq\":\"")
    maxSeq.foreach { case '"' => b.append("\\\""); case '\\' => b.append("\\\\")
                     case c => b.append(c) }
    b.append("\"}").toString
  }
}

private final class KinesisSimMicroBatchStream(
    path: String, streamName: String, nShards: Int) extends MicroBatchStream {
  override def initialOffset(): Offset = KinesisSimOffset("")
  override def latestOffset(): Offset = {
    val chunks = RecordsSource.listChunks(path)
    KinesisSimOffset(if (chunks.isEmpty) "" else chunks.map(_.seq).max)
  }
  override def deserializeOffset(json: String): Offset = {
    val marker = "\"maxSeq\":\""
    val start = json.indexOf(marker) + marker.length
    val b = new StringBuilder
    var i = start
    while (i < json.length && json.charAt(i) != '"') {
      if (json.charAt(i) == '\\') i += 1
      b.append(json.charAt(i)); i += 1
    }
    KinesisSimOffset(b.toString)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KinesisSimOffset].maxSeq
    val hi = end.asInstanceOf[KinesisSimOffset].maxSeq
    RecordsSource.listChunks(path)
      .filter(c => c.seq > lo && c.seq <= hi)
      .map(c => KinesisSimPartition(c.path): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisSimReaderFactory(streamName, nShards)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private final case class KinesisSimPartition(path: String) extends InputPartition

private final class KinesisSimReaderFactory(streamName: String, nShards: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KinesisSimPartition]
    new PartitionReader[InternalRow] {
      // shared conf — same rationale as RecordsSource.listingConf
      private val fs = FileSystem.get(new java.net.URI(p.path), RecordsSource.listingConf)
      private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.util.zip.GZIPInputStream(fs.open(new Path(p.path))), "UTF-8"))
      private val stream = UTF8String.fromString(streamName)
      private var line: String = _
      override def next(): Boolean = { line = in.readLine(); line != null }
      override def get(): InternalRow = {
        // stored layout: 56-digit seq, space, payload (F11 fixed split)
        val seq = line.substring(0, math.min(56, line.length))
        val payload = if (line.length > 57) line.substring(57) else ""
        new GenericInternalRow(Array[Any](
          payload.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          stream,
          UTF8String.fromString(KinesisSimSource.shardOf(seq, nShards)),
          UTF8String.fromString(seq),
          KinesisSimSource.arrivalMicros(seq)))
      }
      override def close(): Unit = in.close()
    }
  }
}
