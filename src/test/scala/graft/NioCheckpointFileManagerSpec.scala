package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager

import graft.streaming.NioCheckpointFileManager

/** Contract tests for the java.nio checkpoint manager — the exact
  * semantics HDFSMetadataLog depends on (rename-if-absent with Hadoop's
  * FileAlreadyExistsException on a lost race, FileNotFoundException from
  * list on a missing dir), plus the session wiring pin: the conf key in
  * Tables.sessionConf must actually resolve to this class through
  * Spark's CheckpointFileManager.create. The end-to-end exercise is
  * every streaming case in StreamingSpec/SinkSpec/EngineSpec — they all
  * checkpoint through this manager via the shared session conf. */
class NioCheckpointFileManagerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mgr(root: String) =
    new NioCheckpointFileManager(new Path(root), new org.apache.hadoop.conf.Configuration())

  test("createAtomic: rename-if-absent commit; loser raises Hadoop's FileAlreadyExistsException") {
    val root = Files.createTempDirectory("graft_ncfm_").toString
    val m = mgr(root)
    val target = new Path(s"$root/offsets/0")
    val out = m.createAtomic(target, overwriteIfPossible = false)
    out.write("v1 {}".getBytes)
    out.close()
    assert(new String(Files.readAllBytes(Paths.get(s"$root/offsets/0"))) == "v1 {}")
    // losing writer: non-overwrite close onto the committed path
    val lose = m.createAtomic(target, overwriteIfPossible = false)
    lose.write("imposter".getBytes)
    intercept[FileAlreadyExistsException] { lose.close() }
    assert(new String(Files.readAllBytes(Paths.get(s"$root/offsets/0"))) == "v1 {}",
      "the committed file must survive the lost race")
    // overwrite mode replaces; cancel leaves nothing behind
    val ow = m.createAtomic(target, overwriteIfPossible = true)
    ow.write("v2 {}".getBytes)
    ow.close()
    assert(new String(Files.readAllBytes(Paths.get(s"$root/offsets/0"))) == "v2 {}")
    val c = m.createAtomic(new Path(s"$root/offsets/1"), overwriteIfPossible = false)
    c.write("never".getBytes)
    c.cancel()
    assert(!Files.exists(Paths.get(s"$root/offsets/1")))
    assert(m.list(new Path(s"$root/offsets")).map(_.getPath.getName).toSeq == Seq("0"),
      "no temp-file debris after the race + cancel")
  }

  test("open is seekable, list filters and raises on missing dirs, delete is recursive") {
    val root = Files.createTempDirectory("graft_ncfm2_").toString
    val m = mgr(root)
    val f = new Path(s"$root/log/7")
    val out = m.createAtomic(f, overwriteIfPossible = false)
    out.write("0123456789".getBytes)
    out.close()
    val in = m.open(f)
    in.seek(4L)
    assert(in.getPos == 4L)
    val buf = new Array[Byte](3)
    in.readFully(4L, buf)
    assert(new String(buf) == "456")
    in.close()
    intercept[java.io.FileNotFoundException] { m.open(new Path(s"$root/log/missing")) }
    intercept[java.io.FileNotFoundException] { m.list(new Path(s"$root/nope")) }
    assert(m.exists(f) && !m.exists(new Path(s"$root/log/missing")))
    m.mkdirs(new Path(s"$root/log/sub"))
    m.delete(new Path(s"$root/log"))
    assert(!Files.exists(Paths.get(s"$root/log")))
    m.delete(new Path(s"$root/log")) // missing: no-op, no throw
  }

  test("open streams large files through a FileChannel with identical read semantics") {
    val root = Files.createTempDirectory("graft_ncfm4_").toString
    val m = mgr(root)
    // > InMemoryOpenBytes: takes the channel path (state-store-snapshot
    // shape); the byte-array fast path is covered by the small-file test
    val n = (2 << 20) + 17
    val bytes = Array.tabulate[Byte](n)(i => (i * 31 & 0xff).toByte)
    val f = new Path(s"$root/state/1.snapshot")
    val out = m.createAtomic(f, overwriteIfPossible = false)
    out.write(bytes)
    out.close()
    val in = m.open(f)
    // sequential read across an internal buffer boundary
    val head = new Array[Byte](4096)
    in.readFully(head)
    assert(head.sameElements(bytes.slice(0, 4096)))
    // seek + getPos round-trip deep into the file
    in.seek(n - 5L)
    assert(in.getPos == n - 5L)
    val tail = new Array[Byte](5)
    in.readFully(tail)
    assert(tail.sameElements(bytes.slice(n - 5, n)))
    assert(in.read() == -1, "EOF after the last byte")
    // positioned read must not disturb the stream position
    in.seek(100L)
    val mid = new Array[Byte](7)
    in.readFully(n / 2L, mid)
    assert(mid.sameElements(bytes.slice(n / 2, n / 2 + 7)))
    assert(in.getPos == 100L, "pread must leave the seek position alone")
    intercept[java.io.EOFException] { in.readFully(n - 2L, new Array[Byte](5)) }
    in.close()
  }

  test("session wiring: CheckpointFileManager.create resolves this class from the shared conf") {
    val root = Files.createTempDirectory("graft_ncfm3_").toString
    val created = CheckpointFileManager.create(
      new Path(root), spark.sessionState.newHadoopConf())
    assert(created.isInstanceOf[NioCheckpointFileManager],
      s"sessionConf must route checkpoints through the nio manager, got ${created.getClass}")
    assert(created.isLocal)
  }
}
