package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The r06 lesson as a contract: when a query dies, the harness must be
  * LOUD. That round lost 73 queries to a schema drift and the correctness
  * artifact simply omitted them — it read as a green round. This spec
  * drives `Verify.main` with an injected failure and asserts the broken
  * query is visible in `failures.json` while healthy queries still dump,
  * so a partial failure can never again masquerade as a clean run.
  */
class HarnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Verify: an injected query failure lands in failures.json; healthy queries still dump; oracle_sql.json still parses") {
    spark // force the shared session so Verify's getOrCreate reuses it
    val outDir = Files.createTempDirectory("graft_harness_").toString
    System.setProperty("graft.verify.noStop", "1")
    System.setProperty("graft.verify.injectFail", "q02_filter_predicates")
    try {
      Verify.main(Array("/root/testdata/sf0.001", outDir,
        "q01_pricing_summary", "q02_filter_predicates"))
    } finally {
      System.clearProperty("graft.verify.injectFail")
      System.clearProperty("graft.verify.noStop")
    }
    val failures = Files.readString(Paths.get(s"$outDir/failures.json"))
    assert(failures.contains("q02_filter_predicates") &&
      failures.contains("injected failure"),
      s"broken query must be recorded loudly, got: $failures")
    assert(!failures.contains("q01_pricing_summary"),
      "healthy queries must not be in failures.json")
    assert(Files.isDirectory(Paths.get(s"$outDir/q01_pricing_summary")),
      "healthy queries still produce their dump")
    assert(!Files.exists(Paths.get(s"$outDir/q02_filter_predicates")),
      "failed query produces no partial dump")
    val oracle = Files.readString(Paths.get(s"$outDir/oracle_sql.json"))
    assert(oracle.startsWith("{") && oracle.endsWith("}") &&
      oracle.contains("q01_pricing_summary"))
  }

  test("temp sweep ages by the NEWEST entry under the tree, not the root dir mtime") {
    // a lake table root's mtime freezes once data/_manifest exist — a
    // root-mtime gate would doom a >2h concurrent run's LIVE tables.
    val dir = Files.createTempDirectory("graft_sweepage_test_")
    try {
      val sub = Files.createDirectories(dir.resolve("data").resolve("__bucket=0"))
      val f = Files.writeString(sub.resolve("part.parquet"), "fresh")
      val oldTs = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * 3600 * 1000L)
      Files.setLastModifiedTime(dir, oldTs) // the exact failure shape: stale root, live leaves
      val cutoff2h = System.currentTimeMillis() - 2 * 3600 * 1000L
      assert(Preflight.newestMtime(dir) >= cutoff2h,
        "a tree with a fresh leaf must read as FRESH despite a stale root mtime")
      // when every entry is old, the tree is genuinely stale
      Seq(f, sub, sub.getParent, dir).foreach(Files.setLastModifiedTime(_, oldTs))
      assert(Preflight.newestMtime(dir) < cutoff2h)
    } finally {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }
}
