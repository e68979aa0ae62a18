package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.PrivacyQueries

/** Laws for the privacy/structure tier (q120-q122, q125) that the DuckDB
  * oracle's value-compare cannot express: redaction completeness, keep-first
  * dedup invariants, chunk coverage/overlap arithmetic, and the band
  * census partition law. Runs on sf0.001 + literal fixtures. */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q120 law: redaction is complete — zero residual PII matches on the cleaned text") {
    val dirty = Tables.documents(spark, sf)
      .select(col("doc_id"),
        PrivacyQueries.injectPii(col("text"), col("doc_id")).as("t"))
    val residual = dirty
      .select(PrivacyQueries.redact(col("t")).as("clean"))
      .select(
        sum(regexp_count(col("clean"),
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))).as("e"),
        sum(regexp_count(col("clean"), lit("\\+1-555-[0-9]{4}"))).as("p"),
        sum(regexp_count(col("clean"),
          lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"))).as("i"))
      .head()
    assert(residual.getLong(0) == 0L, "residual emails")
    assert(residual.getLong(1) == 0L, "residual phones")
    assert(residual.getLong(2) == 0L, "residual IPs")
  }

  test("q120 law: injection counts — 1 email + 1 IP per doc, phone iff doc_id % 3 == 0") {
    val r = PrivacyQueries.q120.fn(spark, sf)
      .agg(sum(col("n_docs")), sum(col("n_emails")), sum(col("n_ips")),
        sum(col("n_phones")))
      .head()
    val nDocs = r.getLong(0)
    assert(r.getLong(1) == nDocs, "one email per doc")
    assert(r.getLong(2) == nDocs, "one IP per doc")
    val expectedPhones = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(3)) === 0).count()
    assert(r.getLong(3) == expectedPhones, "phone on every third doc")
  }

  test("q121 laws: kept paragraph multiset is globally duplicate-free; totals reconcile") {
    val out = PrivacyQueries.q121.fn(spark, sf).cache()
    try {
      // every paragraph text survives exactly once corpus-wide:
      // sum(n_kept) == number of DISTINCT paragraph texts
      val words = split(col("text"), " ")
      val paras = Tables.documents(spark, sf).select(
        explode(transform(
          sequence(lit(0), ceil(size(words) / lit(16.0)).cast("int") - 1),
          i => array_join(slice(words, i * lit(16) + 1, lit(16)), " "))).as("para"))
      val distinctParas = paras.select(col("para")).distinct().count()
      val totals = out.agg(sum(col("n_kept")), sum(col("n_paras"))).head()
      assert(totals.getLong(0) == distinctParas,
        "sum(n_kept) must equal the corpus-wide distinct paragraph count")
      assert(totals.getLong(1) == paras.count(),
        "sum(n_paras) must equal the total paragraph instance count")
      // per-doc sanity: 0 <= n_kept <= n_paras, and every doc appears
      assert(out.filter(col("n_kept") > col("n_paras") || col("n_kept") < 0).isEmpty)
      assert(out.count() == Tables.documents(spark, sf).count())
    } finally out.unpersist()
  }

  test("q122 laws: chunks tile each doc — starts at stride 48, full coverage, 16-token overlap") {
    val chunks = PrivacyQueries.q122.fn(spark, sf).cache()
    try {
      // start arithmetic: chunk i starts at 48i and is non-empty
      assert(chunks.filter(col("start_tok") =!= col("chunk_idx") * 48).isEmpty)
      assert(chunks.filter(col("n_tok") <= 0 || col("n_tok") > 64).isEmpty)
      // coverage: the last chunk ends exactly at the doc's token count
      val lastEnd = chunks.groupBy(col("doc_id"))
        .agg(max(col("start_tok") + col("n_tok")).as("covered"),
          count(lit(1)).as("nc"))
      val nTok = Tables.documents(spark, sf)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      assert(lastEnd.join(nTok, "doc_id").filter(col("covered") =!= col("n")).isEmpty,
        "chunks must cover every token exactly to the end of the doc")
      // overlap: consecutive chunks share 64 - 48 = 16 tokens (when the
      // earlier chunk is full); equivalently every non-final chunk has 64
      val nonFinal = chunks.as("a").join(lastEnd.as("m"), "doc_id")
        .filter(col("a.chunk_idx") < col("m.nc") - 1)
      assert(nonFinal.filter(col("a.n_tok") =!= 64).isEmpty,
        "every non-final chunk must be exactly 64 tokens (16-token overlap at stride 48)")
    } finally chunks.unpersist()
  }

  test("q125 laws: census partitions the corpus; band holds 60-95% per language") {
    val out = PrivacyQueries.q125.fn(spark, sf).cache()
    try {
      assert(out.filter(col("n_kept") + col("n_short") + col("n_long") =!= col("n_docs")).isEmpty,
        "kept + short + long must partition n_docs")
      assert(out.filter(col("lo") > col("hi")).isEmpty)
      // p10..p90 band: interpolation + integer data put the kept mass in
      // [60%, 95%] for any non-degenerate distribution at sf0.001 scale
      val offBand = out.filter(
        col("n_kept").cast("double") / col("n_docs") < 0.6 ||
          col("n_kept").cast("double") / col("n_docs") > 0.95)
      assert(offBand.isEmpty, "p10-p90 band should hold 60-95% of docs per language")
    } finally out.unpersist()
  }
}
