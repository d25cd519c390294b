package graft

import org.apache.spark.sql.functions._

import graft.queries.OracleLits
import graft.scale.TextAnalysis

/** The oracle-literal plumbing behind the round-5 canonicalization: SQL
  * rendering helpers and the driver-side constant extractors whose values
  * the oracle receives verbatim. */
class OracleCanonSpec extends SparkSpec {
  import spark.implicits._

  test("sqlStr escapes embedded quotes; sqlDouble round-trips the double") {
    assert(OracleLits.sqlStr("it's") == "'it''s'")
    assert(OracleLits.sqlStr("plain") == "'plain'")
    Seq(0.0, -1.5, math.Pi, 1e-300, 123456.789e10, -0.1).foreach { d =>
      val lit = OracleLits.sqlDouble(d)
      val inner = lit.stripPrefix("CAST('").stripSuffix("' AS DOUBLE)")
      assert(inner.toDouble == d, s"round-trip failed for $d: $lit")
    }
    intercept[IllegalArgumentException] { OracleLits.sqlDouble(Double.NaN) }
    assert(OracleLits.sqlDec6(BigDecimal("-0.5")) ==
      "CAST(-0.500000 AS DECIMAL(18,6))")
  }

  test("registry: put/get round-trip, absent keys stay absent") {
    assert(OracleLits.get("__no_such_key").isEmpty)
    OracleLits.put("__spec_key", "(VALUES (1)) AS t(x)")
    assert(OracleLits.get("__spec_key").contains("(VALUES (1)) AS t(x)"))
  }

  test("registry: beginRun scopes fragments to one dataset/run") {
    // a JVM verifying two datasets must never serve dataset-A constants
    // to dataset-B oracle SQL (stale fragments corrupt the gate silently)
    try {
      OracleLits.beginRun("/data/sfA")
      OracleLits.put("__scope_key", "(VALUES (1)) AS t(a)")
      assert(OracleLits.get("__scope_key").isDefined)
      OracleLits.beginRun("/data/sfB")
      assert(OracleLits.get("__scope_key").isEmpty,
        "fragment from the previous run leaked into the new run")
      OracleLits.put("__scope_key", "(VALUES (2)) AS t(b)")
      assert(OracleLits.get("__scope_key").contains("(VALUES (2)) AS t(b)"))
    } finally {
      // other suites must see the default-scope registry even on failure
      OracleLits.beginRun("")
    }
  }

  test("bm25TermStats: corpus stats, presence-only terms, idf formula") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian")).toDF("doc_id", "text")
    val (n, sumdl, terms) =
      TextAnalysis.bm25TermStats(docs, "text", "apple banana missing")
    assert(n == 3 && sumdl == 6)
    // the absent query term contributes no row (mirrors bm25's join)
    assert(terms.map(_._1) == Seq("apple", "banana"))
    val byTerm = terms.map(t => t._1 -> t).toMap
    assert(byTerm("apple")._2 == 1 && byTerm("banana")._2 == 2)
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5)); evaluated through Catalyst,
    // so compare against the JVM formula with an ulp-scale tolerance
    terms.foreach { case (_, df, idf) =>
      val ref = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      assert(math.abs(idf - ref) <= math.ulp(ref) * 4, s"idf drift: $idf vs $ref")
    }
    // rarer term carries the larger idf
    assert(byTerm("apple")._3 > byTerm("banana")._3)
  }

  test("bm25TermStats on an empty corpus yields empty stats") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (n, sumdl, terms) = TextAnalysis.bm25TermStats(empty, "text", "apple")
    assert(n == 0 && sumdl == 0 && terms.isEmpty)
  }

  test("quantileCuts + bucketsFromCuts compose to quantileBuckets") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val cuts = graft.scale.Sampling.quantileCuts(df, "v", 4)
    assert(cuts.length == 3)
    val a = graft.scale.Sampling.bucketsFromCuts(df, "v", cuts)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.scale.Sampling.quantileBuckets(df, "v", 4)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // buckets are monotone in the value
    assert((1L until 100L).forall(i => a(i) <= a(i + 1)))
  }

  test("ensureIncrCcState builds once and is reused on the second call") {
    val dir1 = graft.queries.ScaleQueries.ensureIncrCcState(spark, sfDir)
    val done = new java.io.File(s"$dir1/_DONE")
    assert(done.exists())
    assert(new java.io.File(s"$dir1/minhash").isDirectory)
    assert(new java.io.File(s"$dir1/labels").isDirectory)
    val stamp = done.lastModified()
    val dir2 = graft.queries.ScaleQueries.ensureIncrCcState(spark, sfDir)
    assert(dir2 == dir1 && done.lastModified() == stamp,
      "second call must not rebuild the persisted state")
    // the persisted labels are a usable CC labeling: every id labeled once
    val labels = spark.read.parquet(s"$dir1/labels")
    assert(labels.columns.toSet == Set("id", "component"))
    assert(labels.groupBy("id").count().filter($"count" > 1).count() == 0)
  }

  test("langMixture flags mid-document language flips; pure docs stay pure") {
    val en50 = Seq.fill(13)("the cat and a dog of").mkString(" ")  // 78 en toks
    val fr50 = Seq.fill(13)("le chat et la rue les").mkString(" ") // 78 fr toks
    val docs = Seq(
      (1L, en50),                 // 2 chunks, both en
      (2L, en50 + " " + fr50),    // en chunks then fr chunks
      (3L, ""),                   // no tokens -> no row
      (4L, "xyzzy plugh")).toDF("doc_id", "text") // no markers -> und
    val out = graft.scale.TextAnalysis
      .langMixture(docs, "doc_id", "text", chunkSize = 50)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(!out.contains(3L))
    assert(out(1L)._2 == 1L && out(1L)._3 == "en")
    val (nc, nl, maj, nmaj) = out(2L)
    assert(nl >= 2L && nc > nmaj, s"expected a mix: $out")
    assert(Set("en", "fr").contains(maj))
    assert(out(4L) == ((1L, 1L, "und", 1L)))
  }
}
