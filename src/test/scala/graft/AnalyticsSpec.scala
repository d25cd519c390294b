package graft

import org.apache.spark.sql.functions._
import graft.scale.TextAnalysis

/** Sketch-aggregate error bounds and TF-IDF semantics. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf: rare terms outscore common ones; tf counts repeats") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "apple durian")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, "doc_id", "text")
      .select($"doc_id", $"term", $"tf", $"score")
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // at equal tf, the rare term outscores the ubiquitous one:
    // banana (df=1) vs apple-in-doc-2 (df=3), both tf=1
    assert(out((1L, "banana"))._2 > out((2L, "apple"))._2)
    // tf scales the score linearly: apple appears twice in doc 1
    assert(out((1L, "apple"))._1 == 2L)
    assert(math.abs(out((1L, "apple"))._2 - 2 * out((2L, "apple"))._2) < 1e-9)
    // smoothed idf: df = N ⇒ idf = ln((N+1)/(N+1)) + 1 = 1 ⇒ score = tf
    assert(out((2L, "apple"))._2 == 1.0)
  }

  test("sketch aggregates stay inside their error bounds on real data") {
    val dir = sfDir
    val dist = graft.queries.AnalyticsQueries.queries("sk_approx_distinct")(spark, dir)
    assert(dist.filter(!$"within_20pct").count() == 0)
    val quant = graft.queries.AnalyticsQueries.queries("sk_approx_quantile")(spark, dir)
    assert(quant.filter(!$"rank_within_1pct").count() == 0)
    assert(dist.count() == 3 && quant.count() == 3) // A/N/R return flags
  }

  test("hll rollup: unioned per-group sketches land within bound") {
    val row = graft.queries.AnalyticsQueries.queries("sk_hll_rollup")(spark, sfDir)
      .collect()
    assert(row.length == 1 && row(0).getBoolean(1))
  }

  test("bloom-pruned semi-join equals the plain semi-join exactly") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val hot = Tables.load(spark, sfDir, "orders")
      .filter($"o_totalprice" > 450000).select("o_orderkey")
    val pruned = graft.io.Bucketing.bloomPrunedSemiJoin(
      li, hot, "l_orderkey", "o_orderkey", expectedKeys = 20000)
    val plain = li.join(hot.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    // identical multiset of rows: the bloom is I/O pruning, never semantics
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // the membership filter sits in the plan before the join
    assert(pruned.queryExecution.executedPlan.toString
      .contains("might_contain"))
    // non-integral keys fail loudly: cast("long") would null out
    // fractional/unparseable keys and silently drop matching rows
    val strKeys = hot.select($"o_orderkey".cast("string").as("k"))
    val e = intercept[IllegalArgumentException] {
      graft.io.Bucketing.bloomPrunedSemiJoin(li, strKeys,
        "l_orderkey", "k", expectedKeys = 100)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("bigram LM cross-entropy matches hand computation") {
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLm(docs, "text")
    // V = 2; c12: "a b"→3, "b a"→1; c1: a→3, b→1
    // logp("a b") = log2(4/5), logp("b a") = log2(2/3)
    val out = TextAnalysis.lmCrossEntropy(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val lp = (p: Double) => math.log(p) / math.log(2)
    assert(out(2L)._2 == 1L)
    assert(math.abs(out(2L)._1 - -lp(4.0 / 5)) < 1e-3)
    assert(out(1L)._2 == 3L)
    assert(math.abs(out(1L)._1 - -(2 * lp(4.0 / 5) + lp(2.0 / 3)) / 3) < 1e-3)
  }

  test("collocations: bound pairs outrank independent ones; floor applies") {
    // "strong glue" always co-occur; "red"/"fish" occur apart as often
    val docs = (1L to 6L).map(i =>
      (i, "strong glue red fish " + (if (i % 2 == 0) "red cat" else "fish dog")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 2, k = 10)
      .select($"bigram", $"pmi").as[(String, Double)].collect().toMap
    assert(out("strong glue") > out("red fish"))
    val floored = TextAnalysis.collocations(docs, "text", minCount = 4, k = 10)
      .select("bigram").as[String].collect().toSet
    assert(!floored.contains("red cat")) // count 3 < 4
    assert(floored.contains("strong glue")) // count 6
  }

  test("profileDrift: added, removed, type-changed, unchanged statuses") {
    val a = Seq(("1", 1L, "x")).toDF("_id", "n", "s")
    val b = Seq(("1", "one", 0.5)).toDF("_id", "n", "q")
    val out = graft.profile.SchemaProfiler.profileDrift(a, b)
      .select($"path", $"status").as[(String, String)].collect().toMap
    assert(out == Map("_id" -> "unchanged", "n" -> "type_changed",
      "s" -> "removed", "q" -> "added"))
  }

  test("token drift: zero for identical snapshots, one bit for disjoint") {
    val a = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val zero = TextAnalysis.tokenDriftTerms(a, a, "text")
      .agg(sum($"js_term")).head().getDecimal(0)
    assert(zero.doubleValue == 0.0)
    val b = Seq((1L, "p q"), (2L, "q p")).toDF("doc_id", "text")
    val one = TextAnalysis.tokenDriftTerms(a, b, "text")
      .agg(sum($"js_term")).head().getDecimal(0)
    assert(math.abs(one.doubleValue - 1.0) < 1e-6)
  }

  test("cohort retention: day-0 equals cohort size, later days never exceed it") {
    val r = graft.queries.CoreQueries.queries("ev_cohort_retention")(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(r.nonEmpty)
    val byCohort = r.groupBy(_._1)
    byCohort.foreach { case (c, rows) =>
      val m = rows.map(x => x._2 -> x._3).toMap
      assert(m.contains(0L), s"cohort $c missing day-0 row")
      // a user active at age k was by definition active at age 0
      assert(rows.forall(_._3 <= m(0L)), s"cohort $c retention exceeds size")
      assert(rows.forall(_._2 >= 0L), s"cohort $c negative age")
    }
    // every user lands in exactly one cohort: day-0 totals = distinct users
    val users = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users)
  }

  test("bloom prune rejects most non-members at the configured fpp") {
    import spark.implicits._
    val keys = (0L until 1000L).toDF("k")
    val bf = keys.stat.bloomFilter("k", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = (100000L until 110000L).toDF("v")
      .filter(org.apache.spark.sql.graftbridge.Bridge.mightContain(
        bos.toByteArray, $"v"))
    // 10k true non-members at fpp=0.01 → expect ~100 false positives;
    // 5× headroom keeps the test deterministic-in-practice
    assert(probe.count() <= 500)
  }
}
