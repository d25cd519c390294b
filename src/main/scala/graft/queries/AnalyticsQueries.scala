package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.TextAnalysis

/** Analytics operators a 100 TB engine leans on: sketch aggregates (HLL
  * distinct counts, quantile sketches — constant-size state instead of a
  * distinct shuffle / global sort) and TF-IDF term scoring. Sketch outputs
  * are verified against the EXACT value with a deterministic error-bound
  * flag; the DuckDB oracle computes the exact side and asserts the bound.
  * The HLL bound is probabilistic (rsd is a standard deviation, not a hard
  * cap), so the flag's threshold is set with overwhelming margin — ≥5σ —
  * rather than at the typical error. */
object AnalyticsQueries {
  type QF = (SparkSession, String) => DataFrame

  val queries: Map[String, QF] = Map(
    // HLL++ distinct count per group vs exact — flag asserts ≤20% rel.
    // error at rsd 0.04, a 5σ margin (tighter rsd measured ~2× slower for
    // no additional safety; the sketch state is ~KB per group where
    // countDistinct shuffles every distinct key)
    "sk_approx_distinct" -> ((s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_cnt"),
          approx_count_distinct(col("l_orderkey"), 0.04).as("approx"))
        .select(col("l_returnflag"), col("exact_cnt"),
          (abs(col("approx") - col("exact_cnt")) <=
            col("exact_cnt") * 0.2).as("within_20pct"))
        .orderBy("l_returnflag")),

    // Quantile sketch (Greenwald-Khanna, accuracy 10000) vs exact
    // interpolated median. GK guarantees a RANK bound (ε = 1/accuracy), not
    // a value bound — a value-error flag can legitimately fail on gapped
    // distributions — so the flag checks the returned value's rank lands in
    // [0.5 ± 0.01], which the sketch guarantee (ε = 1e-4) always satisfies.
    "sk_approx_quantile" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val agg = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("exact_med"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx"),
          count(lit(1)).as("n"))
      li.join(broadcast(agg), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(first("exact_med").as("exact_med"),
          (sum(when(col("l_extendedprice") <= col("approx"), 1L)
            .otherwise(0L)) / first("n")).as("rank_hi"),
          (sum(when(col("l_extendedprice") < col("approx"), 1L)
            .otherwise(0L)) / first("n")).as("rank_lo"))
        .select(col("l_returnflag"),
          round(col("exact_med"), 4).as("median_price"),
          (col("rank_hi") >= 0.49 && col("rank_lo") <= 0.51)
            .as("rank_within_1pct"))
        .orderBy("l_returnflag")
    }),

    // Mergeable-sketch rollup: per-group HLL sketches union to the global
    // estimate WITHOUT re-scanning — the two-level aggregation pattern that
    // lets 100 TB distinct counts reuse per-partition/per-day sketches.
    // lgConfigK=12 → ~1.6% rsd; the 10% flag is a >6σ margin.
    "sk_hll_rollup" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val perGroup = li.groupBy("l_returnflag")
        .agg(hll_sketch_agg(col("l_orderkey"), 12).as("sk"))
      val global = perGroup
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
      li.agg(countDistinct(col("l_orderkey")).as("exact_cnt"))
        .crossJoin(global)
        .select(col("exact_cnt"),
          (abs(col("approx") - col("exact_cnt")) <=
            col("exact_cnt") * 0.1).as("within_10pct"))
    }),

    // Bloom-pruned semi-join: lineitem rows of high-value orders, pruned by
    // a bloom of the qualifying keys BEFORE the shuffle, exact semi-join as
    // the residual — the result is exactly the semi-join (oracle-checked),
    // the bloom only cuts shuffle input
    "bf_semi_prune" -> ((s, d) => {
      val dec = "decimal(18,2)"
      val hot = Tables.load(s, d, "orders")
        .filter(col("o_totalprice") > 450000).select("o_orderkey")
      graft.io.Bucketing.bloomPrunedSemiJoin(
          Tables.load(s, d, "lineitem"), hot,
          "l_orderkey", "o_orderkey", expectedKeys = 200000)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // TF-IDF: top-3 terms per document. Gate surface is the int64 micro
    // score (floor(raw·10⁶) — no round-half mode) and the ranking runs on
    // the same integer total order (score_micro desc, term) in both
    // engines; TextAnalysis.tfidf keeps the rounded-double view
    "tx_tfidf_top3" -> ((s, d) => {
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("term").asc)
      TextAnalysis.tfidfRaw(Tables.load(s, d, "documents"), "doc_id", "text")
        .withColumn("score_micro", floor(col("score_raw") * lit(1e6)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("score_micro"))
        .orderBy("doc_id", "term")
    })
  )

  val oracles: Map[String, String] = Map(
    "sk_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_cnt,
        |  TRUE AS within_20pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "sk_approx_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |  TRUE AS rank_within_1pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "sk_hll_rollup" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_cnt, TRUE AS within_10pct
        |FROM lineitem""".stripMargin,

    "bf_semi_prune" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "tx_tfidf_top3" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    t -> t != '')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |s AS (SELECT doc_id, term,
        |  CAST(floor((tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0))
        |    * 1000000.0) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, term, score_micro FROM (
        |  SELECT doc_id, term, score_micro, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rn FROM s)
        |WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin
  )
}
