package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Multimodal, Pq, Sampling, Similarity, Temporal, TextAnalysis}
import ScaleShared._

/** Sketch family: KMV bottom-k overlap, Count-Min grids, AMS F2,
  * heavy hitters, incremental merges (merge == retrain by linearity).
  *
  * Mechanically split out of the former single-file ScaleQueries registry;
  * each family owns its queries AND their DuckDB oracle SQL. */
object SketchQueries {

  /** (doc_id, source, tok) occurrence rows off the session-memoized
    * tokenized-docs frame (perf-only; oracles re-tokenize in SQL). */
  private def tokOcc(s: SparkSession, d: String): DataFrame =
    tokenizedDocs(s, d).select(col("doc_id"), col("source"),
      explode(col("tk")).as("tok"))

  val queries: Map[String, QF] = Map(
    // Cross-source bigram overlap matrix (mirror/syndication detection):
    // Jaccard of distinct bigram sets per source pair — bounded by
    // |sources|² after the distinct reduction
    // (n_common, n_union) integer pairs — Jaccard is the caller's one
    // division (sourceOverlap still carries it for interactive use); the
    // gate compares the exact set sizes
    "corpus_overlap" -> ((s, d) =>
      TextAnalysis.sourceOverlap(docs(s, d), "source", "text", n = 2)
        .withColumnsRenamed(Map("grp_a" -> "source_a", "grp_b" -> "source_b"))
        .select("source_a", "source_b", "n_common", "n_union")
        .orderBy("source_a", "source_b")),

    // KMV-sketched source overlap (Beyer '07): the SKETCH counterpart of
    // corpus_overlap — pairwise Jaccard/union sufficient statistics from
    // bounded bottom-k sketches, never re-touching the corpus; integer
    // gate (hash values, ranks, match counts), estimates stay library-side
    "sk_kmv_overlap" -> ((s, d) => {
      val sk = graft.scale.Sketches.kmv(docs(s, d), "source",
        col("text"), 64)
      graft.scale.Sketches.kmvOverlap(sk, 64)
        .withColumnsRenamed(Map("grp_a" -> "source_a", "grp_b" -> "source_b"))
        .select("source_a", "source_b", "kth_min", "n_kmin", "n_common")
        .orderBy("source_a", "source_b")
    }),

    // KMV mergeability gate: per-batch sketches merged must equal the
    // full-corpus sketch exactly (the k smallest of a union are among
    // each side's k smallest) — the two-level rollup contract that lets
    // per-day sketches union to global without re-scanning
    "sk_kmv_incr" -> ((s, d) => {
      val dd = docs(s, d)
      val skA = graft.scale.Sketches.kmv(
        dd.filter(col("doc_id") < 250), "source", col("text"), 64)
      val skB = graft.scale.Sketches.kmv(
        dd.filter(col("doc_id") >= 250), "source", col("text"), 64)
      graft.scale.Sketches.kmvMerge(skA, skB, 64)
        .select(col("grp").as("source"), col("h"),
          col("rank").cast("long").as("rank"))
        .orderBy("source", "rank")
    }),

    // Count-Min sketch (Cormode-Muthukrishnan '05) point-frequency
    // estimates: the corpus is scanned ONCE into a bounded 4×256-cell
    // grid per source; the probe tokens then join the BROADCAST sketch —
    // the 100 TB frequency-probe shape (no re-scan per query). The
    // MD5-derived bucket hash is engine-portable, so the oracle
    // recomputes the identical grid and the estimates gate as exact int64
    "sk_cms_counts" -> ((s, d) => {
      val occ = tokOcc(s, d)
      val tok = occ.select("source", "tok")
      val sk = graft.scale.Sketches.cms(tok, "source", "tok",
        depth = 4, width = 256)
      val probes = occ.filter(col("doc_id") < 50).select("source", "tok")
      graft.scale.Sketches.cmsEstimate(sk, probes, "source", "tok",
        depth = 4, width = 256)
        .select(col("grp").as("source"), col("tok"), col("est"))
        .orderBy("source", "tok")
    }),

    // CMS mergeability gate: counters are linear, so per-batch sketches
    // cell-wise-summed must equal the full-corpus sketch EXACTLY — the
    // rollup contract that lets per-day grids sum to global without
    // re-scanning (oracle is the full-corpus grid)
    "sk_cms_incr" -> ((s, d) => {
      val occ = tokOcc(s, d)
      val skA = graft.scale.Sketches.cms(
        occ.filter(col("doc_id") < 250).select("source", "tok"),
        "source", "tok", 4, 256)
      val skB = graft.scale.Sketches.cms(
        occ.filter(col("doc_id") >= 250).select("source", "tok"),
        "source", "tok", 4, 256)
      graft.scale.Sketches.cmsMerge(skA, skB)
        .select(col("grp").as("source"),
          col("row_j").cast("long").as("row_j"), col("bucket"), col("cnt"))
        .orderBy("source", "row_j", "bucket")
    }),

    // AMS F2 sketch (Alon-Matias-Szegedy '96): r=8 signed counters per
    // source whose squared mean estimates the SELF-JOIN SIZE (repetition
    // mass) — the frequency moment CMS point counts and KMV/HLL distinct
    // counts don't give; the whole per-group state is 8 int64 counters
    // and the gate is the exact counter vector
    "sk_ams_f2" -> ((s, d) => {
      val tok = tokOcc(s, d).select("source", "tok")
      graft.scale.Sketches.amsSketch(tok, "source", "tok", r = 8)
        .select(col("grp").as("source"),
          col("est_i").cast("long").as("est_i"), col("z"))
        .orderBy("source", "est_i")
    }),

    // AMS mergeability gate: signed counters are linear — per-batch Z
    // vectors summed must equal the full-corpus vector exactly
    "sk_ams_incr" -> ((s, d) => {
      val occ = tokOcc(s, d)
      graft.scale.Sketches.amsMerge(
          graft.scale.Sketches.amsSketch(
            occ.filter(col("doc_id") < 250).select("source", "tok"),
            "source", "tok", 8),
          graft.scale.Sketches.amsSketch(
            occ.filter(col("doc_id") >= 250).select("source", "tok"),
            "source", "tok", 8))
        .select(col("grp").as("source"),
          col("est_i").cast("long").as("est_i"), col("z"))
        .orderBy("source", "est_i")
    }),

    // CMS heavy hitters: every distinct token estimated against the
    // broadcast grid, top-10 per source by (est desc, tok asc) via the
    // skew-safe two-phase top-k — the candidate-set pattern that turns a
    // CMS into a frequency leaderboard without exact per-token counts
    "sk_cms_topk" -> ((s, d) => {
      val tok = tokOcc(s, d).select("source", "tok")
      val sk = graft.scale.Sketches.cms(tok, "source", "tok",
        depth = 4, width = 256)
      graft.scale.Sketches.cmsHeavyHitters(sk, tok, "source", "tok",
        depth = 4, width = 256, n = 10)
        .select(col("grp").as("source"),
          col("rank").cast("long").as("rank"), col("tok"), col("est"))
        .orderBy("source", "rank")
    }),
  )

  // a def, not a val: registry-aware entries read OracleLits fragments
  // that the query functions register as they run (Verify dumps oracle
  // SQL AFTER running every query)
  def oracles: Map[String, String] = Map(
    // merge == retrain: the oracle IS the full-corpus bottom-64 per source
    "sk_kmv_incr" ->
      """WITH hv AS (SELECT DISTINCT source AS grp,
        |  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT grp AS source, h, CAST(rk AS BIGINT) AS rank
        |FROM (SELECT grp, h, row_number() OVER (
        |  PARTITION BY grp ORDER BY h) AS rk FROM hv)
        |WHERE rk <= 64 ORDER BY source, rank""".stripMargin,

    // bottom-64 of the MD5-prefix hash per source; union k-min per pair
    // with side_ct = 2 marking values present in BOTH sketches
    "sk_kmv_overlap" ->
      """WITH hv AS (SELECT DISTINCT source AS grp,
        |  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |sk AS (SELECT grp, h FROM (SELECT grp, h, row_number() OVER (
        |    PARTITION BY grp ORDER BY h) AS rk FROM hv) WHERE rk <= 64),
        |gs AS (SELECT DISTINCT grp FROM sk),
        |pr AS (SELECT a.grp AS grp_a, b.grp AS grp_b
        |  FROM gs a JOIN gs b ON a.grp < b.grp),
        |m AS (SELECT pr.grp_a, pr.grp_b, s.h, count(*) AS side_ct
        |  FROM pr JOIN sk s ON s.grp = pr.grp_a OR s.grp = pr.grp_b
        |  GROUP BY 1, 2, 3),
        |u AS (SELECT grp_a, grp_b, h, side_ct, row_number() OVER (
        |  PARTITION BY grp_a, grp_b ORDER BY h) AS rk FROM m)
        |SELECT grp_a AS source_a, grp_b AS source_b,
        |  CAST(max(h) AS BIGINT) AS kth_min,
        |  count(*) AS n_kmin,
        |  CAST(sum(CASE WHEN side_ct = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_common
        |FROM u WHERE rk <= 64 GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // the oracle recomputes the identical 4x256 CMS grid (60-bit MD5
    // prefix of "j:token" mod width) and probes it the same way
    "sk_cms_counts" ->
      s"""WITH tok AS (SELECT source, doc_id, unnest($duckToksAll) AS tok
         |  FROM documents),
         |rj AS (SELECT CAST(range AS BIGINT) AS row_j FROM range(0, 4)),
         |cells AS (SELECT source, rj.row_j,
         |    CAST(('0x' || substr(md5(CAST(rj.row_j AS VARCHAR) || ':' ||
         |      tok), 1, 15)) AS BIGINT) % 256 AS bucket
         |  FROM tok CROSS JOIN rj),
         |sk AS (SELECT source, row_j, bucket, count(*) AS cnt
         |  FROM cells GROUP BY 1, 2, 3),
         |probe AS (SELECT DISTINCT source, tok FROM tok WHERE doc_id < 50),
         |pc AS (SELECT p.source, p.tok, rj.row_j,
         |    CAST(('0x' || substr(md5(CAST(rj.row_j AS VARCHAR) || ':' ||
         |      p.tok), 1, 15)) AS BIGINT) % 256 AS bucket
         |  FROM probe p CROSS JOIN rj)
         |SELECT pc.source, pc.tok,
         |  CAST(min(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
         |FROM pc LEFT JOIN sk ON sk.source = pc.source
         |  AND sk.row_j = pc.row_j AND sk.bucket = pc.bucket
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the oracle recomputes the identical signed-counter vector (sign =
    // parity of the 60-bit MD5 prefix of "i:token", mapped to ±1)
    "sk_ams_f2" ->
      s"""WITH tok AS (SELECT source, unnest($duckToksAll) AS tok
         |  FROM documents),
         |ri AS (SELECT CAST(range AS BIGINT) AS est_i FROM range(0, 8)),
         |sg AS (SELECT source, est_i,
         |    CAST(('0x' || substr(md5(CAST(est_i AS VARCHAR) || ':' ||
         |      tok), 1, 15)) AS BIGINT) % 2 * 2 - 1 AS s
         |  FROM tok CROSS JOIN ri)
         |SELECT source, est_i, CAST(sum(s) AS BIGINT) AS z
         |FROM sg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // merge == retrain for linear signed counters: the oracle IS the
    // full-corpus counter vector
    "sk_ams_incr" ->
      s"""WITH tok AS (SELECT source, unnest($duckToksAll) AS tok
         |  FROM documents),
         |ri AS (SELECT CAST(range AS BIGINT) AS est_i FROM range(0, 8)),
         |sg AS (SELECT source, est_i,
         |    CAST(('0x' || substr(md5(CAST(est_i AS VARCHAR) || ':' ||
         |      tok), 1, 15)) AS BIGINT) % 2 * 2 - 1 AS s
         |  FROM tok CROSS JOIN ri)
         |SELECT source, est_i, CAST(sum(s) AS BIGINT) AS z
         |FROM sg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // top-10 per source by (CMS estimate desc, token asc) over every
    // distinct candidate token
    "sk_cms_topk" ->
      s"""WITH tok AS (SELECT source, unnest($duckToksAll) AS tok
         |  FROM documents),
         |rj AS (SELECT CAST(range AS BIGINT) AS row_j FROM range(0, 4)),
         |cells AS (SELECT source, rj.row_j,
         |    CAST(('0x' || substr(md5(CAST(rj.row_j AS VARCHAR) || ':' ||
         |      tok), 1, 15)) AS BIGINT) % 256 AS bucket
         |  FROM tok CROSS JOIN rj),
         |sk AS (SELECT source, row_j, bucket, count(*) AS cnt
         |  FROM cells GROUP BY 1, 2, 3),
         |probe AS (SELECT DISTINCT source, tok FROM tok),
         |pc AS (SELECT p.source, p.tok, rj.row_j,
         |    CAST(('0x' || substr(md5(CAST(rj.row_j AS VARCHAR) || ':' ||
         |      p.tok), 1, 15)) AS BIGINT) % 256 AS bucket
         |  FROM probe p CROSS JOIN rj),
         |est AS (SELECT pc.source, pc.tok,
         |    CAST(min(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
         |  FROM pc LEFT JOIN sk ON sk.source = pc.source
         |    AND sk.row_j = pc.row_j AND sk.bucket = pc.bucket
         |  GROUP BY 1, 2)
         |SELECT source, CAST(rk AS BIGINT) AS rank, tok, est FROM (
         |  SELECT source, tok, est, row_number() OVER (
         |    PARTITION BY source ORDER BY est DESC, tok) AS rk FROM est)
         |WHERE rk <= 10 ORDER BY source, rank""".stripMargin,

    // merge == retrain for linear counters: the oracle IS the
    // full-corpus grid
    "sk_cms_incr" ->
      s"""WITH tok AS (SELECT source, unnest($duckToksAll) AS tok
         |  FROM documents),
         |rj AS (SELECT CAST(range AS BIGINT) AS row_j FROM range(0, 4)),
         |cells AS (SELECT source, rj.row_j,
         |    CAST(('0x' || substr(md5(CAST(rj.row_j AS VARCHAR) || ':' ||
         |      tok), 1, 15)) AS BIGINT) % 256 AS bucket
         |  FROM tok CROSS JOIN rj)
         |SELECT source, row_j, CAST(bucket AS BIGINT) AS bucket,
         |  count(*) AS cnt
         |FROM cells GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "corpus_overlap" ->
      s"""WITH tok AS (SELECT source AS grp, $duckToksAll AS tk
         |  FROM documents),
         |g0 AS (SELECT grp, unnest(list_transform(
         |    range(1, CASE WHEN len(tk) >= 2 THEN len(tk) - 1 ELSE 0 END + 1),
         |    i -> tk[i] || ' ' || tk[i + 1])) AS gram FROM tok),
         |g AS (SELECT DISTINCT grp, gram FROM g0),
         |sz AS (SELECT grp, count(*) AS sz FROM g GROUP BY 1),
         |iv AS (SELECT a.grp AS sa, b.grp AS sb, count(*) AS n_common
         |  FROM g a JOIN g b ON a.gram = b.gram AND a.grp < b.grp
         |  GROUP BY 1, 2)
         |SELECT iv.sa AS source_a, iv.sb AS source_b,
         |  CAST(iv.n_common AS BIGINT) AS n_common,
         |  CAST(za.sz + zb.sz - iv.n_common AS BIGINT) AS n_union
         |FROM iv JOIN sz za ON za.grp = iv.sa JOIN sz zb ON zb.grp = iv.sb
         |ORDER BY source_a, source_b""".stripMargin,
  )
}
