package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Multimodal, Pq, Sampling, Similarity, Temporal, TextAnalysis}
import ScaleShared._

/** Streaming maintenance family: micro-batch dedup, CMS/HLL/AMS
  * sketch upkeep, PQ index append + drift-triggered retrain — each the
  * committed-batch / commit-marker shape with a full-corpus oracle.
  *
  * Mechanically split out of the former single-file ScaleQueries registry;
  * each family owns its queries AND their DuckDB oracle SQL. */
object StreamScaleQueries {

  val queries: Map[String, QF] = Map(
    // Streaming corpus dedup driven as two batches (history priority = id
    // order here, so the folded result equals global exact survivors —
    // the composition property PropertySpec proves; threshold > 1 disables
    // the fuzzy drop so the oracle stays exact-only, while the near path
    // is oracle-covered by dedup_incr_minhash and spec-covered end-to-end)
    "st_stream_dedup" -> ((s, d) => {
      val corpus = java.nio.file.Files.createTempDirectory("graft_sdq_c").toString
      val state = java.nio.file.Files.createTempDirectory("graft_sdq_s").toString
      val dd = docs(s, d).select("doc_id", "text")
      graft.streaming.StreamDedup.applyBatch(s,
        dd.filter(col("doc_id") < 250), 0L, "doc_id", "text",
        corpus, state, jaccardThreshold = 1.1)
      graft.streaming.StreamDedup.applyBatch(s,
        docsWithDups(s, d).filter(col("doc_id") >= 250), 1L, "doc_id", "text",
        corpus, state, jaccardThreshold = 1.1)
      // the manifest-aware reader (identical rows; required once a
      // compaction has mixed base=/batch= dirs under the corpus root)
      graft.streaming.StreamDedup.currentCorpus(s, corpus, state)
        .select("doc_id").orderBy("doc_id")
    }),

    // Streaming CMS maintenance: two micro-batches fold into per-batch
    // grids (linear counters — no read-modify-write state), a replayed
    // batch short-circuits on its commit marker, and the live sketch is
    // the cell-wise sum over committed grids — which must equal the
    // full-corpus grid the oracle recomputes
    "st_cms_update" -> ((s, d) => {
      val grid = java.nio.file.Files.createTempDirectory("graft_scm_g").toString
      val state = java.nio.file.Files.createTempDirectory("graft_scm_s").toString
      // occurrence rows off the session-memoized tokenized-docs frame
      // (perf-only; the oracle re-tokenizes from the raw table)
      val occ = tokenizedDocs(s, d).select(col("doc_id"), col("source"),
        explode(col("tk")).as("tok"))
      def tokOf(pred: org.apache.spark.sql.Column) =
        occ.filter(pred).select("source", "tok")
      graft.streaming.StreamSketch.applyBatch(s,
        tokOf(col("doc_id") < 250), 0L, "source", "tok",
        grid, state, depth = 4, width = 256)
      graft.streaming.StreamSketch.applyBatch(s,
        tokOf(col("doc_id") >= 250), 1L, "source", "tok",
        grid, state, depth = 4, width = 256)
      // at-least-once replay of a committed batch must be a no-op
      val replay = graft.streaming.StreamSketch.applyBatch(s,
        tokOf(col("doc_id") >= 250), 1L, "source", "tok",
        grid, state, depth = 4, width = 256)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamSketch.currentSketch(s, grid, state)
        .select(col("grp").as("source"),
          col("row_j").cast("long").as("row_j"), col("bucket"), col("cnt"))
        .orderBy("source", "row_j", "bucket")
    }),

    // Streaming AMS maintenance: per-batch signed-counter vectors summed
    // at read time must equal the full-corpus vector (linear counters —
    // the st_cms_update contract for the F2/repetition-mass monitor)
    "st_ams_update" -> ((s, d) => {
      val grid = java.nio.file.Files.createTempDirectory("graft_sam_g").toString
      val state = java.nio.file.Files.createTempDirectory("graft_sam_s").toString
      // occurrence rows off the session-memoized tokenized-docs frame
      // (perf-only; the oracle re-tokenizes from the raw table)
      val occ = tokenizedDocs(s, d).select(col("doc_id"), col("source"),
        explode(col("tk")).as("tok"))
      def tokOf(pred: org.apache.spark.sql.Column) =
        occ.filter(pred).select("source", "tok")
      graft.streaming.StreamSketch.applyAmsBatch(s,
        tokOf(col("doc_id") < 250), 0L, "source", "tok",
        grid, state, r = 8)
      graft.streaming.StreamSketch.applyAmsBatch(s,
        tokOf(col("doc_id") >= 250), 1L, "source", "tok",
        grid, state, r = 8)
      val replay = graft.streaming.StreamSketch.applyAmsBatch(s,
        tokOf(col("doc_id") >= 250), 1L, "source", "tok",
        grid, state, r = 8)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamSketch.currentAms(s, grid, state)
        .select(col("grp").as("source"),
          col("est_i").cast("long").as("est_i"), col("z"))
        .orderBy("source", "est_i")
    }),

    // Streaming HLL distinct-count maintenance: per-batch mergeable
    // sketch states union to the live estimate (the sk_hll_rollup
    // two-level pattern kept fresh by a stream); gate = exact per-group
    // distinct + the within-10% accuracy verdict, both DuckDB-derivable
    "st_hll_update" -> ((s, d) => {
      val grid = java.nio.file.Files.createTempDirectory("graft_shl_g").toString
      val state = java.nio.file.Files.createTempDirectory("graft_shl_s").toString
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"))
      graft.streaming.StreamSketch.applyHllBatch(s,
        li.filter(col("l_orderkey") % 2 === 0), 0L, "l_returnflag",
        "l_orderkey", grid, state)
      graft.streaming.StreamSketch.applyHllBatch(s,
        li.filter(col("l_orderkey") % 2 =!= 0), 1L, "l_returnflag",
        "l_orderkey", grid, state)
      val replay = graft.streaming.StreamSketch.applyHllBatch(s,
        li.filter(col("l_orderkey") % 2 =!= 0), 1L, "l_returnflag",
        "l_orderkey", grid, state)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_cnt"))
      graft.streaming.StreamSketch.currentDistinct(s, grid, state)
        .withColumnRenamed("grp", "l_returnflag")
        .join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_cnt"),
          (abs(col("approx") - col("exact_cnt")) <=
            col("exact_cnt") * 0.1).as("within_10pct"))
        .orderBy("l_returnflag")
    }),

    // Streaming index maintenance: bootstrap batch trains + publishes the
    // codebook (versioned state), the second batch encodes against it
    // frozen and appends idempotently — the oracle independently retrains
    // on the bootstrap ids and encodes the whole corpus, proving the
    // stream's code table equals a from-scratch build
    "st_index_update" -> ((s, d) => {
      val codes = java.nio.file.Files.createTempDirectory("graft_si_c").toString
      val state = java.nio.file.Files.createTempDirectory("graft_si_s").toString
      val e = emb(s, d).select("vec_id", "embedding")
      graft.streaming.StreamIndex.applyBatch(s,
        e.filter(col("vec_id") < 250), 0L, "vec_id", "embedding",
        codes, state)
      graft.streaming.StreamIndex.applyBatch(s,
        e.filter(col("vec_id") >= 250), 1L, "vec_id", "embedding",
        codes, state)
      s.read.parquet(codes)
        .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
          col("code"))
        .orderBy("vec_id", "subspace")
    }),

    // Drift-triggered PQ retraining end-to-end: bootstrap trains on the
    // label-0 region; the second batch is every other cluster SCALED by
    // exactly 2 (a deterministic distribution-shift proxy — x*2 is exact
    // in IEEE float AND double, so both engines see bit-identical drifted
    // vectors), whose err/n is far beyond 1.5x the stored training
    // baseline — the state machine MUST publish codebook v2 and encode
    // that batch, and only it, under v2 (history keeps its v1 codes
    // untouched). The requires make a silent non-trigger fail the gate
    // loudly instead of shipping v1-encoded rows the oracle would reject
    "st_index_retrain" -> ((s, d) => {
      val codes = java.nio.file.Files.createTempDirectory("graft_sr_c").toString
      val state = java.nio.file.Files.createTempDirectory("graft_sr_s").toString
      val e = emb(s, d).select("vec_id", "embedding", "label")
      val r0 = graft.streaming.StreamIndex.applyBatch(s,
        e.filter(col("label") === 0).select("vec_id", "embedding"),
        0L, "vec_id", "embedding", codes, state, retrainFactorPct = 150)
      val r1 = graft.streaming.StreamIndex.applyBatch(s,
        e.filter(col("label") =!= 0).select(col("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")),
        1L, "vec_id", "embedding", codes, state, retrainFactorPct = 150)
      require(r0.bootstrapped && !r0.retrained && r0.cbVersion == 1,
        s"bootstrap state machine broke: $r0")
      require(r1.retrained && r1.cbVersion == 2,
        s"drift batch did not trigger retraining: $r1")
      s.read.parquet(codes)
        .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
          col("code"), col("cb_version").cast("long").as("cb_version"))
        .orderBy("vec_id", "subspace")
    }),

    // Streaming KMV maintenance (completing the CMS/HLL/AMS streaming
    // trio): per-batch bottom-64 grids, kind-scoped commit markers, and
    // the read-time bottom-k rollup must equal the batch-at-once sketch
    // of the whole corpus (bottom-k mergeability is exact — the k
    // smallest of a union are among each side's k smallest)
    "st_kmv_update" -> ((s, d) => {
      val grid = java.nio.file.Files.createTempDirectory("graft_skv_g").toString
      val state = java.nio.file.Files.createTempDirectory("graft_skv_s").toString
      val dd = docs(s, d)
      graft.streaming.StreamSketch.applyKmvBatch(s,
        dd.filter(col("doc_id") < 250), 0L, "source", "text",
        grid, state, k = 64)
      graft.streaming.StreamSketch.applyKmvBatch(s,
        dd.filter(col("doc_id") >= 250), 1L, "source", "text",
        grid, state, k = 64)
      // at-least-once replay of a committed batch must be a no-op
      val replay = graft.streaming.StreamSketch.applyKmvBatch(s,
        dd.filter(col("doc_id") >= 250), 1L, "source", "text",
        grid, state, k = 64)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamSketch.currentKmv(s, grid, state, 64)
        .select(col("grp").as("source"), col("h"),
          col("rank").cast("long").as("rank"))
        .orderBy("source", "rank")
    }),

    // Streaming corpus-quality monitor: per-batch integer quality
    // numerators (docs/tokens/chars/stopwords per source) summed at read
    // time must equal the full-corpus aggregates — linear counters, the
    // st_cms_update contract for the curation drift signal
    // Streaming DoReMi: two loss batches (split mid-corpus) land their
    // per-source partial grids under commit markers, a committed-batch
    // replay must short-circuit, and the live controller's weights must
    // equal batch-at-once doremiWeights over the whole corpus. The
    // per-doc stats come from ONE pinned proxy LM (merge == retrain
    // requires the frozen model; the full-corpus LM here plays that role)
    "st_doremi_update" -> ((s, d) => {
      val grid = java.nio.file.Files.createTempDirectory("graft_dm_g").toString
      val state = java.nio.file.Files.createTempDirectory("graft_dm_s").toString
      val dd = docs(s, d)
      val stats = graft.io.Materialize(
        TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
          TextAnalysis.bigramLm(dd, "text")))
      def land(pred: org.apache.spark.sql.Column, id: Long) = {
        val b = stats.filter(pred)
        graft.streaming.StreamSketch.applyDoremiBatch(s,
          Sampling.doremiState(b, dd, "doc_id", "source"), b.count(), id,
          grid, state)
      }
      land(col("doc_id") < 250, 0L)
      land(col("doc_id") >= 250, 1L)
      val replay = land(col("doc_id") >= 250, 1L)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      val w = graft.streaming.StreamSketch.currentDoremiWeights(s, grid,
        state)
      val rows = w.select("source", "w_nano").collect()
      if (rows.nonEmpty) OracleLits.put("doremi_st_w",
        rows.sortBy(_.getString(0)).map(r =>
          s"(${OracleLits.sqlStr(r.getString(0))}, " +
            s"CAST(${r.getLong(1)} AS BIGINT), " +
            s"${graft.scale.Sampling.DefaultEtaMicro})")
          .mkString("(VALUES ", ", ",
            ") AS t(source, w_nano, eta_micro)"))
      w.orderBy("source")
    }),

    "st_quality_update" -> ((s, d) => {
      val grid = java.nio.file.Files.createTempDirectory("graft_sq_g").toString
      val state = java.nio.file.Files.createTempDirectory("graft_sq_s").toString
      val dd = docs(s, d)
      graft.streaming.StreamSketch.applyQualityBatch(s,
        dd.filter(col("doc_id") < 250), 0L, "source", "text", grid, state)
      graft.streaming.StreamSketch.applyQualityBatch(s,
        dd.filter(col("doc_id") >= 250), 1L, "source", "text", grid, state)
      val replay = graft.streaming.StreamSketch.applyQualityBatch(s,
        dd.filter(col("doc_id") >= 250), 1L, "source", "text", grid, state)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamSketch.currentQuality(s, grid, state)
        .select(col("grp").as("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_stopwords"))
        .orderBy("source")
    }),

    // Streaming repeated-window detection: batch 0 lands the corpus,
    // batch 1 lands the duplicated head (+10000) — every repeat pair
    // STRADDLES the batch boundary, so only the cross-batch fingerprint
    // store can flag them; the live detector must equal batch-at-once
    // crossDocRepeats on the union (the dedup_cross_repeats oracle,
    // verbatim)
    // Streaming SCD2: three change batches split by event_id mod 3 — each
    // batch carries timestamps interleaved with the others', so every key
    // sees out-of-order arrivals; the live dimension must still equal
    // batch-at-once versioning of the union (the oracle)
    "st_scd2_update" -> ((s, d) => {
      val store = java.nio.file.Files.createTempDirectory("graft_s2_w").toString
      val state = java.nio.file.Files.createTempDirectory("graft_s2_s").toString
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      for (b <- 0 to 2)
        graft.streaming.StreamScd2.applyBatch(s,
          ev.filter(pmod(col("event_id"), lit(3)) === b), b.toLong,
          "user_id", "ts", "event_id", "event_type", store, state)
      // at-least-once replay of a committed batch must be a no-op
      val replay = graft.streaming.StreamScd2.applyBatch(s,
        ev.filter(pmod(col("event_id"), lit(3)) === 1), 1L,
        "user_id", "ts", "event_id", "event_type", store, state)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamScd2.currentDimension(s, store, state)
        .select(col("key").as("user_id"), col("version"),
          col("attr").as("state"),
          unix_micros(col("effective_from")).as("from_micros"),
          unix_micros(col("effective_to")).as("to_micros"),
          col("is_current"))
        .orderBy("user_id", "version")
    }),

    // Streaming segment dedup: the id<250 head lands as batch 0, the rest
    // plus a full duplicate copy as batch 1 (monotone ids), a replay of
    // the committed batch must no-op, and the union of cleaned batches
    // must equal batch-at-once segmentDedup over the whole corpus (the
    // dedup_segments oracle verbatim)
    "st_segment_dedup_update" -> ((s, d) => {
      val corpus = java.nio.file.Files.createTempDirectory("graft_sg_c").toString
      val state = java.nio.file.Files.createTempDirectory("graft_sg_s").toString
      val dd = docs(s, d).select("doc_id", "text")
      graft.streaming.StreamSegmentDedup.applyBatch(s,
        dd.filter(col("doc_id") < 250), 0L, "doc_id", "text",
        corpus, state, segTokens = 10)
      val b1 = dd.filter(col("doc_id") >= 250)
        .unionByName(dd.withColumn("doc_id", col("doc_id") + 10000))
      graft.streaming.StreamSegmentDedup.applyBatch(s, b1, 1L,
        "doc_id", "text", corpus, state, segTokens = 10)
      val replay = graft.streaming.StreamSegmentDedup.applyBatch(s, b1, 1L,
        "doc_id", "text", corpus, state, segTokens = 10)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamSegmentDedup.currentCorpus(s, corpus, state)
        .orderBy("doc_id")
    }),

    // Streaming chunk-dedup map maintenance: batch 0 lands, COMPACTS into
    // a pre-merged base, batch 1 (a full duplicate copy) lands on top, a
    // replay of the committed batch must no-op, and the live merge-on-read
    // map must equal batch-at-once chunkDedupMap over the union corpus
    // (same oracle as tx_chunk_dedup)
    "st_chunk_dedup_update" -> ((s, d) => {
      val store = java.nio.file.Files.createTempDirectory("graft_cd_w").toString
      val state = java.nio.file.Files.createTempDirectory("graft_cd_s").toString
      val dd = docs(s, d).select("doc_id", "text")
      graft.streaming.StreamChunkDedup.applyBatch(s, dd, 0L,
        "doc_id", "text", store, state, chunkTokens = 12, strideTokens = 8)
      val c = graft.streaming.StreamChunkDedup.compact(s, store, state)
      require(!c.skipped && c.foldedNow == 1, s"compaction surprised: $c")
      val dup = dd.withColumn("doc_id", col("doc_id") + 10000)
      graft.streaming.StreamChunkDedup.applyBatch(s, dup, 1L,
        "doc_id", "text", store, state, chunkTokens = 12, strideTokens = 8)
      val replay = graft.streaming.StreamChunkDedup.applyBatch(s, dup, 1L,
        "doc_id", "text", store, state, chunkTokens = 12, strideTokens = 8)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamChunkDedup.currentMap(s, store, state)
        .orderBy("chunk_hash")
    }),

    "st_crossdoc_update" -> ((s, d) => {
      val store = java.nio.file.Files.createTempDirectory("graft_sr_w").toString
      val state = java.nio.file.Files.createTempDirectory("graft_sr_s").toString
      val dd = docs(s, d).select("doc_id", "text")
      graft.streaming.StreamRepeats.applyBatch(s, dd, 0L,
        "doc_id", "text", store, state, windowTokens = 8)
      val dup = dd.filter(col("doc_id") < 250)
        .withColumn("doc_id", col("doc_id") + 10000)
      graft.streaming.StreamRepeats.applyBatch(s, dup, 1L,
        "doc_id", "text", store, state, windowTokens = 8)
      // at-least-once replay of a committed batch must be a no-op
      val replay = graft.streaming.StreamRepeats.applyBatch(s, dup, 1L,
        "doc_id", "text", store, state, windowTokens = 8)
      require(replay.replaySkipped, "committed batch replay was not skipped")
      graft.streaming.StreamRepeats.currentRepeats(s, store, state,
          minDocs = 2)
        .orderBy("doc_id")
    }),
  )

  // a def, not a val: registry-aware entries read OracleLits fragments
  // that the query functions register as they run (Verify dumps oracle
  // SQL AFTER running every query)
  def oracles: Map[String, String] = Map(
    // streamed cleaned batches union to batch-at-once segmentDedup over
    // everything that arrived — the dedup_segments SQL verbatim
    "st_segment_dedup_update" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents),
         |tok AS (SELECT doc_id, $duckToksAll AS tk FROM u),
         |seg AS (SELECT doc_id, pos, array_to_string(
         |    list_slice(tk, (pos - 1) * 10 + 1, (pos - 1) * 10 + 10), ' ') AS seg
         |  FROM tok, LATERAL (SELECT unnest(range(1,
         |    CAST(ceil(len(tk) / 10.0) AS INT) + 1)) AS pos) p
         |  WHERE len(tk) > 0),
         |keep AS (SELECT doc_id, pos, seg FROM (
         |  SELECT doc_id, pos, seg, row_number() OVER (
         |    PARTITION BY seg ORDER BY doc_id, pos) AS rn FROM seg)
         |  WHERE rn = 1)
         |SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text
         |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // streamed partial chunk maps (with a compaction in between) merge to
    // the batch-at-once embed-once map — the tx_chunk_dedup SQL verbatim
    "st_chunk_dedup_update" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents),
         |${TextQueries.chunkWindowCtes},
         |h AS (SELECT doc_id, chunk_idx, md5(chunk_text) AS chunk_hash
         |  FROM cw),
         |m AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_occ,
         |    min(doc_id * 1048576 + chunk_idx) AS rk
         |  FROM h GROUP BY 1)
         |SELECT chunk_hash, n_occ,
         |  CAST(rk // 1048576 AS BIGINT) AS rep_doc_id,
         |  CAST(rk % 1048576 AS BIGINT) AS rep_chunk_idx
         |FROM m ORDER BY chunk_hash""".stripMargin,

    // two exact-only stream batches in id order fold to the global
    // survivor set (same SQL shape as dedup_survivors)
    "st_stream_dedup" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents)
        |SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |    ORDER BY doc_id) AS rn FROM u)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // streamed AMS vectors summed == the full-corpus signed counters
    "st_ams_update" ->
      s"""WITH tok AS (SELECT source, unnest($duckToksAll) AS tok
         |  FROM documents),
         |ri AS (SELECT CAST(range AS BIGINT) AS est_i FROM range(0, 8)),
         |sg AS (SELECT source, est_i,
         |    CAST(('0x' || substr(md5(CAST(est_i AS VARCHAR) || ':' ||
         |      tok), 1, 15)) AS BIGINT) % 2 * 2 - 1 AS s
         |  FROM tok CROSS JOIN ri)
         |SELECT source, est_i, CAST(sum(s) AS BIGINT) AS z
         |FROM sg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // streamed HLL states unioned must estimate within 10% of exact
    "st_hll_update" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_cnt,
        |  TRUE AS within_10pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // streamed grids cell-wise-summed == the full-corpus grid
    "st_cms_update" ->
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

    // the stream's batches (bootstrap <250 trains; ≥250 encodes frozen)
    // must together equal a from-scratch encode under the same codebook
    "st_index_update" -> {
      val hist = "(SELECT vec_id FROM embeddings WHERE vec_id < 250)"
      s"""WITH ${pqCtesTrainedOn(hist)},
         |$pqEncodeCte
         |SELECT vec_id, CAST(subspace AS BIGINT) AS subspace, code
         |FROM enc ORDER BY vec_id, subspace""".stripMargin
    },

    // the retrain state machine's code table: batch 0 (label-0 region)
    // encoded under codebook A trained on itself (cb_version 1); the
    // drift batch (all other labels) under codebook B trained on ITSELF
    // (cb_version 2) — the oracle re-derives BOTH codebooks and their
    // per-batch assignments; the engine-side requires guarantee the
    // trigger actually fired, so an un-triggered run can never
    // accidentally match
    "st_index_retrain" -> {
      val a = "(SELECT vec_id FROM embeddings WHERE label = 0)"
      val b = "(SELECT vec_id FROM embeddings WHERE label <> 0)"
      def encUnder(src: String, base: String, sfx: String,
          ver: Int): String =
        s"""SELECT vec_id, subspace, label AS code, $ver AS v FROM (
           |  SELECT v.vec_id, v.subspace, c.label, row_number() OVER (
           |    PARTITION BY v.vec_id, v.subspace ORDER BY
           |      list_sum(list_transform(range(1, len(v.subvec) + 1),
           |        i -> (v.subvec[i] - c.cl[i]) * (v.subvec[i] - c.cl[i]))),
           |      c.label) AS rn
           |  FROM $base v JOIN $src t ON t.vec_id = v.vec_id
           |  JOIN cl2$sfx c ON c.subspace = v.subspace) WHERE rn = 1"""
          .stripMargin
      s"""WITH $pqSharedCtes,
         |sv2 AS (SELECT vec_id, subspace,
         |  list_transform(subvec, x -> x * 2.0) AS subvec FROM sv),
         |${pqTrainCtes(a, "_a")},
         |${pqTrainCtes(b, "_b", base = "sv2")}
         |SELECT vec_id, CAST(subspace AS BIGINT) AS subspace, code,
         |  CAST(v AS BIGINT) AS cb_version
         |FROM (${encUnder(a, "sv", "_a", 1)}
         |  UNION ALL ${encUnder(b, "sv2", "_b", 2)})
         |ORDER BY vec_id, subspace""".stripMargin
    },

    // the streamed bottom-k rollup == the batch-at-once full-corpus
    // sketch (the sk_kmv_incr oracle — bottom-64 of the 60-bit MD5-prefix
    // hash per source)
    "st_kmv_update" ->
      """WITH hv AS (SELECT DISTINCT source AS grp,
        |  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT grp AS source, h, CAST(rk AS BIGINT) AS rank
        |FROM (SELECT grp, h, row_number() OVER (
        |  PARTITION BY grp ORDER BY h) AS rk FROM hv)
        |WHERE rk <= 64 ORDER BY source, rank""".stripMargin,

    // streamed quality counters summed == full-corpus aggregates (the
    // tx_quality_features numerators, grouped by source)
    // live streamed controller == batch-at-once DoReMi over the union —
    // identical CTEs to samp_doremi_weights, lit key from the STREAMED path
    "st_doremi_update" -> {
      val w = OracleLits.get("doremi_st_w")
        .getOrElse("(VALUES ('__none__', CAST(0 AS BIGINT), 100000)) " +
          "AS t(source, w_nano, eta_micro)")
      s"""WITH ${TextQueries.lmStatsCtes},
         |per AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(neg_logp_sum_micro) AS BIGINT) AS sn,
         |    CAST(sum(n_bigrams) AS BIGINT) AS sum_n_bigrams
         |  FROM stats JOIN documents d USING (doc_id) GROUP BY 1),
         |tot AS (SELECT CAST(sum(sn) AS BIGINT) AS tn,
         |    CAST(sum(sum_n_bigrams) AS BIGINT) AS tb FROM per),
         |ww AS (SELECT * FROM $w),
         |wt AS (SELECT CAST(sum(w_nano) AS BIGINT) AS wtot FROM ww),
         |x AS (SELECT per.source, per.n_docs, per.sum_n_bigrams,
         |    CAST(sn // sum_n_bigrams AS BIGINT) AS ce_micro,
         |    CAST(greatest(sn // sum_n_bigrams - tn // tb, 0) AS BIGINT)
         |      AS excess_micro,
         |    ww.w_nano
         |  FROM per JOIN ww ON per.source = ww.source CROSS JOIN tot)
         |SELECT source, n_docs, sum_n_bigrams, ce_micro, excess_micro,
         |  CAST(w_nano AS BIGINT) AS w_nano,
         |  CAST((10000 * w_nano) // wtot AS BIGINT) AS weight_bp
         |FROM x CROSS JOIN wt ORDER BY source""".stripMargin
    },

    "st_quality_update" ->
      """WITH f AS (SELECT source,
        |  list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')
        |    AS tk,
        |  CAST(length(text) AS BIGINT) AS nc FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
        |  CAST(sum(nc) AS BIGINT) AS n_chars,
        |  CAST(sum(len(list_filter(tk, w -> w IN
        |    ('the','a','of','and','in','to','is')))) AS BIGINT)
        |    AS n_stopwords
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // batch-at-once crossDocRepeats over the union corpus — the
    // dedup_cross_repeats oracle's exact shape (the streamed store must
    // reproduce it although every repeat pair straddles the batches)
    // streamed change batches (any split, any order) == batch-at-once
    // scd2 on the union — the oracle IS the scd2_intervals formulation
    "st_scd2_update" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev IS NULL OR prev != event_type),
        |v AS (SELECT user_id, event_type AS state, ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS version,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_ts
        |  FROM ch)
        |SELECT user_id, CAST(version AS BIGINT) AS version, state,
        |  epoch_us(ts) AS from_micros, epoch_us(to_ts) AS to_micros,
        |  (to_ts IS NULL) AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    "st_crossdoc_update" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents
         |  WHERE doc_id < 250),
         |tk AS (SELECT doc_id, $duckToksAll AS tk FROM u),
         |wins AS (SELECT doc_id, md5(array_to_string(tk[i:i+7], ' ')) AS fp
         |  FROM tk, LATERAL (SELECT unnest(range(1, len(tk) - 6)) AS i) t),
         |rep AS (SELECT fp FROM wins GROUP BY fp
         |  HAVING count(DISTINCT doc_id) >= 2),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
         |  FROM wins GROUP BY doc_id),
         |flg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_repeated
         |  FROM wins WHERE fp IN (SELECT fp FROM rep) GROUP BY doc_id)
         |SELECT u.doc_id,
         |  CAST(coalesce(tot.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(flg.n_repeated, 0) AS BIGINT) AS n_repeated
         |FROM u LEFT JOIN tot USING (doc_id) LEFT JOIN flg USING (doc_id)
         |ORDER BY u.doc_id""".stripMargin,
  )
}
