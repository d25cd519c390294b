package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Multimodal, Pq, Sampling, Similarity, Temporal, TextAnalysis}
import ScaleShared._

/** Pipeline + multimodal + layout family: curation chain, provenance,
  * pre-training mix, payload plumbing, Z-order layout, as-of/range joins.
  *
  * Mechanically split out of the former single-file ScaleQueries registry;
  * each family owns its queries AND their DuckDB oracle SQL. */
object PipelineQueries {

  // CDC chunk-boundary CTE stack over a preceding `u(id, text)` CTE: the
  // 16-byte-window Rabin hash as 16 lag()s per byte row, cut where it
  // masks to zero (avg 64 B), forced final cut. Ends with
  // `ch`(id, text, c struct{idx, s, e}) — one row per chunk. Shared by
  // mm_cdc_chunks and mm_cdc_neardup.
  private lazy val cdcChunkCtes: String = {
    val horner = (14 to 0 by -1).foldLeft(
      "lag(v, 15) OVER (PARTITION BY id ORDER BY pos)") { (acc, k) =>
      s"(($acc) * 33 + lag(v, $k) OVER (PARTITION BY id ORDER BY pos))" +
        " % 2147483648"
    }
    s"""b AS (SELECT id, i AS pos, strlen(text) AS n,
       |    (ascii(substr(text, CAST(i AS INT), 1)) * 2654435761)
       |      % 2147483648 AS v
       |  FROM u,
       |    LATERAL (SELECT unnest(range(1, strlen(text) + 1)) AS i) t
       |  WHERE strlen(text) > 0),
       |h AS (SELECT id, pos, n, $horner AS h FROM b),
       |e0 AS (SELECT id, max(n) AS n, coalesce(list_sort(
       |    list(pos) FILTER (WHERE pos >= 16 AND h % 64 = 0)),
       |    CAST([] AS BIGINT[])) AS cuts
       |  FROM h GROUP BY id),
       |en AS (SELECT id, n,
       |    CASE WHEN len(cuts) > 0 AND cuts[-1] = n
       |      THEN cuts ELSE list_append(cuts, n) END AS ends
       |  FROM e0),
       |ch AS (SELECT en.id, u.text, unnest(list_transform(
       |    range(1, len(ends) + 1),
       |    i -> struct_pack(idx := i - 1,
       |      s := CASE WHEN i = 1 THEN 1 ELSE ends[CAST(i AS INT) - 1] + 1
       |        END,
       |      e := ends[CAST(i AS INT)]))) AS c
       |  FROM en JOIN u ON en.id = u.id)""".stripMargin
  }

  val queries: Map[String, QF] = Map(
    // Multimodal frame sampling: every stride-th payload byte (the
    // video-frame-subsample plumbing shape, codec-free)
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.asMultimodal(docs(s, d), "doc_id", "text", "source"), 4)
        .select(col("id"), posexplode(col("frame_bytes")))
        .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("byte"))
        .orderBy("id", "pos")),

    // Multimodal resize: byte-axis nearest-neighbor to 16 bytes; digest +
    // tracked size prove the payload→payload reconstruction
    "mm_resize" -> ((s, d) =>
      Multimodal.resizePayload(
        Multimodal.asMultimodal(docs(s, d), "doc_id", "text", "source"), 16)
        .select(col("id"), col("meta.n_bytes").as("n_bytes"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("id")),

    // Multimodal: binary payload + metadata features (no codec needed)
    "mm_payload_features" -> ((s, d) =>
      Multimodal.payloadFeatures(
        Multimodal.asMultimodal(docs(s, d), "doc_id", "text", "source"))
        .orderBy("id")),

    // Multimodal: batched stub decode (mapPartitions plumbing)
    "mm_decode_stub" -> ((s, d) =>
      Multimodal.decodePayloads(
        Multimodal.asMultimodal(docs(s, d), "doc_id", "text", "source"))
        .select("id", "width", "height")
        .orderBy("id")),

    // CDC fingerprints → the shared chunk-overlap pairing: each doc pairs
    // with its one-char-insertion copy at id+10000 (≥50% of the smaller
    // side's CDC chunks survive the edit; fixed-window chunks all shift).
    // The base half's fingerprints ride the session memo — only the
    // edited copy is chunked per run (the maintained-index shape)
    "mm_cdc_neardup" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"), col("text"))
      val edited = base
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", concat(substring(col("text"), 1, 10),
          lit("Z"), expr("substring(text, 11, length(text))")))
      val mmEdited = Multimodal.asMultimodal(
        edited.withColumn("src", lit("mixed")), "doc_id", "text", "src")
      Multimodal.pairsFromFingerprints(
        ScaleShared.cdcBaseFingerprints(s, d).unionByName(
          Multimodal.cdcChunks(mmEdited, maskBits = 6)
            .select("id", "chunk_hash")),
        minFracBp = 5000, maxDocFreq = 50)
        .select(col("a"), col("b"), col("shared").cast("long").as("shared"),
          col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
        .orderBy("a", "b")
    }),

    // Content-defined chunking: boundaries where the running byte hash
    // masks to zero (avg chunk 2^6 = 64 bytes) — insertion-robust chunk
    // fingerprints where fixed windows shift forever after an edit.
    // segBytes=128 forces the multi-segment path (payloads run to ~558
    // bytes) so the gate proves segment-split == unsplit cuts end to end
    "mm_cdc_chunks" -> ((s, d) =>
      Multimodal.cdcChunks(
        Multimodal.asMultimodal(docs(s, d), "doc_id", "text", "source"),
        maskBits = 6, segBytes = 128)
        .orderBy("id", "chunk_idx")),

    // Multimodal chunk-hash near-dup: payload pairs sharing ≥80% of the
    // smaller side's 64-byte chunk fingerprints (boilerplate chunks with
    // doc-freq > 50 dropped before pairing) — the dup'd corpus pairs every
    // original with its byte-identical copy
    "mm_chunk_dedup" -> ((s, d) =>
      Multimodal.chunkDedupPairs(
          Multimodal.asMultimodal(
            docsWithDups(s, d).withColumn("src", lit("mixed")),
            "doc_id", "text", "src"),
          chunkBytes = 64, minFracBp = 8000, maxDocFreq = 50)
        .select(col("a"), col("b"), col("shared").cast("long").as("shared"),
          col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
        .orderBy("a", "b")),

    // Perceptual-hash near-dup: dHash over the canonical byte grid, then
    // banded Hamming pairing (one (band,value)-keyed shuffle, never
    // all-pairs). The corpus is each payload PLUS a re-encoded
    // (resize-to-128) copy at id+10000 — the exact-byte chunk dedup above
    // cannot pair those; the perceptual hash does. Oracle re-derives the
    // signatures from the same byte grid and replays the banding
    "mm_phash_neardup" -> ((s, d) => {
      val mm = Multimodal.asMultimodal(
        docs(s, d).withColumn("src", lit("mixed")), "doc_id", "text", "src")
      val re = Multimodal.resizePayload(mm, 128)
        .select((col("id") + 10000).as("id"), col("payload"), col("meta"))
      Multimodal.phashNearDup(mm.unionByName(re), bits = 60, bands = 6,
          maxHamming = 5)
        .orderBy("id_a", "id_b")
    }),

    // Span-rewrite corpus report: per source, documents and tokens
    // before/after exact-substring span removal — the operational "how
    // much boilerplate did Lee '21 dedup excise, and did any doc vanish"
    // summary a curation run reads before committing the rewrite
    "pipeline_span_stats" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "source", "text")
      val corpus = dd.unionByName(dd.filter(col("doc_id") < 250)
        .withColumn("doc_id", col("doc_id") + 10000))
      val rewritten = Dedup.spanRewrite(corpus, "doc_id", "text", 8, 2)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(lower(col("text")))).cast("long")
            .as("nt_out"))
        .withColumn("__kept", lit(1L))
      corpus.select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(lower(col("text")))).cast("long")
            .as("nt_in"))
        .join(rewritten, Seq("doc_id"), "left_outer")
        .groupBy("source")
        .agg(count(lit(1)).as("docs_in"),
          sum(coalesce(col("__kept"), lit(0L))).as("docs_out"),
          sum(col("nt_in")).as("tokens_in"),
          sum(coalesce(col("nt_out"), lit(0L))).as("tokens_out"))
        .orderBy("source")
    }),

    // The composed curation pipeline: quality gate → lang id → exact dedup →
    // LSH fuzzy dedup w/ component representatives → per-language stats
    // (served from the session curated-corpus memo shared by the three
    // pipeline_* consumers — see ScaleShared.curatedDocs)
    "pipeline_curation" -> ((s, d) =>
      graft.scale.CurationPipeline.stats(curatedDocs(s, d)._1)),

    // The full pre-training data PLAN in one chain: curate (quality gate →
    // lang id → exact dedup → LSH fuzzy dedup) → token counts → per-
    // language repeat/epoch planning under a token budget → integer mix
    // summary. Every stage is oracle-verified on its own; this entry
    // verifies the composition end-to-end (the report a data team reads
    // before launching a run: how much of each language, repeated how
    // often, serving how many tokens)
    "pipeline_pretrain_mix" -> ((s, d) => {
      val kept = curatedDocs(s, d)._1
      val withTok = kept.withColumn("n_tokens",
        size(TextAnalysis.tokens(col("text"))).cast("long"))
      Sampling.repeatEpochs(withTok, "predicted_lang", "doc_id", "n_tokens",
          budgetTokens = 60000L, weightsBp = Map("en" -> 4000),
          defaultBp = 1000)
        .groupBy("predicted_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("corpus_tokens"),
          sum(col("n_tokens") * col("epochs")).as("served_tokens"),
          max("epochs").as("max_epochs"),
          sum(when(col("epochs") === 0L, 1L).otherwise(0L)).as("n_pruned"))
        .orderBy("predicted_lang")
    }),

    // Per-document curation provenance: why each input doc was dropped
    // (quality_fail / exact_dup / near_dup) or kept
    "pipeline_provenance" -> ((s, d) =>
      curatedDocs(s, d)._2.orderBy("doc_id")),

    // Z-order layout clustering: per-row Morton code over quantile-bucket
    // ranks of (l_orderkey, l_partkey) — the multi-column file-skipping
    // layout (OPTIMIZE ZORDER). The sketch cuts are registered for the
    // oracle (engine-specific, same contract as samp_length_decile); the
    // rank CASE and the bit interleave are recomputed in SQL as pure
    // integer arithmetic
    "layout_zorder" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val (cutsA, cutsB, out) = graft.scale.Layout.zOrderValue(
        li, "l_orderkey", "l_partkey", bits = zorderBits)
      OracleLits.put("zorder_ra",
        OracleLits.sqlCase("l_orderkey", cutsA.toSeq, base = 0))
      OracleLits.put("zorder_rb",
        OracleLits.sqlCase("l_partkey", cutsB.toSeq, base = 0))
      out.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("zv")).orderBy("l_orderkey", "l_linenumber")
    }),

    // Round-9 curation capstone: LR quality scorer (+ domain-prior rescue
    // for borderline docs from clean sources) feeding fuzzy benchmark
    // decontamination, reduced to the per-source funnel report — the
    // composed chain, oracle-verified as ONE plan
    "pipeline_quality_v2" -> ((s, d) => {
      val dd = docs(s, d)
      val nanos = TextQueries.lrWeightsMemo(s, d)
      OracleLits.put("lr_weights", nanos.mkString(","))
      val stats = TextAnalysis.qualityFeatures(dd, "text")
      val scored = TextAnalysis.lrScoreNano(dd, "doc_id", "text", nanos)
        .select(col("doc_id"), col("predicted"))
      val prior = broadcast(TextAnalysis.domainPrior(stats, "source",
        TextQueries.lrLabel).select(col("source"), col("pass_bp")))
      val kept = stats.join(scored, "doc_id").join(prior, "source")
        .filter(col("predicted") ||
          (col("pass_bp") >= 5000L && col("n_tokens") >= 40L))
        .select("doc_id", "source", "text", "n_tokens")
      val eval = dd.filter(col("doc_id") < 5)
        .select(col("doc_id").as("eval_id"), col("text"))
      val clean = Dedup.fuzzyDecontaminate(kept, "doc_id", "text",
        eval, "eval_id", "text", k = 16, bands = 4,
        jaccardThreshold = 0.9)
      val inAgg = dd.groupBy("source").agg(count(lit(1)).as("docs_in"))
      val qAgg = kept.groupBy("source")
        .agg(count(lit(1)).as("docs_quality"))
      val fAgg = clean.groupBy("source")
        .agg(count(lit(1)).as("docs_final"),
          sum(col("n_tokens")).as("tokens_final"))
      inAgg.join(qAgg, Seq("source"), "left_outer")
        .join(fAgg, Seq("source"), "left_outer")
        .select(col("source"), col("docs_in").cast("long").as("docs_in"),
          coalesce(col("docs_quality"), lit(0L)).cast("long")
            .as("docs_quality"),
          coalesce(col("docs_final"), lit(0L)).cast("long")
            .as("docs_final"),
          coalesce(col("tokens_final"), lit(0L)).cast("long")
            .as("tokens_final"))
        .orderBy("source")
    }),

    // Range-partition plan: 16 sketch-cut ranges over l_extendedprice with
    // EXACT per-range rows + bp share — the repartitionByRange sizing
    // report; cuts registered for the oracle (the zorder cut contract)
    "layout_range_plan" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem").select("l_extendedprice")
      val (cuts, plan) = graft.scale.Layout.rangePlan(
        li, "l_extendedprice", parts = 16)
      OracleLits.put("range_plan_cuts",
        OracleLits.sqlCase("l_extendedprice", cuts.toSeq, base = 1))
      plan.select(col("partition_id"),
        col("n_rows").cast("long").as("n_rows"),
        col("share_bp").cast("long").as("share_bp"))
        .orderBy("partition_id")
    }),

    // Hilbert-curve layout clustering: the strictly-local sibling of
    // layout_zorder (consecutive indices are always grid neighbors, so a
    // contiguous file range is a CONNECTED region of the key plane) —
    // same rank bucketing, canonical xy→d transform on the ranks
    "layout_hilbert" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val (cutsA, cutsB, out) = graft.scale.Layout.hilbertOrderValue(
        li, "l_orderkey", "l_partkey", bits = zorderBits)
      OracleLits.put("hilbert_ra",
        OracleLits.sqlCase("l_orderkey", cutsA.toSeq, base = 0))
      OracleLits.put("hilbert_rb",
        OracleLits.sqlCase("l_partkey", cutsB.toSeq, base = 0))
      out.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("hv")).orderBy("l_orderkey", "l_linenumber")
    }),

    // Target-file-size write planner: per partition value, measured
    // payload bytes → ceil-div file count (the small-file/giant-file
    // fix, decided from bytes, not partition cardinality); bounded agg,
    // pure int64
    "layout_file_plan" -> ((s, d) =>
      graft.scale.Layout.filePlan(docs(s, d), "source",
        length(col("text")).cast("long"), targetBytes = 3000L)
        .select(col("source"), col("n_rows").cast("long").as("n_rows"),
          col("total_bytes").cast("long").as("total_bytes"),
          col("n_files").cast("long").as("n_files"))
        .orderBy("source")),

    // The plan applied: deterministic id-hash file slots (broadcast plan
    // join, zero extra shuffles) — per-(partition, slot) row/byte loads,
    // the balance a writer actually gets
    "layout_file_slots" -> ((s, d) => {
      val dd = docs(s, d)
      val plan = graft.scale.Layout.filePlan(dd, "source",
        length(col("text")).cast("long"), targetBytes = 3000L)
      graft.scale.Layout.applyFilePlan(dd, "doc_id", "source", plan)
        .groupBy("source", "file_slot")
        .agg(count(lit(1)).as("n_rows"),
          sum(length(col("text")).cast("long")).as("bytes"))
        .select(col("source"), col("file_slot").cast("long").as("file_slot"),
          col("n_rows").cast("long").as("n_rows"),
          col("bytes").cast("long").as("bytes"))
        .orderBy("source", "file_slot")
    }),

    // SCD type-2 dimension build: the per-user event-type change stream
    // compressed into versioned validity intervals (change-only versions,
    // [from, to) edges from the next change, open current row) — history
    // with point-in-time reconstructability; micros int64 on the gate
    "scd2_intervals" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      Temporal.scd2(ev, "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("version"),
          col("event_type").as("state"),
          unix_micros(col("effective_from")).as("from_micros"),
          unix_micros(col("effective_to")).as("to_micros"),
          col("is_current"))
        .orderBy("user_id", "version")
    }),

    // Point-in-time enrichment against the SCD2 dimension: each purchase
    // event picks up the dimension version VALID AT its timestamp (the
    // feature-store / training-data leak-free lookup) — composed as the
    // as-of join on version open edges, which equals interval containment
    "join_scd2_pit" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val dim = Temporal.scd2(
        ev.select(col("user_id"), col("ts"), col("event_id"),
          col("event_type")),
        "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("effective_from").as("ts"),
          col("version").as("dim_version"),
          col("event_type").as("dim_state"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Temporal.asOfJoin(probes, dim, "user_id", "ts",
        Seq("dim_version", "dim_state"))
        .select("event_id", "dim_version", "dim_state")
        .orderBy("event_id")
    }),

    // As-of join: each click → most recent purchase at-or-before, per user
    // (union + carry-forward window — one shuffle, no inequality join)
    "join_asof" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"),
          col("value").as("p_value"))
      Temporal.asOfJoin(clicks, purchases, "user_id", "ts",
        Seq("p_event_id", "p_value"))
        .select("event_id", "p_event_id", "p_value")
        .orderBy("event_id")
    }),

    // Range join: clicks inside each purchase's 12-hour follow-up window,
    // per user (time-bin explode + equi-join — no interval nested loop)
    "join_range" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("int_id"), col("user_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 12 HOURS")).as("end_ts"))
      val probes = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("probe_id"), col("user_id"), col("ts"))
      Temporal.rangeJoin(intervals, probes, "user_id",
        "start_ts", "end_ts", "ts", binMicros = 12L * 3600 * 1000000)
        .select("int_id", "probe_id")
        .orderBy("int_id", "probe_id")
    }),

    // Dataset card v2 (round-11 verdict item 4): the datasheet a shipped
    // corpus leads with — corpus totals (size, token/char volume, source/
    // lang breadth, exact-duplicate mass, max-document outlier) PLUS the
    // per-source × lang composition table a real dataset card opens with
    // (docs, tokens, within-slice exact dups per slice). Two hash
    // aggregations over one narrow projected frame: the total pass (its
    // three COUNT DISTINCTs ride Spark's standard Expand — the frame is
    // ~4 columns, so the 3x expand stays scan-bound) and the grouped
    // slice pass whose output is bounded by sources × langs. Both unpivot
    // to (source, lang, metric, value) via stack, totals under the '*'
    // scope. All integers; ratios (dup share, mean length) are the
    // reader's division. Within-slice dup counts deliberately do NOT sum
    // to the corpus dup count — cross-slice duplicates belong to the
    // total row only.
    "pipeline_dataset_card" -> ((s, d) => {
      val base = docs(s, d)
        .select(col("source"), col("lang"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("__nt"),
          length(col("text")).cast("long").as("__nc"),
          TextAnalysis.fingerprint(col("text")).as("__fp"))
      val totals = base
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("n_tokens"),
          sum(col("__nc")).as("n_chars"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("__fp")).as("n_fp"),
          max(col("__nt")).as("max_doc_tokens"))
        .select(lit("*").as("source"), lit("*").as("lang"), expr(
          "stack(7, 'n_docs', n_docs, 'n_tokens', n_tokens, " +
            "'n_chars', n_chars, 'n_sources', n_sources, " +
            "'n_langs', n_langs, 'exact_dup_docs', n_docs - n_fp, " +
            "'max_doc_tokens', max_doc_tokens) AS (metric, value)"))
      val slices = base
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("n_tokens"),
          countDistinct(col("__fp")).as("n_fp"))
        .select(col("source"), col("lang"), expr(
          "stack(3, 'n_docs', n_docs, 'n_tokens', n_tokens, " +
            "'exact_dup_docs', n_docs - n_fp) AS (metric, value)"))
      totals.unionByName(slices)
        .select(col("source"), col("lang"), col("metric"),
          col("value").cast("long").as("value"))
        .orderBy("source", "lang", "metric")
    }),
  )

  // a def, not a val: registry-aware entries read OracleLits fragments
  // that the query functions register as they run (Verify dumps oracle
  // SQL AFTER running every query)
  def oracles: Map[String, String] = Map(
    "pipeline_dataset_card" ->
      s"""WITH b AS (SELECT source, lang,
         |    CAST(len($duckToksAll) AS BIGINT) AS nt,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(nc) AS BIGINT) AS n_chars,
         |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(count(DISTINCT fp) AS BIGINT) AS n_fp,
         |    CAST(max(nt) AS BIGINT) AS max_doc_tokens FROM b),
         |sl AS (SELECT source, lang,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT fp) AS BIGINT) AS n_fp
         |  FROM b GROUP BY 1, 2)
         |SELECT source, lang, metric, CAST(value AS BIGINT) AS value FROM (
         |  SELECT '*' AS source, '*' AS lang, 'n_docs' AS metric,
         |    n_docs AS value FROM a
         |  UNION ALL SELECT '*', '*', 'n_tokens', n_tokens FROM a
         |  UNION ALL SELECT '*', '*', 'n_chars', n_chars FROM a
         |  UNION ALL SELECT '*', '*', 'n_sources', n_sources FROM a
         |  UNION ALL SELECT '*', '*', 'n_langs', n_langs FROM a
         |  UNION ALL SELECT '*', '*', 'exact_dup_docs', n_docs - n_fp FROM a
         |  UNION ALL SELECT '*', '*', 'max_doc_tokens', max_doc_tokens FROM a
         |  UNION ALL SELECT source, lang, 'n_docs', n_docs FROM sl
         |  UNION ALL SELECT source, lang, 'n_tokens', n_tokens FROM sl
         |  UNION ALL SELECT source, lang, 'exact_dup_docs', n_docs - n_fp
         |    FROM sl)
         |ORDER BY source, lang, metric""".stripMargin,

    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id AS id, text,
        |  greatest(CAST(floor(length(text) / 4) AS INT), 1) AS n
        |  FROM documents)
        |SELECT id, CAST(i AS BIGINT) AS pos,
        |  ascii(substr(text, (i - 1) * 4 + 1, 1)) AS byte
        |FROM f, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t
        |ORDER BY id, pos""".stripMargin,

    // ascii corpus ⇒ substr-by-char == substr-by-byte (same contract as
    // mm_frame_sample's oracle)
    "mm_resize" ->
      """SELECT doc_id AS id,
        |  CAST(CASE WHEN length(text) > 0 THEN 16 ELSE 0 END
        |    AS BIGINT) AS n_bytes,
        |  md5(CASE WHEN length(text) > 0 THEN array_to_string(
        |    list_transform(range(1, 17), i -> substr(text,
        |      CAST(floor((i - 1) * length(text) / 16.0) AS INT) + 1, 1)),
        |    '') ELSE '' END) AS payload_md5
        |FROM documents ORDER BY id""".stripMargin,

    "mm_payload_features" ->
      """SELECT doc_id AS id, 'text' AS modality, source,
        |CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS content_hash
        |FROM documents ORDER BY id""".stripMargin,

    // the 16-byte window hash replayed as 16 lag()s over per-byte rows —
    // deliberately NOT a stateful fold: DuckDB 1.0's list_reduce silently
    // corrupts list accumulators under vectorized batches (verified
    // per-row-correct / batch-wrong), so the operator was shaped windowed
    "mm_cdc_chunks" ->
      s"""WITH u AS (SELECT doc_id AS id, text FROM documents),
         |$cdcChunkCtes
         |SELECT id, CAST(c.idx AS BIGINT) AS chunk_idx,
         |  CAST(c.s AS BIGINT) AS start_pos,
         |  CAST(c.e - c.s + 1 AS BIGINT) AS chunk_len,
         |  md5(substr(text, CAST(c.s AS INT), CAST(c.e - c.s + 1 AS INT)))
         |    AS chunk_hash
         |FROM ch ORDER BY id, chunk_idx""".stripMargin,

    // CDC fingerprints through the shared overlap machinery: every doc
    // pairs with its one-char-insertion copy — fixed windows cannot
    "mm_cdc_neardup" ->
      s"""WITH u AS (SELECT doc_id AS id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000,
         |    substr(text, 1, 10) || 'Z' || substr(text, 11)
         |  FROM documents),
         |$cdcChunkCtes,
         |fp AS (SELECT DISTINCT id,
         |    md5(substr(text, CAST(c.s AS INT), CAST(c.e - c.s + 1 AS INT)))
         |      AS h
         |  FROM ch),
         |nc AS (SELECT id, count(*) AS n FROM fp GROUP BY id),
         |rare AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= 50),
         |fk AS (SELECT fp.id, fp.h FROM fp JOIN rare USING (h)),
         |p AS (SELECT x.id AS a, y.id AS b, count(*) AS shared
         |  FROM fk x JOIN fk y USING (h) WHERE x.id < y.id GROUP BY 1, 2)
         |SELECT p.a, p.b, CAST(p.shared AS BIGINT) AS shared,
         |  CAST(x.n AS BIGINT) AS na, CAST(y.n AS BIGINT) AS nb
         |FROM p JOIN nc x ON p.a = x.id JOIN nc y ON p.b = y.id
         |WHERE p.shared * 10000 >= least(x.n, y.n) * 5000
         |ORDER BY a, b""".stripMargin,

    // chunk boundaries are BYTE offsets on the Spark side; the oracle
    // chunks the VARCHAR by char position — identical for this corpus
    // (ASCII-only, asserted by the n_chars/strlen parity other mm oracles
    // rely on); md5(varchar) hashes the substring's UTF-8 bytes in both
    "mm_chunk_dedup" ->
      """WITH m AS (SELECT doc_id AS id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents),
        |ch AS (SELECT id, list_distinct(list_transform(
        |    range(1, CAST(ceil(strlen(text) / 64.0) AS INT) + 1),
        |    i -> md5(substring(text, CAST((i - 1) * 64 + 1 AS INT), 64)))) AS hs
        |  FROM m WHERE strlen(text) > 0),
        |f AS (SELECT id, unnest(hs) AS h FROM ch),
        |nc AS (SELECT id, len(hs) AS n FROM ch),
        |rare AS (SELECT h FROM f GROUP BY h HAVING count(*) <= 50),
        |fk AS (SELECT f.id, f.h FROM f JOIN rare USING (h)),
        |p AS (SELECT x.id AS a, y.id AS b, count(*) AS shared
        |  FROM fk x JOIN fk y USING (h) WHERE x.id < y.id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.shared AS BIGINT) AS shared,
        |  CAST(x.n AS BIGINT) AS na, CAST(y.n AS BIGINT) AS nb
        |FROM p JOIN nc x ON p.a = x.id JOIN nc y ON p.b = y.id
        |WHERE p.shared * 10000 >= least(x.n, y.n) * 8000
        |ORDER BY a, b""".stripMargin,

    // dHash signatures re-derived from the byte grid (original payloads
    // plus the resize-to-128 re-encode at id+10000 — the same resample
    // index math as the mm_resize oracle), then the 6-band × 10-bit
    // Hamming banding replayed in SQL
    "mm_phash_neardup" ->
      s"""WITH b0 AS (SELECT doc_id AS id,
         |    list_transform(range(1, strlen(text) + 1), j ->
         |      CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT)) AS by,
         |    CAST(strlen(text) AS BIGINT) AS n
         |  FROM documents),
         |b1 AS (SELECT doc_id + 10000 AS id,
         |    CASE WHEN strlen(text) > 0 THEN
         |      list_transform(range(1, 129), j ->
         |        CAST(ascii(substr(text,
         |          CAST(((j - 1) * strlen(text)) // 128 AS INT) + 1, 1))
         |          AS BIGINT))
         |      ELSE CAST([] AS BIGINT[]) END AS by,
         |    CASE WHEN strlen(text) > 0 THEN CAST(128 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS n
         |  FROM documents),
         |ub AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1),
         |${duckDHash60Ctes("ub")},
         |bb AS (SELECT id, ph, b, (ph >> (b * 10)) & 1023 AS bv
         |  FROM sig, (SELECT CAST(unnest(range(0, 6)) AS INT) AS b)),
         |cand AS (SELECT DISTINCT a.id AS id_a, a.ph AS pa,
         |    c.id AS id_b, c.ph AS pb
         |  FROM bb a JOIN bb c ON a.b = c.b AND a.bv = c.bv
         |  WHERE a.id < c.id)
         |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(pa, pb)) <= 5
         |ORDER BY id_a, id_b""".stripMargin,

    "mm_decode_stub" ->
      """WITH b AS (SELECT doc_id AS id, strlen(text) AS n,
        |  list_sum(list_transform(range(1, strlen(text) + 1),
        |    i -> ascii(substr(text, i, 1)))) AS bsum
        |  FROM documents)
        |SELECT id, CAST(n % 640 + 1 AS INT) AS width,
        |  CAST(bsum % 480 + 1 AS INT) AS height
        |FROM b ORDER BY id""".stripMargin,

    // bucket ranks from the registered sketch cuts; the Morton interleave
    // is integer arithmetic (bit i of rank → weight 4^i, b-side doubled)
    // — exact on any engine. Fallback (query never ran): ntile ranks,
    // which approximate the sketch buckets (rows/schema-grade only).
    "layout_zorder" -> {
      // spread derives from the SAME zorderBits the query uses: bit i of
      // the rank lands at weight 4^i (b-side doubled) — a bits bump can
      // not silently truncate the oracle's interleave
      def spread(x: String): String =
        (0 until zorderBits).map { i =>
          val div = 1 << i
          s"((($x) // $div) % 2) * ${1L << (2 * i)}"
        }.mkString(" + ")
      val nb = 1 << zorderBits
      val (ra, rb) = (OracleLits.get("zorder_ra"), OracleLits.get("zorder_rb")) match {
        case (Some(a), Some(b)) => (a, b)
        case _ => (s"ntile($nb) OVER (ORDER BY l_orderkey) - 1",
          s"ntile($nb) OVER (ORDER BY l_partkey) - 1")
      }
      s"""WITH r AS (SELECT l_orderkey, l_linenumber, l_partkey,
         |  $ra AS ra, $rb AS rb FROM lineitem)
         |SELECT l_orderkey, l_linenumber, l_partkey,
         |  CAST(${spread("ra")} + 2 * (${spread("rb")}) AS BIGINT) AS zv
         |FROM r ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    // interval containment (from <= ts < to, open current) over the same
    // scd2 CTE stack — the as-of composition must equal it exactly
    "join_scd2_pit" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev IS NULL OR prev != event_type),
        |v AS (SELECT user_id, event_type AS state, ts AS from_ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS version,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_ts
        |  FROM ch),
        |p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, CAST(v.version AS BIGINT) AS dim_version,
        |  v.state AS dim_state
        |FROM p JOIN v ON p.user_id = v.user_id AND v.from_ts <= p.ts
        |  AND (v.to_ts IS NULL OR p.ts < v.to_ts)
        |ORDER BY p.event_id""".stripMargin,

    // the full chain as ONE statement: shared qf/LR CTEs -> rubric prior
    // -> quality keep -> corpus ∪ offset eval -> the established minhash
    // pair chain -> decontaminated funnel per source
    "pipeline_quality_v2" -> {
      val corpus =
        s"""${TextQueries.qfStatsCtes},
           |${TextQueries.lrScoreCtes},
           |pr AS (SELECT d.source,
           |    (10000 * sum(CASE WHEN g.n_tokens >= 45
           |       AND g.n_stopwords * 20 >= g.n_tokens THEN 1 ELSE 0 END))
           |      // count(*) AS pass_bp
           |  FROM g JOIN documents d USING (doc_id) GROUP BY 1),
           |keepq AS (SELECT g.doc_id, d.source, d.text, g.n_tokens
           |  FROM g JOIN documents d USING (doc_id) JOIN m USING (doc_id)
           |    JOIN pr ON d.source = pr.source
           |  WHERE CAST(floor(m.margin * 1000000000.0) AS BIGINT) > 0
           |    OR (pr.pass_bp >= 5000 AND g.n_tokens >= 40)),
           |u AS (SELECT doc_id AS id, text FROM keepq
           |  UNION ALL SELECT doc_id + 50000, text FROM documents
           |  WHERE doc_id < 5)""".stripMargin
      s"""${minhashPairsCtesOver(corpus)},
         |dropped AS (SELECT DISTINCT id_a AS doc_id FROM pairs
         |  WHERE id_a < 50000 AND id_b >= 50000),
         |fin AS (SELECT k.doc_id, k.source, k.n_tokens FROM keepq k
         |  WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)),
         |ia AS (SELECT source, count(*) AS docs_in FROM documents
         |  GROUP BY 1),
         |qa AS (SELECT source, count(*) AS docs_quality FROM keepq
         |  GROUP BY 1),
         |fa AS (SELECT source, count(*) AS docs_final,
         |    sum(n_tokens) AS tokens_final FROM fin GROUP BY 1)
         |SELECT ia.source, CAST(docs_in AS BIGINT) AS docs_in,
         |  CAST(coalesce(docs_quality, 0) AS BIGINT) AS docs_quality,
         |  CAST(coalesce(docs_final, 0) AS BIGINT) AS docs_final,
         |  CAST(coalesce(tokens_final, 0) AS BIGINT) AS tokens_final
         |FROM ia LEFT JOIN qa USING (source) LEFT JOIN fa USING (source)
         |ORDER BY ia.source""".stripMargin
    },

    "layout_range_plan" -> {
      val body = OracleLits.get("range_plan_cuts")
        .getOrElse("ntile(16) OVER (ORDER BY l_extendedprice)")
      s"""WITH b AS (SELECT $body AS partition_id FROM lineitem),
         |c AS (SELECT partition_id, count(*) AS n_rows FROM b GROUP BY 1),
         |t AS (SELECT sum(n_rows) AS tt FROM c)
         |SELECT CAST(partition_id AS BIGINT) AS partition_id,
         |  CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST((10000 * n_rows) // tt AS BIGINT) AS share_bp
         |FROM c CROSS JOIN t ORDER BY partition_id""".stripMargin
    },

    "scd2_intervals" ->
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

    // the canonical xy→d loop unrolled to one CTE per level; rank = the
    // registered sketch cuts (same contract as layout_zorder), bit tests
    // as (v // s) % 2 integer arithmetic, quadrant/rotate as CASEs —
    // engine-portable end to end
    "layout_hilbert" -> {
      val nb = 1 << zorderBits
      val (ra, rb) =
        (OracleLits.get("hilbert_ra"), OracleLits.get("hilbert_rb")) match {
          case (Some(a), Some(b)) => (a, b)
          case _ => (s"ntile($nb) OVER (ORDER BY l_orderkey) - 1",
            s"ntile($nb) OVER (ORDER BY l_partkey) - 1")
        }
      val iterCtes = ((zorderBits - 1) to 0 by -1).zipWithIndex.map {
        case (level, idx) =>
          val s = 1L << level
          s"""h${idx + 1} AS (SELECT l_orderkey, l_linenumber, l_partkey,
             |  CASE WHEN ry = 1 THEN x WHEN rx = 1 THEN ${nb - 1} - y
             |    ELSE y END AS x,
             |  CASE WHEN ry = 1 THEN y WHEN rx = 1 THEN ${nb - 1} - x
             |    ELSE x END AS y,
             |  d + ${s * s} * CASE WHEN rx = 0 AND ry = 0 THEN 0
             |    WHEN rx = 0 THEN 1 WHEN ry = 1 THEN 2 ELSE 3 END AS d
             |  FROM (SELECT *, ((x // $s) % 2) AS rx, ((y // $s) % 2) AS ry
             |    FROM h$idx))""".stripMargin
      }.mkString(",\n")
      s"""WITH h0 AS (SELECT l_orderkey, l_linenumber, l_partkey,
         |  CAST($ra AS BIGINT) AS x, CAST($rb AS BIGINT) AS y,
         |  CAST(0 AS BIGINT) AS d FROM lineitem),
         |$iterCtes
         |SELECT l_orderkey, l_linenumber, l_partkey,
         |  CAST(d AS BIGINT) AS hv
         |FROM h$zorderBits ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "layout_file_plan" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(length(text)) AS BIGINT) AS total_bytes,
        |  CAST(greatest(1, (sum(length(text)) + 2999) // 3000) AS BIGINT)
        |    AS n_files
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "layout_file_slots" ->
      """WITH p AS (SELECT source,
        |    greatest(1, (sum(length(text)) + 2999) // 3000) AS n_files
        |  FROM documents GROUP BY 1),
        |s AS (SELECT d.source,
        |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % p.n_files AS file_slot,
        |    length(d.text) AS b
        |  FROM documents d JOIN p USING (source))
        |SELECT source, CAST(file_slot AS BIGINT) AS file_slot,
        |  CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(b) AS BIGINT) AS bytes
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the shared span-rewrite CTE stack aggregated per source; tokens_out
    // counts the surviving-token frame directly (the rewritten text
    // rejoins single-spaced lowercase tokens, so its token count IS the
    // kept-row count)
    "pipeline_span_stats" ->
      s"""WITH $spanRewriteCtes,
         |ko AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |  FROM kept GROUP BY 1)
         |SELECT u.source, CAST(count(*) AS BIGINT) AS docs_in,
         |  CAST(sum(CASE WHEN ko.n IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS docs_out,
         |  CAST(sum(len(tk.tk)) AS BIGINT) AS tokens_in,
         |  CAST(sum(coalesce(ko.n, 0)) AS BIGINT) AS tokens_out
         |FROM u JOIN tk USING (doc_id) LEFT JOIN ko USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "pipeline_curation" ->
      s"""$curationChainCtes
         |SELECT predicted_lang, count(*) AS n_docs FROM ex
         |WHERE doc_id NOT IN (SELECT id FROM dup)
         |GROUP BY predicted_lang ORDER BY predicted_lang""".stripMargin,

    // survivors (ex minus dup) joined back to feat's token counts, then
    // the repeat-epochs arithmetic (int64 div/%) grouped by language
    "pipeline_pretrain_mix" ->
      s"""$curationChainCtes,
         |kept AS (SELECT ex.doc_id, ex.predicted_lang, f.n_tokens
         |  FROM ex JOIN feat f ON f.doc_id = ex.doc_id
         |  WHERE ex.doc_id NOT IN (SELECT id FROM dup)),
         |tot AS (SELECT predicted_lang, sum(n_tokens) AS t
         |  FROM kept GROUP BY 1),
         |pl AS (SELECT predicted_lang, t,
         |  CASE WHEN t > 0 THEN ((60000 * (CASE predicted_lang
         |    WHEN 'en' THEN 4000 ELSE 1000 END)) // 10000) // t
         |    ELSE 0 END AS fe,
         |  CASE WHEN t > 0 THEN ((60000 * (CASE predicted_lang
         |    WHEN 'en' THEN 4000 ELSE 1000 END)) // 10000) % t
         |    ELSE 0 END AS rem FROM tot),
         |cum AS (SELECT k.doc_id, k.predicted_lang, k.n_tokens,
         |  sum(k.n_tokens) OVER (PARTITION BY k.predicted_lang ORDER BY
         |    CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 10000, k.doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM kept k),
         |ep AS (SELECT cum.predicted_lang, cum.n_tokens,
         |  pl.fe + (CASE WHEN cum.c - cum.n_tokens < pl.rem
         |    THEN 1 ELSE 0 END) AS epochs
         |  FROM cum JOIN pl USING (predicted_lang))
         |SELECT predicted_lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
         |  CAST(sum(n_tokens * epochs) AS BIGINT) AS served_tokens,
         |  CAST(max(epochs) AS BIGINT) AS max_epochs,
         |  CAST(sum(CASE WHEN epochs = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pruned
         |FROM ep GROUP BY 1 ORDER BY 1""".stripMargin,

    // every input doc labeled with the stage that dropped it
    "pipeline_provenance" ->
      s"""$curationChainCtes
         |SELECT u0.doc_id, CASE
         |  WHEN qf.doc_id IS NULL THEN 'quality_fail'
         |  WHEN ex.doc_id IS NULL THEN 'exact_dup'
         |  WHEN dup.id IS NOT NULL THEN 'near_dup'
         |  ELSE 'kept' END AS stage
         |FROM u0
         |LEFT JOIN qf ON u0.doc_id = qf.doc_id
         |LEFT JOIN ex ON u0.doc_id = ex.doc_id
         |LEFT JOIN dup ON u0.doc_id = dup.id
         |ORDER BY u0.doc_id""".stripMargin,

    // Not DuckDB's ASOF JOIN: on equal-ts purchases ASOF picks an arbitrary
    // row, while Temporal.asOfJoin deterministically picks the greatest
    // payload struct — the window below mirrors that tie-break exactly.
    "join_asof" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, event_id AS p_event_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, p_event_id, p_value FROM (
        |  SELECT l.event_id, r.p_event_id, r.p_value, row_number() OVER (
        |    PARTITION BY l.event_id
        |    ORDER BY r.ts DESC, r.p_event_id DESC, r.p_value DESC) AS rn
        |  FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "join_range" ->
      """WITH i AS (SELECT event_id AS int_id, user_id, ts AS start_ts,
        |  ts + INTERVAL 12 HOUR AS end_ts FROM events
        |  WHERE event_type = 'purchase'),
        |p AS (SELECT event_id AS probe_id, user_id, ts FROM events
        |  WHERE event_type = 'click')
        |SELECT int_id, probe_id FROM i JOIN p ON i.user_id = p.user_id
        |  AND p.ts >= i.start_ts AND p.ts <= i.end_ts
        |ORDER BY int_id, probe_id""".stripMargin,
  )
}
