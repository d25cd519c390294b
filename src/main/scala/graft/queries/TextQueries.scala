package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Multimodal, Pq, Sampling, Similarity, Temporal, TextAnalysis}
import ScaleShared._

/** Text-analysis family: quality features, language ID, repetition,
  * entropy, perplexity, redaction, decontamination, BPE train/encode,
  * postings/BM25, NB classifier — over the documents table.
  *
  * Mechanically split out of the former single-file ScaleQueries registry;
  * each family owns its queries AND their DuckDB oracle SQL. */
object TextQueries {

  val queries: Map[String, QF] = Map(
    // Token counting: whitespace + subword (BPE-ish regex) tokenizers
    "tx_token_count" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        size(TextAnalysis.subwordTokens(col("text"))).cast("long")
          .as("n_subword_tokens"))
        .orderBy("doc_id")),

    // Tokenizer fertility by language: BPE tokens per word, the standard
    // multilingual tokenizer-quality statistic. Exact integer sums only —
    // callers divide; the gate stays ratio-free and bit-stable
    "bpe_fertility" -> ((s, d) => {
      val m = bpeMerges(s, d).map(t => (t._2, t._3))
      TextAnalysis.bpeEncode(docs(s, d), "doc_id", "text", m)
        .join(docs(s, d).select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(col("n_bpe_tokens")).as("total_bpe_tokens"))
        .orderBy("lang")
    }),

    // Quality scoring: token/stopword/punctuation/alpha features
    "tx_quality_features" -> ((s, d) =>
      TextAnalysis.qualityFeatures(docs(s, d), "text")
        .select("doc_id", "n_tokens", "n_stopwords", "stopword_ratio",
          "mean_token_len", "punct_ratio", "alpha_ratio")
        .orderBy("doc_id")),

    // Language ID via marker-token election
    "tx_lang_id" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("predicted_lang"))
        .orderBy("doc_id")),

    // Data-driven n-gram language ID: char-trigram profiles trained from
    // the labeled corpus (top-300 grams per language — Cavnar-Trenkle's
    // profile size, and the lever that keeps the gram join bounded by the
    // profiles instead of the corpus vocabulary), docs classified by
    // count-vector cosine
    "tx_lang_id_ngram" -> ((s, d) =>
      TextAnalysis.charNgramLangId(docs(s, d), "doc_id", "text", "lang",
        profileTopN = 300)
        .orderBy("doc_id")),

    // Vocabulary-coverage / OOV-rate QA: per doc, how many tokens fall
    // outside the top-20 corpus vocabulary (total order (count desc,
    // token)) — the tokenizer/vocab sizing signal; integer counts only,
    // and the corpus pays one memoized token explode + one broadcast
    // anti-join against the bounded vocabulary
    "tx_oov_rate" -> ((s, d) => {
      val toks = tokenizedDocs(s, d)
        .select(col("doc_id"), explode(col("tk")).as("w"))
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(20).select("w")
      val oov = toks.join(vocab, Seq("w"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("n_oov"))
      val tot = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      docs(s, d).select("doc_id")
        .join(tot, Seq("doc_id"), "left_outer")
        .join(oov, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_oov"), lit(0L)).as("n_oov"))
        .orderBy("doc_id")
    }),

    // Language-ID confusion matrix: labeled vs predicted lang counts —
    // the classifier-evaluation surface (precision/recall per language
    // derive by the caller's divisions; the gate ships integer counts)
    "tx_lang_confusion" -> ((s, d) =>
      docs(s, d).select(col("lang"),
          TextAnalysis.langId(col("text")).as("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted_lang")),

    // Mixed-language detection: per-50-token-chunk language election,
    // summarized per doc as integer counts + majority lang — n_langs > 1
    // flags concatenation artifacts / boilerplate sandwiches
    "tx_lang_mix" -> ((s, d) =>
      TextAnalysis.langMixture(docs(s, d), "doc_id", "text", chunkSize = 50)
        .orderBy("doc_id")),

    // Document fingerprinting (normalized-content digest)
    "tx_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp")).orderBy("doc_id")),

    // Winnowing fingerprint selection (Schleimer '03, k=3 w=4): window-min
    // k-gram hashes with the rightmost-tie rule — the density-guaranteed
    // local fingerprints whole-doc MD5 cannot provide (any shared run of
    // >= w+k-1 tokens shares a fingerprint)
    "tx_winnow" -> ((s, d) =>
      TextAnalysis.winnowFingerprints(docs(s, d), "doc_id", "text", 3, 4)
        .orderBy("doc_id", "fp_pos", "fp_hash")),

    // Per-document sliding token chunks (12-token windows, stride 8 — 4
    // tokens of overlap): the embedding/RAG chunker; document boundaries
    // kept, last chunk truncates at the end. Zero shuffle
    "tx_chunk_windows" -> ((s, d) =>
      TextAnalysis.chunkWindows(docs(s, d), "doc_id", "text",
        chunkTokens = 12, strideTokens = 8)
        .orderBy("doc_id", "chunk_idx")),

    // Chunk-level exact dedup map over the dup'd corpus: embed each
    // DISTINCT chunk once (the RAG step downstream of the chunker) —
    // one skew-safe hash aggregate; rep = min (doc, idx) occurrence
    "tx_chunk_dedup" -> ((s, d) =>
      graft.scale.Dedup.chunkDedupMap(docsWithDups(s, d), "doc_id", "text",
        chunkTokens = 12, strideTokens = 8)
        .orderBy("chunk_hash")),

    // Incremental chunk-dedup map: the persisted (chunk_hash, n_occ, rep)
    // state of the id<250 head merges with a batch holding the rest PLUS
    // a full duplicate copy — history is never re-chunked, and the merged
    // map must equal the batch-at-once recomputation (same oracle as
    // tx_chunk_dedup; merge == retrain)
    "tx_chunk_dedup_incr" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "text")
      val state = graft.scale.Dedup.chunkDedupMap(
        dd.filter(col("doc_id") < 250), "doc_id", "text", 12, 8)
      val batch = dd.filter(col("doc_id") >= 250)
        .unionByName(dd.withColumn("doc_id", col("doc_id") + 10000))
      graft.scale.Dedup.chunkDedupIncremental(state, batch,
        "doc_id", "text", 12, 8)
        .orderBy("chunk_hash")
    }),

    // Repetition signals (Gopher-style): duplicate/top n-gram fractions +
    // max consecutive-token run — all per-row expressions, zero shuffles
    "tx_repetition" -> ((s, d) =>
      docs(s, d)
        .withColumn("tk", TextAnalysis.tokens(lower(col("text"))))
        .withColumn("r2",
          graft.functions.TextExpressions.ngramRepetition(col("tk"), 2))
        .select(col("doc_id"),
          col("r2").getField("dup_frac").as("dup_2gram_frac"),
          graft.functions.TextExpressions.ngramRepetition(col("tk"), 3)
            .getField("dup_frac").as("dup_3gram_frac"),
          col("r2").getField("top_frac").as("top_2gram_frac"),
          TextAnalysis.maxTokenRun(col("tk")).cast("long").as("max_token_run"),
          TextAnalysis.symbolRatio(col("text"), col("tk")).as("symbol_ratio"))
        .orderBy("doc_id")),

    // Context-window chunking: 50-token chunks, 10-token overlap (chunk
    // text fingerprinted so the result stays narrow)
    "tx_chunks" -> ((s, d) =>
      tokenizedDocs(s, d)
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunkTokens(col("tk"), 50, 10)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_index"),
          size(TextAnalysis.tokens(col("col"))).cast("long").as("n_tokens"),
          md5(col("col")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_index")),

    // PII redaction: email / IPv6 / IPv4 / SSN / card / phone families →
    // typed tokens, applied in the order-sensitive piiPatterns chain
    "tx_redact" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("redacted"))
        .orderBy("doc_id")),

    // Per-family PII redaction counters — the operational governance
    // report of a curation run (how much PII, of what kind, per doc);
    // counts are staged exactly like the redaction so each hit is
    // attributed to one family. Pure int64 counters on the gate
    "tx_redact_stats" -> ((s, d) =>
      TextAnalysis.redactPiiStats(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // NB quality model (fastText/CCNet-style "looks curated?" filter):
    // the top-512-vocabulary per-class counts — the model's SUFFICIENT
    // STATISTICS, pure int64 on the gate (likelihoods derive via
    // nbFromCounts; emitting the ln here put a libm quantization on the
    // gate for no information gain)
    "nb_quality_model" -> ((s, d) =>
      TextAnalysis.nbTopCounts(
        TextAnalysis.nbCounts(docs(s, d), "text",
          col("source").isin("src0", "src1", "src2")), vocab = 512)
        .orderBy("token")),

    // NB quality scores: prior log-odds + per-token log-likelihood-ratio
    // sum, carried end-to-end in exact MICRO-UNIT int64 (the 6-decimal
    // model × 10⁶); predicted=1 for curated-looking docs (an integer
    // comparison). The micro model constants are registered for the
    // oracle (OracleLits) as plain integers — no ln, no decimal literal,
    // no non-integer type anywhere on the compared surface
    "nb_quality_score" -> ((s, d) => nbScored(s, d).orderBy("doc_id")),

    // Committee quality gate: the LR and NB scorers' OPPOSING views are
    // combined by rank (reciprocal-rank fusion, the same integer combiner
    // as tx_rrf_fusion) rather than by score — rank fusion is immune to
    // the two models' incomparable score scales, the reason ensembled
    // data filters (FineWeb-Edu-style committees) fuse on ranks. Both
    // corpus-wide rankings run through the skew-safe two-level
    // groupedRank (constant group = the worst-skew case: no global-order
    // window forms); the fusion join is id-keyed; the final top-50 is a
    // TakeOrderedAndProject under the exact (rrf desc, id) total order
    "tx_quality_ensemble" -> ((s, d) => {
      val dd = docs(s, d)
      val nanos = lrWeightsMemo(s, d)
      OracleLits.put("lr_weights", nanos.mkString(","))
      val lr = TextAnalysis.lrScoreNano(dd, "doc_id", "text", nanos)
        .select(col("doc_id"), col("margin_nano"))
      val nb = nbScored(s, d).select(col("doc_id"), col("score_micro"))
      def ranked(df: DataFrame, scoreCol: String, as: String) =
        Sampling.groupedRank(
          df.withColumn("__g", lit(0L))
            .withColumn("__neg", -col(scoreCol)),
          "__g", "__neg", "doc_id")
          .select(col("doc_id"), col("rank").as(as))
      ranked(lr, "margin_nano", "lr_rank")
        .join(ranked(nb, "score_micro", "nb_rank"), "doc_id")
        .withColumn("rrf_micro", expr(
          "1000000L div (60L + lr_rank) + 1000000L div (60L + nb_rank)"))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(50)
        .select("doc_id", "lr_rank", "nb_rank", "rrf_micro")
    }),

    // Incremental NB training: per-batch counts merged into state, then
    // the vocabulary restriction — must equal retraining on the full
    // corpus (the oracle IS the full-corpus counts, proving
    // merge∘restrict = retrain); integer output, no gate quantization
    "nb_incr_model" -> ((s, d) => {
      val dd = docs(s, d)
      val pos = col("source").isin("src0", "src1", "src2")
      val state = TextAnalysis.nbCounts(dd.filter(col("doc_id") < 250),
        "text", pos)
      val batch = TextAnalysis.nbCounts(dd.filter(col("doc_id") >= 250),
        "text", pos)
      TextAnalysis.nbTopCounts(TextAnalysis.nbMergeCounts(state, batch),
        vocab = 512).orderBy("token")
    }),

    // NB calibration: reliability diagram over fixed probability bins —
    // mean predicted (sum_pred_micro/10⁶/n_docs) vs actual (n_pos/n_docs)
    // per bin is the calibration gap; division-free pure-int64 output
    "nb_calibration" -> ((s, d) =>
      TextAnalysis.nbCalibration(docs(s, d), "doc_id", "text",
        col("source").isin("src0", "src1", "src2"), vocab = 512, bins = 10)
        .orderBy("bin")),

    // Logistic-regression quality classifier: distill the integer quality
    // rubric (length >= 45 tokens AND stopword density >= 5%) into a
    // 5-weight linear scorer — the cheap deployable filter of
    // fastText/CCNet lineage. Training is 20 rounds of full-batch GD with
    // DECIMAL(18,9)-quantized per-row gradient contributions (exact
    // decimal sums — partition-order-stable weights); the weights are
    // registered for the oracle and independently re-derived from the
    // fixtures by tools/lit_check.py
    "lr_quality_model" -> ((s, d) => {
      val nanos = lrWeightsMemo(s, d)
      OracleLits.put("lr_weights", nanos.mkString(","))
      import s.implicits._
      TextAnalysis.lrFeatureNames.zip(nanos).toDF("feature", "weight_nano")
        .orderBy("feature")
    }),

    // LR scores from the registered nano weights: both engines rebuild the
    // double by ONE IEEE division and evaluate the identical fixed-order
    // dot product over identically-derived features — floor(margin·10⁹)
    // int64 on the gate, integer keep verdict; per-row, zero shuffles
    "lr_quality_score" -> ((s, d) => {
      val nanos = lrWeightsMemo(s, d)
      OracleLits.put("lr_weights", nanos.mkString(","))
      TextAnalysis.lrScoreNano(docs(s, d), "doc_id", "text", nanos)
        .orderBy("doc_id")
    }),

    // Distillation QA: the student/teacher confusion matrix as one
    // pure-int64 row (how faithfully the linear scorer reproduces the
    // rubric it was trained on)
    "lr_quality_eval" -> ((s, d) => {
      val dd = docs(s, d)
      val nanos = lrWeightsMemo(s, d)
      OracleLits.put("lr_weights", nanos.mkString(","))
      val labels = TextAnalysis.qualityFeatures(dd, "text")
        .select(col("doc_id"), lrLabel.as("y"))
      TextAnalysis.lrScoreNano(dd, "doc_id", "text", nanos)
        .join(labels, "doc_id")
        .agg(
          sum(when(col("predicted") && col("y"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("predicted") && !col("y"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("predicted") && col("y"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("predicted") && !col("y"), 1L).otherwise(0L))
            .as("tn"))
    }),

    // Per-domain quality prior: the rubric pass rate aggregated to each
    // source in exact basis points — domain reputation as a bounded side
    // table (the URL/domain-level filtering signal of Gopher/RefinedWeb)
    "tx_source_prior" -> ((s, d) =>
      TextAnalysis.domainPrior(
        TextAnalysis.qualityFeatures(docs(s, d), "text"), "source", lrLabel)
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          col("n_pass").cast("long").as("n_pass"),
          col("pass_bp").cast("long").as("pass_bp"))
        .orderBy("source")),

    // Domain-prior rescue: a doc survives on its own rubric pass, or —
    // when borderline (>= 40 tokens) — on its domain's reputation
    // (pass_bp >= 5000). Prior rides back as a broadcast join; verdicts
    // and reasons are pure integer/string logic
    "tx_prior_keep" -> ((s, d) => {
      val stats = TextAnalysis.qualityFeatures(docs(s, d), "text")
      val prior = broadcast(TextAnalysis.domainPrior(stats, "source",
        lrLabel).select(col("source"), col("pass_bp")))
      stats.join(prior, "source")
        .withColumn("reason",
          when(lrLabel, "doc_pass")
            .when(col("pass_bp") >= 5000L && col("n_tokens") >= 40L,
              "domain_rescue")
            .otherwise("drop"))
        .select(col("doc_id"), col("source"),
          (col("reason") =!= "drop").as("keep"), col("reason"))
        .orderBy("doc_id")
    }),

    // Inverted-index posting lists: top-50 terms by document frequency
    // with capped (first-20) containing-doc lists — skew-safe per-term cap
    "tx_postings" -> ((s, d) =>
      TextAnalysis.postings(docs(s, d), "doc_id", "text",
        topTerms = 50, cap = 20)
        .orderBy(col("df").desc, col("token"))),

    // Incremental index maintenance: per-batch postings states merged,
    // then finalized — the oracle is the full-corpus index, proving
    // finalize(merge(batches)) == retrain exactly
    "tx_postings_incr" -> ((s, d) => {
      val dd = docs(s, d)
      val a = TextAnalysis.postingsState(
        dd.filter(col("doc_id") < 250), "doc_id", "text")
      val b = TextAnalysis.postingsState(
        dd.filter(col("doc_id") >= 250), "doc_id", "text")
      TextAnalysis.postingsTop(TextAnalysis.postingsMerge(a, b),
          topTerms = 50)
        .orderBy(col("df").desc, col("token"))
    }),

    // BM25 retrieval: top-20 docs for a literal query (one term absent
    // from the corpus — it must contribute nothing); broadcast term
    // stats, zero-shuffle scoring scan. Gate surface is bm25Nano's int64
    // nano score (floor-truncated per-term contributions — no decimal
    // cast, no round-half tie) ordered by the integer total order
    "tx_bm25" -> ((s, d) => {
      val dd = docs(s, d)
      val q = "spark window join quantum"
      // register the per-term idf as INTEGER nano values (floor(idf·10⁹)
      // of the same Catalyst log the query evaluates) — the oracle
      // reconstructs idf by one deterministic IEEE division, so no float
      // literal needs parsing anywhere in the gate chain
      val (_, _, terms) = TextAnalysis.bm25TermStats(dd, "text", q)
      if (terms.nonEmpty) OracleLits.put("bm25_qd",
        terms.map { case (t, df, idf) =>
          s"(${OracleLits.sqlStr(t)}, CAST($df AS BIGINT), " +
            s"CAST(${math.floor(idf * 1e9).toLong} AS BIGINT))"
        }.mkString("(VALUES ", ", ", ") AS t(qt, df, idf9)"))
      TextAnalysis.bm25Nano(dd, "doc_id", "text", q, k = 20)
    }),

    // Hybrid retrieval: BM25 lexical top-20 fused with dense-cosine
    // top-20 by reciprocal-rank fusion (Cormack '09) — the standard RAG
    // retriever combiner. Both lists are searches the library already
    // runs (broadcast-stats BM25 scan; brute-force cosine for the single
    // probe vector); the fused score is pure integer
    // (Σ 1_000_000 div (60 + rank)), so the gate compares int64 end to
    // end. The rank window runs over the 20-row top-k frame only —
    // k-bounded, never corpus-wide. Dense query = doc 0's embedding;
    // ids are the shared doc/vec key
    "tx_rrf_fusion" -> ((s, d) => {
      val dd = docs(s, d)
      val q = "spark window join quantum"
      val (_, _, terms) = TextAnalysis.bm25TermStats(dd, "text", q)
      if (terms.nonEmpty) OracleLits.put("rrf_qd",
        terms.map { case (t, df, idf) =>
          s"(${OracleLits.sqlStr(t)}, CAST($df AS BIGINT), " +
            s"CAST(${math.floor(idf * 1e9).toLong} AS BIGINT))"
        }.mkString("(VALUES ", ", ", ") AS t(qt, df, idf9)"))
      val sparse = TextAnalysis.bm25Nano(dd, "doc_id", "text", q, k = 20)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("score_nano").desc, col("doc_id"))))
        .select("doc_id", "rnk")
      val e = emb(s, d)
      val dense = Similarity.bruteForceTopK(e.filter(col("vec_id") === 0),
          e, "vec_id", "embedding", 20)
        .select(col("neighbor_id").as("doc_id"), col("rnk"))
      Similarity.rrfFuse(Seq("sparse" -> sparse, "dense" -> dense),
          "doc_id", "rnk")
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
        .select("doc_id", "sparse_rnk", "dense_rnk", "rrf_micro")
    }),

    // Corpus length histogram in log2 buckets (the dataset-report shape:
    // constant output rows at any corpus size, one agg). The bucket is
    // length(bin(n+1))-1 — integer-exact floor(log2), immune to the
    // float-log boundary drift a double log2 would risk at powers of two
    "tx_len_hist" -> ((s, d) =>
      docs(s, d)
        .select((length(bin(size(TextAnalysis.tokens(col("text")))
          .cast("long") + 1)) - 1).cast("long").as("log2_tokens"))
        .groupBy("log2_tokens").agg(count(lit(1)).as("n_docs"))
        .orderBy("log2_tokens")),

    // PMI collocations: top-20 bigrams beating the independence
    // expectation (min count 5) — the phrase-detection statistic; gate
    // surface is the int64 micro PMI ranked by the integer total order
    "tx_collocations" -> ((s, d) =>
      TextAnalysis.collocationsMicro(docs(s, d), "text", minCount = 5, k = 20)),

    // Corpus-level 2-gram heavy hitters (top-20 by count, lexicographic
    // tie-break): the corpus-statistics counterpart of the per-doc
    // repetition signals
    "tx_top_ngrams" -> ((s, d) =>
      TextAnalysis.topNgrams(docs(s, d), "text", 2, 20)
        .orderBy(col("cnt").desc, col("ngram").asc)),

    // Character-entropy quality signal (perplexity proxy): bits of the
    // per-doc char distribution, in int64 micro units on the gate
    "tx_char_entropy" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextAnalysis.charEntropyMicro(col("text")).as("entropy_micro"))
        .orderBy("doc_id")),

    // Heaps-law vocabulary-growth curve: docs/tokens/distinct-vocab at 10
    // exact corpus-prefix checkpoints — the tokenizer/vocab sizing signal;
    // cumulative answers come from the first-occurrence inequality join,
    // never a prefix re-scan
    "tx_heaps" -> ((s, d) =>
      TextAnalysis.heapsCurve(docs(s, d), "doc_id", "text")
        .orderBy("checkpoint")),

    // Corpus drift monitoring between the first and second half of the
    // corpus (crawl-over-crawl shape): top-20 drifting tokens by the
    // integer cross-product statistic |c_a·n_b − c_b·n_a| (= n_a·n_b·|p−q|
    // — ranks exactly as total variation, with zero floating point on the
    // gate; tokenDriftTerms keeps the JS-divergence view for callers).
    // The gate emits drift_x as int64: bounded at sf0.01; the library op
    // carries DECIMAL(38,0) for 100 TB counts
    "tx_drift" -> ((s, d) => {
      val dd = docs(s, d)
      TextAnalysis.tokenDriftCounts(
        dd.filter(col("doc_id") < 250), dd.filter(col("doc_id") >= 250), "text")
        .orderBy(col("drift_x").desc, col("token").asc)
        .limit(20)
        .select(col("token"), col("c_a"), col("c_b"),
          col("drift_x").cast("long").as("drift_x"))
    }),

    // Corpus-LM perplexity quality filter (CCNet-style): bigram LM trained
    // on the corpus; the gate carries the division-free per-doc (Σ −logp,
    // n) sufficient statistics in int64 micro units — mean bits derivable
    // (lmCrossEntropy keeps the interactive view)
    "tx_lm_perplexity" -> ((s, d) => {
      val dd = docs(s, d)
      TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
        TextAnalysis.bigramLm(dd, "text"))
        .orderBy("doc_id")
    }),

    // CCNet-style perplexity bucketing (Wenzek '20 §4.3): per-language
    // head/middle/tail terciles of the per-doc LM cross entropy. The
    // tercile key is pure int64 (the overflow-safe split of
    // floor(neg_logp·10⁶ / n) — never neg·10⁶ first, which a 1M-token doc
    // would overflow), and the per-language ntile runs through the
    // skew-safe two-level prefix-sum rank (Sampling.groupedNtile) — no
    // single-language global-order window ever forms
    "tx_ppl_buckets" -> ((s, d) => {
      val dd = docs(s, d)
      // groupedNtile consumes its input from THREE plan branches (the cut
      // sketch, the offset collect, the final ranked frame) — materialize
      // the one-row-per-doc key frame so the LM train+score chain behind
      // it runs once, not three times (28 s → 9 s first-run at sf0.1)
      val keyed = graft.io.Materialize(
        TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
          TextAnalysis.bigramLm(dd, "text"))
          .join(dd.select(col("doc_id"), col("lang")), "doc_id")
          .withColumn("ce_pico",
            expr("(neg_logp_sum_micro div n_bigrams) * 1000000L" +
              " + ((neg_logp_sum_micro % n_bigrams) * 1000000L)" +
              " div n_bigrams"))
          .select("doc_id", "lang", "ce_pico"))
      Sampling.groupedNtile(keyed, "lang", "ce_pico", "doc_id", 3)
        .withColumn("tercile", col("ntile"))
        .withColumn("ppl_bucket",
          when(col("tercile") === 1, "head")
            .when(col("tercile") === 2, "middle").otherwise("tail"))
        .select("doc_id", "lang", "ce_pico", "tercile", "ppl_bucket")
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: the corpus' top-3 2-grams stand in for an
    // eval-set n-gram list (bounded, collected once); docs overlapping it
    // are dropped with a per-row zero-shuffle filter
    "tx_decontaminate" -> ((s, d) => {
      val evalGrams = TextAnalysis.topNgrams(docs(s, d), "text", 2, 3)
        .select("ngram").collect().map(_.getString(0)).toSeq
      TextAnalysis.decontaminate(docs(s, d), "doc_id", "text", evalGrams, 2)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // Blocklist screening: occurrence count of listed terms per doc and the
    // keep verdict at a 5% hit-ratio budget (integer-exact: 20·hits ≤ toks)
    "tx_blocklist" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        TextAnalysis.blocklistHits(col("text"), blocklistTerms)
          .cast("long").as("n_hits"))
        .withColumn("keep", col("n_hits") * 20 <= col("n_tokens"))
        .orderBy("doc_id")),

    // BPE training statistic: adjacent-symbol pair frequencies over the
    // char-split vocabulary (top-20; the round-0 merge candidates)
    "bpe_pair_freqs" -> ((s, d) =>
      TextAnalysis.pairCounts(
        TextAnalysis.wordFreqs(docs(s, d), "text")
          .select(TextAnalysis.charSymbols(col("w")).as("sym"), col("freq")),
        "sym", "freq")
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(20)),

    // BPE tokenizer training, 8 merge rounds (vocabulary-bounded loop).
    // Oracled by a statically-unrolled 8-round DuckDB mirror (bpeMergesSql);
    // the golden merge sequence is additionally pinned by ScaleSpec.
    // Served from the session merge-table memo (8 rows) shared by the
    // four bpe_* consumers — rebuilt as a frame with the exact schema
    // bpeTrain returned
    "bpe_merges" -> ((s, d) => {
      import s.implicits._
      bpeMerges(s, d).toDF("rank", "left", "right", "pair_freq")
        .orderBy("rank")
    }),

    // BPE tokenizer APPLICATION: train 8 merges, then encode the corpus
    // with them — merge application runs on the distinct-word vocabulary
    // (never corpus-sized data); per-doc output carries an order-exact
    // MD5 of the full symbol stream so the oracle checks the actual
    // encoding, not just counts
    "bpe_encode" -> ((s, d) => {
      val m = bpeMerges(s, d).map(t => (t._2, t._3))
      TextAnalysis.bpeEncode(docs(s, d), "doc_id", "text", m)
        .orderBy("doc_id")
    }),

    // Tokenizer QA: the trained BPE must be LOSSLESS — concatenating each
    // word's subwords reconstructs the word, for every vocabulary word
    "bpe_roundtrip" -> ((s, d) => {
      val m = bpeMerges(s, d).map(t => (t._2, t._3))
      TextAnalysis.bpeEncodeWords(docs(s, d), "text", m)
        .agg(count(lit(1)).as("n_words"),
          sum(when(replace(col("enc"), lit(" "), lit("")) === col("w"), 0L)
            .otherwise(1L)).as("n_mismatched"))
    }),

    // Unigram-LM (SentencePiece-style) tokenizer, the second subword
    // family beside BPE: substring-scored seed vocab, greedy
    // longest-prefix segmentation, usage re-estimation, prune, final
    // segmentation — encode surface is the bpe_encode gate shape. The
    // oracle replays the whole train+encode pipeline in SQL (two unrolled
    // 8-round segmentation passes)
    "tok_unigram_vocab" -> ((s, d) =>
      graft.scale.Unigram.train(docs(s, d), "text", maxPieceLen = 6,
          seedMulti = 24, keepMulti = 12, maxRounds = 8)
        .orderBy("piece")),

    "tok_unigram_encode" -> ((s, d) =>
      unigramEncoded(s, d).orderBy("doc_id")),

    // Unigram tokenizer fertility by language — the bpe_fertility QA
    // statistic for the unigram family (pieces per word, as exact integer
    // sums; callers divide), off the session-memoized encode frame
    "tok_unigram_fertility" -> ((s, d) =>
      unigramEncoded(s, d)
        .join(docs(s, d).select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(col("n_pieces")).as("total_pieces"))
        .orderBy("lang")),
  )

  // chunk=12 / stride=8 sliding-window CTEs over a preceding
  // `u`(doc_id, text) CTE; ends with `cw`(doc_id, chunk_idx, start_tok,
  // n_tok, chunk_text). Shared by tx_chunk_windows and tx_chunk_dedup.
  private[queries] lazy val chunkWindowCtes: String =
    s"""t AS (SELECT doc_id, $duckToksAll AS tk FROM u),
       |n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t
       |  WHERE len(tk) > 0),
       |ch AS (SELECT doc_id, tk, n, unnest(range(0,
       |    1 + (greatest(n - 12, 0) + 7) // 8)) AS chunk_idx FROM n),
       |cw AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(chunk_idx * 8 AS BIGINT) AS start_tok,
       |  CAST(least(12, n - chunk_idx * 8) AS BIGINT) AS n_tok,
       |  array_to_string(list_slice(tk, CAST(chunk_idx * 8 + 1 AS INT),
       |    CAST(least(chunk_idx * 8 + 12, n) AS INT)), ' ') AS chunk_text
       |  FROM ch)""".stripMargin

  // a def, not a val: registry-aware entries read OracleLits fragments
  // that the query functions register as they run (Verify dumps oracle
  // SQL AFTER running every query)
  // Integer quality-feature sufficient statistics (the tx_quality_features
  // g CTE), shared with the LR quality-classifier oracles. Ends with
  // `g`(doc_id, nc, n_tokens, n_stopwords, n_punct, n_alpha).
  private[queries] def qfStatsCtes: String =
    """f AS (SELECT doc_id, text,
      |  list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS tk,
      |  CAST(length(text) AS BIGINT) AS nc FROM documents),
      |g AS (SELECT doc_id, nc,
      |  CAST(len(tk) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(tk, w -> w IN
      |    ('the','a','of','and','in','to','is'))) AS BIGINT) AS n_stopwords,
      |  CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g'))
      |    AS BIGINT) AS n_punct,
      |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
      |    AS BIGINT) AS n_alpha
      |  FROM f)""".stripMargin

  // The LR teacher rubric (evaluated on the qualityFeatures stat columns):
  // "curated-looking" = at least 45 tokens AND stopword density >= 5%.
  // Pure integer predicate — engine- and oracle-portable verbatim.
  private[queries] def lrLabel =
    col("n_tokens") >= 45L && col("n_stopwords") * 20L >= col("n_tokens")

  // Session-memoized LR training (the tokenizedDocs memo pattern): the
  // model/score/eval queries share one trained weight vector per (session,
  // dataset) — a deployed pipeline trains once and every consumer scores
  // against the artifact. Perf-only: every consumer still registers the
  // weights as oracle literals and tools/lit_check.py re-derives the full
  // GD trajectory from the fixtures.
  // Shared NB scorer build (nb_quality_score + the ensemble): trains
  // ONCE — the collected model registers the oracle literals AND feeds
  // scoring back as a local relation (nbScoreMicroWith), so scoring
  // never re-runs the training aggregation
  private def nbScored(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val pos = col("source").isin("src0", "src1", "src2")
    val model = TextAnalysis.nbTrain(dd, "text", pos, vocab = 512).collect()
    val priorRows = dd
      .agg(sum(when(pos, 1L).otherwise(0L)).as("np"),
        sum(when(pos, 0L).otherwise(1L)).as("nn"))
      .select(log((col("np") + 1.0) / (col("nn") + 1.0))
        .cast("decimal(18,6)").as("__prior"))
      .collect()
    def micro(bd: java.math.BigDecimal): Long =
      bd.setScale(6).movePointRight(6).longValueExact
    // empty corpus → null prior aggregate; score 0 keeps the query
    // total (empty output) instead of an NPE in the micro conversion
    val priorMicroV =
      if (priorRows(0).isNullAt(0)) 0L else micro(priorRows(0).getDecimal(0))
    val modelMicro = model.map(r =>
      (r.getString(0), micro(r.getDecimal(1)), micro(r.getDecimal(2))))
    if (model.nonEmpty) {
      OracleLits.put("nb_model",
        modelMicro.map { case (t, lp, ln) =>
          s"(${OracleLits.sqlStr(t)}, $lp, $ln)"
        }.mkString("(VALUES ", ", ",
          ") AS t(token, lpos_micro, lneg_micro)"))
      OracleLits.put("nb_prior", priorMicroV.toString)
    }
    import s.implicits._
    val localModel = modelMicro.toSeq
      .toDF("token", "lpos_micro", "lneg_micro")
    val localPrior = Seq(priorMicroV).toDF("__prior_micro")
    TextAnalysis.nbScoreMicroWith(dd, "doc_id", "text",
      localModel, localPrior)
  }

  private[queries] def lrWeightsMemo(s: SparkSession, dir: String): Seq[Long] = {
    val base = sessionStateDir(s, dir, "graft_lrw_") { b =>
      val w = TextAnalysis.lrTrain(docs(s, dir), "text", lrLabel)
      new java.io.File(b).mkdirs()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$b/w.csv"),
        w.map(_.movePointRight(9).longValueExact).mkString(",")
          .getBytes("UTF-8")): Unit
    }
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/w.csv")), "UTF-8")
      .split(",").map(_.toLong).toSeq
  }

  // The engine-trained LR weights (int64 nano), parsed from the registered
  // csv fragment; all-zero fallback when the query has not run in this JVM
  // (the fallback scores everything 0 — loudly wrong, never silently right)
  private def lrWeightNanos: Seq[Long] =
    OracleLits.get("lr_weights")
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq.fill(5)(0L))

  // Feature map + margin over the qfStats `g` CTE, shared by the LR score
  // and eval oracles: each feature is a cast + fixed-order IEEE division
  // mirroring TextAnalysis.lrFeatures verbatim; the weights rebuild their
  // doubles by ONE IEEE division from the registered nano literals
  private[queries] def lrScoreCtes: String = {
    val w = lrWeightNanos
    def wd(j: Int) = s"(CAST(${w(j)} AS DOUBLE) / 1000000000.0)"
    s"""x AS (SELECT doc_id,
       |    CAST(least(n_tokens, 400) AS DOUBLE) / 50.0 AS x1,
       |    CASE WHEN n_tokens > 0 THEN
       |      (20.0 * CAST(n_stopwords AS DOUBLE)) / CAST(n_tokens AS DOUBLE)
       |      ELSE 0.0 END AS x2,
       |    CASE WHEN n_tokens > 0 THEN
       |      (CAST(nc - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE))
       |        / 10.0
       |      ELSE 0.0 END AS x3,
       |    CASE WHEN nc > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(nc AS DOUBLE)
       |      ELSE 0.0 END AS x4
       |  FROM g),
       |m AS (SELECT doc_id, ${wd(0)} + ${wd(1)} * x1 + ${wd(2)} * x2
       |    + ${wd(3)} * x3 + ${wd(4)} * x4 AS margin FROM x)""".stripMargin
  }

  // Shared bigram-LM CTE stack (train on the corpus, logp quantized to
  // DECIMAL(18,6) AT THE LM so per-doc sums are exact decimals — the
  // round-4 contract). Ends with `stats`(doc_id, neg_logp_sum_micro,
  // n_bigrams); used by tx_lm_perplexity and tx_ppl_buckets.
  private[queries] def lmStatsCtes: String =
    s"""t AS (SELECT doc_id, $duckToksAll AS l FROM documents),
       |v AS (SELECT count(DISTINCT tk) AS v FROM
       |  (SELECT unnest(l) AS tk FROM t)),
       |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
       |  i -> l[i] || ' ' || l[i+1])) AS bigram FROM t),
       |c12 AS (SELECT bigram, count(*) AS c12 FROM bg GROUP BY 1),
       |c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c12) AS c1
       |  FROM c12 GROUP BY 1),
       |lm AS (SELECT bigram,
       |  CAST(ln((c12 + 1.0) / (c1 + v)) / ln(2.0) AS DECIMAL(18,6)) AS logp
       |  FROM c12 JOIN c1 ON split_part(c12.bigram, ' ', 1) = c1.w1
       |  CROSS JOIN v),
       |stats AS (SELECT doc_id,
       |  CAST(-sum(logp) * 1000000 AS BIGINT) AS neg_logp_sum_micro,
       |  count(*) AS n_bigrams
       |FROM bg JOIN lm USING (bigram) GROUP BY 1)""".stripMargin

  def oracles: Map[String, String] = Map(
    "tx_lang_id_ngram" ->
      """WITH g AS (SELECT doc_id, lang,
        |    unnest(list_transform(range(1,
        |      greatest(length(lower(text)) - 2, 0) + 1),
        |      i -> substr(lower(text), i, 3))) AS g FROM documents),
        |dv AS (SELECT doc_id, g, count(*) AS dc FROM g GROUP BY 1, 2),
        |lv0 AS (SELECT lang, g, count(*) AS lc FROM g GROUP BY 1, 2),
        |lv AS (SELECT lang, g, lc FROM (
        |  SELECT lang, g, lc, row_number() OVER (
        |    PARTITION BY lang ORDER BY lc DESC, g) AS prn FROM lv0)
        |  WHERE prn <= 300),
        |dn AS (SELECT doc_id, sqrt(sum(dc * dc)) AS dn FROM dv GROUP BY 1),
        |lnorm AS (SELECT lang, sqrt(sum(lc * lc)) AS ln FROM lv GROUP BY 1),
        |dt AS (SELECT dv.doc_id, lv.lang, sum(dc * lc) AS dot
        |  FROM dv JOIN lv USING (g) GROUP BY 1, 2),
        |s AS (SELECT doc_id, lang, round(dot / (dn * ln), 6) AS cos
        |  FROM dt JOIN dn USING (doc_id) JOIN lnorm USING (lang))
        |SELECT doc_id, lang AS predicted_lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY cos DESC, lang) AS rn FROM s)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "tx_token_count" ->
      """SELECT doc_id,
        |CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |  t -> t != '')) AS BIGINT) AS n_tokens,
        |CAST(len(list_filter(string_split_regex(trim(regexp_replace(lower(text),
        |  '([a-z]+|[0-9]+|[^a-z0-9\s])', ' \1 ', 'g')), '\s+'),
        |  t -> t != '')) AS BIGINT) AS n_subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_quality_features" ->
      s"""WITH $qfStatsCtes
        |SELECT doc_id, n_tokens, n_stopwords,
        |  CASE WHEN n_tokens > 0
        |    THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    ELSE 0.0 END AS stopword_ratio,
        |  CASE WHEN n_tokens > 0
        |    THEN CAST(nc - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    ELSE 0.0 END AS mean_token_len,
        |  CASE WHEN nc > 0 THEN CAST(n_punct AS DOUBLE) / CAST(nc AS DOUBLE)
        |    ELSE 0.0 END AS punct_ratio,
        |  CASE WHEN nc > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(nc AS DOUBLE)
        |    ELSE 0.0 END AS alpha_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "tx_lang_id" -> {
      val (scoreDefs, langCase) = duckLangScore("tk")
      s"""WITH tok AS (SELECT doc_id, lang,
         |  list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t != '') AS tk FROM documents),
         |sc AS (SELECT doc_id, lang, $scoreDefs FROM tok)
         |SELECT doc_id, lang, $langCase AS predicted_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "tx_oov_rate" ->
      s"""WITH tok AS (SELECT doc_id, unnest($duckToksAll) AS w
         |  FROM documents),
         |vf AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
         |vocab AS (SELECT w FROM vf ORDER BY c DESC, w LIMIT 20),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov
         |  FROM tok LEFT JOIN vocab v USING (w) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // the tx_lang_id prediction aggregated into the confusion matrix
    "tx_lang_confusion" -> {
      val (scoreDefs, langCase) = duckLangScore("tk")
      s"""WITH tok AS (SELECT doc_id, lang,
         |  list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t != '') AS tk FROM documents),
         |sc AS (SELECT doc_id, lang, $scoreDefs FROM tok),
         |p AS (SELECT lang, $langCase AS predicted_lang FROM sc)
         |SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "tx_fingerprint" ->
      """SELECT doc_id,
        |md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_chunk_windows" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents),
         |$chunkWindowCtes
         |SELECT doc_id, chunk_idx, start_tok, n_tok, chunk_text
         |FROM cw ORDER BY doc_id, chunk_idx""".stripMargin,

    // rep decode: doc ids stay far below 2^20, so (doc, idx) min-struct
    // equals the min of doc·2^20 + idx exactly
    "tx_chunk_dedup" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents),
         |$chunkWindowCtes,
         |h AS (SELECT doc_id, chunk_idx, md5(chunk_text) AS chunk_hash
         |  FROM cw),
         |m AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_occ,
         |    min(doc_id * 1048576 + chunk_idx) AS rk
         |  FROM h GROUP BY 1)
         |SELECT chunk_hash, n_occ,
         |  CAST(rk // 1048576 AS BIGINT) AS rep_doc_id,
         |  CAST(rk % 1048576 AS BIGINT) AS rep_chunk_idx
         |FROM m ORDER BY chunk_hash""".stripMargin,

    // merge == retrain: the incremental state+batch merge must land on
    // the batch-at-once map over the same corpus (docs ∪ docs+10000)
    "tx_chunk_dedup_incr" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents),
         |$chunkWindowCtes,
         |h AS (SELECT doc_id, chunk_idx, md5(chunk_text) AS chunk_hash
         |  FROM cw),
         |m AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_occ,
         |    min(doc_id * 1048576 + chunk_idx) AS rk
         |  FROM h GROUP BY 1)
         |SELECT chunk_hash, n_occ,
         |  CAST(rk // 1048576 AS BIGINT) AS rep_doc_id,
         |  CAST(rk % 1048576 AS BIGINT) AS rep_chunk_idx
         |FROM m ORDER BY chunk_hash""".stripMargin,

    // window-min selection replicated with DuckDB's own struct-min window
    // (both engines order (gh, -pos) lexicographically → rightmost tie);
    // valid starts = 1..max(G-w+1, 1), the < w-gram degenerate window
    "tx_winnow" ->
      s"""WITH t AS (SELECT doc_id, $duckToksAll AS tk FROM documents),
         |g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
         |  i -> struct_pack(pos := i, gh :=
         |    CAST(('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' ||
         |      tk[i+2]), 1, 8)) AS BIGINT)))) AS s FROM t),
         |g AS (SELECT doc_id, s.pos AS pos, s.gh AS gh FROM g0),
         |sel AS (SELECT doc_id, pos,
         |    min(struct_pack(gh := gh, negpos := -pos)) OVER (
         |      PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         |    count(*) OVER (PARTITION BY doc_id) AS gcnt
         |  FROM g)
         |SELECT DISTINCT doc_id, CAST(-(m.negpos) AS BIGINT) AS fp_pos,
         |  CAST(m.gh AS BIGINT) AS fp_hash
         |FROM sel WHERE pos <= greatest(gcnt - 3, 1)
         |ORDER BY doc_id, fp_pos, fp_hash""".stripMargin,

    // per-chunk marker election over non-overlapping 50-token slices,
    // rolled up to integer mix statistics (mirror of langMixture)
    "tx_lang_mix" -> {
      val (scoreDefs, electCase) = duckLangScore("ctk")
      s"""WITH tok AS (SELECT doc_id, $duckToksAll AS tk FROM documents),
         |x AS (SELECT doc_id, tk, unnest(range(0,
         |  CASE WHEN len(tk) = 0 THEN 0
         |    ELSE greatest(CAST(ceil(len(tk) / 50.0) AS BIGINT), 1)
         |  END)) AS ci FROM tok),
         |ch AS (SELECT doc_id, tk[(ci*50+1):(ci*50+50)] AS ctk FROM x),
         |sc AS (SELECT doc_id, $scoreDefs FROM ch),
         |el AS (SELECT doc_id, $electCase AS lang FROM sc),
         |pl AS (SELECT doc_id, lang, count(*) AS c FROM el GROUP BY 1, 2),
         |rn AS (SELECT doc_id, lang, c, row_number() OVER (
         |  PARTITION BY doc_id ORDER BY c DESC, lang) AS rn FROM pl)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks,
         |  CAST(count(*) AS BIGINT) AS n_langs,
         |  max(CASE WHEN rn = 1 THEN lang END) AS majority_lang,
         |  CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS n_majority
         |FROM rn GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    "tx_chunks" ->
      s"""WITH tok AS (SELECT doc_id, $duckToksAll AS tk FROM documents),
         |x AS (SELECT doc_id, tk, unnest(range(0,
         |  CASE WHEN len(tk) = 0 THEN 0
         |    ELSE greatest(CAST(ceil((len(tk) - 10) / 40.0) AS BIGINT), 1)
         |  END)) AS chunk_index FROM tok)
         |SELECT doc_id, chunk_index,
         |  len(tk[(chunk_index*40+1):(chunk_index*40+50)]) AS n_tokens,
         |  md5(array_to_string(tk[(chunk_index*40+1):(chunk_index*40+50)],
         |    ' ')) AS chunk_md5
         |FROM x ORDER BY doc_id, chunk_index""".stripMargin,

    // integer cross-product drift: |c_a·n_b − c_b·n_a| — no floating
    // point anywhere (see the query's comment)
    "tx_drift" ->
      s"""WITH ta AS (SELECT unnest($duckToksAll) AS token
         |  FROM documents WHERE doc_id < 250),
         |tb AS (SELECT unnest($duckToksAll) AS token
         |  FROM documents WHERE doc_id >= 250),
         |ca AS (SELECT token, count(*) AS c_a FROM ta GROUP BY 1),
         |cb AS (SELECT token, count(*) AS c_b FROM tb GROUP BY 1),
         |na AS (SELECT sum(c_a) AS n_a FROM ca),
         |nb AS (SELECT sum(c_b) AS n_b FROM cb),
         |j AS (SELECT coalesce(ca.token, cb.token) AS token,
         |    coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
         |  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token)
         |SELECT token, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
         |  CAST(abs(c_a * n_b - c_b * n_a) AS BIGINT) AS drift_x
         |FROM j CROSS JOIN na CROSS JOIN nb
         |ORDER BY drift_x DESC, token ASC LIMIT 20""".stripMargin,

    "tx_heaps" ->
      s"""WITH m AS (SELECT max(doc_id) + 1 AS n FROM documents),
         |ks AS (SELECT DISTINCT (n * i) // 10 AS k
         |  FROM m, range(1, 11) r(i)),
         |tok AS (SELECT doc_id, unnest($duckToksAll) AS tok
         |  FROM documents),
         |fo AS (SELECT tok, min(doc_id) AS fd FROM tok GROUP BY 1),
         |vc AS (SELECT k, count(*) AS vocab_size
         |  FROM ks JOIN fo ON fo.fd < ks.k GROUP BY 1),
         |dc AS (SELECT doc_id, CAST(len($duckToksAll) AS BIGINT) AS nt
         |  FROM documents),
         |ta AS (SELECT k, count(*) AS n_docs, sum(nt) AS total_tokens
         |  FROM ks JOIN dc ON dc.doc_id < ks.k GROUP BY 1)
         |SELECT CAST(ta.k AS BIGINT) AS checkpoint,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(total_tokens AS BIGINT) AS total_tokens,
         |  CAST(vocab_size AS BIGINT) AS vocab_size
         |FROM ta JOIN vc USING (k) ORDER BY checkpoint""".stripMargin,

    "tx_lm_perplexity" ->
      s"""WITH $lmStatsCtes
         |SELECT doc_id, neg_logp_sum_micro, n_bigrams
         |FROM stats ORDER BY doc_id""".stripMargin,

    // per-doc cross-entropy key derived from the shared stats by EXACT
    // integer arithmetic (the overflow-safe split of floor(neg·10⁶ / n));
    // tercile = plain SQL ntile, which the engine reproduces skew-safely
    "tx_ppl_buckets" ->
      s"""WITH $lmStatsCtes,
         |k AS (SELECT doc_id, CAST(
         |    (neg_logp_sum_micro // n_bigrams) * 1000000
         |    + ((neg_logp_sum_micro % n_bigrams) * 1000000) // n_bigrams
         |  AS BIGINT) AS ce_pico FROM stats),
         |b AS (SELECT d.doc_id, d.lang, k.ce_pico,
         |    CAST(ntile(3) OVER (PARTITION BY d.lang
         |      ORDER BY k.ce_pico, d.doc_id) AS BIGINT) AS tercile
         |  FROM k JOIN documents d USING (doc_id))
         |SELECT doc_id, lang, ce_pico, tercile,
         |  CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |    ELSE 'tail' END AS ppl_bucket
         |FROM b ORDER BY doc_id""".stripMargin,

    "tx_repetition" -> {
      def grams(n: Int): String = {
        val parts = (0 until n).map(k => s"tk[i+$k]").mkString(" || ' ' || ")
        s"list_transform(range(1, CASE WHEN len(tk) >= $n " +
          s"THEN len(tk) - ${n - 1} ELSE 0 END + 1), i -> $parts)"
      }
      val maxRun =
        """CASE WHEN len(tk) = 0 THEN 0 ELSE CAST((list_reduce(
          |  list_transform(tk, t -> struct_pack(best := 1, cur := 1, prev := t)),
          |  (a, b) -> struct_pack(
          |    best := greatest(a.best,
          |      CASE WHEN b.prev = a.prev THEN a.cur + 1 ELSE 1 END),
          |    cur := CASE WHEN b.prev = a.prev THEN a.cur + 1 ELSE 1 END,
          |    prev := b.prev))).best AS BIGINT) END""".stripMargin
      s"""WITH tok AS (SELECT doc_id, text, $duckToksAll AS tk FROM documents),
         |g AS (SELECT doc_id, text, tk,
         |  ${grams(2)} AS g2, ${grams(3)} AS g3 FROM tok)
         |SELECT doc_id,
         |  CASE WHEN len(g2) > 0 THEN 1.0 -
         |    CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
         |    ELSE 0.0 END AS dup_2gram_frac,
         |  CASE WHEN len(g3) > 0 THEN 1.0 -
         |    CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
         |    ELSE 0.0 END AS dup_3gram_frac,
         |  CASE WHEN len(g2) > 0 THEN
         |    CAST(list_max(list_transform(list_distinct(g2),
         |      d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE) / len(g2)
         |    ELSE 0.0 END AS top_2gram_frac,
         |  $maxRun AS max_token_run,
         |  CASE WHEN len(tk) > 0 THEN
         |    CAST((length(text) - length(replace(text, '#', ''))) +
         |      (length(text) - length(replace(text, '...', ''))) / 3
         |      AS DOUBLE) / len(tk)
         |    ELSE 0.0 END AS symbol_ratio
         |FROM g ORDER BY doc_id""".stripMargin
    },

    // the staged family chain re-derived from the engine's own pattern
    // table (one source of truth; patterns are dialect-portable by
    // contract so the same strings run under RE2)
    "tx_redact" -> {
      val chained = TextAnalysis.piiPatterns.foldLeft("text") {
        case (e, (_, tok, pat)) => s"regexp_replace($e,\n    '$pat', '$tok', 'g')"
      }
      s"""SELECT doc_id,
         |  $chained AS redacted
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // per-family counters: each stage counts its matches on the text as
    // it looks when that family runs, then applies the replace — the
    // exact redactPiiStats staging
    "tx_redact_stats" -> {
      val stages = TextAnalysis.piiPatterns.zipWithIndex.map {
        case ((name, tok, pat), i) =>
          s"""s${i + 1} AS (SELECT
             |  * REPLACE (regexp_replace(t, '$pat', '$tok', 'g') AS t),
             |  CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT)
             |    AS n_$name
             |  FROM s$i)""".stripMargin
      }.mkString(",\n")
      val names = TextAnalysis.piiPatterns.map(p => s"n_${p._1}").mkString(", ")
      s"""WITH s0 AS (SELECT doc_id, text AS t FROM documents),
         |$stages
         |SELECT doc_id, $names, t AS redacted
         |FROM s${TextAnalysis.piiPatterns.size} ORDER BY doc_id""".stripMargin
    },

    // the model's sufficient statistics — pure integer counts, fully
    // recomputed by the oracle (no ln anywhere on the gate)
    "nb_quality_model" -> nbCountsSql,

    // incremental train == full retrain: the oracle is the SAME
    // full-corpus counts the batch query restricts against
    "nb_incr_model" -> nbCountsSql,

    // the per-token micro log constants (int64) and the micro prior come
    // from the registered model literals when present (the engine's
    // quantized values × 10⁶ — no libm ln, no decimal literal in the
    // oracle); the data-sized tokenize/join/sum remains recomputed in SQL
    // as PURE INTEGER arithmetic. Fallback: derive the model in SQL with
    // ln + round(·10⁶) — rows/schema-grade only, like all fallbacks.
    "nb_quality_score" -> {
      // one scoring tail; the branches differ only in where mq/pr come from
      val scoreTail =
        """dl AS (SELECT tok.doc_id,
          |    sum(mq.lpos_micro - mq.lneg_micro) AS delta
          |  FROM tok JOIN mq USING (token) GROUP BY 1),
          |sc AS (SELECT d.doc_id,
          |    CAST(coalesce(dl.delta, 0) + pr.prior_micro AS BIGINT)
          |      AS score_micro
          |  FROM documents d LEFT JOIN dl ON dl.doc_id = d.doc_id
          |  CROSS JOIN pr)
          |SELECT doc_id, score_micro,
          |  CAST(CASE WHEN score_micro > 0 THEN 1 ELSE 0 END AS BIGINT)
          |    AS predicted
          |FROM sc ORDER BY doc_id""".stripMargin
      (OracleLits.get("nb_model"), OracleLits.get("nb_prior")) match {
        case (Some(m), Some(p)) =>
          s"""WITH tok AS (SELECT doc_id, unnest($duckToksAll) AS token
             |  FROM documents),
             |mq AS (SELECT * FROM $m),
             |pr AS (SELECT CAST($p AS BIGINT) AS prior_micro),
             |$scoreTail""".stripMargin
        case _ =>
          // decimal(18,6) × 10⁶ is integer-valued; the cast is exact
          s"""$nbModelCte,
             |mq AS (SELECT token,
             |    CAST(logp_pos * 1000000 AS BIGINT) AS lpos_micro,
             |    CAST(logp_neg * 1000000 AS BIGINT) AS lneg_micro FROM m),
             |pr AS (SELECT CAST(round(ln(
             |    (sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1.0) /
             |    (sum(CASE WHEN pos THEN 0 ELSE 1 END) + 1.0)) * 1000000.0)
             |  AS BIGINT) AS prior_micro FROM lab),
             |$scoreTail""".stripMargin
      }
    },

    "nb_calibration" ->
      s"""$nbModelCte,
         |pr AS (SELECT CAST(ln(
         |    (sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1.0) /
         |    (sum(CASE WHEN pos THEN 0 ELSE 1 END) + 1.0))
         |  AS DECIMAL(18,6)) AS prior FROM lab),
         |dl AS (SELECT tok.doc_id, sum(m.logp_pos - m.logp_neg) AS delta
         |  FROM tok JOIN m USING (token) GROUP BY 1),
         |sc AS (SELECT d.doc_id,
         |    CAST(coalesce(dl.delta, 0) + pr.prior AS DECIMAL(18,6)) AS score,
         |    (d.source IN ('src0', 'src1', 'src2')) AS pos
         |  FROM documents d LEFT JOIN dl ON dl.doc_id = d.doc_id
         |  CROSS JOIN pr),
         |p AS (SELECT pos, CAST(1.0 / (1.0 + exp(-CAST(score AS DOUBLE)))
         |    AS DECIMAL(18,6)) AS p6 FROM sc)
         |SELECT least(CAST(floor(p6 * 10) AS BIGINT), 9) AS bin,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(sum(CAST(p6 * 1000000 AS BIGINT)) AS BIGINT) AS sum_pred_micro
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // the weights ARE the engine's registered constants (lit_check
    // re-derives the GD trajectory from the fixtures independently)
    "lr_quality_model" -> {
      val vals = TextAnalysis.lrFeatureNames.zip(lrWeightNanos)
        .map { case (f, n) => s"(${OracleLits.sqlStr(f)}, $n)" }
        .mkString(", ")
      s"""SELECT feature, CAST(weight_nano AS BIGINT) AS weight_nano
         |FROM (VALUES $vals) AS t(feature, weight_nano)
         |ORDER BY feature""".stripMargin
    },

    // margin re-derived from the nano literals by one IEEE division and
    // the identical left-associated dot product over identically-derived
    // features; the compared surface is floor(margin·10⁹) int64
    "lr_quality_score" ->
      s"""WITH $qfStatsCtes,
         |$lrScoreCtes
         |SELECT doc_id,
         |  CAST(floor(margin * 1000000000.0) AS BIGINT) AS margin_nano,
         |  (CAST(floor(margin * 1000000000.0) AS BIGINT) > 0) AS predicted
         |FROM m ORDER BY doc_id""".stripMargin,

    // both scorers replayed through their existing CTE stacks, ranks by
    // the identical (score desc, id) total order, fusion pure integer;
    // the degenerate no-lits fallback only fires when the query never ran
    "tx_quality_ensemble" -> {
      val nbSrc =
        (OracleLits.get("nb_model"), OracleLits.get("nb_prior")) match {
          case (Some(mm), Some(p)) =>
            s"""mq AS (SELECT * FROM $mm),
               |pr AS (SELECT CAST($p AS BIGINT) AS prior_micro)""".stripMargin
          case _ =>
            """mq AS (SELECT '' AS token, 0 AS lpos_micro,
              |    0 AS lneg_micro WHERE false),
              |pr AS (SELECT CAST(0 AS BIGINT) AS prior_micro)""".stripMargin
        }
      s"""WITH $qfStatsCtes,
         |$lrScoreCtes,
         |tok AS (SELECT doc_id, unnest($duckToksAll) AS token
         |  FROM documents),
         |$nbSrc,
         |lrn AS (SELECT doc_id,
         |    CAST(floor(margin * 1000000000.0) AS BIGINT) AS margin_nano
         |  FROM m),
         |dl AS (SELECT tok.doc_id,
         |    sum(mq.lpos_micro - mq.lneg_micro) AS delta
         |  FROM tok JOIN mq USING (token) GROUP BY 1),
         |scn AS (SELECT d.doc_id,
         |    CAST(coalesce(dl.delta, 0) + pr.prior_micro AS BIGINT)
         |      AS score_micro
         |  FROM documents d LEFT JOIN dl ON dl.doc_id = d.doc_id
         |  CROSS JOIN pr),
         |lrr AS (SELECT doc_id, row_number() OVER (
         |    ORDER BY margin_nano DESC, doc_id) AS lr_rank FROM lrn),
         |nbr AS (SELECT doc_id, row_number() OVER (
         |    ORDER BY score_micro DESC, doc_id) AS nb_rank FROM scn),
         |fz AS (SELECT doc_id, lr_rank, nb_rank,
         |    1000000 // (60 + lr_rank) + 1000000 // (60 + nb_rank)
         |      AS rrf_micro
         |  FROM lrr JOIN nbr USING (doc_id))
         |SELECT doc_id, CAST(lr_rank AS BIGINT) AS lr_rank,
         |  CAST(nb_rank AS BIGINT) AS nb_rank,
         |  CAST(rrf_micro AS BIGINT) AS rrf_micro
         |FROM fz ORDER BY rrf_micro DESC, doc_id LIMIT 50""".stripMargin
    },

    "lr_quality_eval" ->
      s"""WITH $qfStatsCtes,
         |$lrScoreCtes,
         |p AS (SELECT m.doc_id,
         |    (CAST(floor(m.margin * 1000000000.0) AS BIGINT) > 0) AS pred,
         |    (g.n_tokens >= 45 AND g.n_stopwords * 20 >= g.n_tokens) AS y
         |  FROM m JOIN g USING (doc_id))
         |SELECT
         |  CAST(sum(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fp,
         |  CAST(sum(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fn,
         |  CAST(sum(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END)
         |    AS BIGINT) AS tn
         |FROM p""".stripMargin,

    "tx_source_prior" ->
      s"""WITH $qfStatsCtes,
         |lab AS (SELECT g.doc_id, d.source,
         |    (g.n_tokens >= 45 AND g.n_stopwords * 20 >= g.n_tokens) AS pass
         |  FROM g JOIN documents d USING (doc_id))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST((10000 * sum(CASE WHEN pass THEN 1 ELSE 0 END)) // count(*)
         |    AS BIGINT) AS pass_bp
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,

    "tx_prior_keep" ->
      s"""WITH $qfStatsCtes,
         |lab AS (SELECT g.doc_id, d.source, g.n_tokens,
         |    (g.n_tokens >= 45 AND g.n_stopwords * 20 >= g.n_tokens) AS pass
         |  FROM g JOIN documents d USING (doc_id)),
         |pr AS (SELECT source,
         |    (10000 * sum(CASE WHEN pass THEN 1 ELSE 0 END)) // count(*)
         |      AS pass_bp
         |  FROM lab GROUP BY 1),
         |r AS (SELECT lab.doc_id, lab.source,
         |    CASE WHEN pass THEN 'doc_pass'
         |      WHEN pr.pass_bp >= 5000 AND lab.n_tokens >= 40
         |        THEN 'domain_rescue'
         |      ELSE 'drop' END AS reason
         |  FROM lab JOIN pr USING (source))
         |SELECT doc_id, source, (reason != 'drop') AS keep, reason
         |FROM r ORDER BY doc_id""".stripMargin,

    "tx_postings" -> duckPostingsSql,

    // merge == retrain: the incremental index must equal the full-corpus
    // index, so the oracle IS the full-corpus formulation
    "tx_postings_incr" -> duckPostingsSql,

    // per-term idf from the registered literals when present (the exact
    // doubles the engine's Catalyst log produced — the oracle performs
    // only IEEE ×/÷ on them, which is deterministic across engines);
    // tf/dl/N/Σdl remain recomputed. The gate surface is the int64 NANO
    // score: floor(contrib·10⁹) per (doc, term) — floor of a shared
    // double has no round-half tie for engine builds to disagree on —
    // summed and ordered as pure integers. Fallback: re-derive the ln.
    "tx_bm25" -> {
      // idf is reconstructed from the INTEGER nano literal by one IEEE
      // division — identical bits on any engine, no float literal parse
      val scoreTail =
        s"""sc AS (SELECT t.doc_id, d.qt, d.df,
           |    (CAST(d.idf9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)) AS idf,
           |    len(list_filter(t.tk, x -> x = d.qt)) AS tf, len(t.tk) AS dl
           |  FROM tok t JOIN qd d ON list_contains(t.tk, d.qt)),
           |c AS (SELECT doc_id,
           |    CAST(floor((idf
           |      * (tf * CAST(2.5 AS DOUBLE))
           |      / (tf + CAST(1.5 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
           |        + CAST(0.75 AS DOUBLE) * ((dl * st.n) / st.sumdl))))
           |      * 1000000000.0) AS BIGINT) AS contrib
           |  FROM sc, st)
           |SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_nano
           |FROM c GROUP BY 1 ORDER BY score_nano DESC, doc_id LIMIT 20""".stripMargin
      OracleLits.get("bm25_qd") match {
        case Some(qd) =>
          s"""WITH tok AS (SELECT doc_id, $duckToksAll AS tk FROM documents),
             |st AS (SELECT count(*) AS n, sum(len(tk)) AS sumdl FROM tok),
             |qd AS (SELECT * FROM $qd),
             |$scoreTail""".stripMargin
        case None =>
          s"""WITH tok AS (SELECT doc_id, $duckToksAll AS tk FROM documents),
             |st AS (SELECT count(*) AS n, sum(len(tk)) AS sumdl FROM tok),
             |qd AS (SELECT qt, count(*) AS df,
             |    CAST(floor(ln(CAST(1.0 AS DOUBLE)
             |      + ((SELECT n FROM st) - count(*) + CAST(0.5 AS DOUBLE))
             |        / (count(*) + CAST(0.5 AS DOUBLE)))
             |      * 1000000000.0) AS BIGINT) AS idf9 FROM
             |    (SELECT unnest(['spark', 'window', 'join', 'quantum']) AS qt) q
             |  JOIN tok ON list_contains(tk, qt) GROUP BY 1),
             |$scoreTail""".stripMargin
      }
    },

    // hybrid fusion: BM25 ranks re-derived through the identical
    // score_nano tail (idf from the INTEGER nano literal), dense ranks by
    // the cosine order the ann oracles use; the fusion itself is integer
    // division only — no float ever reaches a compared column
    "tx_rrf_fusion" -> {
      val qdSql = OracleLits.get("rrf_qd") match {
        case Some(qd) => s"SELECT * FROM $qd"
        case None =>
          s"""SELECT qt, count(*) AS df,
             |    CAST(floor(ln(CAST(1.0 AS DOUBLE)
             |      + ((SELECT n FROM st) - count(*) + CAST(0.5 AS DOUBLE))
             |        / (count(*) + CAST(0.5 AS DOUBLE)))
             |      * 1000000000.0) AS BIGINT) AS idf9 FROM
             |    (SELECT unnest(['spark', 'window', 'join', 'quantum']) AS qt) q
             |  JOIN tok ON list_contains(tk, qt) GROUP BY 1""".stripMargin
      }
      s"""WITH tok AS (SELECT doc_id, $duckToksAll AS tk FROM documents),
         |st AS (SELECT count(*) AS n, sum(len(tk)) AS sumdl FROM tok),
         |qd AS ($qdSql),
         |sc AS (SELECT t.doc_id, d.qt, d.df,
         |    (CAST(d.idf9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)) AS idf,
         |    len(list_filter(t.tk, x -> x = d.qt)) AS tf, len(t.tk) AS dl
         |  FROM tok t JOIN qd d ON list_contains(t.tk, d.qt)),
         |co AS (SELECT doc_id,
         |    CAST(floor((idf
         |      * (tf * CAST(2.5 AS DOUBLE))
         |      / (tf + CAST(1.5 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
         |        + CAST(0.75 AS DOUBLE) * ((dl * st.n) / st.sumdl))))
         |      * 1000000000.0) AS BIGINT) AS contrib
         |  FROM sc, st),
         |bmk AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_nano
         |  FROM co GROUP BY 1 ORDER BY score_nano DESC, doc_id LIMIT 20),
         |bm AS (SELECT doc_id, row_number() OVER (
         |    ORDER BY score_nano DESC, doc_id) AS rs FROM bmk),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |dtop AS (SELECT neighbor_id, rnk AS rd FROM (
         |  SELECT vec_id AS neighbor_id, row_number() OVER (
         |    ORDER BY ${ScaleShared.duckCosine("qe", "embedding")} DESC,
         |      vec_id) AS rnk
         |  FROM embeddings, qv WHERE vec_id != 0) WHERE rnk <= 20),
         |f AS (SELECT coalesce(bm.doc_id, dtop.neighbor_id) AS doc_id,
         |    coalesce(rs, 0) AS sparse_rnk, coalesce(rd, 0) AS dense_rnk,
         |    coalesce(1000000 // (60 + rs), 0)
         |      + coalesce(1000000 // (60 + rd), 0) AS rrf_micro
         |  FROM bm FULL OUTER JOIN dtop ON bm.doc_id = dtop.neighbor_id)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(sparse_rnk AS BIGINT) AS sparse_rnk,
         |  CAST(dense_rnk AS BIGINT) AS dense_rnk,
         |  CAST(rrf_micro AS BIGINT) AS rrf_micro
         |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin
    },

    "tx_len_hist" ->
      """SELECT CAST(length(bin(len(list_filter(
        |    string_split_regex(trim(text), '\s+'), t -> t != '')) + 1)) - 1
        |    AS BIGINT) AS log2_tokens,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "tx_collocations" ->
      s"""WITH tok AS (SELECT $duckToksAll AS tk FROM documents),
         |uni AS (SELECT w, count(*) AS c_w FROM
         |  (SELECT unnest(tk) AS w FROM tok) GROUP BY w),
         |ntok AS (SELECT sum(c_w) AS n_tok FROM uni),
         |bi AS (SELECT bigram, count(*) AS c_ab FROM
         |  (SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i + 1])) AS bigram FROM tok)
         |  GROUP BY bigram HAVING count(*) >= 5),
         |nbi AS (SELECT sum(CASE WHEN len(tk) > 1 THEN len(tk) - 1
         |  ELSE 0 END) AS n_bi FROM tok)
         |SELECT bigram, c_ab,
         |  CAST(floor((ln((CAST(c_ab AS DOUBLE) / n_bi) /
         |    ((CAST(u1.c_w AS DOUBLE) / n_tok) *
         |     (CAST(u2.c_w AS DOUBLE) / n_tok))) / ln(2.0)) * 1000000.0)
         |    AS BIGINT) AS pmi_micro
         |FROM bi
         |JOIN uni u1 ON split_part(bigram, ' ', 1) = u1.w
         |JOIN uni u2 ON split_part(bigram, ' ', 2) = u2.w
         |CROSS JOIN ntok CROSS JOIN nbi
         |ORDER BY pmi_micro DESC, bigram ASC LIMIT 20""".stripMargin,

    "tx_top_ngrams" ->
      s"""WITH tok AS (SELECT $duckToksAll AS tk FROM documents),
         |g AS (SELECT unnest(list_transform(
         |    range(1, CASE WHEN len(tk) >= 2 THEN len(tk) - 1 ELSE 0 END + 1),
         |    i -> tk[i] || ' ' || tk[i + 1])) AS ngram FROM tok)
         |SELECT ngram, count(*) AS cnt FROM g GROUP BY ngram
         |ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin,

    "tx_char_entropy" ->
      """WITH c AS (SELECT doc_id, length(text) AS n,
        |    unnest(list_transform(range(1, length(text) + 1),
        |      i -> substr(text, i, 1))) AS ch FROM documents),
        |h AS (SELECT doc_id, n, ch, count(*) AS cnt FROM c GROUP BY 1, 2, 3)
        |SELECT doc_id,
        |  CAST(floor(-sum((cnt * 1.0 / n) * log2(cnt * 1.0 / n)) * 1000000.0)
        |    AS BIGINT) AS entropy_micro
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "tx_blocklist" -> {
      val terms = blocklistTerms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      x -> x != '')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      x -> x != '' AND list_contains($terms, x))) AS BIGINT) AS n_hits
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_hits, n_hits * 20 <= n_tokens AS keep
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "tx_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, lang, $duckToksAll AS tk FROM documents),
         |g AS (SELECT doc_id, lang, list_transform(
         |    range(1, CASE WHEN len(tk) >= 2 THEN len(tk) - 1 ELSE 0 END + 1),
         |    i -> tk[i] || ' ' || tk[i + 1]) AS grams FROM tok),
         |freq AS (SELECT unnest(grams) AS ngram FROM g),
         |top3 AS (SELECT ngram FROM (SELECT ngram, count(*) AS cnt FROM freq
         |  GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 3)),
         |evl AS (SELECT list(ngram) AS ev FROM top3)
         |SELECT doc_id, lang FROM g CROSS JOIN evl
         |WHERE NOT list_has_any(list_distinct(grams), ev)
         |ORDER BY doc_id""".stripMargin,

    "bpe_pair_freqs" ->
      s"""WITH wf AS (SELECT w, count(*) AS freq FROM (
         |    SELECT unnest($duckToksAll) AS w FROM documents) GROUP BY w),
         |sym AS (SELECT list_transform(range(1, length(w) + 1),
         |    i -> substr(w, i, 1)) AS s, freq FROM wf),
         |p AS (SELECT unnest(list_transform(range(1, len(s)),
         |    i -> struct_pack(a := s[i], b := s[i + 1]))) AS pr, freq FROM sym)
         |SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS freq FROM p
         |GROUP BY 1, 2 ORDER BY freq DESC, a, b LIMIT 20""".stripMargin,

    "bpe_merges" -> bpeMergesSql,

    "bpe_encode" -> bpeEncodeSql,

    "bpe_roundtrip" ->
      s"""WITH $bpeEncodeCtes
         |SELECT CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(CASE WHEN array_to_string(sy, '') = w THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_mismatched
         |FROM wenc""".stripMargin,

    "bpe_fertility" -> bpeFertilitySql,

    // final unigram vocabulary: every corpus character (usage 0 when the
    // seed segmentation never used it) plus the 12 highest-usage
    // multi-char pieces, total order (usage desc | piece)
    "tok_unigram_vocab" ->
      s"""WITH $unigramCommonCtes
         |SELECT piece, CAST(pu AS BIGINT) AS usage FROM (
         |  SELECT c.piece, coalesce(u.uscore, 0) AS pu
         |  FROM uch c LEFT JOIN uus u USING (piece)
         |  UNION ALL
         |  SELECT piece, uscore AS pu FROM (
         |    SELECT piece, uscore FROM uus WHERE length(piece) >= 2
         |    ORDER BY uscore DESC, piece LIMIT 12))
         |ORDER BY piece""".stripMargin,

    "tok_unigram_encode" ->
      s"""WITH $unigramCommonCtes,
         |wenc AS (SELECT w, array_to_string(segs, ' ') AS enc,
         |  CAST(len(segs) AS BIGINT) AS np FROM fg8),
         |dt AS (SELECT doc_id, i AS pos, tk[i] AS w
         |  FROM (SELECT doc_id, $duckToksAll AS tk FROM documents),
         |  LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) t),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(np) AS BIGINT) AS n_pieces,
         |  md5(string_agg(enc, ' ' ORDER BY pos)) AS enc_md5
         |  FROM dt JOIN wenc USING (w) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
         |  CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
         |  coalesce(a.enc_md5, md5('')) AS enc_md5
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // the tok_unigram_encode chain aggregated per language — the
    // bpe_fertility shape over the unigram piece counts, integer sums
    "tok_unigram_fertility" ->
      s"""WITH $unigramCommonCtes,
         |wenc AS (SELECT w, CAST(len(segs) AS BIGINT) AS np FROM fg8),
         |dt AS (SELECT doc_id, tk[i] AS w
         |  FROM (SELECT doc_id, $duckToksAll AS tk FROM documents),
         |  LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) t),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(np) AS BIGINT) AS n_pieces
         |  FROM dt JOIN wenc USING (w) GROUP BY doc_id)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(coalesce(a.n_words, 0)) AS BIGINT) AS total_words,
         |  CAST(sum(coalesce(a.n_pieces, 0)) AS BIGINT) AS total_pieces
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
  )
}
