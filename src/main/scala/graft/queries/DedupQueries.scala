package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Multimodal, Pq, Sampling, Similarity, Temporal, TextAnalysis}
import ScaleShared._

/** Deduplication family: exact / MinHash-LSH / SimHash / n-gram
  * Jaccard / segment / cross-doc-repeat / embedding near-dup queries and
  * their connected-components clustering, incremental variants included.
  *
  * Mechanically split out of the former single-file ScaleQueries registry;
  * each family owns its queries AND their DuckDB oracle SQL. */
object DedupQueries {

  val queries: Map[String, QF] = Map(
    // Exact dedup: hash-partitioned groupBy on content fingerprint
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(docsWithDups(s, d), "doc_id", "text").orderBy("keep_id")),

    // Exact-dedup survivors (ranking-window formulation, min id wins)
    "dedup_survivors" -> ((s, d) =>
      Dedup.exactSurvivors(docsWithDups(s, d), "doc_id", "text")
        .select("doc_id").orderBy("doc_id")),

    // MinHash signatures (k=16, MD5-derived affine permutations)
    "dedup_minhash_sig" -> ((s, d) =>
      tokenizedDocs(s, d)
        .withColumn("tk", array_distinct(col("tk")))
        .withColumn("hashed", Dedup.hashedElems(col("tk")))
        .select(col("doc_id"),
          concat_ws("-", transform(Dedup.minhashFromHashes(col("hashed"), 16),
            x => x.cast("string"))).as("sig"))
        .orderBy("doc_id")),

    // Banded-LSH candidate pairs + exact-Jaccard verification
    "dedup_minhash_pairs" -> ((s, d) =>
      Dedup.minhashCandidates(docsWithDups(s, d), "doc_id", "text",
        k = 16, bands = 4, jaccardThreshold = 0.9)
        .orderBy("id_a", "id_b")),

    // Fuzzy benchmark decontamination: the corpus' LSH band buckets probe
    // the (broadcast-sized) eval set's buckets — near-duplicates of eval
    // docs drop even when exact n-gram screening would miss them; the
    // survivors are the decontaminated training set
    "tx_decontaminate_fuzzy" -> ((s, d) => {
      val corpus = docsWithDups(s, d)
      val eval = docs(s, d).filter(col("doc_id") < 5)
        .select(col("doc_id").as("eval_id"), col("text"))
      Dedup.fuzzyDecontaminate(corpus, "doc_id", "text",
        eval, "eval_id", "text", k = 16, bands = 4,
        jaccardThreshold = 0.9)
        .select("doc_id").orderBy("doc_id")
    }),

    // LSH tuning frontier: candidate cost + verified yield per band count
    // over the dup'd corpus — the S-curve deployment table (precision =
    // verified/candidates, recall reads relatively down the bands axis)
    "dedup_lsh_frontier" -> ((s, d) =>
      Dedup.lshFrontier(docsWithDups(s, d), "doc_id", "text", k = 16,
        bandsAxis = Seq(2, 4, 8), jaccardThreshold = 0.9)
        .orderBy("bands")),

    // Segment-level dedup (C4-style boilerplate removal): duplicate docs'
    // segments all dedup away; each doc reassembles from survivors
    "dedup_segments" -> ((s, d) =>
      Dedup.segmentDedup(docsWithDups(s, d), "doc_id", "text", 10)
        .orderBy("doc_id")),

    // Incremental segment dedup: a new batch (rest of the corpus plus a
    // full duplicate copy) reassembles against the persisted segment-
    // fingerprint state of the id<250 head — history is never re-scanned;
    // output equals batch-at-once segmentDedup over the union corpus
    // restricted to the batch ids (monotone-id contract)
    "dedup_incr_segments" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "text")
      val state = Dedup.segmentState(
        dd.filter(col("doc_id") < 250), "doc_id", "text", 10)
      val batch = dd.filter(col("doc_id") >= 250)
        .unionByName(dd.withColumn("doc_id", col("doc_id") + 10000))
      Dedup.segmentDedupIncremental(state, batch, "doc_id", "text", 10)._1
        .orderBy("doc_id")
    }),

    // Incremental exact dedup: a new batch dedups against persisted
    // fingerprint state — history is never re-scanned (state: docs < 250;
    // batch: the rest plus a full duplicate copy of the corpus)
    "dedup_incr_exact" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "text")
      val state = Dedup.exactState(
        dd.filter(col("doc_id") < 250), "doc_id", "text")
      val batch = docsWithDups(s, d).filter(col("doc_id") >= 250)
      Dedup.exactIncremental(state, batch, "doc_id", "text")._1
        .select("doc_id").orderBy("doc_id")
    }),

    // Incremental fuzzy dedup: the batch's signatures band-join the stored
    // corpus state; only pairs with a batch endpoint emit
    "dedup_incr_minhash" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "text")
      val state = Dedup.minhashState(dd, "doc_id", "text", 16, 3)
      val batch = dd.withColumn("doc_id", col("doc_id") + 10000)
      Dedup.minhashIncremental(state, batch, "doc_id", "text",
        k = 16, bands = 4, jaccardThreshold = 0.9, shingleN = 3)._1
        .orderBy("id_a", "id_b")
    }),

    // Cross-document repeated-substring detection (Lee et al. '21
    // analogue): fingerprinted sliding 8-token windows, repeated = seen
    // in >= 2 distinct docs. Corpus duplicates only the id<250 head, so
    // duplicated docs report full window coverage and the rest report
    // only natural overlap
    "dedup_cross_repeats" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "text")
      val corpus = dd.unionByName(dd.filter(col("doc_id") < 250)
        .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.crossDocRepeats(corpus, "doc_id", "text", 8, 2)
        .orderBy("doc_id")
    }),

    // Exact-substring span REWRITING (the removal half of Lee '21):
    // repeated 8-token windows are excised from every occurrence except
    // the corpus-wide first, overlapping flagged spans merged by interval
    // union, documents reassembled from the uncovered tokens (a fully
    // covered doc drops). The oracle replays the whole pipeline —
    // windows, first-occurrence ranking, gaps-and-islands union,
    // reassembly — over the same MD5 window family
    "dedup_span_rewrite" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "text")
      val corpus = dd.unionByName(dd.filter(col("doc_id") < 250)
        .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.spanRewrite(corpus, "doc_id", "text", 8, 2)
        .orderBy("doc_id")
    }),

    // Multi-length span rewriting (the maximal-span form of Lee '21
    // removal): detection at 5/8/13-token windows, each length keeping
    // its own corpus-wide first occurrence, flagged intervals united by
    // the same gaps-and-islands merge before excision — long boilerplate
    // is removed at its own granularity while short repeats still catch
    "dedup_span_multi" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id", "text")
      val corpus = dd.unionByName(dd.filter(col("doc_id") < 250)
        .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.spanRewriteMulti(corpus, "doc_id", "text", Seq(5, 8, 13), 2)
        .orderBy("doc_id")
    }),

    // Incremental clustering: yesterday's labeling (as its star forest)
    // merges with the batch's new pairs — must equal batch-at-once CC.
    // Yesterday's state (minhash signatures + CC labels) is PERSISTED
    // parquet, exactly as deployed — the measured path is signature the
    // batch, band-join it against state, re-contract; not a history
    // re-clustering (which is what made this query the round-4 bench's
    // heaviest entry). First invocation in a session builds the state
    // (Bench builds it in the untimed warmup)
    "dedup_incr_components" -> ((s, d) => {
      val stateDir = ensureIncrCcState(s, d)
      val dd = docs(s, d).select("doc_id", "text")
      val state = s.read.parquet(s"$stateDir/minhash")
      val oldLabels = s.read.parquet(s"$stateDir/labels")
      val batch = dd.withColumn("doc_id", col("doc_id") + 10000)
      val (newPairs, _) = Dedup.minhashIncremental(state, batch,
        "doc_id", "text", k = 16, bands = 4, jaccardThreshold = 0.9,
        shingleN = 3)
      Dedup.connectedComponentsIncremental(oldLabels, newPairs).orderBy("id")
    }),

    // Duplicate-group clustering: connected components over the LSH pairs
    // (memoized session labels — the oracle re-derives CC independently)
    "dedup_components" -> ((s, d) => ccLabels(s, d).orderBy("id")),

    // Quality-aware dedup survivor: per duplicate cluster keep the BEST
    // document ((n_chars desc, id) total order — longest content wins, not
    // min-id), via the skew-safe two-phase topPerGroup window; singletons
    // survive as their own cluster
    "dedup_best_survivor" -> ((s, d) => {
      val dd = docsWithDups(s, d)
      val labels = ccLabels(s, d)
      val withComp = dd
        .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"),
          "left_outer")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
        .select(col("doc_id"), col("component"),
          length(col("text")).cast("long").as("n_chars"))
      Sampling.topPerGroup(withComp, "component", col("doc_id"), 1,
        Seq(col("n_chars").desc, col("doc_id").asc))
        .select("component", "doc_id", "n_chars")
        .orderBy("component")
    }),

    // Dedup report: duplicate-cluster size histogram (how much of the
    // corpus is duplicated, at what multiplicity) — constant output rows
    // at any corpus size; singletons counted via the anti-joined remainder
    "dedup_cluster_stats" -> ((s, d) => {
      val dd = docsWithDups(s, d)
      val labels = ccLabels(s, d)
      val clustered = labels.groupBy("component")
        .agg(count(lit(1)).as("cluster_size"))
      val nSingle = dd.join(labels.withColumnRenamed("id", "doc_id"),
          Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_clusters"))
        .select(lit(1L).as("cluster_size"), col("n_clusters"))
      clustered.groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"))
        .unionByName(nSingle)
        .groupBy("cluster_size")
        .agg(sum(col("n_clusters")).as("n_clusters"))
        .orderBy("cluster_size")
    }),

    // SimHash (16-bit, MD5-nibble majority votes) — the codegen kernel:
    // one digest + one vote loop per token inside whole-stage codegen
    "dedup_simhash" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), Dedup.simhash(col("text"), 16).as("sh"))
        .orderBy("doc_id")),

    // n-gram (3-word shingle) Jaccard over consecutive-id candidate pairs;
    // shingle sets materialized once per doc, reused on both join sides
    "dedup_ngram_jaccard" -> ((s, d) => {
      val base = tokenizedDocs(s, d)
        .select(col("doc_id"), TextAnalysis.shinglesOf(col("tk"), 3).as("sg"))
      val a = base.select(col("doc_id").as("id_a"), col("sg").as("sa"))
      val b = base.select(col("doc_id").as("id_b"), col("sg").as("sb"))
      a.join(b, col("id_a") + 1 === col("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.jaccard(col("sa"), col("sb")).as("jaccard3"))
        .orderBy("id_a")
    }),

    // Embedding-cosine near-dup pairs, bucketed by cluster label
    "nd_embedding_neardup" -> ((s, d) =>
      Dedup.embeddingNearDups(emb(s, d), "vec_id", "embedding", "label", 0.3)
        .select("bucket", "id_a", "id_b")
        .orderBy("bucket", "id_a", "id_b")),

    // Fully self-contained semantic near-dup: when no cluster label exists,
    // SRP-LSH buckets the corpus and the cosine pair join stays per-bucket
    "nd_srp_neardup" -> ((s, d) => {
      val e = emb(s, d)
        .withColumn("srp", Similarity.srpBucket(col("embedding"), 8))
      Dedup.embeddingNearDups(e, "vec_id", "embedding", "srp", 0.3)
        .select("bucket", "id_a", "id_b")
        .orderBy("bucket", "id_a", "id_b")
    }),
  )

  // a def, not a val: registry-aware entries read OracleLits fragments
  // that the query functions register as they run (Verify dumps oracle
  // SQL AFTER running every query)
  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents)
        |SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM u GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "dedup_segments" ->
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

    // the incremental merge must land on batch-at-once segmentDedup over
    // the union corpus, restricted to the batch ids — the same CTE stack
    // as dedup_segments with one final filter
    "dedup_incr_segments" ->
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
         |FROM keep WHERE doc_id >= 250
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_survivors" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents)
        |SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |    ORDER BY doc_id) AS rn FROM u)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "nd_srp_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding, $duckSrpTerms AS bucket
         |  FROM embeddings)
         |SELECT a.bucket AS bucket, a.vec_id AS id_a, b.vec_id AS id_b
         |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.3
         |ORDER BY a.bucket, id_a, id_b""".stripMargin,

    "dedup_minhash_sig" -> {
      val sigExprs = (0 until 16).map(i =>
        s"CAST(${duckMinhash(i, "tk")} AS VARCHAR)").mkString(" || '-' || ")
      s"""WITH tok AS (SELECT doc_id, $duckToks AS tk FROM documents)
         |SELECT doc_id, $sigExprs AS sig FROM tok ORDER BY doc_id""".stripMargin
    },

    "dedup_minhash_pairs" ->
      (minhashPairsCtes +
        "\nSELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b"),

    // the frontier replays the signature chain once and the band/candidate/
    // verify chain per band count — same minhash/shingle family as
    // dedup_minhash_pairs, band hash re-sliced per configuration
    "dedup_lsh_frontier" -> {
      def cfgCtes(b: Int): String = {
        val r = 16 / b
        def bandHash(j: Int): String =
          (j * r until j * r + r).map(i => s"CAST(s$i AS VARCHAR)")
            .mkString(" || '-' || ")
        val bandSelects = (0 until b).map(j =>
          s"SELECT id, $j AS band, md5(${bandHash(j)}) AS bh FROM sig")
          .mkString(" UNION ALL ")
        s"""band$b AS ($bandSelects),
           |cand$b AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM band$b a JOIN band$b b
           |  ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
           |ver$b AS (SELECT CAST(count(*) AS BIGINT) AS v
           |  FROM cand$b c JOIN tok ta ON c.id_a = ta.id
           |       JOIN tok tb ON c.id_b = tb.id
           |  WHERE CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE) /
           |    len(list_distinct(list_concat(ta.tk, tb.tk))) >= 0.9)""".stripMargin
      }
      def row(b: Int): String =
        s"""SELECT CAST($b AS BIGINT) AS bands,
           |  CAST(${16 / b} AS BIGINT) AS rows_per_band,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand$b)
           |    AS candidate_pairs,
           |  (SELECT v FROM ver$b) AS verified_pairs""".stripMargin
      val sigCols = (0 until 16).map(i =>
        s"${duckMinhash(i, "tk")} AS s$i").mkString(", ")
      s"""WITH u AS (SELECT doc_id AS id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents),
         |t0 AS (SELECT id, $duckToksAll AS tk FROM u),
         |tok AS (SELECT id, $duckShingles3 AS tk FROM t0),
         |sig AS (SELECT id, $sigCols FROM tok),
         |${cfgCtes(2)},
         |${cfgCtes(4)},
         |${cfgCtes(8)}
         |SELECT * FROM (${row(2)} UNION ALL ${row(4)} UNION ALL ${row(8)})
         |ORDER BY bands""".stripMargin
    },

    // the same signature/band/verify chain over corpus ∪ offset eval set;
    // contaminated = corpus ids paired (at the 0.9 gate) with an eval id
    "tx_decontaminate_fuzzy" ->
      (minhashPairsCtesOver(
        """u AS (SELECT doc_id AS id, text FROM documents
          |  UNION ALL SELECT doc_id + 10000, text FROM documents
          |  UNION ALL SELECT doc_id + 50000, text FROM documents
          |    WHERE doc_id < 5)""".stripMargin) +
        """
          |SELECT id AS doc_id FROM u
          |WHERE id < 50000 AND id NOT IN
          |  (SELECT id_a FROM pairs WHERE id_b >= 50000)
          |ORDER BY doc_id""".stripMargin),

    "dedup_incr_exact" ->
      """WITH state AS (SELECT DISTINCT
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents WHERE doc_id < 250),
        |u AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250
        |  UNION ALL SELECT doc_id + 10000, text FROM documents),
        |f AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM u),
        |fresh AS (SELECT doc_id, fp FROM f
        |  WHERE fp NOT IN (SELECT fp FROM state))
        |SELECT doc_id FROM (SELECT doc_id, row_number() OVER (
        |  PARTITION BY fp ORDER BY doc_id) AS rn FROM fresh)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // same banded-LSH chain as dedup_minhash_pairs over the full corpus,
    // restricted to pairs with a batch-side (shifted-id) endpoint
    "dedup_incr_minhash" ->
      (minhashPairsCtes +
        """
          |SELECT id_a, id_b, jaccard FROM pairs
          |WHERE id_a >= 10000 OR id_b >= 10000
          |ORDER BY id_a, id_b""".stripMargin),

    "dedup_components" -> componentsWalkSql,

    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $componentsWalkCtes,
         |compx2 AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
         |cl AS (SELECT component, count(*) AS cluster_size FROM compx2
         |  GROUP BY 1),
         |hist AS (SELECT cluster_size, count(*) AS n_clusters FROM cl
         |  GROUP BY 1
         |  UNION ALL
         |  SELECT 1 AS cluster_size, count(*) AS n_clusters FROM u
         |  WHERE u.id NOT IN (SELECT id FROM compx2))
         |SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
         |FROM hist GROUP BY 1 ORDER BY cluster_size""".stripMargin,

    "dedup_best_survivor" ->
      s"""WITH RECURSIVE $componentsWalkCtes,
         |compx2 AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
         |j AS (SELECT u.id AS doc_id, coalesce(c.component, u.id) AS component,
         |    CAST(length(u.text) AS BIGINT) AS n_chars
         |  FROM u LEFT JOIN compx2 c ON u.id = c.id)
         |SELECT component, doc_id, n_chars FROM (
         |  SELECT component, doc_id, n_chars, row_number() OVER (
         |    PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM j)
         |WHERE rn = 1 ORDER BY component""".stripMargin,

    // the incremental merge must land on the batch-at-once labeling, so
    // the oracle IS the full-run components query
    "dedup_incr_components" -> componentsWalkSql,

    "dedup_simhash" -> {
      val terms = (0 until 16).map(duckSimhashTerm).mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, $duckToksAll AS toks FROM documents)
         |SELECT doc_id, CAST($terms AS BIGINT) AS sh FROM tok
         |ORDER BY doc_id""".stripMargin
    },

    "dedup_ngram_jaccard" ->
      s"""WITH tok AS (SELECT doc_id, $duckToksAll AS tk FROM documents),
         |sh AS (SELECT doc_id, $duckShingles3 AS sg FROM tok)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CASE WHEN len(list_distinct(list_concat(a.sg, b.sg))) > 0 THEN
         |    CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE) /
         |      len(list_distinct(list_concat(a.sg, b.sg))) ELSE 0.0 END AS jaccard3
         |FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
         |ORDER BY id_a""".stripMargin,

    "nd_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings)
         |SELECT a.label AS bucket, a.vec_id AS id_a, b.vec_id AS id_b
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.3
         |ORDER BY bucket, id_a, id_b""".stripMargin,

    // sliding windows: tk[i:i+7] is the 1-based inclusive 8-token slice;
    // range(1, len-6) is empty when the doc has < 8 tokens (DuckDB range
    // with stop <= start yields no rows), so short docs fall to the LEFT
    // JOIN's zero counts exactly like the Spark kernel's empty n-gram array
    "dedup_cross_repeats" ->
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

    // the full span-rewrite replay: same window/MD5 family as
    // dedup_cross_repeats, then first-occurrence ranking per fingerprint
    // (rn = 1 survives), gaps-and-islands interval union per doc, and
    // token reassembly from the uncovered positions
    "dedup_span_rewrite" ->
      s"""WITH $spanRewriteCtes
         |SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the length-union replay: one wins/occ/flag family per window
    // length, united flags through the shared islands/reassembly tail
    "dedup_span_multi" ->
      s"""WITH ${spanRewriteCtesFor(Seq(5, 8, 13))}
         |SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
