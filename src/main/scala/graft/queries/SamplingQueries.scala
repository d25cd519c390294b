package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Multimodal, Pq, Sampling, Similarity, Temporal, TextAnalysis}
import ScaleShared._

/** Sampling family: deterministic/stratified/weighted/temperature
  * sampling, splits, token budgets, sequence packing, DSIR, epoch plans.
  *
  * Mechanically split out of the former single-file ScaleQueries registry;
  * each family owns its queries AND their DuckDB oracle SQL. */
object SamplingQueries {

  val queries: Map[String, QF] = Map(
    // Deterministic id-hash sampling (~25%): reproducible across runs,
    // engines, and partitionings — no RNG
    "samp_hash" -> ((s, d) =>
      Sampling.deterministicSample(docs(s, d), "doc_id", 0.25)
        .select("doc_id", "lang").orderBy("doc_id")),

    // Deterministic per-epoch shuffle keys (the training-dataloader order
    // primitive): epoch e's order is the sort by the 60-bit MD5 prefix of
    // "e:doc_id" — reproducible per epoch, decorrelated across epochs,
    // and at scale the permutation IS the engine's distributed range sort
    // on the key (no single-task global window anywhere)
    "samp_epoch_shuffle" -> ((s, d) => {
      val dd = docs(s, d).select("doc_id")
      (0 until 3).map { e =>
        dd.select(lit(e.toLong).as("epoch"), col("doc_id"),
          Dedup.tokenHash60(concat(lit(s"$e:"),
            col("doc_id").cast("string"))).as("skey"))
      }.reduce(_.unionByName(_)).orderBy("epoch", "skey", "doc_id")
    }),

    // Stratified quota sample: ≤20 docs per language, id-hash order
    "samp_stratified" -> ((s, d) =>
      Sampling.stratifiedQuota(docs(s, d), "lang", "doc_id", 20)
        .select("doc_id", "lang").orderBy("doc_id")),

    // Cluster-balanced sampling (topic balancing over the embedding space
    // — the DataComp-style curation knob): k-means cells, then an equal
    // per-cluster quota under the deterministic id-hash order — dominant
    // topics downsampled, rare topics kept in full. Composes the semdedup
    // assignment (1 Lloyd's round) with the skew-safe salted quota window
    "samp_cluster_balance" -> ((s, d) => {
      val e = emb(s, d)
      val assigned = Similarity.assignToNearest(e,
        Similarity.kmeansFit(e, "vec_id", "embedding", k = 4, iters = 1),
        "vec_id", "embedding")
      Sampling.stratifiedQuota(
          assigned.select(col("vec_id"), col("assigned").as("cluster")),
          "cluster", "vec_id", 60)
        .select("vec_id", "cluster").orderBy("vec_id")
    }),

    // Weighted deterministic sample: inclusion probability ∝ token count
    // (20 bp per token ⇒ a 500-token doc is always kept) — integer-exact,
    // engine-portable, zero shuffles
    "samp_weighted" -> ((s, d) =>
      Sampling.weightedSample(docs(s, d), "doc_id",
        size(TextAnalysis.tokens(col("text"))), 20)
        .select("doc_id", "lang").orderBy("doc_id")),

    // Language-temperature resample (α = 0.3): common languages
    // downsampled toward p^α, rarest kept in full — deterministic id-hash
    // selection against driver-computed per-language basis points
    "samp_temperature" -> ((s, d) =>
      Sampling.temperatureSample(docs(s, d), "lang", "doc_id",
        alphaBp = 3000)
        .select("doc_id", "lang").orderBy("doc_id")),

    // Data-constrained repeat planning (Muennighoff '23): per-source token
    // targets from a mixture, sources smaller than their target repeated —
    // full epochs by integer division + a hash-ordered partial prefix for
    // the remainder; pure-int64 plan (div/%, no float division)
    "samp_repeat_epochs" -> ((s, d) =>
      Sampling.repeatEpochs(
        docs(s, d).withColumn("n_tokens",
          size(TextAnalysis.tokens(col("text"))).cast("long")),
        "source", "doc_id", "n_tokens", budgetTokens = 50000L,
        weightsBp = Map("src0" -> 2000, "src1" -> 1000), defaultBp = 350)
        .select("doc_id", "source", "n_tokens", "epochs")
        .orderBy("doc_id")),

    // Repeat plan → epoch instances → fixed-context packing: the two
    // int64 machines composed (instance id = doc_id·1000 + epoch, a
    // deterministic dense order key); spans stay integer-exact end-to-end
    "samp_pack_epochs" -> ((s, d) => {
      val dd = docs(s, d).withColumn("n_tokens",
        size(TextAnalysis.tokens(col("text"))).cast("long"))
      val planned = Sampling.repeatEpochs(dd, "source", "doc_id",
        "n_tokens", budgetTokens = 50000L,
        weightsBp = Map("src0" -> 2000, "src1" -> 1000), defaultBp = 350)
      val inst = planned.filter(col("epochs") > 0)
        .select(col("doc_id"), col("n_tokens"),
          explode(sequence(lit(1L), col("epochs"))).as("epoch"))
        .select((col("doc_id") * 1000 + col("epoch")).as("inst_id"),
          col("n_tokens"))
      Sampling.packSequences(inst, "inst_id", "n_tokens", 512L)
        .orderBy("inst_id", "seq_id")
    }),

    // Water-filling mixture allocation: budget split by target weights,
    // capped at each source's supply, surplus redistributed to the rest at
    // their relative weights — integer fixed-point plan; the allocation
    // rides the gate as literals and lit_check re-derives it
    "samp_waterfill" -> ((s, d) => {
      val avail = docs(s, d)
        .groupBy("source")
        .agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
          .as("avail"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val plan = Sampling.waterfillAllocation(avail,
        Map("src0" -> 2500, "src1" -> 1500), defaultBp = 300,
        budgetTokens = 20000L)
      OracleLits.put("waterfill_alloc",
        plan.map { case (g, _, w, al) =>
          s"(${OracleLits.sqlStr(g)}, $w, $al)"
        }.mkString(", "))
      import s.implicits._
      plan.toDF("source", "avail_tokens", "weight_bp", "alloc_tokens")
        .orderBy("source")
    }),

    // UniMax language sampling (Chung '23): uniform budget spread with a
    // hard per-language epoch cap — water-filling under equal weights on
    // avail×maxEpochs supplies. Budget 400k vs these fixtures exercises
    // BOTH fixed-point branches across the sweep SFs: at sf0.01 the budget
    // exceeds total supply (every language saturates at maxEpochs), at
    // sf0.1 two saturation rounds run before the uniform fill settles.
    // The allocation rides the gate as literals; the oracle re-derives
    // avail and the cap/epoch arithmetic in SQL, lit_check replays the
    // water-fill itself
    "samp_unimax" -> ((s, d) => {
      val avail = docs(s, d)
        .groupBy("lang")
        .agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
          .as("avail"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val plan = Sampling.unimaxAllocation(avail, maxEpochs = 2,
        budgetTokens = 400000L)
      OracleLits.put("unimax_alloc",
        plan.map { case (g, _, _, al, _) =>
          s"(${OracleLits.sqlStr(g)}, $al)"
        }.mkString(", "))
      import s.implicits._
      plan.toDF("lang", "avail_tokens", "cap_tokens", "alloc_tokens",
          "epochs_micro")
        .orderBy("lang")
    }),

    // Padding-waste report (dynamic-batching QA): per 32-doc batch, the
    // tokens a pad-to-max collator burns under length-sorted vs arrival
    // -order batching — the measured case for length bucketing. Both
    // rankings run through the skew-safe two-level groupedRank (constant
    // group = the worst skew case: NO global-order window forms)
    "samp_padding_waste" -> ((s, d) => {
      val b = 32L
      val base = docs(s, d)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tokens"))
        .withColumn("g", lit("all"))
      def batched(orderCol: String, strategy: String) =
        Sampling.groupedRank(base, "g", orderCol, "doc_id")
          .withColumn("batch_id", expr(s"(rank - 1L) div ${b}L"))
          .groupBy("batch_id")
          .agg(count(lit(1)).as("n_rows"), max("n_tokens").as("max_tokens"),
            sum("n_tokens").as("sum_tokens"))
          .withColumn("padding_tokens",
            col("max_tokens") * col("n_rows") - col("sum_tokens"))
          .withColumn("strategy", lit(strategy))
      batched("n_tokens", "length_sorted")
        .unionByName(batched("doc_id", "arrival"))
        .select(col("strategy"), col("batch_id"),
          col("n_rows").cast("long").as("n_rows"),
          col("max_tokens").cast("long").as("max_tokens"),
          col("sum_tokens").cast("long").as("sum_tokens"),
          col("padding_tokens").cast("long").as("padding_tokens"))
        .orderBy("strategy", "batch_id")
    }),

    // DSIR importance weights: how target-like (here: English-distributed)
    // each doc's hashed-token profile is — bucket-ratio model built in one
    // bounded agg, scoring zero-shuffle (Sampling.importanceWeights); the
    // 256 quantized log-ratios are registered for the oracle (OracleLits)
    "dsir_weights" -> ((s, d) => {
      val dd = docs(s, d)
      val ratios = Sampling.importanceRatios(dd, "text", col("lang") === "en")
      registerDsirRatios(ratios)
      // gate surface is the int64 micro weight (weight × 10⁶ exactly) —
      // pattern-1 cross-engine contract; `importanceWeights` keeps the
      // decimal view for library callers
      Sampling.importanceWeightsMicroFromRatios(dd, "text", ratios)
        .select("doc_id", "weight_micro").orderBy("doc_id")
    }),

    // DSIR selection: the 50 most target-like docs under the deterministic
    // (weight desc, id) total order — TakeOrderedAndProject, no global
    // sort; the ORDER itself is integer-exact (micro weights)
    "dsir_select" -> ((s, d) => {
      val dd = docs(s, d)
      val ratios = Sampling.importanceRatios(dd, "text", col("lang") === "en")
      registerDsirRatios(ratios)
      Sampling.importanceWeightsMicroFromRatios(dd, "text", ratios)
        .orderBy(col("weight_micro").desc, col("doc_id").asc).limit(50)
        .select("doc_id", "weight_micro")
    }),

    // Sharded dataset export: the holdout split written as a
    // split-partitioned parquet layout and read back — per-split counts
    // prove the partitioned write path end-to-end. The export lands in a
    // per-session FIXED dir (overwritten), so repeated invocations
    // (Prof/Bench/Verify) cap at one copy instead of leaking temp dirs
    "samp_split_export" -> ((s, d) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_split_" +
        s.sparkContext.applicationId
      Sampling.holdoutSplit(docs(s, d), "doc_id", valBp = 1000, testBp = 1000)
        .write.mode("overwrite").partitionBy("split").parquet(out)
      s.read.parquet(out)
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
        .select(col("split").cast("string").as("split"), col("n_docs"))
        .orderBy("split")
    }),

    // Deterministic 80/10/10 train/val/test split (leakage-stable: a row's
    // split never changes as the corpus grows)
    "samp_split" -> ((s, d) =>
      Sampling.holdoutSplit(docs(s, d), "doc_id", valBp = 1000, testBp = 1000)
        .select("doc_id", "split").orderBy("doc_id")),

    // Dedup-aware split: duplicate clusters (LSH pairs -> components)
    // land in one split atomically — no train/test near-dup leakage
    "samp_leakage_split" -> ((s, d) => {
      val dd = docsWithDups(s, d)
      Sampling.leakageSafeSplit(dd, "doc_id", ccLabels(s, d),
        valBp = 1000, testBp = 1000)
        .select("doc_id", "component", "split").orderBy("doc_id")
    }),

    // Curriculum bucketing: length deciles via the scale path — a
    // fixed-size quantile sketch + zero-shuffle comparison against its
    // broadcast cut-points (exact `ntile` would funnel the WHOLE corpus
    // through one task: a global-order window does not partition). The
    // sketch cuts are registered for the oracle (OracleLits — a KLL/GK
    // sketch is engine-specific, so the oracle takes them as given and
    // recomputes the data-sized assignment). Legacy exact-ntile form kept
    // behind spark.graft.lengthDecile.ntile=true
    "samp_length_decile" -> ((s, d) => {
      val base = docs(s, d)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      if (s.conf.getOption("spark.graft.lengthDecile.ntile").contains("true")) {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n_tokens"), col("doc_id"))
        base.withColumn("decile", ntile(10).over(w).cast("long"))
          .orderBy("doc_id")
      } else {
        val cuts = Sampling.quantileCuts(base, "n_tokens", 10)
        OracleLits.put("len_decile_cuts",
          OracleLits.sqlCase("n_tokens", cuts.toSeq, base = 1))
        Sampling.bucketsFromCuts(base, "n_tokens", cuts)
          .withColumnRenamed("bucket", "decile")
          .orderBy("doc_id")
      }
    }),

    // Dataset mixing: per-source keep rates (src0 in full, src1 at 50%,
    // everything else at 20%) in one zero-shuffle pass
    "samp_mixture" -> ((s, d) =>
      Sampling.mixtureSample(docs(s, d), "source", "doc_id",
        Map("src0" -> 10000, "src1" -> 5000), defaultBp = 2000)
        .select("doc_id", "source").orderBy("doc_id")),

    // Per-domain quality cap: keep each source's 10 LONGEST docs (the
    // "best N per domain" crawl cap) via the skew-safe two-phase window —
    // no single task ever sorts a whole hot domain
    "samp_source_cap" -> ((s, d) =>
      Sampling.topPerGroup(
          docs(s, d).select("doc_id", "source", "n_chars"),
          "source", col("doc_id"), cap = 10,
          Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("doc_id"), col("source"), col("rank").cast("long").as("rank"))
        .orderBy("doc_id")),

    // Balanced eval-set construction by composition: the deterministic
    // val split, stratified to ≤10 docs per language — splits, quotas and
    // dedup share one id-hash family so the set is reproducible end-to-end
    "samp_eval_set" -> ((s, d) =>
      Sampling.stratifiedQuota(
        Sampling.holdoutSplit(docs(s, d), "doc_id", valBp = 3000, testBp = 0)
          .filter(col("split") === "val"),
        "lang", "doc_id", quota = 10)
        .select("doc_id", "lang").orderBy("doc_id")),

    // Token-budget shard packing: cut the doc_id-ordered corpus into
    // ~1000-token training shards — two-level prefix sum, no global-order
    // window (PlanSpec pins the bucket-partitioned spec)
    "pack_token_budget" -> ((s, d) =>
      Sampling.packByTokenBudget(
        docs(s, d).select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", 1000L)
        .select("doc_id", "n_tokens", "shard_id").orderBy("doc_id")),

    // GPT-style sequence packing: the concatenated token stream cut into
    // fixed 512-token context windows, one row per (doc, window-overlap)
    // with the doc's span inside the window — two-level prefix sum, no
    // global-order window (PlanSpec pins the bucket-partitioned spec)
    "pack_sequences" -> ((s, d) =>
      Sampling.packSequences(
        docs(s, d).select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", 512L)
        .orderBy("doc_id", "seq_id")),

    // Quality-ordered token-budget selection: best-first (n_chars is the
    // quality proxy here; any score_nano slots into orderCol) until the
    // 10000-token budget is exactly spent — the fixed-size training-set
    // cut, no overshoot. Two-level prefix sums, no global-order window
    "samp_quality_budget" -> ((s, d) =>
      Sampling.budgetSelect(
        docs(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
          (-col("n_chars")).as("__ord")),
        "__ord", "doc_id", "n_tok", budgetTokens = 10000L)
        .select(col("doc_id"), col("n_tok"), col("cum_tokens"),
          col("selected"))
        .orderBy("doc_id")),

    // Curriculum-ordered shard packing CAPSTONE: the interleaved band
    // schedule fed straight into token-budget shard cutting — the actual
    // training-shard artifact a curriculum run reads (shards follow the
    // schedule order, ~1000 tokens each; packByTokenBudget's unique
    // orderCol contract is satisfied by the schedule's global_pos).
    // De-instrumented round 13: the three-round driver-only hash red was
    // root-caused to the ORACLE's uncast HUGEINT window sum (now CAST AS
    // BIGINT), so the round-12 shardSelfCheck bare-window diagnostic is
    // gone — the plan is back to zero global-order windows (PlanSpec
    // pins the census). samp_pack_curriculum_parts stays as the
    // permanent stage gate exposing every intermediate.
    "samp_pack_curriculum" -> ((s, d) => {
      // materialized: the schedule's grouped ranks drive several driver
      // actions, each of which would otherwise re-run the band ntile
      val banded = graft.io.Materialize(Sampling.groupedNtile(
          docs(s, d).select(col("doc_id"), col("n_chars"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
            .withColumn("__g", lit(0L)),
          "__g", "n_chars", "doc_id", 4)
        .withColumnRenamed("ntile", "band").drop("__g"))
      // materialized: packByTokenBudget drives three actions (cut sketch,
      // offset collect, final) — each would re-run the schedule's rank
      val packed = Sampling.packByTokenBudget(
          graft.io.Materialize(
            Sampling.curriculumInterleave(banded, "doc_id", "band",
              seed = 7L)
            .select(col("doc_id"), col("band"), col("global_pos"),
              col("n_tok"))),
          "global_pos", "n_tok", 1000L)
      packed
        .select(col("doc_id"), col("band"), col("global_pos"),
          col("n_tok"), col("shard_id"))
        .orderBy("global_pos")
    }),

    // Stage-diagnostic decomposition of the capstone (round-12 verdict
    // item 1a): the SAME schedule machinery with every intermediate
    // surface exposed — band, within-band shuffle rank, band size, stride
    // key, global position, token count, and the exclusive running total
    // `st` that shard_id divides. When the driver next compares, the
    // red/green pattern across capstone vs parts pinpoints WHICH stage
    // diverges (schedule vs token join vs prefix sum vs division); a red
    // capstone with green parts and no raise_error localizes the
    // divergence to the harness replay itself
    "samp_pack_curriculum_parts" -> ((s, d) => {
      val banded = graft.io.Materialize(Sampling.groupedNtile(
          docs(s, d).select(col("doc_id"), col("n_chars"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
            .withColumn("__g", lit(0L)),
          "__g", "n_chars", "doc_id", 4)
        .withColumnRenamed("ntile", "band").drop("__g"))
      Sampling.packByTokenBudget(
          graft.io.Materialize(
            Sampling.curriculumInterleave(banded, "doc_id", "band",
              seed = 7L)
            .select(col("doc_id"), col("band"), col("band_rank"),
              col("n_band"), col("ikey"), col("global_pos"),
              col("n_tok"))),
          "global_pos", "n_tok", 1000L, keepTotalCol = Some("st"))
        .select(col("doc_id"), col("band"), col("band_rank"),
          col("n_band"), col("ikey"), col("global_pos"), col("n_tok"),
          col("st"), col("shard_id"))
        .orderBy("global_pos")
    }),

    // Interleaved curriculum schedule: groupedNtile length bands (the
    // difficulty proxy; perplexity bands compose identically) + per-band
    // deterministic shuffle + stride-scheduling interleave — the
    // dataloader order a banded training run consumes. Every prefix of
    // the schedule carries each band proportionally (spec-asserted);
    // pure int64, replayed exactly by the oracle's window arithmetic
    "samp_curriculum" -> ((s, d) => {
      // materialized: the schedule's grouped ranks drive several driver
      // actions, each of which would otherwise re-run the band ntile
      val banded = graft.io.Materialize(Sampling.groupedNtile(
          docs(s, d).select(col("doc_id"), col("n_chars"))
            .withColumn("__g", lit(0L)),
          "__g", "n_chars", "doc_id", 4)
        .withColumnRenamed("ntile", "band").drop("__g"))
      Sampling.curriculumInterleave(banded, "doc_id", "band", seed = 7L)
        .select(col("doc_id"), col("band"), col("band_rank"),
          col("n_band"), col("ikey"), col("global_pos"))
        .orderBy("global_pos")
    }),

    // Curriculum QA report: per (band, prefix-decile) membership counts
    // (deviation vs the proportional ideal is the reader's one
    // cross-multiplication) + each band's max interleave gap — the
    // acceptance table a banded training run consults before trusting the
    // schedule (the ann_frontier pattern applied to sampling)
    "samp_curriculum_qa" -> ((s, d) => {
      val banded = graft.io.Materialize(Sampling.groupedNtile(
          docs(s, d).select(col("doc_id"), col("n_chars"))
            .withColumn("__g", lit(0L)),
          "__g", "n_chars", "doc_id", 4)
        .withColumnRenamed("ntile", "band").drop("__g"))
      // materialized: curriculumQa drives a count action plus the gap
      // join's two sides over the schedule
      val sched = graft.io.Materialize(
        Sampling.curriculumInterleave(banded, "doc_id", "band", seed = 7L)
          .select(col("doc_id"), col("band"), col("band_rank"),
            col("global_pos")))
      Sampling.curriculumQa(sched, "band", "global_pos", "band_rank", 10)
        .orderBy("band", "prefix_id")
    }),

    // DoReMi-style domain reweighting (Xie '23): each source's next-round
    // mixture weight is exp(η · excess proxy loss), proxy = the engine's
    // bigram LM. Everything on the gate is int64 — the per-source
    // ce/excess are exact integer micro-bits, the ONE exp per source is
    // registered as an integer nano literal (lit_check re-derives it from
    // the fixtures), and weight_bp is integer division of those nanos.
    // The stats frame is materialized so the LM train+score chain runs
    // once, not once per downstream branch
    "samp_doremi_weights" -> ((s, d) => {
      val dd = docs(s, d)
      val stats = graft.io.Materialize(
        TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
          TextAnalysis.bigramLm(dd, "text")))
      val w = Sampling.doremiWeights(stats, dd, "doc_id", "source")
      // bounded collect: one row per SOURCE (the lit-registration side
      // frame, same pattern as dsir/waterfill)
      val rows = w.select("source", "w_nano").collect()
      // eta_micro rides beside each weight so lit_check replays the
      // engine's ACTUAL η instead of hardcoding it (round-11 ADVICE)
      if (rows.nonEmpty) OracleLits.put("doremi_w",
        rows.sortBy(_.getString(0)).map(r =>
          s"(${OracleLits.sqlStr(r.getString(0))}, " +
            s"CAST(${r.getLong(1)} AS BIGINT), " +
            s"${Sampling.DefaultEtaMicro})")
          .mkString("(VALUES ", ", ",
            ") AS t(source, w_nano, eta_micro)"))
      w.orderBy("source")
    }),

    // Incremental DoReMi: the per-source loss state (exact int64
    // partials) folds associatively across batches, so the mixture
    // controller merges yesterday's state with today's batch and
    // recomputes weights — merge == retrain bit-exactly under the PINNED
    // proxy LM (the deployed shape: the proxy model is trained once).
    // The oracle is batch-at-once over the whole corpus — the equality
    // IS the correctness claim
    "samp_doremi_incr" -> ((s, d) => {
      val dd = docs(s, d)
      val stats = graft.io.Materialize(
        TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
          TextAnalysis.bigramLm(dd, "text")))
      val state = Sampling.doremiState(
        stats.filter(col("doc_id") < 250), dd, "doc_id", "source")
      val batch = Sampling.doremiState(
        stats.filter(col("doc_id") >= 250), dd, "doc_id", "source")
      val w = Sampling.doremiWeightsFromState(
        Sampling.doremiMerge(state, batch))
      val rows = w.select("source", "w_nano").collect()
      if (rows.nonEmpty) OracleLits.put("doremi_incr_w",
        rows.sortBy(_.getString(0)).map(r =>
          s"(${OracleLits.sqlStr(r.getString(0))}, " +
            s"CAST(${r.getLong(1)} AS BIGINT), " +
            s"${Sampling.DefaultEtaMicro})")
          .mkString("(VALUES ", ", ",
            ") AS t(source, w_nano, eta_micro)"))
      w.orderBy("source")
    }),

    // The closed mixture-control loop: DoReMi weights from the measured
    // proxy loss feed the water-filling allocator — measure → reweight →
    // allocate, the artifact the next training round's sampler reads.
    // Everything after the per-source exp is exact integer arithmetic
    // (weight_bp division, the integer water-fill), and lit_check replays
    // the WHOLE chain: w_nano re-derived (ulp-tolerant), then bp division
    // and the water-fill replica run exactly from the registered ints
    "samp_doremi_plan" -> ((s, d) => {
      val dd = docs(s, d)
      val stats = graft.io.Materialize(
        TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
          TextAnalysis.bigramLm(dd, "text")))
      val w = Sampling.doremiWeights(stats, dd, "doc_id", "source")
        .select("source", "w_nano", "weight_bp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val avail = dd.groupBy("source")
        .agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
          .as("avail"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // a source with no scored bigrams has no weight row → bp 0 (never
      // allocated); present sources carry their DoReMi share
      val plan = Sampling.waterfillAllocation(avail,
        w.map(t => t._1 -> t._3.toInt).toMap, defaultBp = 0,
        budgetTokens = 20000L)
      OracleLits.put("doremi_plan",
        plan.map { case (g, _, wbp, al) =>
          val wn = w.find(_._1 == g).map(_._2).getOrElse(0L)
          s"(${OracleLits.sqlStr(g)}, CAST($wn AS BIGINT), $wbp, $al, " +
            s"${Sampling.DefaultEtaMicro})"
        }.mkString("(VALUES ", ", ",
          ") AS t(source, w_nano, weight_bp, alloc_tokens, eta_micro)"))
      import s.implicits._
      plan.toDF("source", "avail_tokens", "weight_bp", "alloc_tokens")
        .orderBy("source")
    }),
  )

  // The curriculum schedule CTE stack (band ntile → seeded shuffle →
  // stride-scheduling interleave → global position), ending in
  // `g`(doc_id, band, band_rank, n_band, ikey, global_pos) — shared by
  // samp_curriculum and the samp_pack_curriculum capstone.
  private[queries] val curriculumCtes: String =
    """b AS (
      |  SELECT doc_id,
      |    CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
      |      AS band
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, band,
      |    CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)),
      |      1, 15)) AS BIGINT) AS ck
      |  FROM b),
      |r AS (
      |  SELECT doc_id, band,
      |    CAST(row_number() OVER (PARTITION BY band ORDER BY ck, doc_id)
      |      AS BIGINT) AS band_rank,
      |    CAST(count(*) OVER (PARTITION BY band) AS BIGINT) AS n_band
      |  FROM k),
      |i AS (
      |  SELECT doc_id, band, band_rank, n_band,
      |    ((band_rank * 2 - 1) * 1048576) // n_band AS ikey
      |  FROM r),
      |g AS (
      |  SELECT doc_id, band, band_rank, n_band, ikey,
      |    CAST(row_number() OVER (ORDER BY ikey, band, band_rank)
      |      AS BIGINT) AS global_pos
      |  FROM i)""".stripMargin

  // a def, not a val: registry-aware entries read OracleLits fragments
  // that the query functions register as they run (Verify dumps oracle
  // SQL AFTER running every query)
  def oracles: Map[String, String] = Map(
    "samp_leakage_split" -> leakageSplitSql,

    "samp_hash" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |  AS BIGINT) % 10000 < 2500
        |ORDER BY doc_id""".stripMargin,

    "samp_quality_budget" ->
      s"""WITH t AS (SELECT doc_id, n_chars,
         |    CAST(len($duckToksAll) AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |    sum(n_tok) OVER (ORDER BY n_chars DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT doc_id, n_tok, CAST(cum AS BIGINT) AS cum_tokens,
         |  cum <= 10000 AS selected
         |FROM c ORDER BY doc_id""".stripMargin,

    "samp_curriculum" ->
      s"""WITH $curriculumCtes
         |SELECT doc_id, band, band_rank, n_band, ikey, global_pos
         |FROM g ORDER BY global_pos""".stripMargin,

    // the QA report replayed over the same schedule CTEs: prefix-decile
    // membership per band + per-band max gap (lag over the schedule —
    // fine in the oracle; the engine uses the rank equi-join)
    "samp_curriculum_qa" ->
      s"""WITH $curriculumCtes,
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
         |pl AS (SELECT CAST(p AS BIGINT) AS prefix_id,
         |    CAST((p * nn.n) // 10 AS BIGINT) AS prefix_len
         |  FROM (SELECT unnest(range(1, 11)) AS p) ps, nn),
         |gp AS (SELECT band, global_pos,
         |    global_pos - coalesce(lag(global_pos) OVER (
         |      PARTITION BY band ORDER BY global_pos), 0) AS gap
         |  FROM g),
         |mg AS (SELECT band, CAST(max(gap) AS BIGINT) AS max_gap,
         |    CAST(count(*) AS BIGINT) AS n_band
         |  FROM gp GROUP BY 1),
         |np AS (SELECT g.band, pl.prefix_id, pl.prefix_len,
         |    CAST(sum(CASE WHEN g.global_pos <= pl.prefix_len
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_in_prefix
         |  FROM g CROSS JOIN pl GROUP BY 1, 2, 3)
         |SELECT np.band, np.prefix_id, np.prefix_len, mg.n_band,
         |  np.n_in_prefix, mg.max_gap
         |FROM np JOIN mg USING (band)
         |ORDER BY band, prefix_id""".stripMargin,

    // per-source stats re-derived through the shared bigram-LM CTE stack
    // (exact integer micro-bits); the ONE transcendental per source comes
    // back as the registered integer nano literal — a source-set mismatch
    // between lits and data fails the inner join loudly; weight_bp is
    // integer division both sides
    "samp_doremi_weights" -> {
      val w = OracleLits.get("doremi_w")
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

    // batch-at-once over the whole corpus: the merged-state weights must
    // equal a full retrain — identical CTEs to samp_doremi_weights, only
    // the lit key differs (the engine registered it from the MERGED path)
    "samp_doremi_incr" -> {
      val w = OracleLits.get("doremi_incr_w")
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

    // avail re-derived in SQL; the weight/alloc columns are the
    // registered plan literals, independently replayed end-to-end by
    // lit_check's doremi_plan checker (w_nano ulp-checked, bp division
    // and water-fill exact from the registered ints)
    "samp_doremi_plan" -> {
      val vals = OracleLits.get("doremi_plan")
        .getOrElse("(VALUES ('__none__', CAST(0 AS BIGINT), 0, 0, " +
          "100000)) AS t(source, w_nano, weight_bp, alloc_tokens, " +
          "eta_micro)")
      s"""WITH a AS (SELECT source,
         |    CAST(sum(len($duckToksAll)) AS BIGINT) AS avail_tokens
         |  FROM documents GROUP BY 1),
         |w AS (SELECT * FROM $vals)
         |SELECT a.source, a.avail_tokens,
         |  CAST(w.weight_bp AS BIGINT) AS weight_bp,
         |  CAST(w.alloc_tokens AS BIGINT) AS alloc_tokens
         |FROM a JOIN w USING (source) ORDER BY source""".stripMargin
    },

    "samp_pack_curriculum" ->
      s"""WITH $curriculumCtes,
         |tok AS (SELECT doc_id,
         |    CAST(len($duckToksAll) AS BIGINT) AS n_tok FROM documents),
         |j AS (SELECT g.doc_id, g.band, g.global_pos, tok.n_tok
         |  FROM g JOIN tok USING (doc_id))
         |SELECT doc_id, band, global_pos, n_tok,
         |  CAST((sum(n_tok) OVER (ORDER BY global_pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
         |    // 1000 AS BIGINT) AS shard_id
         |FROM j ORDER BY global_pos""".stripMargin,

    // identical CTE stack with every intermediate exposed, including the
    // exclusive running total `st` shard_id divides — the oracle-side
    // stage localizer for the capstone's driver-only hash divergence
    "samp_pack_curriculum_parts" ->
      s"""WITH $curriculumCtes,
         |tok AS (SELECT doc_id,
         |    CAST(len($duckToksAll) AS BIGINT) AS n_tok FROM documents),
         |j AS (SELECT g.doc_id, g.band, g.band_rank, g.n_band, g.ikey,
         |    g.global_pos, tok.n_tok
         |  FROM g JOIN tok USING (doc_id)),
         |st AS (SELECT doc_id, band, band_rank, n_band, ikey, global_pos,
         |    n_tok,
         |    CAST((sum(n_tok) OVER (ORDER BY global_pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
         |      AS BIGINT) AS st
         |  FROM j)
         |SELECT doc_id, band, band_rank, n_band, ikey, global_pos, n_tok,
         |  st, CAST(st // 1000 AS BIGINT) AS shard_id
         |FROM st ORDER BY global_pos""".stripMargin,

    "samp_epoch_shuffle" ->
      """SELECT CAST(e AS BIGINT) AS epoch, doc_id,
        |  CAST(('0x' || substr(md5(CAST(e AS VARCHAR) || ':' ||
        |    CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS skey
        |FROM documents, (SELECT unnest(range(0, 3)) AS e)
        |ORDER BY epoch, skey, doc_id""".stripMargin,

    "samp_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
        |t AS (SELECT sum(c) AS n FROM c),
        |r AS (SELECT lang, CAST(pow(c * 1.0 / n,
        |    (3000 - 10000) / 10000.0) AS DECIMAL(18,6)) AS r6 FROM c, t),
        |m AS (SELECT max(r6) AS mx FROM r),
        |k AS (SELECT lang, CAST(round(10000.0 * CAST(r6 AS DOUBLE)
        |    / CAST(mx AS DOUBLE)) AS BIGINT) AS keep_bp FROM r, m)
        |SELECT d.doc_id, d.lang FROM documents d JOIN k USING (lang)
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 10000 < k.keep_bp
        |ORDER BY d.doc_id""".stripMargin,

    "dsir_weights" ->
      s"""$dsirCte
         |SELECT d.doc_id, CAST(coalesce(s.w, 0) AS BIGINT) AS weight_micro
         |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "dsir_select" ->
      s"""$dsirCte
         |SELECT d.doc_id, CAST(coalesce(s.w, 0) AS BIGINT) AS weight_micro
         |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
         |ORDER BY weight_micro DESC, d.doc_id LIMIT 50""".stripMargin,

    // int64 throughout: sum() over BIGINT is HUGEINT in DuckDB — `//` and
    // `%` stay exact on it; the final cast narrows the compared surface
    "samp_repeat_epochs" ->
      s"""WITH $repeatEpochsCtes
         |SELECT doc_id, source, n_tokens, epochs FROM epr
         |ORDER BY doc_id""".stripMargin,

    // avail re-derived in SQL (a literal-vs-data mismatch fails the join);
    // the algorithmic alloc column is the registered literal, re-derived
    // independently by lit_check's python water-filling replica
    "samp_waterfill" -> {
      val vals = OracleLits.get("waterfill_alloc")
        .getOrElse("('__none__', 0, 0)")
      s"""WITH a AS (SELECT source,
         |    CAST(sum(len($duckToksAll)) AS BIGINT) AS avail_tokens
         |  FROM documents GROUP BY 1),
         |w AS (SELECT * FROM (VALUES $vals)
         |  AS t(source, weight_bp, alloc_tokens))
         |SELECT a.source, a.avail_tokens,
         |  CAST(w.weight_bp AS BIGINT) AS weight_bp,
         |  CAST(w.alloc_tokens AS BIGINT) AS alloc_tokens
         |FROM a JOIN w USING (source) ORDER BY source""".stripMargin
    },

    // avail, the epoch cap, and the implied micro-epochs all re-derive in
    // SQL; only the water-fill allocation itself rides as literals (its
    // integer iteration is lit_check's python replica, shared with
    // samp_waterfill / samp_doremi_plan)
    "samp_unimax" -> {
      val vals = OracleLits.get("unimax_alloc")
        .getOrElse("('__none__', 0)")
      s"""WITH a AS (SELECT lang,
         |    CAST(sum(len($duckToksAll)) AS BIGINT) AS avail_tokens
         |  FROM documents GROUP BY 1),
         |w AS (SELECT * FROM (VALUES $vals) AS t(lang, alloc_tokens))
         |SELECT a.lang, a.avail_tokens,
         |  CAST(a.avail_tokens * 2 AS BIGINT) AS cap_tokens,
         |  CAST(w.alloc_tokens AS BIGINT) AS alloc_tokens,
         |  CAST(CASE WHEN a.avail_tokens = 0 THEN 0
         |    ELSE (CAST(w.alloc_tokens AS BIGINT) * 1000000)
         |      // a.avail_tokens END AS BIGINT) AS epochs_micro
         |FROM a JOIN w USING (lang) ORDER BY lang""".stripMargin
    },

    // plain windows in the oracle (lowercasing never changes token count)
    "samp_padding_waste" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len($duckToksAll) AS BIGINT) AS n_tokens FROM documents),
         |r AS (SELECT doc_id, n_tokens,
         |    row_number() OVER (ORDER BY n_tokens, doc_id) AS rk_len,
         |    row_number() OVER (ORDER BY doc_id) AS rk_arr
         |  FROM t),
         |ls AS (SELECT 'length_sorted' AS strategy,
         |    (rk_len - 1) // 32 AS batch_id, count(*) AS n_rows,
         |    max(n_tokens) AS max_tokens, sum(n_tokens) AS sum_tokens
         |  FROM r GROUP BY 2),
         |ar AS (SELECT 'arrival' AS strategy,
         |    (rk_arr - 1) // 32 AS batch_id, count(*) AS n_rows,
         |    max(n_tokens) AS max_tokens, sum(n_tokens) AS sum_tokens
         |  FROM r GROUP BY 2),
         |u AS (SELECT * FROM ls UNION ALL SELECT * FROM ar)
         |SELECT strategy, CAST(batch_id AS BIGINT) AS batch_id,
         |  CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST(max_tokens AS BIGINT) AS max_tokens,
         |  CAST(sum_tokens AS BIGINT) AS sum_tokens,
         |  CAST(max_tokens * n_rows - sum_tokens AS BIGINT)
         |    AS padding_tokens
         |FROM u ORDER BY strategy, batch_id""".stripMargin,

    // repeat plan → one row per epoch instance → the pack cumsum over the
    // instance order (the pack_sequences oracle shape on instance ids)
    "samp_pack_epochs" ->
      s"""WITH $repeatEpochsCtes,
         |inst AS (SELECT doc_id * 1000 + e AS inst_id, n_tokens
         |  FROM (SELECT doc_id, n_tokens,
         |    unnest(range(1, epochs + 1)) AS e
         |    FROM epr WHERE epochs > 0)),
         |pc AS (SELECT inst_id, n_tokens, sum(n_tokens) OVER (
         |  ORDER BY inst_id ROWS UNBOUNDED PRECEDING) AS cum FROM inst),
         |ps AS (SELECT inst_id, CAST(cum - n_tokens AS BIGINT) AS st,
         |    CAST(cum AS BIGINT) AS en
         |  FROM pc WHERE n_tokens > 0),
         |pe AS (SELECT inst_id, st, en,
         |  unnest(range(st // 512, ((en - 1) // 512) + 1)) AS seq_id
         |  FROM ps)
         |SELECT inst_id, seq_id,
         |  CAST(greatest(st, seq_id * 512) - seq_id * 512 AS BIGINT)
         |    AS start_in_seq,
         |  CAST(least(en, (seq_id + 1) * 512) - greatest(st, seq_id * 512)
         |    AS BIGINT) AS n_in_seq
         |FROM pe ORDER BY inst_id, seq_id""".stripMargin,

    "samp_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10000, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    "samp_weighted" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 10000
        |  < least(10000, 20 * len(list_filter(
        |      string_split_regex(trim(text), '\s+'), t -> t != '')))
        |ORDER BY doc_id""".stripMargin,

    "samp_split_export" ->
      """SELECT CASE WHEN b < 1000 THEN 'val' WHEN b < 2000 THEN 'test'
        |    ELSE 'train' END AS split, count(*) AS n_docs
        |FROM (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |  AS BIGINT) % 10000 AS b FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "samp_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 1000 THEN 'val' WHEN b < 2000 THEN 'test'
        |    ELSE 'train' END AS split
        |FROM (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 10000 AS b FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // bucket assignment against the engine's registered sketch cut-points
    // (fallback: the legacy exact-ntile form, matching the flag-gated path)
    "samp_length_decile" -> {
      val body = OracleLits.get("len_decile_cuts") match {
        case Some(cases) =>
          s"CAST($cases AS BIGINT) AS decile"
        case None =>
          "CAST(ntile(10) OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS decile"
      }
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |    x -> x != '')) AS BIGINT) AS n_tokens FROM documents)
         |SELECT doc_id, n_tokens, $body
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "samp_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 10000
        |  < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
        |      ELSE 2000 END
        |ORDER BY doc_id""".stripMargin,

    "samp_source_cap" ->
      """SELECT doc_id, source, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    "samp_eval_set" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10000, doc_id) AS rn
        |  FROM documents
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 10000 < 3000)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    "pack_token_budget" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t != '')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(floor((cum - n_tokens) / 1000) AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,

    // the oracle's global-order running sum is the SPEC of the engine's
    // two-level prefix sum: identical offsets, pure integer spans
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |    t -> t != '')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t),
        |s AS (SELECT doc_id, CAST(cum - n_tokens AS BIGINT) AS st,
        |    CAST(cum AS BIGINT) AS en
        |  FROM c WHERE n_tokens > 0),
        |e AS (SELECT doc_id, st, en,
        |  unnest(range(st // 512, ((en - 1) // 512) + 1)) AS seq_id FROM s)
        |SELECT doc_id, seq_id,
        |  CAST(greatest(st, seq_id * 512) - seq_id * 512 AS BIGINT)
        |    AS start_in_seq,
        |  CAST(least(en, (seq_id + 1) * 512) - greatest(st, seq_id * 512)
        |    AS BIGINT) AS n_in_seq
        |FROM e ORDER BY doc_id, seq_id""".stripMargin,

    // a2 = assignment by the 1-round centroids (c1), matching kmeansFit(1)
    // + assignToNearest; the quota window replicates stratifiedQuota's
    // deterministic (id-hash, id) order
    "samp_cluster_balance" ->
      s"""WITH $kmeansCtes,
         |asg AS (SELECT vec_id, label AS cluster FROM a2),
         |sel AS (SELECT vec_id, cluster, row_number() OVER (
         |  PARTITION BY cluster ORDER BY
         |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 10000, vec_id) AS rn FROM asg)
         |SELECT vec_id, cluster FROM sel WHERE rn <= 60
         |ORDER BY vec_id""".stripMargin,
  )
}
