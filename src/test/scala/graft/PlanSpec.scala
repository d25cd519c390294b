package graft

import graft.queries.CoreQueries

/** Physical-plan regression locks: the properties SCALE.md claims are
  * asserted here so a refactor that silently loses pushdown, broadcast, or
  * the top-k operator fails the suite, not just the benchmark. */
class PlanSpec extends SparkSpec {
  

  private def plan(name: String): String =
    CoreQueries.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("point lookup pushes the key predicate to the parquet scan") {
    val p = plan("s7_point_lookup")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(c_custkey,42)"), p)
  }

  test("q1 pushes the shipdate filter and prunes columns") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("LessThan(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "unreferenced column not pruned:\n" + p)
  }

  test("q3 top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q3_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sync diff is a single full-outer SortMergeJoin") {
    val p = plan("j1_sync_classify")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("temporal joins avoid nested-loop and cartesian plans") {
    Seq("join_asof", "join_range").foreach { q =>
      val p = graft.queries.ScaleQueries.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q nested loop:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q cartesian:\n$p")
    }
    // the as-of join is a window over one exchange, not a join at all
    val asof = graft.queries.ScaleQueries.queries("join_asof")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(asof.contains("Window"), asof)
  }

  test("profiler histogram reduces before it explodes (single-pass form)") {
    // profileDF must aggregate conditional counters FIRST and only then
    // explode the one-row result into (path, ftype, cnt) rows. In the
    // printed plan (root first) the Generate therefore appears ABOVE the
    // aggregate; the regressed explode-then-count form would print the
    // aggregate above the Generate.
    val p = graft.profile.SchemaProfiler
      .profileDF(Tables.orderDocs(spark, sfDir))
      .queryExecution.executedPlan.toString
    val gen = p.indexOf("Generate")
    val agg = p.indexOf("HashAggregate")
    assert(gen >= 0 && agg > gen, p)
  }

  test("corpus n-gram top-k plans as TakeOrderedAndProject") {
    val p = graft.scale.TextAnalysis
      .topNgrams(Tables.load(spark, sfDir, "documents"), "text", 2, 20)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("weighted sample is a pure per-row filter — no exchange") {
    val p = graft.scale.Sampling.weightedSample(
        Tables.load(spark, sfDir, "documents"), "doc_id",
        org.apache.spark.sql.functions.col("n_chars"), 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("holdout split and mixture sampling are zero-exchange per-row ops") {
    val d = Tables.load(spark, sfDir, "documents")
    val split = graft.scale.Sampling.holdoutSplit(d, "doc_id", 1000, 1000)
      .queryExecution.executedPlan.toString
    assert(!split.contains("Exchange"), split)
    val mix = graft.scale.Sampling.mixtureSample(d, "source", "doc_id",
        Map("src0" -> 10000), 2000)
      .queryExecution.executedPlan.toString
    assert(!mix.contains("Exchange"), mix)
  }

  test("source-cap quota is the salted two-phase window, never one task") {
    // both Window nodes must carry a partition spec (the regressed form —
    // a global-order window — would move every row through a single task)
    val p = graft.queries.ScaleQueries.queries("samp_source_cap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.size >= 2, p) // phase-1 salted + phase-2 exact
    specs.foreach(s => assert(s.contains("source#"), s"unpartitioned window: $s\n$p"))
    assert(specs.exists(_.contains("__salt")), p) // skew pre-truncation intact
  }

  test("sequence packing windows are bucket-partitioned — never one task") {
    // the two-level prefix sum must keep every window spec partitioned on
    // the bucket key; a global-order window would funnel 100 TB of rows
    // through a single task
    val p = graft.queries.ScaleQueries.queries("pack_sequences")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s =>
      assert(s.contains("bucket#"), s"unpartitioned window: $s\n$p"))
  }

  test("token-budget packing windows are bucket-partitioned — never one task") {
    // packByTokenBudget shares packSequences' two-level prefix sum; the
    // regressed form (a global-order running sum) would serialize the
    // whole corpus through a single task when building training shards
    val p = graft.queries.ScaleQueries.queries("pack_token_budget")(
      spark, sfDir).queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s =>
      assert(s.contains("bucket#"), s"unpartitioned window: $s\n$p"))
  }

  test("perplexity-bucket ntile windows are bucket-partitioned — never " +
      "one task per language") {
    // groupedNtile's two-level prefix-sum rank must keep every window spec
    // partitioned on the cut-bucket key; a plain per-language ntile window
    // would funnel a dominant language through a single task, and the
    // offsets table must enter as a broadcast join, never a shuffle
    val p = graft.queries.ScaleQueries.queries("tx_ppl_buckets")(
      spark, sfDir).queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s =>
      assert(s.contains("bucket#"), s"unpartitioned window: $s\n$p"))
  }

  test("quality-ensemble corpus rankings are bucket-partitioned — " +
      "rank fusion never forms a global-order window") {
    // both scorer rankings go through groupedRank's two-level prefix sum;
    // a plain corpus-wide row_number would move every row through ONE
    // task, and the final top-50 must be TakeOrderedAndProject, not a
    // global sort
    val df = graft.queries.ScaleQueries.queries("tx_quality_ensemble")(
      spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s =>
      assert(s.contains("bucket#"), s"unpartitioned window: $s\n$p"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("span-rewrite keep-one is a hash aggregate — never an fp-keyed " +
      "sort window") {
    // the keep-one stage must be the min(struct) partial aggregate + an
    // AQE-splittable join-back; the regressed row_number form would funnel
    // every occurrence of one boilerplate fingerprint (millions of rows in
    // exactly the corpora this operator targets) through a single task
    for (q <- Seq("dedup_span_rewrite", "dedup_span_multi")) {
      val p = graft.queries.ScaleQueries.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val specs = "windowspecdefinition\\(([^)]*)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      specs.foreach { s =>
        assert(!s.contains("fp#"), s"$q fp-keyed window: $s\n$p")
        // the surviving windows are the per-doc gaps-and-islands merges
        assert(s.contains("doc_id#"), s"$q unpartitioned window: $s\n$p")
      }
      assert(p.contains("partial_min"),
        s"$q keep-one lost its partial aggregation:\n$p")
    }
  }

  test("exact/segment dedup keep-one is a hash aggregate — never an " +
      "fp-keyed sort window") {
    // the round-10 span-family fix, extended to its three siblings: a
    // boilerplate segment (C4 case) or an exact-duplicate document repeated
    // millions of times is exactly these operators' target corpus, and a
    // row_number() window partitioned by the fingerprint would funnel every
    // occurrence of the hottest key through a single sorted task
    for (q <- Seq("dedup_segments", "dedup_survivors", "dedup_incr_exact",
        "dedup_incr_segments")) {
      val p = graft.queries.ScaleQueries.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val specs = "windowspecdefinition\\(([^)]*)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      specs.foreach(s =>
        assert(!s.contains("fp#"), s"$q fp-keyed window: $s\n$p"))
      assert(p.contains("partial_min"),
        s"$q keep-one lost its partial aggregation:\n$p")
    }
  }

  test("curriculum schedule and budget-select windows are " +
      "bucket-partitioned — never one task") {
    // all four ride the two-level prefix-sum machinery; a regressed
    // global window would funnel the whole corpus (or a dominant band)
    // through a single task. Round 13 restored the census to ZERO
    // global-order windows: the round-12 shardSelfCheck bare-window
    // diagnostic was removed from the capstone once the driver red was
    // root-caused to the oracle's uncast HUGEINT (not the engine)
    for (q <- Seq("samp_curriculum", "samp_quality_budget",
        "samp_pack_curriculum", "samp_pack_curriculum_parts")) {
      val p = graft.queries.ScaleQueries.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val specs = "windowspecdefinition\\(([^)]*)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(specs.nonEmpty, p)
      val global = specs.filterNot(_.contains("bucket#"))
      assert(global.isEmpty, s"$q unpartitioned window: $global\n$p")
      assert(specs.exists(_.contains("bucket#")),
        s"$q lost its bucket-partitioned prefix-sum windows\n$p")
    }
  }

  test("CDC byte window partitions by (id, segment) — parallelism scales " +
      "with total bytes, never capped at payload count") {
    // the regressed per-id window would hold an entire payload's byte
    // rows in one task (a 1 GB media payload = 1G rows in one sort)
    val p = graft.queries.ScaleQueries.queries("mm_cdc_chunks")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s =>
      assert(s.contains("__cdc_seg#"), s"payload-global window: $s\n$p"))
  }

  test("round-9 broadcast pins: fuzzy-decontamination eval probe, " +
      "file-plan slot join, and domain-prior rescue all broadcast their " +
      "bounded side") {
    for (q <- Seq("tx_decontaminate_fuzzy", "layout_file_slots",
        "tx_prior_keep")) {
      val p = graft.queries.ScaleQueries.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("semdedup pair join is keyed on the cluster — no cartesian product") {
    val p = graft.queries.ScaleQueries.queries("emb_semdedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("PQ ADC search: broadcast LUT equi-join over the code table, " +
      "rank-limited before the exchange") {
    val p = graft.queries.ScaleQueries.queries("ann_pq_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the corpus-sized code table must join the tiny per-query LUT as a
    // broadcast hash join — never a shuffle or nested loop on the codes
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // top-k prunes per-partition before the per-query exchange
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("CMS estimate: probes join the BROADCAST grid — the corpus-built " +
      "sketch never shuffles the probe side") {
    val p = graft.queries.ScaleQueries.queries("sk_cms_counts")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("SQ8 ANN: one broadcast scan of the code table, top-k pruned " +
      "before the per-query exchange") {
    val p = graft.queries.ScaleQueries.queries("ann_sq_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the tiny query side broadcasts into the corpus scan (the brute-
    // force geometry — corpus touched once, never shuffled into pairs)
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // rank-limit prunes per-partition before the per-query exchange
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("multi-probe IVF: probe ranking stays a literal pass, candidates " +
      "join on the cell key — no cartesian, no nested loop") {
    val p = graft.queries.ScaleQueries.queries("ann_ivf_multiprobe")(
        spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate join is keyed (broadcast at test SF, SMJ at scale)
    assert(p.contains("cell"), p)
  }

  test("filtered ANN: same keyed candidate join as multi-probe with the " +
      "predicate BELOW the cell join — no cartesian, filter on the scan") {
    val df = graft.queries.ScaleQueries.queries("ann_filtered_topk")(
      spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("cell"), p)
    // the metadata predicate sits in the corpus-side Filter directly over
    // the scan (it prunes the posting lists BEFORE the join/scoring); a
    // post-filtered plan would score first and carry no such filter
    assert(p.contains("% 3) = 0"), p)
    // per-partition rank pruning before the per-query exchange
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("cluster-balance: quota window partitions by (cluster, salt) — " +
      "one hot topic cannot pin a task") {
    val p = graft.queries.ScaleQueries.queries("samp_cluster_balance")(
        spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition(cluster#"), p)
    assert(p.contains("__salt"), p)
  }

  test("repeat-epochs: broadcast totals join + one per-group window") {
    val p = graft.queries.ScaleQueries.queries("samp_repeat_epochs")(
        spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the cumulative window partitions by the group key (no global sort)
    assert(p.contains("windowspecdefinition(source#"), p)
  }

  test("bpe encode joins the corpus against the vocabulary — no cartesian") {
    // merge application must stay on the word vocabulary: the corpus side
    // is one explode + an equi-join + one aggregation
    val p = graft.scale.TextAnalysis.bpeEncode(
        Tables.load(spark, sfDir, "documents"), "doc_id", "text",
        Seq(("e", "s"), ("es", "t")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("DSIR scoring is a zero-exchange per-row fold over a literal table") {
    // after the bounded model collect, the scoring pass must be a pure
    // per-row expression: no Exchange, no join, no re-aggregation
    val p = graft.scale.Sampling.importanceWeights(
        Tables.load(spark, sfDir, "documents"), "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("NB scoring broadcasts the model — vocab join is never shuffled") {
    val p = graft.scale.TextAnalysis.nbScore(
        Tables.load(spark, sfDir, "documents"), "doc_id", "text",
        org.apache.spark.sql.functions.col("source") === "src0", vocab = 64)
      .queryExecution.executedPlan.toString
    // the token→model join must be the broadcast hash join (the id-keyed
    // join back to docs may legitimately sort-merge at scale)
    assert(p.contains("BroadcastHashJoin"), p)
    // model selection stays top-k shaped
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("integer gate variants keep the library plan shapes (micro/nano)") {
    // the pattern-1 reshapes must not have traded plan quality for gate
    // portability: micro DSIR scoring stays a zero-exchange per-row fold…
    val dd = Tables.load(spark, sfDir, "documents")
    val ratios = graft.scale.Sampling.importanceRatios(
      dd, "text", org.apache.spark.sql.functions.col("lang") === "en")
    val pw = graft.scale.Sampling
      .importanceWeightsMicroFromRatios(dd, "text", ratios)
      .queryExecution.executedPlan.toString
    assert(!pw.contains("Exchange"), pw)
    assert(!pw.contains("Join"), pw)
    // …and nano BM25 keeps the broadcast-join + top-k finish
    val pb = graft.scale.TextAnalysis.bm25Nano(
        dd, "doc_id", "text", "spark window join", k = 20)
      .queryExecution.executedPlan.toString
    assert(!pb.contains("SortMergeJoin"), pb)
    assert(pb.contains("BroadcastHashJoin"), pb)
    assert(pb.contains("TakeOrderedAndProject"), pb)
  }

  test("flagship count report is one union of count-pruned parquet scans") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cr").toString
    Tables.load(spark, sfDir, "nation")
      .write.mode("overwrite").parquet(s"$tmp/a.parquet")
    Tables.load(spark, sfDir, "region")
      .write.mode("overwrite").parquet(s"$tmp/b.parquet")
    val df = graft.workflow.MigrationWorkflow.countReport(
      spark, tmp, Seq("b", "a"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Union"), p)
    // each count leg reads ZERO columns (footer-metadata counts)
    assert(p.contains("ReadSchema: struct<>"), p)
    assert(!p.contains("Join"), p)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"), rows.toSeq)
    assert(rows.forall(_.getLong(1) > 0), rows.toSeq)
  }

  test("overlap matrix and funnel stay equi-join shaped — no cartesian") {
    val ov = graft.scale.TextAnalysis.sourceOverlap(
        Tables.load(spark, sfDir, "documents"), "source", "text")
      .queryExecution.executedPlan.toString
    assert(!ov.contains("CartesianProduct"), ov)
    assert(!ov.contains("BroadcastNestedLoopJoin"), ov)
    val fn = graft.streaming.EventStream.funnel(
        Tables.load(spark, sfDir, "events"), Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(!fn.contains("CartesianProduct"), fn)
    assert(!fn.contains("BroadcastNestedLoopJoin"), fn)
    // per-step slices reach the scan as pushed event_type filters
    assert(fn.contains("EqualTo(event_type,view)"), fn)
  }

  test("component stats aggregate carries map-side partials (two-phase agg)") {
    val p = graft.scale.Similarity.componentStats(
        Tables.load(spark, sfDir, "embeddings"), "embedding")
      .queryExecution.executedPlan.toString
    // partial_ aggregate functions before the exchange = map-side combine
    assert(p.contains("partial_"), p)
  }

  test("temperature sample is a zero-exchange per-row filter") {
    // the language model rides as a literal map; the data path must stay
    // an embarrassingly parallel scan (model-building agg runs beforehand)
    val p = graft.scale.Sampling.temperatureSample(
        Tables.load(spark, sfDir, "documents"), "lang", "doc_id", 3000)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("postings cap is the salted two-phase window; term top-k is bounded") {
    val p = graft.scale.TextAnalysis.postings(
        Tables.load(spark, sfDir, "documents"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the per-term doc cap must keep its salt (a stopword's corpus-sized
    // posting list would otherwise sort in one task)
    assert(p.contains("__salt"), p)
    // term selection plans as top-k, not a global sort of the vocabulary
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bm25 scoring path is broadcast-joined with a top-k finish") {
    val p = graft.scale.TextAnalysis.bm25(
        Tables.load(spark, sfDir, "documents"), "doc_id", "text",
        "spark window join", k = 20)
      .queryExecution.executedPlan.toString
    // the corpus never shuffles into a join: term stats broadcast in
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // k-bounded result — no global sort of the scored corpus
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("event anomaly window partitions by type and pre-reduces the volume") {
    val p = graft.streaming.EventStream.anomalousDays(
        Tables.load(spark, sfDir, "events"))
      .queryExecution.executedPlan.toString
    // every window spec carries the event_type partition key
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s =>
      assert(s.contains("event_type#"), s"unpartitioned window: $s\n$p"))
    // the raw event volume reduces through a partial count first
    assert(p.contains("partial_"), p)
  }

  test("tx_lang_id_ngram prunes language profiles before the gram join") {
    // the top-300 profile restriction must survive refactors: it is the
    // lever that bounds the docGrams⋈profile fan-out by the profiles
    // instead of the corpus vocabulary. topPerGroup's two-phase rank
    // filter plans as WindowGroupLimit nodes (salted + exact phase).
    val p = graft.queries.ScaleQueries.queries("tx_lang_id_ngram")(
      spark, sfDir).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("samp_length_decile's default path has no single-task window") {
    // the registered decile query assigns buckets by comparing against
    // broadcast sketch cut-points — a projection, not a global-order
    // window funneling the corpus through one task (the legacy ntile
    // formulation stays behind spark.graft.lengthDecile.ntile)
    val p = graft.queries.ScaleQueries.queries("samp_length_decile")(
      spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("window"), p)
  }

  test("no plan collects data to the driver mid-query") {
    // classification + decompose queries must not contain LocalTableScan of
    // collected data (constant lookup tables excepted — none used here)
    Seq("j1_sync_classify", "d4_array_object_table", "f1_flat_project")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("Scan ExistingRDD"), s"$q collected:\n$p")
      }
  }

  test("span rewrite: window-keyed shuffles and a doc-keyed anti join — " +
      "no pairwise document stage, no cartesian") {
    val p = graft.queries.ScaleQueries.queries("dedup_span_rewrite")(
      spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("OPQ top-k keeps the ann_pq_topk plan shape: broadcast LUT join, " +
      "top-k pruned before the per-query exchange") {
    val p = graft.queries.ScaleQueries.queries("ann_opq_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("unigram encode: no cartesian or nested-loop stage anywhere in " +
      "the train+encode pipeline") {
    val p = graft.queries.ScaleQueries.queries("tok_unigram_encode")(
      spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("no nondeterministic expression feeds a shuffle key — the " +
      "SPARK-23207 retry-correctness census") {
    // a rand()/monotonically_increasing_id() inside an exchange's
    // partitioning expressions means a fetch-failure stage retry can
    // assign rows to DIFFERENT reducers than the lost attempt — rows lost
    // or duplicated with no error. saltedJoin is the one operator that
    // ever salted a shuffle key; census the shuffle-bearing gates most
    // likely to regress plus the salted join itself.
    val nondet = Seq("monotonically_increasing_id", "rand(", "randn(",
      "uuid()", "shuffle(")
    for (q <- Seq("join_salted", "samp_pack_curriculum", "dedup_survivors",
        "tx_postings")) {
      val p = CoreQueries.queries.get(q)
        .orElse(graft.queries.ScaleQueries.queries.get(q))
        .map(_(spark, sfDir).queryExecution.executedPlan.toString).get
      val keys = "hashpartitioning\\(([^)]*)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq ++
        "rangepartitioning\\(([^)]*)".r
          .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(keys.nonEmpty, s"$q: expected at least one exchange\n$p")
      for (k <- keys; bad <- nondet)
        assert(!k.contains(bad), s"$q shuffle key carries $bad: $k\n$p")
    }
  }
}
