package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and sharding for training-data pipelines.
  *
  * All selection here is HASH-deterministic, never RNG-based: a re-run (or a
  * retried task, or a different partitioning of the same data) selects the
  * same rows, which makes the sample reproducible end-to-end and lets an
  * external engine verify it row-for-row. `rand()`-based sampling breaks all
  * three properties — at 100 TB a retried stage would silently change the
  * sample.
  */
object Sampling {

  /** Uniform deterministic id-hash bucket in [0, 10000): the shared
    * MD5-prefix hash family ([[Dedup.tokenHash]]) mod 10000 —
    * engine-portable (any system with md5 computes the identical bucket). */
  def hashBucket(id: Column): Column =
    Dedup.tokenHash(id.cast("string")) % 10000

  /** Keep ~`fraction` of rows, selected by id-hash bucket. Per-row filter:
    * no shuffle, fully pushdown-friendly, reproducible across runs/engines.
    */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    // round, not truncate: 0.29 * 10000 is 2899.999… in IEEE double
    df.filter(hashBucket(col(idCol)) < math.round(fraction * 10000))
  }

  /** Weighted deterministic Bernoulli sample: a row is kept iff its id-hash
    * bucket (uniform in [0, 10000)) falls below its own inclusion threshold
    * `min(10000, weight · perWeightBp)` basis points — inclusion probability
    * proportional to the row's weight, capped at 1 (the Horvitz-Thompson
    * shape used to oversample long/valuable documents). Pure INTEGER
    * arithmetic: no float rounding to diverge across engines, per-row
    * filter, zero shuffles, reproducible under retries/re-partitioning like
    * the uniform sampler. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      perWeightBp: Int): DataFrame = {
    require(perWeightBp > 0, s"perWeightBp must be positive: $perWeightBp")
    df.filter(hashBucket(col(idCol)) <
      least(lit(10000L), weight.cast("long") * perWeightBp))
  }

  /** Stratified quota sample: at most `quota` rows per `groupCol` value,
    * chosen in id-hash order (a deterministic stand-in for random-within-
    * group). Delegates to the skew-safe [[topPerGroup]]. */
  def stratifiedQuota(df: DataFrame, groupCol: String, idCol: String,
      quota: Int): DataFrame =
    topPerGroup(df, groupCol, col(idCol), quota,
      Seq(hashBucket(col(idCol)).asc, col(idCol).asc))
      .drop("rank")

  /** Skew-safe "best `cap` per group" (the per-domain quota cap every crawl
    * pipeline applies before training): keep each group's top `cap` rows
    * under the deterministic total order `rank` — which MUST be total (break
    * ties with a unique id as the last sort key) or survivors are
    * partition-order-dependent. Appends the in-group position as `rank`
    * (1-based int).
    *
    * Two-phase window so one hot group cannot pin a single task: rows first
    * rank within (group, salt) — salt = murmur3(`saltBy`) mod `salts`,
    * engine-private but result-neutral — and are pre-truncated to `cap`, so
    * no task sorts more than ~|group|/salts rows of the hottest group; the
    * ≤ `cap`·`salts` survivors per group then take the exact global rank.
    * Lossless: a row in a group's true top-`cap` has < `cap` rows ranked
    * above it overall, hence < `cap` above it within its own salt bucket, so
    * it always survives phase 1. */
  def topPerGroup(df: DataFrame, groupCol: String, saltBy: Column, cap: Int,
      rank: Seq[Column], salts: Int = 64): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    require(salts > 0, s"salts must be positive: $salts")
    require(!df.columns.contains("rank"),
      "topPerGroup appends a 'rank' column; input already has one")
    val saltC = Cols.fresh("__salt", df.columns)
    val rnC = Cols.fresh("__rn", df.columns)
    val w1 = Window.partitionBy(col(groupCol), col(saltC)).orderBy(rank: _*)
    val pre = df
      .withColumn(saltC, pmod(hash(saltBy), lit(salts)))
      .withColumn(rnC, row_number().over(w1))
      .filter(col(rnC) <= cap)
      .drop(saltC, rnC)
    val w2 = Window.partitionBy(col(groupCol)).orderBy(rank: _*)
    pre.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= cap)
  }

  /** Deterministic train/validation/test split: the id-hash bucket is cut at
    * `valBp` and `valBp + testBp` basis points (of 10000), so every row gets
    * exactly one label, assignment is reproducible across runs/engines/
    * repartitionings, and — because the hash ignores every other column —
    * re-ingesting a grown corpus keeps previously-assigned rows in their
    * original split (no leakage of yesterday's training rows into today's
    * test set). Per-row expression, zero shuffles. */
  def holdoutSplit(df: DataFrame, idCol: String, valBp: Int, testBp: Int,
      splitCol: String = "split"): DataFrame = {
    require(valBp >= 0 && testBp >= 0 && valBp + testBp <= 10000,
      s"holdout basis points out of range: val=$valBp test=$testBp")
    val b = hashBucket(col(idCol))
    df.withColumn(splitCol,
      when(b < valBp, "val")
        .when(b < valBp + testBp, "test")
        .otherwise("train"))
  }

  /** Dedup-aware holdout split: near-duplicate CLUSTERS are assigned to a
    * split atomically, so a test document can never have a near-duplicate
    * in train (the leakage that per-document splits silently allow).
    * `labels` is a duplicate-cluster labeling `(id, component)` — e.g.
    * [[Dedup.connectedComponents]] over verified LSH pairs; documents
    * absent from it are singletons and use their own id as the component.
    * The split is the same id-hash-bucket family as [[holdoutSplit]], keyed
    * on the component — one broadcast-or-shuffle join with the (much
    * smaller) label frame plus a per-row hash, no other data movement. */
  def leakageSafeSplit(df: DataFrame, idCol: String, labels: DataFrame,
      valBp: Int, testBp: Int, splitCol: String = "split"): DataFrame = {
    require(valBp >= 0 && testBp >= 0 && valBp + testBp <= 10000,
      s"holdout basis points out of range: val=$valBp test=$testBp")
    val joined = df
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    val b = hashBucket(col("component"))
    joined.withColumn(splitCol,
      when(b < valBp, "val")
        .when(b < valBp + testBp, "test")
        .otherwise("train"))
  }

  /** Per-group mixture sampling (dataset mixing): each `groupCol` value is
    * kept at its own rate from `ratesBp` (basis points of 10000; groups
    * absent from the map use `defaultBp`) — the standard way to hit a target
    * source mixture (upweight curated sources, downsample crawl) in one
    * pass. Selection is the same id-hash bucket as [[deterministicSample]],
    * so mixtures compose with splits/dedup reproducibly. The rate map rides
    * inside the plan as a literal map lookup: per-row filter, no join, no
    * shuffle, no driver-side row movement. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq).forall(r => r >= 0 && r <= 10000),
      s"rates must be in [0, 10000]: $ratesBp default=$defaultBp")
    val rateMap =
      if (ratesBp.isEmpty) typedLit(Map.empty[String, Int])
      else map(ratesBp.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.filter(hashBucket(col(idCol)) <
      coalesce(rateMap(col(groupCol)), lit(defaultBp)))
  }

  /** Token-budget shard assignment: documents are laid out in `orderCol`
    * order and cut into shards of ~`budgetTokens` tokens — shard_id =
    * first-token-offset div budget, the standard streaming packing rule (a
    * doc straddling a boundary goes to the shard its first token falls in).
    *
    * 100 TB shape: the global running offset is the same TWO-LEVEL prefix
    * sum as [[packSequences]] — order-preserving bucket assignment against
    * broadcast sketch cuts (zero-shuffle, the [[quantileCuts]] family),
    * per-bucket subtotals (one tiny agg; collect ≤ `buckets` rows, the
    * bounded-model pattern), then a bucket-PARTITIONED cumulative window
    * plus a literal per-bucket base offset. No global-order single-task
    * window ever forms (PlanSpec pins every window spec to carry the
    * bucket key). Shard assignment is invariant to where the cuts land —
    * ANY order-consistent bucketing yields the same global offsets — and
    * the arithmetic is pure int64 (`div`, never a float division).
    *
    * `orderCol` must be non-null (it defines the stream order); negative
    * token counts fail loudly rather than corrupt downstream offsets.
    *
    * `keepTotalCol` (diagnostic): when set, the EXCLUSIVE running token
    * total that shard_id divides (`st`, the value `shard_id = st div
    * budget` is computed from) is retained under the given name — the
    * stage-localizing surface for cross-engine hash triage (a diverging
    * shard_id is then attributable to the prefix sum vs the division). */
  def packByTokenBudget(df: DataFrame, orderCol: String, tokenCountCol: String,
      budgetTokens: Long, buckets: Int = 64,
      keepTotalCol: Option[String] = None): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(!df.columns.contains("bucket"),
      "packByTokenBudget adds a scratch 'bucket' column; rename the input's")
    keepTotalCol.foreach(n => require(!df.columns.contains(n) &&
        n != "bucket" && n != "shard_id",
      s"keepTotalCol '$n' collides with an input or generated column"))
    val taken = df.columns :+ "bucket"
    val cumC = Cols.fresh("__cum", taken)
    val offC = Cols.fresh("__off", taken)
    val stC = Cols.fresh("__st", taken)
    // fail-loud contract shared with packSequences: a negative count would
    // silently shift every later doc's shard assignment
    val dfChecked = df.withColumn(tokenCountCol,
      when(col(tokenCountCol) < 0, raise_error(concat(
        lit("packByTokenBudget: negative token count "),
        col(tokenCountCol).cast("string"), lit(" at "),
        col(orderCol).cast("string")))).otherwise(col(tokenCountCol)))
    val withB = bucketsFromCuts(dfChecked, orderCol,
      quantileCuts(df, orderCol, buckets))
    // per-bucket token subtotals → prefix offsets (collect ≤ buckets rows)
    val subs = withB.groupBy(col("bucket"))
      .agg(sum(col(tokenCountCol)).as("__s")).collect()
      .map { r =>
        require(!r.isNullAt(0), s"packByTokenBudget: null $orderCol")
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }.sortBy(_._1)
    val offs = subs.map(_._1).zip(subs.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val offExpr = offs.foldLeft(lit(0L)) { case (e, (b, o)) =>
      when(col("bucket") === b, lit(o)).otherwise(e)
    }
    val w = Window.partitionBy(col("bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = withB
      .withColumn(cumC, sum(col(tokenCountCol)).over(w))
      .withColumn(offC, offExpr)
      .withColumn(stC, col(offC) + col(cumC) - col(tokenCountCol))
      // shard via exact integer division (long `div`, never a double)
      .withColumn("shard_id", expr(s"$stC div ${budgetTokens}L"))
      .drop(cumC, offC, "bucket")
    keepTotalCol match {
      case Some(n) => packed.withColumnRenamed(stC, n)
      case None => packed.drop(stC)
    }
  }

  /** DIAGNOSTIC tripwire for [[packByTokenBudget]]: recompute `shardCol`
    * through an INDEPENDENT formulation — a bare global-order running-sum
    * window over `orderCol`, the textbook single-task definition the
    * two-level prefix sum is proven equivalent to — and `raise_error` on
    * the first row where the two disagree. Turns any silent engine-side
    * divergence (a lost checkpoint block, a nondeterministic recompute, a
    * miscut bucket) into a LOUD per-row error naming the position and both
    * values, instead of a downstream hash mismatch nobody can localize.
    *
    * Deliberately NOT a scale operator: the bare window funnels the frame
    * through one task, which is exactly why production packing uses the
    * two-level sum. Attach this only to bounded gate/triage frames. */
  def shardSelfCheck(packed: DataFrame, orderCol: String,
      tokenCountCol: String, budgetTokens: Long,
      shardCol: String = "shard_id"): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(packed.columns.contains(shardCol),
      s"shardSelfCheck: no '$shardCol' column to check")
    val taken = packed.columns
    val stC = Cols.fresh("__chk_st", taken)
    val chkC = Cols.fresh("__chk_shard", taken)
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed
      .withColumn(stC, sum(col(tokenCountCol)).over(w) - col(tokenCountCol))
      .withColumn(chkC, expr(s"$stC div ${budgetTokens}L"))
      .withColumn(shardCol,
        when(col(shardCol) === col(chkC), col(shardCol))
          .otherwise(raise_error(concat(
            lit("packByTokenBudget self-check diverged at "),
            lit(s"$orderCol="), col(orderCol).cast("string"),
            lit(": two-level="), col(shardCol).cast("string"),
            lit(" global-window="), col(chkC).cast("string"),
            lit(" running_total="), col(stC).cast("string")))))
      .drop(stC, chkC)
  }

  /** Quality-ordered token-budget selection — "take the best documents
    * until the budget is spent", the curation step that turns a scored
    * corpus into a fixed-size training set. Rows are consumed in
    * (`orderCol`, `tieCol`) ASCENDING order (pass a negated score for
    * best-first) and a row is selected iff its INCLUSIVE running token
    * total stays within `budgetTokens` — no overshoot: the first row
    * that would cross the line, and everything ranked after it, is left
    * out. Adds `cum_tokens` (the inclusive running total) and `selected`.
    *
    * Same two-level prefix-sum shape as [[packByTokenBudget]] — bucket by
    * global [[quantileCuts]] on `orderCol`, per-bucket token subtotals
    * collected (≤ `buckets` rows) into broadcast offsets, within-bucket
    * running sum — with an EXPLICIT tie column so equal scores stay
    * deterministic (packByTokenBudget's orderCol is contractually unique;
    * quality scores are not). No global-order window; pure int64. */
  def budgetSelect(df: DataFrame, orderCol: String, tieCol: String,
      tokenCountCol: String, budgetTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(!df.columns.contains("bucket"),
      "budgetSelect adds a scratch 'bucket' column; rename the input's")
    require(!df.columns.contains("cum_tokens")
        && !df.columns.contains("selected"),
      "budgetSelect adds 'cum_tokens'/'selected'; rename the input's")
    val dfChecked = df.withColumn(tokenCountCol,
      when(col(tokenCountCol) < 0, raise_error(concat(
        lit("budgetSelect: negative token count "),
        col(tokenCountCol).cast("string"), lit(" at "),
        col(tieCol).cast("string")))).otherwise(col(tokenCountCol)))
    val withB = bucketsFromCuts(dfChecked, orderCol,
      quantileCuts(df, orderCol, buckets))
    val subs = withB.groupBy(col("bucket"))
      .agg(sum(col(tokenCountCol)).as("__s")).collect()
      .map { r =>
        require(!r.isNullAt(0), s"budgetSelect: null $orderCol")
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }.sortBy(_._1)
    val offs = subs.map(_._1).zip(subs.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val offExpr = offs.foldLeft(lit(0L)) { case (e, (b, o)) =>
      when(col("bucket") === b, lit(o)).otherwise(e)
    }
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .withColumn("cum_tokens", offExpr + sum(col(tokenCountCol)).over(w))
      .withColumn("selected", col("cum_tokens") <= budgetTokens)
      .drop("bucket")
  }

  /** Data-constrained repeat/epoch planning (Muennighoff et al., "Scaling
    * Data-Constrained Language Models", NeurIPS 2023): when the target
    * mixture asks a source for more tokens than it has, the source is
    * REPEATED. Each group's token target is `budgetTokens·w/10000` (basis
    * points from `weightsBp`, `defaultBp` for absent groups); every doc in
    * the group gets `target div Σtokens` full epochs, plus one more for
    * docs in the deterministic partial prefix that fills the remainder —
    * docs ordered by (id-hash, id) and included while their FIRST token
    * falls inside the remainder (the [[packByTokenBudget]] straddle rule,
    * so the partial epoch is itself an unbiased hash-ordered sample).
    * `epochs = 0` prunes a doc, 1 keeps it once, n > 1 repeats it.
    *
    * 100 TB shape: one bounded per-group aggregate (broadcast back — group
    * cardinality is sources/languages), a literal weight-map lookup, and
    * ONE per-group cumulative window on ~uniform hash order. All
    * arithmetic is int64 (`div`/`%` — no float division anywhere), so the
    * plan is engine-exact at any scale. A group so large its window skews
    * gets the pack_sequences two-level prefix-sum treatment (SCALE.md).
    * Output: input columns + `epochs` (int64). */
  def repeatEpochs(df: DataFrame, groupCol: String, idCol: String,
      tokenCountCol: String, budgetTokens: Long,
      weightsBp: Map[String, Int], defaultBp: Int): DataFrame = {
    require(budgetTokens > 0 && budgetTokens <= Long.MaxValue / 10000,
      s"budgetTokens out of range: $budgetTokens")
    require((defaultBp +: weightsBp.values.toSeq).forall(w => w >= 0 && w <= 10000),
      s"weights must be in [0, 10000] basis points: $weightsBp default=$defaultBp")
    val wMap =
      if (weightsBp.isEmpty) typedLit(Map.empty[String, Int])
      else map(weightsBp.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCountCol)).as("__t"))
    val wOrd = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(totals), Seq(groupCol))
      .withColumn("__w",
        coalesce(wMap(col(groupCol)), lit(defaultBp)).cast("long"))
      .withColumn("__target", expr(s"(${budgetTokens}L * __w) div 10000"))
      .withColumn("__full",
        when(col("__t") > 0, expr("__target div __t")).otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__t") > 0, expr("__target % __t")).otherwise(lit(0L)))
      .withColumn("__cum", sum(col(tokenCountCol)).over(wOrd))
      .withColumn("epochs",
        (col("__full") + when(
          col("__cum") - col(tokenCountCol) < col("__rem"), lit(1L))
          .otherwise(lit(0L))).cast("long"))
      .drop("__t", "__w", "__target", "__full", "__rem", "__cum")
  }

  /** DSIR-style importance weights over hashed token buckets (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling", 2023):
    * each token lands in one of `buckets` MD5-derived buckets (the shared
    * engine-portable [[Dedup.tokenHash]] family); the target (`isTarget`)
    * and raw (rest) corpora define smoothed bucket distributions; a
    * document's weight is the sum over its tokens of
    * `ln(p_target(bucket) / p_raw(bucket))` — high weight = looks like the
    * target distribution.
    *
    * 100 TB shape: one explode+groupBy over `buckets` keys (map-side
    * partials make it scan-bound; the collect is ≤ `buckets` rows, the same
    * bounded-model pattern as the k-means centroid collect), then scoring
    * is a ZERO-SHUFFLE per-row fold over the token array against a literal
    * ratio table — no vocab join, no per-doc re-aggregation.
    *
    * Determinism: each bucket's log ratio is quantized HALF_UP at 6
    * decimals driver-side (exactly Spark's and DuckDB's double→DECIMAL
    * rounding), so the per-doc weight is an EXACT decimal sum —
    * order-independent and bit-stable across engines. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame =
    importanceWeightsFromRatios(docs, textCol,
      importanceRatios(docs, textCol, isTarget, buckets))

  /** The bucket-ratio model behind [[importanceWeights]], exposed so
    * callers (and the correctness oracle) can reuse the exact quantized
    * constants instead of re-deriving the `ln` — the cross-engine
    * canonicalization contract (see `graft.queries.OracleLits`).
    * Driver-side by design: the collect is ≤ `buckets` rows. */
  def importanceRatios(docs: DataFrame, textCol: String,
      isTarget: Column, buckets: Int = 256): IndexedSeq[BigDecimal] = {
    require(buckets >= 2 && buckets <= 65536, s"buckets out of range: $buckets")
    val tokC = Cols.fresh("__tok", docs.columns)
    val isTC = Cols.fresh("__is_t", docs.columns)
    val bC = Cols.fresh("__b", docs.columns)
    val counted = docs
      .select(isTarget.as(isTC),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as(tokC))
      .select(col(isTC),
        pmod(Dedup.tokenHash(col(tokC)), lit(buckets.toLong)).as(bC))
      .groupBy(bC)
      .agg(sum(when(col(isTC), 1L).otherwise(0L)).as("ct"),
        sum(when(col(isTC), 0L).otherwise(1L)).as("cr"))
      .collect()
    val ct = Array.fill(buckets)(0L)
    val cr = Array.fill(buckets)(0L)
    counted.foreach { r =>
      val i = r.getLong(0).toInt; ct(i) = r.getLong(1); cr(i) = r.getLong(2) }
    val nt = ct.sum.toDouble
    val nr = cr.sum.toDouble
    (0 until buckets).map { i =>
      val v = math.log(((ct(i) + 1.0) / (nt + buckets)) /
        ((cr(i) + 1.0) / (nr + buckets)))
      BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
    }
  }

  /** Zero-shuffle scoring half of [[importanceWeights]]: fold each doc's
    * token buckets against the literal quantized ratio table. */
  def importanceWeightsFromRatios(docs: DataFrame, textCol: String,
      ratio: IndexedSeq[BigDecimal]): DataFrame = {
    val buckets = ratio.size
    val ratioArr = typedLit(ratio)
    // the merge must return EXACTLY the accumulator type (decimal addition
    // widens scale 18→17); the cast back is exact — values carry 6 decimals
    val w = aggregate(TextAnalysis.tokens(lower(col(textCol))),
      typedLit(BigDecimal(0)),
      (acc, t) => (acc + element_at(ratioArr,
        (pmod(Dedup.tokenHash(t), lit(buckets.toLong)) + 1).cast("int")))
        .cast("decimal(38,18)"))
    docs.withColumn("weight", w.cast("decimal(18,6)"))
  }

  /** Integer-micro gate surface of [[importanceWeightsFromRatios]]: the
    * same fold, but each bucket's 6-decimal log ratio is shipped as its
    * exact MICRO-UNIT long (ratio × 10⁶ — integral by construction, the
    * ratios are quantized at scale 6) and the per-doc weight is a pure
    * int64 sum. No DECIMAL or DOUBLE appears anywhere on the compared
    * surface, so no engine pair can disagree on literal parsing, decimal
    * widening, or value formatting — the cross-engine "pattern 1"
    * contract (SCALE.md). `weight_micro = weight × 10⁶` exactly.
    * Overflow-safe by construction: |ratio_micro| ≤ ln(bucket-count+1)·10⁶
    * ≲ 2·10⁷, so a doc needs ~10¹¹ tokens to overflow int64. */
  def importanceWeightsMicroFromRatios(docs: DataFrame, textCol: String,
      ratio: IndexedSeq[BigDecimal]): DataFrame = {
    val buckets = ratio.size
    val micro = ratio.map(r =>
      r.setScale(6).bigDecimal.movePointRight(6).longValueExact)
    val microArr = typedLit(micro)
    val w = aggregate(TextAnalysis.tokens(lower(col(textCol))),
      lit(0L),
      (acc, t) => acc + element_at(microArr,
        (pmod(Dedup.tokenHash(t), lit(buckets.toLong)) + 1).cast("int")))
    docs.withColumn("weight_micro", w)
  }

  /** Deterministic importance resample: the `k` documents most like the
    * target distribution under [[importanceWeights]], selected by the total
    * order (weight desc, id asc) — a reproducible stand-in for DSIR's
    * Gumbel top-k (which needs RNG). Plans as TakeOrderedAndProject: no
    * global sort at any scale. */
  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, buckets: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    importanceWeights(docs, idCol, textCol, isTarget, buckets)
      .orderBy(col("weight").desc, col(idCol).asc)
      .limit(k)
  }

  /** Language-temperature resampling (the multilingual-corpus rebalance of
    * XLM-R / mBERT: Conneau et al., "Unsupervised Cross-lingual
    * Representation Learning at Scale", 2020 §3): groups are sampled with
    * probability ∝ p^α (α = `alphaBp`/10000 < 1 flattens the distribution),
    * which per ROW means a keep rate ∝ p^(α−1), scaled so the rarest group
    * is kept in full — common languages are downsampled, rare ones
    * preserved. Selection reuses the engine-portable id-hash bucket, so
    * temperature mixes compose with splits and dedup reproducibly.
    *
    * 100 TB shape: one count-by-group aggregate whose result is bounded by
    * the number of GROUPS (languages/sources — this is for low-cardinality
    * group columns, same bounded-model contract as the k-means centroid
    * collect), then a zero-shuffle per-row hash filter against a literal
    * rate map. Determinism: the only transcendental (pow) is quantized
    * HALF_UP at 6 decimals driver-side — exactly Spark's and DuckDB's
    * double→DECIMAL rounding — before the rates are normalized, so an
    * external engine recomputes the identical basis-point thresholds. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      alphaBp: Int, maxGroups: Int = 65536): DataFrame = {
    require(alphaBp > 0 && alphaBp <= 10000,
      s"alphaBp must be in (0, 10000]: $alphaBp")
    require(maxGroups > 0, s"maxGroups must be positive: $maxGroups")
    // α−1 computed as ONE integer-sourced division so an external engine
    // reproduces the identical double (alphaBp/1e4 − 1.0 rounds twice)
    val expo = (alphaBp - 10000).toDouble / 10000.0
    // the collect's bound is CONTRACTUAL (low-cardinality group columns),
    // not structural like the DSIR bucket count — enforce it loudly, and
    // BEFORE materializing: the limit caps what ever reaches the driver,
    // so a high-cardinality misuse errors instead of OOMing the collect
    val counts = df.groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxGroups + 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.size <= maxGroups,
      s"temperatureSample saw > $maxGroups groups; it is for " +
        "low-cardinality group columns (languages/sources) — " +
        "raise maxGroups only if the driver can hold that rate map")
    if (counts.isEmpty) return df.filter(lit(false))
    val n = counts.values.sum.toDouble
    val r6 = counts.map { case (g, c) =>
      g -> BigDecimal(math.pow(c.toDouble / n, expo))
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
    }
    val mx = r6.values.max
    // exact-decimal → double division is one IEEE op on both engines; the
    // rarest group lands exactly at 10000 (r6 == mx)
    val keepBp = r6.map { case (g, r) =>
      g -> math.round(10000.0 * r.toDouble / mx.toDouble)
    }
    val rateMap = map(keepBp.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.filter(hashBucket(col(idCol)) < rateMap(col(groupCol).cast("string")))
  }

  /** Water-filling token allocation for mixture construction: split
    * `budgetTokens` across groups proportionally to `weightsBp`, capped by
    * each group's available tokens, with capped groups' surplus
    * redistributed among the rest at THEIR relative weights — iterated to
    * the fixed point (the standard mixture-building step when target
    * weights exceed what small sources hold; [[repeatEpochs]] is the
    * sibling that REPEATS scarce sources instead of redistributing).
    *
    * Pure integer arithmetic, fully deterministic: proportional targets
    * are int64 floor division, and the sub-group-count floor remainder is
    * handed out one token at a time in group-name order to groups with
    * headroom. Invariants (spec-asserted): Σ alloc = min(budget, Σ avail);
    * alloc ≤ avail per group; saturated groups get exactly avail.
    * Driver-side on the bounded per-group table (`avail` must be
    * group-cardinality-sized — the [[temperatureSample]] contract);
    * tools/lit_check.py re-derives the allocation independently. */
  def waterfillAllocation(avail: Seq[(String, Long)],
      weightsBp: Map[String, Int], defaultBp: Int,
      budgetTokens: Long): Seq[(String, Long, Long, Long)] = {
    require(budgetTokens >= 0, s"budget must be >= 0: $budgetTokens")
    // the proportional target multiplies remaining × weight in int64;
    // guard the product loudly instead of silently wrapping (a 10¹⁵-token
    // budget at weight 10⁴ would overflow — rescale weights or budget)
    require(budgetTokens <= Long.MaxValue / 10001,
      s"budget too large for bp-weight int64 arithmetic: $budgetTokens")
    require(defaultBp >= 0, "defaultBp must be >= 0")
    // duplicates would collapse into one alloc/weight map entry (last
    // write wins) while the output echoed both rows — silently breaking
    // the Σ alloc = min(budget, Σ avail) invariant
    require(avail.map(_._1).distinct.size == avail.size,
      s"duplicate group names in avail: " +
        avail.groupBy(_._1).collect { case (g, rs) if rs.size > 1 => g }
          .toSeq.sorted.mkString(", "))
    avail.foreach { case (g, a) =>
      require(a >= 0, s"negative avail for $g: $a") }
    val weight: Map[String, Long] = avail.map { case (g, _) =>
      g -> weightsBp.getOrElse(g, defaultBp).toLong }.toMap
    weight.foreach { case (g, w) =>
      require(w >= 0 && w <= 10000,
        s"weight out of basis-point range [0, 10000] for $g: $w") }
    val alloc = scala.collection.mutable.Map[String, Long]()
    var active = avail.sortBy(_._1) // name order — deterministic
      .filter { case (g, _) => weight(g) > 0 }
    // zero-weight (and, below, saturated) groups are fixed at their cap
    avail.foreach { case (g, a) =>
      alloc(g) = if (weight(g) == 0) 0L else -1L }
    var remaining = budgetTokens
    var progress = true
    while (progress && active.nonEmpty) {
      progress = false
      val sumAvail = active.map(_._2).sum
      if (sumAvail <= remaining) {
        // everything left saturates — budget exceeds supply
        active.foreach { case (g, a) => alloc(g) = a }
        remaining -= sumAvail
        active = Nil
      } else {
        val sumW = active.map { case (g, _) => weight(g) }.sum
        val sat = active.filter { case (g, a) =>
          a <= remaining * weight(g) / sumW }
        if (sat.nonEmpty) {
          sat.foreach { case (g, a) => alloc(g) = a; remaining -= a }
          active = active.filterNot { case (g, _) => sat.exists(_._1 == g) }
          progress = true
        } else {
          // fixed point: floor targets + name-order remainder hand-out
          val sumWf = active.map { case (g, _) => weight(g) }.sum
          active.foreach { case (g, _) =>
            alloc(g) = remaining * weight(g) / sumWf }
          var r = remaining - active.map { case (g, _) => alloc(g) }.sum
          var i = 0
          while (r > 0) {
            val (g, a) = active(i % active.size)
            if (alloc(g) < a) { alloc(g) += 1; r -= 1 }
            i += 1
          }
          remaining = 0
          active = Nil
        }
      }
    }
    avail.sortBy(_._1).map { case (g, a) =>
      (g, a, weight(g), alloc(g)) }
  }

  /** UniMax language-sampling allocation (Chung et al. '23,
    * arXiv:2304.09151): spread the token budget as UNIFORMLY as possible
    * across languages, capping every language at `maxEpochs` passes over
    * its own corpus — the published fix for temperature sampling's twin
    * failure modes (head languages dominating the mixture at high
    * temperature, tail languages over-repeated into memorization at low).
    * The optimum is exactly the water-filling fixed point under EQUAL
    * weights with per-group supply `avail × maxEpochs`, so this reuses the
    * spec-tested integer [[waterfillAllocation]] core unchanged (its
    * saturation rounds realize UniMax's "remove budget-exhausted
    * languages, re-spread the remainder" loop); everything stays exact
    * int64 — the only division is the reported epochs, floored to
    * micro-units. Rows: (group, avail, cap, alloc, epochs_micro), name
    * order. Scale shape: the input is one bounded per-language aggregate
    * (language cardinality is tiny next to the corpus), the plan itself is
    * driver arithmetic — same contract as the waterfill and DoReMi plans. */
  def unimaxAllocation(avail: Seq[(String, Long)], maxEpochs: Int,
      budgetTokens: Long): Seq[(String, Long, Long, Long, Long)] = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    // epochs_micro multiplies alloc by 1e6; alloc <= budget, so one guard
    // bounds both the cap product and the reporting product
    require(budgetTokens <= Long.MaxValue / 1000000L,
      s"budget too large for micro-epoch int64 reporting: $budgetTokens")
    avail.foreach { case (g, a) =>
      require(a >= 0 && a <= Long.MaxValue / maxEpochs,
        s"avail out of int64 cap range for $g: $a") }
    val capped = avail.map { case (g, a) => (g, a * maxEpochs) }
    val byName = avail.toMap
    waterfillAllocation(capped, Map.empty, defaultBp = 100,
        budgetTokens = budgetTokens)
      .map { case (g, cap, _, alloc) =>
        val a = byName(g)
        (g, a, cap, alloc, if (a == 0L) 0L else alloc * 1000000L / a)
      }
  }

  /** Scale-path quantile bucketing: assign each row a bucket 1..n by
    * comparing `valueCol` against percentile_approx cut-points — a single
    * fixed-size-sketch aggregation plus a zero-shuffle per-row comparison
    * against n-1 broadcast literals, where exact `ntile` would move the
    * entire dataset through ONE task (a global-order window does not
    * partition). The trade: buckets are approximate at the boundaries
    * (sketch accuracy 1/`accuracy`) and ties land in one bucket rather than
    * splitting to equalize counts — acceptable for curriculum bucketing,
    * not for an exact-equal-count contract (that is `samp_length_decile`'s
    * ntile semantics, kept for oracle parity at test SF). */
  def quantileBuckets(df: DataFrame, valueCol: String, n: Int,
      accuracy: Int = 10000): DataFrame =
    bucketsFromCuts(df, valueCol,
      quantileCuts(df, valueCol, n, accuracy))

  /** The cut-points behind [[quantileBuckets]], exposed so callers (and
    * the correctness oracle, via `graft.queries.OracleLits`) can reuse the
    * exact sketch output instead of re-deriving it — a KLL/GK sketch is
    * engine-specific, so cross-engine comparison must treat the cuts as
    * given constants. One fixed-size-sketch aggregation. */
  def quantileCuts(df: DataFrame, valueCol: String, n: Int,
      accuracy: Int = 10000): Array[Double] = {
    require(n >= 2, "need at least 2 buckets")
    df.stat.approxQuantile(
      valueCol, (1 until n).map(_.toDouble / n).toArray, 1.0 / accuracy)
  }

  /** Skew-safe EXACT grouped ntile: assigns each row the same bucket
    * `ntile(k) OVER (PARTITION BY groupCol ORDER BY orderCol, tieCol)`
    * would, without ever forming a per-group global-order window (at
    * 100 TB a dominant group — one language, one source — would pin that
    * window to a single task). Two-level prefix-sum ranking, the
    * [[packSequences]] shape:
    *
    *  1. rows bucket by GLOBAL [[quantileCuts]] on `orderCol` — any
    *     order-consistent bucketing yields the same final ranks, so the
    *     sketch's approximation never reaches the output;
    *  2. per-(group, bucket) counts collect to the driver (bounded by
    *     `maxGroups × buckets`, enforced loudly) and become per-group
    *     running base offsets plus per-group totals, broadcast back;
    *  3. rank = base offset + `row_number` over the (group, bucket)
    *     window — every window partition carries the bucket key;
    *  4. the SQL-standard ntile formula maps (rank, n) to the bucket in
    *     pure int64: the first `n % k` buckets take `n div k + 1` rows.
    *
    * `orderCol` must be non-null (it defines the order; a null would fall
    * out of every cut bucket) and (`orderCol`, `tieCol`) must be a total
    * order within each group — equal `orderCol` values always share a cut
    * bucket, so the within-bucket window sees every tie group whole. */
  def groupedNtile(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, k: Int, buckets: Int = 64,
      maxGroups: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(!df.columns.contains("ntile"),
      "groupedNtile adds an 'ntile' column; rename the input's")
    val taken = df.columns ++ Seq("rank", "n_in_group", "ntile")
    val nC = Cols.fresh("__n", taken)
    val rkC = Cols.fresh("__rk", taken)
    val ranked = groupedRank(df, groupCol, orderCol, tieCol, buckets,
      maxGroups, rankCol = rkC, nCol = nC)
    val q = expr(s"$nC div ${k}L")           // base bucket size
    val rem = expr(s"$nC % ${k}L")           // buckets that take one extra
    ranked
      // SQL ntile: rank r in 1..n → first rem buckets hold q+1 rows each;
      // greatest(q, 1) keeps the (unreachable when q = 0) else branch from
      // dividing by zero under codegen's non-ANSI null result
      .withColumn("ntile",
        when(col(rkC) <= rem * (q + 1L),
          expr(s"($rkC - 1L) div ($nC div ${k}L + 1L) + 1L"))
          .otherwise(rem + expr(
            s"($rkC - 1L - ($nC % ${k}L) * ($nC div ${k}L + 1L)) div " +
              s"greatest($nC div ${k}L, 1L) + 1L"))
          .cast("long"))
      .drop(rkC, nC)
  }

  /** Skew-safe EXACT grouped rank — the machinery behind [[groupedNtile]],
    * exposed for consumers that need the `row_number() OVER (PARTITION BY
    * group ORDER BY order, tie)` value itself (batch construction,
    * curriculum positions) without a per-group global-order window: rows
    * bucket by global [[quantileCuts]] (any order-consistent bucketing
    * yields the same ranks), per-(group, bucket) counts become per-group
    * base offsets + totals broadcast back, and rank = offset +
    * bucket-partitioned `row_number`. Adds `rankCol` (1-based, int64) and
    * `nCol` (the group's row count). */
  def groupedRank(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, buckets: Int = 64, maxGroups: Int = 1000,
      rankCol: String = "rank", nCol: String = "n_in_group"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(!df.columns.contains("bucket"),
      "groupedRank adds a scratch 'bucket' column; rename the input's")
    require(!df.columns.contains(rankCol) && !df.columns.contains(nCol),
      s"groupedRank adds '$rankCol'/'$nCol'; rename the input's")
    val taken = df.columns ++ Seq("bucket", rankCol, nCol)
    val gC = Cols.fresh("__g", taken)
    val rnC = Cols.fresh("__rn", taken)
    val offC = Cols.fresh("__off", taken)
    val withB = bucketsFromCuts(df, orderCol,
      quantileCuts(df, orderCol, buckets))
    // per-(group, bucket) counts: the bound is CONTRACTUAL (languages,
    // sources) — cap what reaches the driver BEFORE collecting, so a
    // high-cardinality misuse errors instead of OOMing the collect
    val subs = withB
      .groupBy(col(groupCol).cast("string").as(gC), col("bucket"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxGroups * buckets + 1).collect()
      .map { r =>
        require(!r.isNullAt(0), s"groupedRank: null $groupCol")
        require(!r.isNullAt(1), s"groupedRank: null $orderCol")
        (r.getString(0), r.getLong(1), r.getLong(2))
      }
    require(subs.length <= maxGroups * buckets,
      s"groupedRank saw > $maxGroups groups × $buckets cut buckets; it " +
        "is for low-cardinality group columns — raise maxGroups only if " +
        "the driver can hold that offset table")
    // per-group running offsets + totals (tiny, driver-side, broadcast)
    val offRows = subs.groupBy(_._1).toSeq.flatMap { case (g, entries) =>
      val sorted = entries.sortBy(_._2)
      val prefix = sorted.map(_._3).scanLeft(0L)(_ + _)
      val total = prefix.last
      sorted.zip(prefix).map { case ((_, b, _), off) => (g, b, off, total) }
    }
    if (offRows.isEmpty) {
      return df.withColumn(rankCol, lit(null).cast("long"))
        .withColumn(nCol, lit(null).cast("long")).filter(lit(false))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(offRows.toDF(gC, "bucket", offC, nCol))
    val w = Window.partitionBy(col(groupCol), col("bucket"))
      .orderBy(col(orderCol), col(tieCol))
    withB
      .withColumn(rnC, row_number().over(w).cast("long"))
      .join(offsets,
        withB(groupCol).cast("string") === offsets(gC)
          && withB("bucket") === offsets("bucket"))
      .drop(offsets(gC)).drop(offsets("bucket"))
      .withColumn(rankCol, col(offC) + col(rnC))
      .drop("bucket", rnC, offC)
  }

  /** Interleaved curriculum schedule — the DATALOADER-ORDER artifact a
    * banded training run actually consumes. Input rows carry a band
    * (typically [[groupedNtile]] buckets over a difficulty signal:
    * perplexity, quality, length); the output assigns every row a global
    * training position such that
    *  - WITHIN a band, order is the deterministic per-seed shuffle (the
    *    epoch-shuffle primitive: 60-bit MD5 key of "seed:id"), ranked by
    *    [[groupedRank]] — no per-band global-order window, so a dominant
    *    band never pins one task;
    *  - ACROSS bands, rows interleave by STRIDE SCHEDULING: band b's r-th
    *    element gets `ikey = ((2r−1)·scale) div n_b` — the midpoint
    *    fraction (2r−1)/(2·n_b) in fixed-point — so every prefix of the
    *    schedule carries each band in proportion to its size (the
    *    per-band drift in any prefix window is O(1) elements plus tie
    *    slack; SamplingAndRepetitionSpec asserts it). Deterministic band
    *    mixing per step, no RNG.
    * Adds `band_rank` (1-based within band), `n_band`, `ikey`, and
    * `global_pos` (1-based over the whole schedule — itself computed by
    * the single-group [[groupedRank]], so even the total order never
    * forms a one-task window). All arithmetic is int64 with a loud
    * overflow guard; any engine replays it exactly. */
  def curriculumInterleave(df: DataFrame, idCol: String, bandCol: String,
      seed: Long, scale: Long = 1L << 20, buckets: Int = 64,
      maxBands: Int = 1000): DataFrame = {
    require(scale >= 1, s"scale must be positive: $scale")
    val taken = df.columns ++
      Seq("band_rank", "n_band", "ikey", "global_pos")
    val ckC = Cols.fresh("__ck", taken)
    val tieC = Cols.fresh("__tie", taken)
    val oneC = Cols.fresh("__one", taken)
    val ntC = Cols.fresh("__ntot", taken)
    val keyed = df.withColumn(ckC, graft.scale.Dedup.tokenHash60(
      concat(lit(s"$seed:"), col(idCol).cast("string"))))
    val ranked = groupedRank(keyed, bandCol, ckC, idCol, buckets, maxBands,
      rankCol = "band_rank", nCol = "n_band")
    // (2r−1)·scale must stay in int64 — name the rank instead of wrapping
    val lim = Long.MaxValue / scale
    // materialized: the global-position groupedRank below drives THREE
    // actions over this frame (cut sketch, offset collect, final plan) —
    // without the cut each would re-run the per-band rank's window+join
    val withKey = graft.io.Materialize(ranked
      .withColumn("ikey",
        when(col("band_rank") * 2L - 1L > lim, raise_error(concat(
          lit("curriculumInterleave: band rank "),
          col("band_rank").cast("string"),
          lit(s" overflows int64 at scale $scale — lower scale"))))
        .otherwise(expr(s"((band_rank * 2L - 1L) * ${scale}L) div n_band")))
      .drop(ckC))
    // global position over (ikey, band, band_rank) — a TOTAL order, via
    // the same two-level prefix-sum rank with one constant group
    groupedRank(
        withKey.withColumn(oneC, lit(0L))
          .withColumn(tieC, struct(col(bandCol), col("band_rank"))),
        oneC, "ikey", tieC, buckets, maxGroups = 1,
        rankCol = "global_pos", nCol = ntC)
      .drop(oneC, tieC, ntC)
  }

  /** Curriculum-schedule QA report — the dataloader-order acceptance table
    * (the [[graft.scale.Similarity.annFrontier]] pattern applied to
    * sampling): for a schedule carrying a band, a 1-based global position,
    * and a 1-based within-band rank (the [[curriculumInterleave]] output),
    * report per (band, prefix) how many of the band's rows land in each of
    * `prefixes` equal schedule prefixes — the band-share data whose
    * deviation vs ideal (`n_in_prefix·N − n_band·prefix_len`, the reader's
    * one cross-multiplication) certifies every training prefix carries
    * each band proportionally — plus each band's maximum interleave gap
    * (the longest wait between two consecutive occurrences, measured from
    * position 0).
    *
    * 100 TB shape: gaps come from an EQUI-JOIN of the schedule to itself
    * on (band, rank−1) — within a band the stride schedule's positions are
    * monotone in rank, so rank-adjacent IS position-adjacent and no
    * per-band global-order window ever forms; prefix counts are one hash
    * aggregate of `prefixes` conditional sums against literal cut-offs
    * (N comes from one bounded count action). Output is pure int64:
    * (band, prefix_id, prefix_len, n_band, n_in_prefix, max_gap). */
  def curriculumQa(schedule: DataFrame, bandCol: String, posCol: String,
      rankCol: String, prefixes: Int = 10): DataFrame = {
    require(prefixes >= 1, s"prefixes must be positive: $prefixes")
    val taken = schedule.columns ++
      Seq("band", "prefix_id", "prefix_len", "n_band", "n_in_prefix",
        "max_gap")
    val bC = Cols.fresh("__qb", taken)
    val rC = Cols.fresh("__qr", taken)
    val pC = Cols.fresh("__qprev", taken)
    val gC = Cols.fresh("__qgap", taken)
    val n = schedule.count() // one bounded action; N is a plan literal
    val cuts = (1 to prefixes).map(p => (p.toLong, p.toLong * n / prefixes))
    val prevPos = schedule.select(col(bandCol).as(bC),
      (col(rankCol) + 1L).as(rC), col(posCol).as(pC))
    val gaps = schedule.join(prevPos,
        col(bandCol) === col(bC) && col(rankCol) === col(rC), "left_outer")
      .withColumn(gC, col(posCol) - coalesce(col(pC), lit(0L)))
    val aggs = Seq(
      count(lit(1)).as("n_band"),
      max(col(gC)).cast("long").as("max_gap")) ++
      cuts.map { case (p, lp) =>
        sum(when(col(posCol) <= lp, 1L).otherwise(0L)).as(s"__n$p") }
    val wide = gaps.groupBy(col(bandCol).as("band"))
      .agg(aggs.head, aggs.tail: _*)
    wide.select(col("band"), col("n_band"), col("max_gap"),
        explode(array(cuts.map { case (p, lp) =>
          struct(lit(p).as("prefix_id"), lit(lp).as("prefix_len"),
            col(s"__n$p").as("n_in_prefix"))
        }: _*)).as("__pf"))
      .select(col("band"),
        col("__pf").getField("prefix_id").as("prefix_id"),
        col("__pf").getField("prefix_len").as("prefix_len"),
        col("n_band"), col("__pf").getField("n_in_prefix").as("n_in_prefix"),
        col("max_gap"))
  }

  /** GPT-style sequence packing (document-concatenation batch
    * construction): the corpus token stream, concatenated in `orderCol`
    * order, is cut into fixed `seqLen` context windows; each document
    * emits one row per window it overlaps — `(orderCol, seq_id,
    * start_in_seq, n_in_seq)` — the attention-span map a packed
    * pretraining loader needs (no padding waste; a doc may straddle
    * window boundaries). [[packByTokenBudget]] is the coarser cousin:
    * whole docs into open-ended shards; this cuts EXACT fixed-length
    * windows and says which slice of each window each doc occupies.
    *
    * 100 TB shape: the global running offset is a TWO-LEVEL prefix sum —
    * order-preserving bucket assignment against broadcast sketch cuts
    * (zero-shuffle, the [[quantileCuts]] family), per-bucket subtotals
    * (one tiny agg; collect ≤ `buckets` rows, the bounded-model pattern),
    * then a bucket-PARTITIONED cumulative window plus a literal per-bucket
    * base offset. No global-order single-task window ever forms (PlanSpec
    * pins every window spec to carry the bucket key). The output is
    * invariant to where the cuts land: ANY order-consistent bucketing
    * yields the same global offsets, so the sketch needs no cross-engine
    * canonicalization and the gate stays pure int64.
    *
    * `orderCol` must be non-null and unique (it defines the stream order);
    * zero-token documents occupy no stream positions and emit no rows. */
  def packSequences(df: DataFrame, orderCol: String, tokenCountCol: String,
      seqLen: Long, buckets: Int = 64): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(!df.columns.contains("bucket"),
      "packSequences adds a scratch 'bucket' column; rename the input's")
    val taken = df.columns :+ "bucket"
    val cumC = Cols.fresh("__cum", taken)
    val offC = Cols.fresh("__off", taken)
    val stC = Cols.fresh("__st", taken)
    val enC = Cols.fresh("__en", taken)
    val seqC = Cols.fresh("__seq", taken)
    // fail-loud contract: a negative token count would silently corrupt
    // every downstream stream offset (and en < st makes sequence() emit a
    // descending bogus window range) — guard it at the frame entry, so
    // BOTH consumers (the subtotal collect and the cumulative window) see
    // the checked column
    val dfChecked = df.withColumn(tokenCountCol,
      when(col(tokenCountCol) < 0, raise_error(concat(
        lit("packSequences: negative token count "),
        col(tokenCountCol).cast("string"), lit(" at "),
        col(orderCol).cast("string")))).otherwise(col(tokenCountCol)))
    val withB = bucketsFromCuts(dfChecked, orderCol,
      quantileCuts(df, orderCol, buckets))
    // per-bucket token subtotals → prefix offsets. The collect is bounded
    // by `buckets` rows; a null bucket would mean a null orderCol, which
    // violates the contract — fail loudly rather than mis-place the doc
    val subs = withB.groupBy(col("bucket"))
      .agg(sum(col(tokenCountCol)).as("__s")).collect()
      .map { r =>
        require(!r.isNullAt(0), s"packSequences: null $orderCol")
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }.sortBy(_._1)
    // bucket i's base offset = sum of the subtotals before it (scanLeft
    // yields n+1 prefix sums; zip pairs bucket i with prefix i)
    val offs = subs.map(_._1).zip(subs.map(_._2).scanLeft(0L)(_ + _)).toSeq
    // literal per-bucket base offset (≤ buckets branches); landed in its
    // own column so codegen never duplicates the CASE chain
    val offExpr = offs.foldLeft(lit(0L)) { case (e, (b, o)) =>
      when(col("bucket") === b, lit(o)).otherwise(e)
    }
    val w = Window.partitionBy(col("bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .withColumn(cumC, sum(col(tokenCountCol)).over(w))
      .withColumn(offC, offExpr)
      .withColumn(stC, col(offC) + col(cumC) - col(tokenCountCol))
      .withColumn(enC, col(offC) + col(cumC))
      .where(col(tokenCountCol) > 0)
      // seq range via exact integer division (long `div`, never a double)
      .withColumn(seqC, explode(sequence(
        expr(s"$stC div ${seqLen}L"), expr(s"($enC - 1) div ${seqLen}L"))))
      .select(col(orderCol), col(seqC).as("seq_id"),
        (greatest(col(stC), col(seqC) * seqLen) - col(seqC) * seqLen)
          .as("start_in_seq"),
        (least(col(enC), (col(seqC) + 1) * seqLen)
          - greatest(col(stC), col(seqC) * seqLen)).as("n_in_seq"))
  }

  /** Zero-shuffle bucket assignment against literal cut-points. */
  def bucketsFromCuts(df: DataFrame, valueCol: String,
      cuts: Array[Double]): DataFrame = {
    val n = cuts.length + 1
    // build innermost-out so the SMALLEST cut is tested first: the final
    // expression is when(v<=c1,1).otherwise(when(v<=c2,2)...otherwise(n))
    val chain = cuts.zipWithIndex.reverse.foldLeft(lit(n)) {
      case (acc, (cut, i)) =>
        when(col(valueCol) <= cut, lit(i + 1)).otherwise(acc)
    }
    // a NULL value fails every `<=` test and would fall through to the
    // final otherwise — silently landing in the TOP bucket even though
    // approxQuantile ignored the row when placing the cuts. Null value →
    // null bucket, explicitly.
    val bucket = when(col(valueCol).isNull, lit(null)).otherwise(chain)
    df.withColumn("bucket", bucket.cast("long"))
  }

  /** DoReMi-style domain reweighting (Xie et al. '23, arXiv:2305.10429)
    * with the engine's bigram LM as the proxy model: each source's next-
    * round mixture weight is an exponentiated function of its EXCESS
    * proxy loss over the corpus mean, so harder-than-average domains are
    * upweighted — the feedback-driven sibling of the static
    * temperature/mixture samplers above.
    *
    * `stats` is the per-doc (doc_id, neg_logp_sum_micro, n_bigrams)
    * frame from TextAnalysis.lmCrossEntropyStats (micro-BITS, decimal-
    * exact); `docs` supplies the domain column. Per-source cross entropy
    * `ce_micro = Σ neg_logp_sum_micro div Σ n_bigrams` and
    * `excess_micro = max(ce − corpus_ce, 0)` are EXACT int64, so the
    * only float step is ONE exp per source (a bounded set):
    * `w_nano = floor(exp(η·excess_bits)·10⁹)`, after which
    * `weight_bp = (10000·w_nano) div Σ w_nano` is integer arithmetic
    * again — the cross-engine contract quantizes exactly one
    * transcendental per domain. η arrives as `etaMicro` (η·10⁶).
    *
    * 100 TB shape: one hash aggregate on the source key (bounded
    * groups), two 1-row/bounded totals broadcast back — no window, no
    * sort, no per-document float anywhere. */
  def doremiWeights(stats: DataFrame, docs: DataFrame, idCol: String,
      sourceCol: String, etaMicro: Long = DefaultEtaMicro): DataFrame =
    doremiWeightsFromState(doremiState(stats, docs, idCol, sourceCol),
      etaMicro)

  /** The per-source LM-loss state behind [[doremiWeights]]: one row per
    * source with the EXACT int64 partials (n_docs, Σ neg_logp_sum_micro,
    * Σ n_bigrams). The state is ASSOCIATIVE — [[doremiMerge]] of two
    * states equals the state of the concatenated corpora — so a deployed
    * mixture controller maintains it incrementally per batch and
    * recomputes weights from the merged state (merge == retrain,
    * bit-exactly). Validity contract: the per-doc stats must come from a
    * PINNED proxy LM (the deployed shape — the proxy model is trained
    * once, then batches stream through it); re-training the LM per batch
    * would change history's scores, which is retraining, not merging. */
  def doremiState(stats: DataFrame, docs: DataFrame, idCol: String,
      sourceCol: String): DataFrame =
    stats.join(
        docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source")),
        "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("neg_logp_sum_micro")).as("__sn"),
        sum(col("n_bigrams")).as("sum_n_bigrams"))

  /** Fold two per-source states: integer sums add per source (a source
    * absent from one side passes through). Associative and commutative —
    * the merge==retrain property every `*_incr` operator here carries. */
  def doremiMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("source")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("__sn")).as("__sn"),
        sum(col("sum_n_bigrams")).as("sum_n_bigrams"))

  /** Default η·10⁶ for the DoReMi family — referenced by the gate
    * queries when registering `eta_micro` beside the weight lits, so
    * tools/lit_check.py replays the engine's ACTUAL η instead of
    * hardcoding one (round-11 ADVICE). */
  val DefaultEtaMicro: Long = 100000L

  /** Exponent ceiling for [[doremiWeightsFromState]]'s one exp: with
    * x = η·excess_bits capped at 13, w_nano = floor(eˣ·10⁹) ≤ ~4.43e14
    * and the downstream `10000L * w_nano` stays far inside int64
    * (overflow began at x ≳ 13.7, where exp→Infinity floors to
    * Long.MaxValue under non-ANSI eval and the bp division returned
    * garbage — round-11 ADVICE). 13 excess BITS of proxy loss is already
    * an absurd domain gap; the clamp only changes pathological inputs. */
  val DoremiMaxExponentPico: Long = 13000000000000L

  /** The weight tail of [[doremiWeights]] over a prepared state frame. */
  def doremiWeightsFromState(per: DataFrame,
      etaMicro: Long = DefaultEtaMicro): DataFrame = {
    require(etaMicro > 0, s"etaMicro must be positive: $etaMicro")
    val tot = per.agg(sum(col("__sn")).as("__tn"),
      sum(col("sum_n_bigrams")).as("__tb"))
    // η as a double by ONE IEEE division, then ONE multiply per source —
    // the fixed evaluation order the lit checker replays verbatim
    val etaD = lit(etaMicro).cast("double") / lit(1000000.0)
    // integer clamp BEFORE the float step (exact, mirrored by the
    // checker): excess_micro · etaMicro ≤ 13e12 ⇔ exponent ≤ 13
    val excessCapMicro = DoremiMaxExponentPico / etaMicro
    val withCe = per.crossJoin(broadcast(tot))
      .withColumn("ce_micro", expr("__sn div sum_n_bigrams"))
      .withColumn("corpus_ce_micro", expr("__tn div __tb"))
      .withColumn("excess_micro",
        greatest(col("ce_micro") - col("corpus_ce_micro"), lit(0L)))
      .withColumn("w_nano",
        floor(exp((least(col("excess_micro"), lit(excessCapMicro))
          .cast("double") / lit(1000000.0))
          * etaD) * lit(1000000000.0)).cast("long"))
    val wTot = withCe.agg(sum(col("w_nano")).as("__wt"))
    withCe.crossJoin(broadcast(wTot))
      .select(col("source"), col("n_docs"), col("sum_n_bigrams"),
        col("ce_micro"), col("excess_micro"), col("w_nano"),
        expr("(10000L * w_nano) div __wt").as("weight_bp"))
  }
}
