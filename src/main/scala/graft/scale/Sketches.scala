package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-value sketches (Beyer et al., "On
  * Synopses for Distinct Value Estimation Under Multiset Operations",
  * SIGMOD 2007): per group, the k SMALLEST values of a uniform hash of
  * the distinct elements. Constant-size mergeable state — like HLL — but
  * supporting the set operation HLL cannot: INTERSECTION, and with it
  * sketched Jaccard similarity between groups. The 100 TB use: pairwise
  * content overlap between sources/snapshots from bounded per-group
  * sketches, never re-touching the corpus (`corpus_overlap` is the exact
  * counterpart this approximates at scale).
  *
  * Determinism: the hash is the engine-portable 60-bit MD5-prefix family
  * ([[Dedup.tokenHash60]] — the 32-bit prefix saturates at billions of
  * distincts, biasing Jaccard and capping union estimates near 2^32) and
  * every statistic on the compared surface is an integer (hash values,
  * ranks, match counts) — the estimates (ratios) stay library-side in
  * [[kmvEstimates]]. */
object Sketches {

  /** Bottom-k sketch per group: (grp, h, rank) with `h` the 60-bit
    * MD5-prefix hash of each DISTINCT value and rank 1..k ascending in h.
    * One distinct-shuffle + the skew-safe two-phase top-k window
    * ([[Sampling.topPerGroup]]) — no group ever sorts more than
    * ~|group|/salts rows in one task. */
  def kmv(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val hashed = df
      .select(col(groupCol).as("grp"),
        Dedup.tokenHash60(value.cast("string")).as("h"))
      .distinct()
    Sampling.topPerGroup(hashed, "grp", col("h"), k, Seq(col("h").asc))
  }

  /** Merge two bottom-k sketch frames: per group, the k smallest distinct
    * hashes of the union — the mergeability that makes KMV a two-level
    * rollup sketch (per-partition/per-day sketches union to the global
    * one without re-scanning, the `sk_hll_rollup` pattern). Exactness
    * contract: `merge(kmv(A), kmv(B)) == kmv(A ∪ B)` because the k
    * smallest of a union are always among each side's k smallest. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = a.select("grp", "h").unionByName(b.select("grp", "h")).distinct()
    Sampling.topPerGroup(u, "grp", col("h"), k, Seq(col("h").asc))
  }

  /** All-pairs overlap sufficient statistics from a bottom-k sketch
    * frame: for each group pair (grp_a < grp_b), merge the two sketches,
    * keep the k smallest DISTINCT union values, and report
    * `(kth_min, n_kmin, n_common)` — the largest kept value, how many
    * were kept (< k only when the union itself is smaller), and how many
    * kept values occur in BOTH sketches. `n_common / n_kmin` estimates
    * the Jaccard similarity; `kth_min` supports the union-cardinality
    * estimate. All work is on the bounded sketch frame (groups² × k rows
    * at most) — the corpus is never touched. */
  def kmvOverlap(sk: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val groups = sk.select("grp").distinct()
    val pairs = groups.select(col("grp").as("grp_a"))
      .join(groups.select(col("grp").as("grp_b")),
        col("grp_a") < col("grp_b"))
    val mA = pairs.join(sk.select(col("grp").as("grp_a"), col("h")),
      Seq("grp_a"))
    val mB = pairs.join(sk.select(col("grp").as("grp_b"), col("h")),
      Seq("grp_b"))
    // side_ct = 2 ⇔ the value is in both groups' sketches
    val uni = mA.select("grp_a", "grp_b", "h")
      .unionByName(mB.select("grp_a", "grp_b", "h"))
      .groupBy("grp_a", "grp_b", "h").agg(count(lit(1)).as("side_ct"))
    val w = Window.partitionBy("grp_a", "grp_b").orderBy(col("h").asc)
    uni.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy("grp_a", "grp_b")
      .agg(max(col("h")).as("kth_min"),
        count(lit(1)).as("n_kmin"),
        sum(when(col("side_ct") === 2, 1L).otherwise(0L)).as("n_common"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
    * Summary: The Count-Min Sketch and its Applications", J. Algorithms
    * 2005): a depth×width grid of counters; every token occurrence
    * increments one bucket per row (bucket = hash_j(token) mod width).
    * Point estimate = MIN over rows — always an OVERestimate of the true
    * frequency, within εN with probability 1-δ for width=⌈e/ε⌉,
    * depth=⌈ln 1/δ⌉. Exactly mergeable by cell-wise sum (per-day/
    * per-partition sketches roll up without re-scanning), which is the
    * 100 TB shape: the corpus is touched once to build bounded
    * (groups × depth × width)-row sketch frames; all frequency probes
    * afterwards are joins against the BROADCAST sketch.
    *
    * Determinism: row-j's hash is the engine-portable 60-bit MD5 prefix
    * of "j:token" ([[Dedup.tokenHash60]]) mod width — the DuckDB oracle
    * recomputes the identical grid, so estimates gate as exact int64. */
  def cms(tokenRows: DataFrame, groupCol: String, tokCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth x $width")
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("row_j"), cmsBucket(col(tokCol), j, width).as("bucket"))
    }
    tokenRows
      .select(col(groupCol).as("grp"), explode(array(cells: _*)).as("cell"))
      .groupBy(col("grp"), col("cell.row_j").as("row_j"),
        col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      // build parameters ride along as constant metadata columns so the
      // consumers ([[cmsEstimate]], [[cmsMerge]]) can verify they address
      // the grid with the SAME depth/width it was built with — a mismatch
      // would otherwise silently read absent cells as count 0
      .withColumn("d", lit(depth)).withColumn("w", lit(width))
  }

  /** Row-j bucket of a token: 60-bit MD5 prefix of "j:token" mod width
    * (non-negative, so `%` and `pmod` agree across engines). A NULL token
    * raises: its hash would be null, the cell would land in a null bucket
    * that no equi-join can ever probe (null never matches null), and the
    * estimate would silently read 0 — the fail-loud contract instead. */
  def cmsBucket(tok: Column, rowJ: Int, width: Int): Column =
    pmod(Dedup.tokenHash60(concat(lit(s"$rowJ:"),
      when(tok.isNull,
        raise_error(lit("cms: null token (tokenize before sketching)")))
        .otherwise(tok))), lit(width.toLong))

  /** Cell-wise sum of two CMS frames — CMS merge is EXACT (counters are
    * linear), so `merge(cms(A), cms(B)) == cms(A ⊎ B)` always. Grids
    * built with different depth/width raise wherever their cells meet
    * (co-located cells carry the build parameters — summing counters
    * from incompatible hash grids is meaningless). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    cmsCellSum(a.select("grp", "row_j", "bucket", "cnt", "d", "w")
      .unionByName(b.select("grp", "row_j", "bucket", "cnt", "d", "w")))

  /** Cell-wise sum of CMS grid rows (shared by [[cmsMerge]] and the
    * streaming rollup): counters add; the build-parameter metadata must
    * agree on every co-located cell or the sum raises. */
  private[graft] def cmsCellSum(rows: DataFrame): DataFrame =
    rows.groupBy("grp", "row_j", "bucket")
      .agg(sum("cnt").as("cnt"),
        min("d").as("_dmin"), max("d").as("_dmax"),
        min("w").as("_wmin"), max("w").as("_wmax"))
      .select(col("grp"), col("row_j"), col("bucket"), col("cnt"),
        when(col("_dmin") =!= col("_dmax") || col("_wmin") =!= col("_wmax"),
          raise_error(lit(
            "cms merge: grids built with different depth/width")))
          .otherwise(col("_dmin")).as("d"),
        col("_wmin").as("w"))

  /** Point-frequency estimates for a probe set of (grp, token) pairs:
    * min over the depth rows of the addressed cells (absent cell = 0).
    * The SKETCH side is broadcast — it is bounded by groups×depth×width
    * regardless of corpus size — so probing never shuffles the probes. */
  def cmsEstimate(sk: DataFrame, probes: DataFrame, groupCol: String,
      tokCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth x $width")
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("row_j"), cmsBucket(col("tok"), j, width).as("bucket"))
    }
    val addressed = probes
      .select(col(groupCol).as("grp"), col(tokCol).as("tok"))
      .distinct()
      .select(col("grp"), col("tok"), explode(array(cells: _*)).as("cell"))
      .select(col("grp"), col("tok"),
        col("cell.row_j").as("row_j"), col("cell.bucket").as("bucket"))
    addressed
      .join(broadcast(sk.select("grp", "row_j", "bucket", "cnt", "d", "w")),
        Seq("grp", "row_j", "bucket"), "left")
      // any probe that lands on a populated cell cross-checks the grid's
      // build parameters — addressing a grid with the wrong depth/width
      // raises instead of silently reading absent cells as 0 (a token the
      // grid has never seen legitimately estimates 0: all cells absent)
      .withColumn("cnt", when(col("d").isNotNull &&
          (col("d") =!= depth || col("w") =!= width),
        raise_error(concat(lit("cmsEstimate: sketch built with "),
          col("d").cast("string"), lit("x"), col("w").cast("string"),
          lit(s", probed with ${depth}x$width"))))
        .otherwise(coalesce(col("cnt"), lit(0L))))
      .groupBy("grp", "tok").agg(min(col("cnt")).as("est"))
  }

  /** CMS heavy hitters — the classic CMS + candidate-set pattern: estimate
    * every candidate token's frequency against the grid and keep the top
    * `n` per group, ranked (est desc, token asc) for a deterministic
    * total order. The candidate frame is typically the corpus's distinct
    * tokens (one distinct shuffle); the ranking uses the skew-safe
    * two-phase top-k ([[Sampling.topPerGroup]]) so one hot group never
    * pins a task. CMS estimates are one-sided (never below the true
    * count), so every listed estimate upper-bounds nothing and
    * lower-bounds its token's mass — but the LEADERBOARD itself is not
    * guaranteed complete: enough collision-inflated light tokens can
    * outrank a true heavy hitter and displace it from the top-n. Size
    * `width` (and read est as "at least the true count") accordingly. */
  def cmsHeavyHitters(sk: DataFrame, candidates: DataFrame, groupCol: String,
      tokCol: String, depth: Int, width: Int, n: Int): DataFrame =
    Sampling.topPerGroup(
      cmsEstimate(sk, candidates, groupCol, tokCol, depth, width),
      "grp", col("tok"), n, Seq(col("est").desc, col("tok").asc))

  /** AMS F2 sketch (Alon, Matias & Szegedy, "The Space Complexity of
    * Approximating the Frequency Moments", STOC 1996): `r` independent
    * ±1 estimators; estimator i keeps the single counter
    * Z_i = Σ_occurrences s_i(token) with s_i(token) ∈ {−1, +1} a
    * hash-derived sign. E[Z_i²] = F2 = Σ_tok count(tok)² — the SELF-JOIN
    * SIZE / repetition mass of the corpus, the moment CMS (point counts)
    * and KMV/HLL (distinct counts) do not give. Like CMS the counters
    * are LINEAR: per-batch Z vectors SUM to the whole-corpus vector
    * exactly ([[amsMerge]]), so per-day sketches roll up without
    * re-scanning, and the entire per-group state is `r` int64 counters.
    * The sign is the parity of the 60-bit MD5 prefix of "i:token" —
    * engine-portable, so the Z vector itself (pure int64) is the gate
    * surface and the oracle recomputes it exactly. */
  def amsSketch(tokenRows: DataFrame, groupCol: String, tokCol: String,
      r: Int): DataFrame = {
    require(r > 0, s"r must be positive: $r")
    // null tokens raise (a null sign would silently drop the occurrence
    // from every counter — same fail-loud contract as cmsBucket)
    val tokOrErr = when(col(tokCol).isNull,
      raise_error(lit("amsSketch: null token (tokenize before sketching)")))
      .otherwise(col(tokCol))
    val ests = (0 until r).map { i =>
      struct(lit(i).as("est_i"),
        (pmod(Dedup.tokenHash60(concat(lit(s"$i:"), tokOrErr)), lit(2L))
          * 2L - 1L).as("s"))
    }
    tokenRows
      .select(col(groupCol).as("grp"), explode(array(ests: _*)).as("e"))
      .groupBy(col("grp"), col("e.est_i").as("est_i"))
      .agg(sum(col("e.s")).as("z"))
  }

  /** Counter-wise sum of two AMS frames — exact, counters are linear. */
  def amsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select("grp", "est_i", "z").unionByName(b.select("grp", "est_i", "z"))
      .groupBy("grp", "est_i").agg(sum("z").as("z"))

  /** Library-side F2 estimate from an AMS frame: mean of Z_i² per group
    * (each Z_i² is an unbiased F2 estimator; averaging r of them cuts the
    * variance by r — use a median-of-means split of the estimators when
    * r is large and tails matter). */
  def amsF2Estimate(sk: DataFrame): DataFrame =
    sk.groupBy("grp")
      .agg((sum(col("z") * col("z")).cast("double") / count(lit(1)))
        .as("f2_est"))

  /** Library-side estimates from [[kmvOverlap]] rows: sketched Jaccard
    * and the union-cardinality estimate. When the union fit inside the
    * sketch (n_kmin < k) the answer is EXACT — n_kmin itself, not the
    * estimator (the estimator formula applied to a saturated-below-k
    * sketch over-counts by H/kth_min ≫ 1). A kth_min of 0 (hash value 0
    * among the k minima) also falls back to the exact count instead of
    * dividing by zero — with a 60-bit hash that needs n_kmin ≤ 1, where
    * the count IS the answer. */
  def kmvEstimates(overlap: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val hashRange = math.pow(2.0, 60) // tokenHash60: 15-hex-digit prefix
    overlap
      .withColumn("jaccard_est",
        col("n_common").cast("double") / col("n_kmin"))
      .withColumn("union_est",
        when(col("n_kmin") < lit(k) || col("kth_min") <= lit(0),
          col("n_kmin").cast("double"))
          .otherwise((col("n_kmin") - 1).cast("double") * hashRange /
            col("kth_min")))
  }
}
