package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional scan pruning — the
  * OPTIMIZE ZORDER primitive of table formats, as a library op: rows are
  * sorted by a Z-(Morton-)curve over quantile-bucket ranks of the chosen
  * columns, so every written file covers a NARROW range of EVERY
  * clustering column and min/max footer stats prune scans on any of them
  * (a linear sort gives that for the leading column only).
  *
  * Why quantile ranks, not raw values: interleaving raw bits assumes
  * uniform, aligned domains; production z-ordering (Delta's
  * range-partition ids) bucket-normalizes first, which is skew-robust and
  * type-agnostic. The cuts come from [[Sampling.quantileCuts]] — one
  * fixed-size-sketch aggregation per column.
  *
  * 100 TB shape: cuts are `2^bits − 1` broadcast literals per column;
  * rank assignment and bit interleaving are zero-shuffle per-row
  * expressions inside whole-stage codegen; the final clustering is ONE
  * range repartition + in-partition sort on the z-value (the same
  * exchange any write-with-ordering pays). Nothing driver-resident
  * beyond the cut arrays. */
object Layout {

  /** Interleave the low `bits` bits of two non-negative longs: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1 — the 2-D Morton
    * code. Pure bitwise ops (codegen'd, engine-portable: `& << |` are
    * exact on any engine). Inputs must already be bucket ranks
    * < 2^`bits`; a loud guard beats silent wraparound. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val lim = 1L << bits
    def spread(c: Column): Column =
      (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
        // c & (1<<i) keeps bit i IN PLACE (value 2^i); shifting it left
        // by i lands it at 2i — one AND + one shift per bit
        acc.bitwiseOR(shiftleft(c.bitwiseAND(lit(1L << i)), i))
      }
    def guarded(c: Column): Column =
      when(c.isNull.or(c < 0).or(c >= lim),
        raise_error(concat(lit(s"zValue2 input out of [0, $lim): "),
          coalesce(c.cast("string"), lit("null")))))
        .otherwise(c)
    spread(guarded(a)).bitwiseOR(shiftleft(spread(guarded(b)), 1))
  }

  /** Per-row z-value over two columns' quantile-bucket ranks (2^`bits`
    * buckets each, ranks 0-based). Returns (cutsA, cutsB, df + `zCol`) —
    * the cuts are the engine-specific sketch output, exposed for the
    * correctness oracle (`OracleLits` contract) and for re-applying the
    * same layout to later batches (a stable layout across increments
    * needs frozen cuts, same as any partitioning scheme). */
  def zOrderValue(df: DataFrame, colA: String, colB: String, bits: Int,
      zCol: String = "zv", accuracy: Int = 2000):
      (Array[Double], Array[Double], DataFrame) = {
    require(bits >= 1 && bits <= 16, s"bits out of range for bucketing: $bits")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val n = 1 << bits
    // both columns sketched in ONE corpus pass (the multi-column
    // approxQuantile overload) — scan count is the scale budget. The
    // default sketch error (1/2000) is sized for layout buckets, where
    // boundary slack only nudges file shapes — a tighter sketch inflates
    // per-partition sketch state (and its merge) for no pruning benefit
    val Array(cutsA, cutsB) = df.stat.approxQuantile(
      Array(colA, colB), (1 until n).map(_.toDouble / n).toArray,
      1.0 / accuracy)
    def rank(c: String, cuts: Array[Double]): Column = {
      val ranked = cuts.zipWithIndex.reverse.foldLeft(lit(cuts.length.toLong)) {
        case (acc, (cut, i)) => when(col(c) <= cut, lit(i.toLong)).otherwise(acc)
      }
      // guard the RAW column: a NULL input falls through every `<= cut`
      // test into the top-cell default rank, which zValue2's range guard
      // accepts — fail loud here instead (the bucketsFromCuts contract)
      when(col(c).isNull,
        raise_error(lit(s"zorder: null input in column $c")))
        .otherwise(ranked)
    }
    // ranks land in INTERMEDIATE columns first: zValue2 references each
    // input once per interleave bit, and inlining the n-way CASE chain
    // into every bit term multiplies the codegen'd expression 2·bits
    // times (measured ~6× slower at 4 bits over sf0.1 lineitem from the
    // blown-up method alone). CollapseProject keeps multi-referenced
    // non-cheap aliases un-inlined, so the chain evaluates once per row
    // per column.
    val raC = Cols.fresh("__z_ra", df.columns)
    val rbC = Cols.fresh("__z_rb", df.columns)
    val out = df
      .withColumn(raC, rank(colA, cutsA))
      .withColumn(rbC, rank(colB, cutsB))
      .withColumn(zCol, zValue2(col(raC), col(rbC), bits))
      .drop(raC, rbC)
    (cutsA, cutsB, out)
  }

  /** Cluster `df` for writing: range-repartition into `files` output
    * partitions by z-value and sort within each — every file then spans a
    * contiguous z-range, i.e. a small hyper-rectangle of BOTH columns.
    * Callers `.write` the result; parquet min/max footers do the pruning. */
  def zOrderCluster(df: DataFrame, colA: String, colB: String,
      files: Int, bits: Int = 8): DataFrame = {
    require(files > 0, s"files must be positive: $files")
    val (_, _, withZ) = zOrderValue(df, colA, colB, bits)
    withZ.repartitionByRange(files, col("zv"))
      .sortWithinPartitions("zv")
  }

  /** 2-D Hilbert curve index over bucket ranks — the strictly-local
    * alternative to [[zValue2]]'s Morton code: CONSECUTIVE Hilbert indices
    * are always grid neighbors (the Z-curve jumps across the grid at
    * quadrant seams), so a file covering a contiguous index range covers
    * one connected rectangle-ish region — tighter min/max footer bounds
    * per file at equal file count, which is why table formats grew
    * OPTIMIZE ... HILBERT alongside ZORDER.
    *
    * This is the canonical iterative xy→d transform (per-level quadrant
    * code + rotate/reflect), unrolled `bits` times. Every level's (x, y)
    * state lands in its OWN columns — the rotation references each input
    * twice, so a single nested expression would double per level
    * (2^bits-sized codegen); landed aliases keep it linear. Quadrant codes
    * and reflections are pure integer CASE/arithmetic — engine-portable,
    * mirrored verbatim by the unrolled oracle CTE stack. Inputs are
    * guarded to [0, 2^bits) like [[zValue2]]. */
  def hilbertOrderValue(df: DataFrame, colA: String, colB: String,
      bits: Int, hCol: String = "hv", accuracy: Int = 2000):
      (Array[Double], Array[Double], DataFrame) = {
    require(bits >= 1 && bits <= 16, s"bits out of range for bucketing: $bits")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val n = 1 << bits
    val Array(cutsA, cutsB) = df.stat.approxQuantile(
      Array(colA, colB), (1 until n).map(_.toDouble / n).toArray,
      1.0 / accuracy)
    def rank(c: String, cuts: Array[Double]): Column = {
      val ranked = cuts.zipWithIndex.reverse.foldLeft(lit(cuts.length.toLong)) {
        case (acc, (cut, i)) => when(col(c) <= cut, lit(i.toLong)).otherwise(acc)
      }
      // guard the RAW column: a NULL input falls through every `<= cut`
      // test into the top-cell default rank, which the derived-rank guard
      // below accepts — fail loud here instead (the bucketsFromCuts
      // contract the docstring promises)
      when(col(c).isNull,
        raise_error(lit(s"hilbert: null input in column $c")))
        .otherwise(ranked)
    }
    val taken = df.columns.toSeq :+ hCol
    val xC = Cols.fresh("__h_x", taken)
    val yC = Cols.fresh("__h_y", taken)
    val dC = Cols.fresh("__h_d", taken)
    val lim = n.toLong
    def guarded(c: Column): Column =
      when(c.isNull.or(c < 0).or(c >= lim),
        raise_error(concat(lit(s"hilbert rank out of [0, $lim): "),
          coalesce(c.cast("string"), lit("null")))))
        .otherwise(c)
    var out = df
      .withColumn(xC, guarded(rank(colA, cutsA)))
      .withColumn(yC, guarded(rank(colB, cutsB)))
      .withColumn(dC, lit(0L))
    for (level <- (bits - 1) to 0 by -1) {
      val s = 1L << level
      val x = col(xC); val y = col(yC)
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      // quadrant code (3·rx) XOR ry over {0,1}² — spelled as a CASE so no
      // engine's xor semantics can diverge: (0,0)→0 (0,1)→1 (1,1)→2 (1,0)→3
      val q = when(rx === 0 && ry === 0, lit(0L))
        .when(rx === 0, lit(1L)).when(ry === 1, lit(2L)).otherwise(lit(3L))
      // rotate/reflect (ry=0 swaps axes; rx=1 additionally reflects by n−1)
      val newX = when(ry === 1, x)
        .otherwise(when(rx === 1, lit(lim - 1) - y).otherwise(y))
      val newY = when(ry === 1, y)
        .otherwise(when(rx === 1, lit(lim - 1) - x).otherwise(x))
      out = out
        .withColumn(dC, col(dC) + lit(s * s) * q)
        .withColumns(Map(xC -> newX, yC -> newY))
    }
    (cutsA, cutsB, out.withColumnRenamed(dC, hCol).drop(xC, yC))
  }

  /** Driver-side reference xy→d (the executable spec [[hilbertOrderValue]]
    * is property-tested against, and a utility for planning probes). */
  def hilbertXY2D(bits: Int, x0: Long, y0: Long): Long = {
    require(bits >= 1 && bits <= 16, s"bits out of range: $bits")
    val n = 1L << bits
    require(x0 >= 0 && x0 < n && y0 >= 0 && y0 < n, s"($x0,$y0) not in grid")
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** [[zOrderCluster]]'s Hilbert counterpart: range-repartition + sort on
    * the Hilbert index — contiguous index ranges per file, connected
    * regions of the (colA, colB) plane. */
  def hilbertCluster(df: DataFrame, colA: String, colB: String,
      files: Int, bits: Int = 8): DataFrame = {
    require(files > 0, s"files must be positive: $files")
    val (_, _, withH) = hilbertOrderValue(df, colA, colB, bits)
    withH.repartitionByRange(files, col("hv"))
      .sortWithinPartitions("hv")
  }

  /** Range-partition plan — the `repartitionByRange` sizing tool: `parts`
    * ranges from one quantile sketch of `keyCol` (cuts = `parts − 1`
    * broadcast literals), with the EXACT row count and basis-point share
    * each range would receive — read before writing a range-clustered
    * table or choosing reducer counts, because sketch-balanced boundaries
    * can still be row-imbalanced under heavy ties (the report shows it:
    * a tie-heavy key pins one range, and the fix is a different key or
    * salting, not more partitions). Returns (cuts, plan frame of
    * partition_id / n_rows / share_bp). One sketch pass + one count
    * aggregate bounded by `parts`. */
  def rangePlan(df: DataFrame, keyCol: String, parts: Int,
      accuracy: Int = 2000): (Array[Double], DataFrame) = {
    require(parts >= 2 && parts <= 100000, s"parts out of range: $parts")
    val cuts = Sampling.quantileCuts(df, keyCol, parts, accuracy)
    val withB = Sampling.bucketsFromCuts(df, keyCol, cuts)
    val counts = withB.groupBy(col("bucket").as("partition_id"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("__t"))
    val plan = counts.crossJoin(broadcast(tot))
      .select(col("partition_id").cast("long").as("partition_id"),
        col("n_rows"),
        expr("(10000L * n_rows) div __t").as("share_bp"))
    (cuts, plan)
  }

  /** Target-file-size write plan: for each value of `partCol`, the exact
    * payload size (`sum(sizeCol)`), and the file count that lands output
    * files at ~`targetBytes` — `ceil(bytes / target)`, at least 1. The
    * fix for BOTH small-file explosion (a thousand 100 KB files in a cold
    * partition) and the giant-file stall (one 40 GB file in a hot one),
    * decided from measured bytes, not partition count.
    *
    * Pure integer math on an aggregate bounded by the partition-value
    * cardinality (capped loudly at `maxParts` BEFORE collecting). */
  def filePlan(df: DataFrame, partCol: String, sizeCol: Column,
      targetBytes: Long, maxParts: Int = 10000): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val agg = df.groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"), sum(sizeCol).as("total_bytes"))
    // ceil div in int64: (b + t - 1) div t; empty/zero payload → 1 file
    agg.withColumn("n_files",
      greatest(lit(1L),
        expr(s"(total_bytes + ${targetBytes}L - 1L) div ${targetBytes}L")))
      .withColumn("n_files",
        when(col("total_bytes").isNull, lit(1L)).otherwise(col("n_files")))
  }

  /** Assign every row its output file slot under a [[filePlan]]: slot =
    * id-hash mod the partition's planned file count — deterministic
    * (retry/engine-stable, the [[Sampling.hashBucket]] family) and
    * size-balanced in expectation. The plan is a broadcast join (bounded
    * frame); writers then `repartitionByRange(totalPlannedFiles,
    * col(partCol), col("file_slot"))` + `partitionBy(partCol)` so each
    * (partition, slot) key gets its own task and writes one
    * ~target-sized file (HASH repartition would merge keys into shared
    * tasks and under-produce files — LayoutSpec proves the range form
    * lands exactly the planned counts). */
  def applyFilePlan(df: DataFrame, idCol: String, partCol: String,
      plan: DataFrame): DataFrame = {
    val p = broadcast(plan.select(col(partCol), col("n_files")))
    df.join(p, partCol)
      .withColumn("file_slot",
        pmod(Dedup.tokenHash(col(idCol).cast("string")), col("n_files")))
      .drop("n_files")
  }
}
