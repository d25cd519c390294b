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
    def rank(c: String, cuts: Array[Double]): Column =
      cuts.zipWithIndex.reverse.foldLeft(lit(cuts.length.toLong)) {
        case (acc, (cut, i)) => when(col(c) <= cut, lit(i.toLong)).otherwise(acc)
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
}
