package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in equi-join can't express directly, shaped for
  * scale: as-of (most-recent-at-or-before) via a union + carry-forward
  * window, and interval×point range join via time-bin bucketing. Both
  * compile to ONE shuffle on the join key — no inequality join, no
  * broadcast-nested-loop, no cartesian blow-up at 100 TB.
  */
object Temporal {

  /** Backward as-of join: for each left row, attach the payload of the most
    * recent right row with `right.ts <= left.ts` on the same key (the
    * point-in-time lookup of feature stores / tick data).
    *
    * Instead of an inequality join (which Spark plans as a
    * broadcast-nested-loop or a sort-merge with per-row scans), both sides
    * are tagged and unioned, then a single window
    * `partitionBy(key).orderBy(ts, side)` carries the last non-null right
    * payload forward — one shuffle of |L|+|R| rows, linear per partition,
    * skew-bounded by the key's own cardinality. At equal timestamps the
    * right row sorts first, so `<=` (inclusive) semantics hold; among
    * equal-ts right rows the greatest payload struct wins (deterministic).
    *
    * Contract: `left` and `right` both contain `keyCol` and `tsCol`;
    * `payload` names columns of `right` (disjoint from `left`'s columns).
    * Output: all left columns + the payload columns (null where no right
    * row precedes — left-join semantics).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStructT = left.select(struct(leftCols.map(col): _*).as("_l"))
      .schema("_l").dataType
    val pStructT = right.select(struct(payload.map(col): _*).as("_p"))
      .schema("_p").dataType
    val lp = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(pStructT).as("_p"), lit(0).as("_side"))
    val rp = right.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(null).cast(lStructT).as("_l"),
      struct(payload.map(col): _*).as("_p"), lit(1).as("_side"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").desc, col("_p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp.unionByName(rp)
      .withColumn("_carried", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(p => col(s"_carried.$p").as(p)): _*)
  }

  /** Interval × point range join: pairs every interval `[startCol, endCol]`
    * with the points whose `tsCol` falls inside it, same key.
    *
    * Scale shape: intervals explode to the fixed-width time bins they
    * overlap, points map to their single bin, and the match becomes an
    * equi-join on `(key, bin)` + the exact BETWEEN residual. Pick
    * `binMicros` ≥ the typical interval length so each interval lands in
    * ~2 bins; a point has exactly one bin, so each qualifying
    * (interval, point) pair is produced exactly once — no dedup pass.
    *
    * Contract: column names are disjoint across the two inputs except
    * `keyCol`; timestamps are post-1970 (bin ids use truncating division).
    */
  def rangeJoin(intervals: DataFrame, points: DataFrame, keyCol: String,
      startCol: String, endCol: String, tsCol: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    val ib = intervals
      .withColumn("_bin", explode(sequence(
        expr(s"unix_micros($startCol) div $binMicros"),
        expr(s"unix_micros($endCol) div $binMicros"))))
    val pb = points
      .withColumn("_bin", expr(s"unix_micros($tsCol) div $binMicros"))
    ib.join(pb, Seq(keyCol, "_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }
}
