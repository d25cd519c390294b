package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
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
    * row precedes — left-join semantics). Scratch columns are named to
    * avoid the inputs' columns, and nested access uses `getField`, so
    * dotted or underscore-prefixed user columns are safe.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taken = leftCols ++ right.columns
    val (kC, tsC, lC, pC, sideC, carriedC) = (
      Cols.fresh("_k", taken), Cols.fresh("_ts", taken),
      Cols.fresh("_l", taken), Cols.fresh("_p", taken),
      Cols.fresh("_side", taken), Cols.fresh("_carried", taken))
    val lStructT = left.select(struct(leftCols.map(col): _*).as(lC))
      .schema(lC).dataType
    val pStructT = right.select(struct(payload.map(col): _*).as(pC))
      .schema(pC).dataType
    val lp = left.select(col(keyCol).as(kC), col(tsCol).as(tsC),
      struct(leftCols.map(col): _*).as(lC),
      lit(null).cast(pStructT).as(pC), lit(0).as(sideC))
    val rp = right.select(col(keyCol).as(kC), col(tsCol).as(tsC),
      lit(null).cast(lStructT).as(lC),
      struct(payload.map(col): _*).as(pC), lit(1).as(sideC))
    val w = Window.partitionBy(col(kC))
      .orderBy(col(tsC).asc, col(sideC).desc, col(pC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp.unionByName(rp)
      .withColumn(carriedC, last(col(pC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 0)
      .select(leftCols.map(c => col(lC).getField(c).as(c)) ++
        payload.map(p => col(carriedC).getField(p).as(p)): _*)
  }

  /** Time-bin id: exact integer division of the epoch-microsecond value —
    * Column API only (no SQL-text splicing, arbitrary column exprs work). */
  private def binOf(ts: Column, binMicros: Long): Column = {
    val us = unix_micros(ts)
    // integer-exact floor division for non-negative timestamps (contract)
    ((us - (us % binMicros)) / binMicros).cast("long")
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
    val binC = Cols.fresh("_bin", intervals.columns ++ points.columns)
    val ib = intervals.withColumn(binC, explode(sequence(
      binOf(col(startCol), binMicros), binOf(col(endCol), binMicros))))
    val pb = points.withColumn(binC, binOf(col(tsCol), binMicros))
    ib.join(pb, Seq(keyCol, binC))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(binC)
  }

  /** Slowly-changing-dimension type 2: compress a keyed change stream into
    * versioned validity intervals. A new version opens only when the
    * tracked attribute actually CHANGES (consecutive duplicates collapse —
    * the SCD2 change-only contract); each version carries
    * `[effective_from, effective_to)` where `effective_to` is the NEXT
    * change's timestamp (null on the open current version) and
    * `is_current` marks the live row. The warehouse-dimension shape the
    * reference's one-shot snapshot sync cannot represent — history with
    * point-in-time reconstructability (join on `from <= ts < to`).
    *
    * Order within a key is `(tsCol, tieCol)` — a total order, so collapse
    * and interval edges are deterministic under ties. Two window passes
    * over ONE `keyCol` shuffle (lag-collapse, then lead-interval);
    * partitions are bounded by a single entity's change count, never
    * corpus-order. `attrCol` must be non-null: a null attribute would
    * silently VANISH through the null-propagating collapse predicate
    * (`prev =!= null` is null → filtered), so it fails loudly instead —
    * encode "attribute cleared" as an explicit sentinel value. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val taken = changes.columns.toSeq ++
      Seq("version", "effective_from", "effective_to", "is_current")
    val prevC = Cols.fresh("__prev", taken)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val guarded = changes.withColumn(attrCol,
      when(col(attrCol).isNull, raise_error(concat(
        lit("scd2: null attribute at key "),
        coalesce(col(keyCol).cast("string"), lit("null")))))
        .otherwise(col(attrCol)))
    val changed = guarded
      .withColumn(prevC, lag(col(attrCol), 1).over(w))
      // first row per key (null prev) always opens version 1; equal
      // consecutive attrs collapse into the earlier version
      .filter(col(prevC).isNull || col(prevC) =!= col(attrCol))
      .drop(prevC)
    val wv = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changed
      .withColumn("version", row_number().over(wv).cast("long"))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(wv))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
