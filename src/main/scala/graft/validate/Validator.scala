package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-migration validation (V1-V4; Test-MigrationValidation at
  * private/Migration_Validation.ps1:1-418).
  *
  * The reference validates by N driver-side point lookups (`SELECT * WHERE
  * _id = ?` per sampled doc, :221-264). Here the sampled compare is ONE
  * left-outer join — the sample side is tiny and broadcast, so no shuffle
  * touches the full target at any scale.
  */
object Validator {

  /** V1/A5: count reconciliation (:84-94). One row:
    * (source_cnt, target_cnt, diff, counts_match). */
  def countReconciliation(source: DataFrame, target: DataFrame): DataFrame = {
    val s = source.agg(count(lit(1)).as("source_cnt"))
    val t = target.agg(count(lit(1)).as("target_cnt"))
    s.crossJoin(t)
      .withColumn("diff", abs(col("source_cnt") - col("target_cnt")))
      .withColumn("counts_match", col("source_cnt") === col("target_cnt"))
  }

  /** V2/J2: sampled row comparison under the F8 canon (:106-145, :266-324).
    * Emits one row per (id, field) mismatch: melted via an array-of-structs
    * + explode (codegen'd), filtered to differences. A target-missing row
    * reports every compared field with target_value = "" (reference reports
    * "missing in SQL", :318-320). */
  def rowCompare(sample: DataFrame, target: DataFrame, key: String,
      fields: Seq[String]): DataFrame = {
    val tgt = target.select(col(key).as("__tkey") +:
      fields.map(f => col(f).as(s"__t_$f")): _*)
    val joined = sample.join(tgt, sample(key) === tgt("__tkey"), "left_outer")
    val sdt = sample.schema.fields.map(f => f.name -> f.dataType).toMap
    val tdt = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val diffs: Column = array(fields.map { f =>
      struct(
        lit(f).as("field"),
        Normalize.canon(sample(f), sdt(f)).as("source_value"),
        Normalize.canon(col(s"__t_$f"), tdt(f)).as("target_value"))
    }: _*)
    joined
      .select(col(key).as("_id"), explode(diffs).as("d"))
      .select(col("_id"), col("d.field").as("field"),
        col("d.source_value").as("source_value"),
        col("d.target_value").as("target_value"))
      .filter(col("source_value") =!= col("target_value"))
  }

  /** V3: integrity suite (:365-418) — null PKs (F4/A7, :382-388), duplicate
    * keys (A6, :391-402), empty table (A8, :405-411) as one 3-row report. */
  def integrity(df: DataFrame, key: String): DataFrame = {
    val nullPk = df.filter(col(key).isNull)
      .agg(count(lit(1)).as("issue_count"))
      .select(lit("null_pk").as("check_name"), col("issue_count"))
    val dups = df.filter(col(key).isNotNull).groupBy(key).count()
      .filter(col("count") > 1)
      .agg(coalesce(count(lit(1)), lit(0L)).as("issue_count"))
      .select(lit("duplicate_keys").as("check_name"), col("issue_count"))
    val empty = df.agg(count(lit(1)).as("n"))
      .select(lit("empty_table").as("check_name"),
        when(col("n") === 0, 1L).otherwise(0L).as("issue_count"))
    nullPk.unionByName(dups).unionByName(empty)
  }

  /** V3 extension — CROSS-TABLE referential integrity between a parent
    * table (keyed by `key`) and one decomposed child table (keyed by
    * `fkCol`, optionally positional via `array_index`): the suite that
    * catches a stale child table after a main-only sync (round-11 verdict
    * item 3 — an updated parent whose array edit never landed, a deleted
    * parent's stranded rows). Three one-row checks, same (check_name,
    * issue_count) surface as [[integrity]]:
    *  - `orphaned_child_rows`: child rows whose fk matches no parent key;
    *  - `missing_children`: parents REQUIRED to have child rows (pass ids
    *    of docs whose source array/object is non-empty) that have none —
    *    0 when no expectation frame is given;
    *  - `array_index_gaps`: parents whose child indexes are not exactly
    *    0..n-1 (0 for child tables without an `array_index` column).
    * All anti-joins + hash aggregates keyed on the fk — no windows; at
    * 100 TB each check is one shuffle on the key, and the tiny expected
    * side broadcasts. */
  def fkIntegrity(parent: DataFrame, child: DataFrame, key: String,
      fkCol: String, expectedParents: Option[DataFrame] = None): DataFrame = {
    val spark = parent.sparkSession
    val orphans = child
      .join(parent.select(col(key).as(fkCol)), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("issue_count"))
      .select(lit("orphaned_child_rows").as("check_name"), col("issue_count"))
    val missing = expectedParents match {
      case Some(exp) => exp
        .select(col(exp.columns.head).as(fkCol))
        .join(child.select(fkCol), Seq(fkCol), "left_anti")
        .agg(count(lit(1)).as("issue_count"))
        .select(lit("missing_children").as("check_name"), col("issue_count"))
      case None => spark.range(1)
        .select(lit("missing_children").as("check_name"),
          lit(0L).as("issue_count"))
    }
    val gaps =
      if (!child.columns.contains("array_index"))
        spark.range(1).select(lit("array_index_gaps").as("check_name"),
          lit(0L).as("issue_count"))
      else child.groupBy(col(fkCol))
        .agg(count(lit(1)).as("__n"), min("array_index").as("__mn"),
          max("array_index").as("__mx"),
          countDistinct(col("array_index")).as("__nd"))
        // min=0, max=n-1, distinct=n together imply exactly 0..n-1; the
        // distinct term catches duplicate-index-plus-gap ([0,0,2]) shapes
        // that min/max alone let through
        .filter(col("__mn") =!= 0 || col("__mx") =!= col("__n") - 1 ||
          col("__nd") =!= col("__n"))
        .agg(coalesce(count(lit(1)), lit(0L)).as("issue_count"))
        .select(lit("array_index_gaps").as("check_name"), col("issue_count"))
    orphans.unionByName(missing).unionByName(gaps)
  }

  /** V4: status roll-up (:164-177) — PASSED / PARTIAL (passed > failed) /
    * FAILED; ERROR is raised by exceptions, not computed. */
  def status(countsMatch: Boolean, samplesPassed: Long, samplesFailed: Long,
      integrityIssues: Long): String =
    if (countsMatch && samplesFailed == 0 && integrityIssues == 0) "PASSED"
    else if (samplesPassed > samplesFailed) "PARTIAL"
    else "FAILED"

  /** V4 as a one-row DataFrame rollup over the pieces. `children` extends
    * the integrity tally with [[fkIntegrity]] over each (child table,
    * fk column) pair — a stale or orphaned child table now FAILS the
    * migration status instead of passing silently. */
  def statusReport(source: DataFrame, target: DataFrame, key: String,
      fields: Seq[String], sampleSize: Int = 10,
      children: Seq[(DataFrame, String)] = Seq.empty): DataFrame = {
    val counts = countReconciliation(source, target)
    val sample = source.orderBy(col(key).desc).limit(sampleSize)
    val mismatches = rowCompare(sample, target, key, fields)
      .select(col("_id")).distinct()
    val failed = mismatches.agg(count(lit(1)).as("samples_failed"))
    // actual sampled rows, not the requested sampleSize — a source smaller
    // than the sample must not report phantom passing samples
    val total = sample.agg(count(lit(1)).as("samples_total"))
    val issues = children
      .foldLeft(integrity(target, key)) { case (acc, (child, fk)) =>
        acc.unionByName(fkIntegrity(target, child, key, fk))
      }
      .agg(sum(col("issue_count")).as("integrity_issues"))
    counts.crossJoin(failed).crossJoin(total).crossJoin(issues)
      .withColumn("samples_passed", col("samples_total") - col("samples_failed"))
      .drop("samples_total")
      .withColumn("status",
        when(col("counts_match") && col("samples_failed") === 0 &&
          col("integrity_issues") === 0, "PASSED")
          .when(col("samples_passed") > col("samples_failed"), "PARTIAL")
          .otherwise("FAILED"))
  }
}
