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

  /** V4: status roll-up (:164-177) — PASSED / PARTIAL (passed > failed) /
    * FAILED; ERROR is raised by exceptions, not computed. */
  def status(countsMatch: Boolean, samplesPassed: Long, samplesFailed: Long,
      integrityIssues: Long): String =
    if (countsMatch && samplesFailed == 0 && integrityIssues == 0) "PASSED"
    else if (samplesPassed > samplesFailed) "PARTIAL"
    else "FAILED"

  /** V4 as a one-row DataFrame rollup over the pieces. */
  def statusReport(source: DataFrame, target: DataFrame, key: String,
      fields: Seq[String], sampleSize: Int = 10): DataFrame = {
    val counts = countReconciliation(source, target)
    val sample = source.orderBy(col(key).desc).limit(sampleSize)
    val mismatches = rowCompare(sample, target, key, fields)
      .select(col("_id")).distinct()
    val failed = mismatches.agg(count(lit(1)).as("samples_failed"))
    // actual sampled rows, not the requested sampleSize — a source smaller
    // than the sample must not report phantom passing samples
    val total = sample.agg(count(lit(1)).as("samples_total"))
    val issues = integrity(target, key)
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
