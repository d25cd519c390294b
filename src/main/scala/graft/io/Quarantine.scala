package graft.io

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Per-row error quarantine (SURVEY §7.5): the scalable replacement for the
  * reference's per-row try/catch + error tally (Data_Migration.ps1:146-155;
  * Sync.ps1:194-197). Rows whose values fail a typed conversion are split
  * into a quarantine frame carrying a reason, instead of aborting the job or
  * silently nulling — one pass, no driver involvement, both outputs share
  * the source scan. */
object Quarantine {

  /** A cast rule: column → target type. `try_cast` semantics (null on
    * failure) distinguish real nulls from conversion failures. */
  case class CastRule(column: String, to: DataType)

  /** Split `df` into (clean, quarantined). Clean rows have all rule columns
    * cast; quarantined rows keep original values plus a `_quarantine_reason`
    * listing every failed column. */
  def split(df: DataFrame, rules: Seq[CastRule]): (DataFrame, DataFrame) = {
    val failFlags: Seq[(String, Column)] = rules.map { r =>
      val failed = col(r.column).isNotNull && try_cast(col(r.column), r.to).isNull
      r.column -> failed
    }
    val reason = concat_ws(",", failFlags.map { case (name, failed) =>
      when(failed, lit(name)).otherwise(lit(null))
    }: _*)
    val flagged = df.withColumn("_quarantine_reason", reason)
    val clean = flagged.filter(col("_quarantine_reason") === "")
      .drop("_quarantine_reason")
      .select(df.columns.map { c =>
        rules.find(_.column == c) match {
          case Some(r) => col(c).cast(r.to).as(c)
          case None => col(c)
        }
      }.toSeq: _*)
    val bad = flagged.filter(col("_quarantine_reason") =!= "")
    (clean, bad)
  }

  private def try_cast(c: Column, to: DataType): Column = c.try_cast(to)
}
