package graft.validate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F8: the value-normalization canon used for row comparison
  * (Compare-Normalize at private/Migration_Validation.ps1:326-363):
  * null → "", boolean → "1"/"0", datetime → `yyyy-MM-dd HH:mm:ss` (X7),
  * numerics stringified, everything else trimmed string.
  * Pure built-in expressions — codegen'd, per-row, shuffle-free. */
object Normalize {
  def canon(c: Column, dt: DataType): Column = {
    val v = dt match {
      case BooleanType => when(c, lit("1")).otherwise(lit("0"))
      case TimestampType | TimestampNTZType | DateType =>
        date_format(c, "yyyy-MM-dd HH:mm:ss")
      case StringType => trim(c)
      case _ => c.cast(StringType)
    }
    coalesce(v, lit("")) // null → "" (Migration_Validation.ps1:330-332)
  }
}
