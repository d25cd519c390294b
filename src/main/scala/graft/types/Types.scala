package graft.types

import org.apache.spark.sql.types._

/** The reference's inferred type tags (private/Analyze_scheme.ps1:230-267:
  * string/integer/number/boolean/datetime/array/object/null/ObjectId/other).
  */
sealed abstract class InferredType(val tag: String)
object InferredType {
  case object TString extends InferredType("string")
  case object TInteger extends InferredType("integer")
  case object TNumber extends InferredType("number")
  case object TBoolean extends InferredType("boolean")
  case object TDatetime extends InferredType("datetime")
  case object TObjectId extends InferredType("ObjectId")
  case object TNull extends InferredType("null")
  case object TArray extends InferredType("array")
  case object TObject extends InferredType("object")
  case object TBinary extends InferredType("binary")
  case object TOther extends InferredType("other")

  val all: Seq[InferredType] = Seq(TString, TInteger, TNumber, TBoolean,
    TDatetime, TObjectId, TNull, TArray, TObject, TBinary, TOther)

  def fromTag(t: String): InferredType =
    all.find(_.tag == t).getOrElse(TOther)

  /** Spark DataType → reference type tag (P3). The reference inspects runtime
    * values (Analyze_scheme.ps1:230-267); on a schema'd DataFrame the static
    * type carries the same information, with `null` handled per-value by the
    * profiler. */
  def of(dt: DataType): InferredType = dt match {
    case StringType | _: CharType | _: VarcharType => TString
    case ByteType | ShortType | IntegerType | LongType => TInteger
    case FloatType | DoubleType | _: DecimalType => TNumber
    case BooleanType => TBoolean
    case TimestampType | TimestampNTZType | DateType => TDatetime
    case BinaryType => TBinary
    case _: ArrayType => TArray
    case _: StructType => TObject
    case _ => TOther
  }

  /** Spark type to use when materializing a column of this inferred type
    * (SURVEY.md §1.3 "Spark type" column). */
  def toSpark(t: InferredType): DataType = t match {
    case TString | TObjectId | TNull | TOther => StringType
    case TInteger => LongType
    case TNumber => DecimalType(18, 2) // reference: DECIMAL(18,2), Sql_Schema_Generator.ps1:439-441
    case TBoolean => BooleanType
    case TDatetime => TimestampType
    case TBinary => BinaryType
    case TArray | TObject =>
      throw new IllegalArgumentException(s"$t decomposes to a child table, not a column")
  }
}

/** Output SQL dialect for generated DDL, mirroring `-DatabaseType`
  * (private/Data_Migration.ps1:42-44). The reference generated SQL Server DDL
  * then regex-rewrote it for MySQL (Data_Migration.ps1:324-361, quirk Q9/D7);
  * we render each dialect directly from the table spec instead. */
sealed trait Dialect {
  def quote(ident: String): String
  def name: String
}
object Dialect {
  case object MySQL extends Dialect {
    def quote(i: String): String = s"`$i`"
    val name = "mysql"
  }
  case object SQLServer extends Dialect {
    def quote(i: String): String = s"[$i]"
    val name = "sqlserver"
  }
}

/** Inferred type → SQL column type per dialect (D6; reference
  * Convert-MongoTypeToSQL at private/Sql_Schema_Generator.ps1:404-458 and
  * Get-SQLDataType at private/Sync.ps1:479-507). `maxLen` drives the
  * VARCHAR(255)/VARCHAR(MAX) split (:427-434); the reference's own split is
  * unreachable because samples are pre-truncated to 50 chars (quirk Q4) — we
  * measure true lengths. */
object TypeMapper {
  def sqlType(t: InferredType, dialect: Dialect, maxLen: Option[Long] = None,
      isId: Boolean = false): String = {
    if (isId) return "VARCHAR(24)" // _id forced, Sql_Schema_Generator.ps1:419-421
    val wide = maxLen.exists(_ > 255)
    (t, dialect) match {
      case (InferredType.TString, Dialect.SQLServer) =>
        if (wide) "VARCHAR(MAX)" else "VARCHAR(255)"
      case (InferredType.TString, Dialect.MySQL) =>
        if (wide) "TEXT" else "VARCHAR(255)"
      case (InferredType.TInteger, _) => "INT"
      case (InferredType.TNumber, _) => "DECIMAL(18,2)"
      case (InferredType.TBoolean, Dialect.SQLServer) => "BIT"
      case (InferredType.TBoolean, Dialect.MySQL) => "TINYINT(1)"
      case (InferredType.TDatetime, Dialect.SQLServer) => "DATETIME2"
      case (InferredType.TDatetime, Dialect.MySQL) => "DATETIME"
      case (InferredType.TObjectId, _) => "VARCHAR(24)"
      case (InferredType.TNull, _) => "VARCHAR(255)"
      case (_, Dialect.SQLServer) => "VARCHAR(MAX)"
      case (_, Dialect.MySQL) => "VARCHAR(255)"
    }
  }
}
