package graft.decompose

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{TableKind, TableSpec}

/** Relational decomposition of document DataFrames into main + child tables
  * (F1/F3, D3-D5). The reference *creates* child tables but never loads them
  * (quirk Q3, no insert path beyond the main table — Data_Migration.ps1:
  * 202-275); this decomposer actually populates them.
  *
  * Every operator here is narrow (`select`) or a built-in generator
  * (`posexplode`) — no shuffle, no UDFs: at 100 TB each child-table extract
  * is a single embarrassingly-parallel scan over the document table, and
  * Catalyst prunes the unread document columns down to the parquet reader.
  */
object Decomposer {

  /** F1: main-table projection — scalar top-level fields only, sorted by name
    * (Data_Migration.ps1:217-231; column sort per Sql_Schema_Generator.ps1:225). */
  def mainTable(docs: DataFrame, spec: TableSpec): DataFrame =
    docs.select(spec.columns.map(c => col(c.name)): _*)

  /** F3: nested-object child table — `select(_id, nested.*)` renamed to leaf
    * names (Sql_Schema_Generator.ps1:119-125), one row per document where the
    * object is present. */
  def nestedTable(docs: DataFrame, spec: TableSpec): DataFrame = {
    val path = spec.sourcePath
    val fk = spec.fkColumn.get
    docs.filter(col(path).isNotNull)
      .select(col("_id").as(fk) +:
        spec.columns.map(c => col(s"$path.${c.name}").as(c.name)): _*)
  }

  /** D4: array-of-objects child table — `posexplode` position becomes
    * `array_index` (Sql_Schema_Generator.ps1:297-345, index col :330). */
  def arrayObjectTable(docs: DataFrame, spec: TableSpec): DataFrame = {
    val path = spec.sourcePath
    val fk = spec.fkColumn.get
    docs.filter(col(path).isNotNull)
      .select(col("_id").as(fk), posexplode(col(path)))
      .select(col(fk) +: col("pos").as("array_index") +:
        spec.columns.map(c => col(s"col.${c.name}").as(c.name)): _*)
  }

  /** D5: array-of-primitives child table — (array_index, value) with the
    * elected element cast (Sql_Schema_Generator.ps1:347-402, election
    * :383-394). */
  def arrayPrimitiveTable(docs: DataFrame, spec: TableSpec): DataFrame = {
    val path = spec.sourcePath
    val fk = spec.fkColumn.get
    val valueType = graft.types.InferredType.toSpark(spec.columns.head.inferred)
    docs.filter(col(path).isNotNull)
      .select(col("_id").as(fk), posexplode(col(path)))
      .select(col(fk), col("pos").as("array_index"),
        col("col").cast(valueType).as("value"))
  }

  /** D1 driver: decompose a document DataFrame into all tables of a compiled
    * model. Returned plans share the one source scan (no materialization —
    * callers decide caching). */
  def decompose(docs: DataFrame, model: Seq[TableSpec]): Map[String, DataFrame] =
    model.map { spec =>
      spec.name -> (spec.kind match {
        case TableKind.Main => mainTable(docs, spec)
        case TableKind.Nested => nestedTable(docs, spec)
        case TableKind.ArrayOfObjects => arrayObjectTable(docs, spec)
        case TableKind.ArrayOfPrimitives => arrayPrimitiveTable(docs, spec)
      })
    }.toMap
}
