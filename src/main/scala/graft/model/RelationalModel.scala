package graft.model

import graft.profile.SchemaProfile
import graft.types.{Dialect, InferredType, TypeMapper}

/** One relational column compiled from a profiled document path. */
case class ColumnSpec(
    name: String,
    inferred: InferredType,
    nullable: Boolean,
    maxLen: Option[Long] = None,
    isId: Boolean = false) {
  def sqlType(d: Dialect): String = TypeMapper.sqlType(inferred, d, maxLen, isId)
}

sealed trait TableKind
object TableKind {
  case object Main extends TableKind
  case object Nested extends TableKind          // child per nested object (D3)
  case object ArrayOfObjects extends TableKind  // child per object array (D4)
  case object ArrayOfPrimitives extends TableKind // child per primitive array (D5)
}

/** Relational table compiled from the profile (reference "Tables" +
  * "Relationships" output of New-SQLSchema, Sql_Schema_Generator.ps1:102-181).
  * `sourcePath` is the document path this table materializes ("" for main).
  * Child tables carry `fkColumn` → parent `_id` (:280, :291) and array tables
  * an `array_index` column (:330). */
case class TableSpec(
    name: String,
    kind: TableKind,
    sourcePath: String,
    columns: Seq[ColumnSpec],
    primaryKey: Option[String],
    fkColumn: Option[String],
    parentTable: Option[String]) {

  /** D2/D3/D7: CREATE TABLE DDL rendered directly per dialect (the reference
    * rendered SQL Server then regex-rewrote to MySQL, Data_Migration.ps1:
    * 324-361 — we render each dialect from the spec, fixing quirk Q9). */
  def ddl(d: Dialect): String = {
    val q = d.quote _
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    kind match {
      case TableKind.Main => ()
      case _ =>
        // surrogate auto-increment PK on child tables (Sql_Schema_Generator.ps1:277)
        val ident = d match {
          case Dialect.MySQL => s"${q("id")} INT AUTO_INCREMENT PRIMARY KEY"
          case Dialect.SQLServer => s"${q("id")} INT IDENTITY(1,1) PRIMARY KEY"
        }
        lines += ident
    }
    fkColumn.foreach(fk => lines += s"${q(fk)} VARCHAR(24) NOT NULL")
    if (kind == TableKind.ArrayOfObjects || kind == TableKind.ArrayOfPrimitives)
      lines += s"${q("array_index")} INT NOT NULL" // :330
    columns.foreach { c =>
      val n = if (c.nullable) "NULL" else "NOT NULL"
      lines += s"${q(c.name)} ${c.sqlType(d)} $n"
    }
    primaryKey.foreach(pk => lines += s"PRIMARY KEY (${q(pk)})")
    (fkColumn, parentTable) match {
      case (Some(fk), Some(pt)) =>
        lines += s"FOREIGN KEY (${q(fk)}) REFERENCES ${q(pt)}(${q("_id")})"
      case _ => ()
    }
    s"CREATE TABLE ${q(name)} (\n  ${lines.mkString(",\n  ")}\n);"
  }
}

/** Reference-quirk compatibility flags (SURVEY §4.3: quirks are FIXED by
  * default; each flag reproduces the reference's literal behavior for
  * byte-compatible artifact comparison). */
case class QuirkFlags(
    /** Q1: `-contains '.'` on a string never matches, so dotted child paths
      * ALSO become (never-populated) main-table columns
      * (Sql_Schema_Generator.ps1:76, :84-93). */
    q1LegacyFlatten: Boolean = false,
    /** Q2: the NOT NULL check compares a count with itself, so every flat
      * column is NOT NULL regardless of occurrence
      * (Sql_Schema_Generator.ps1:237). */
    q2NotNullAll: Boolean = false)

/** D1: profile → relational model compiler (New-SQLSchema,
  * Sql_Schema_Generator.ps1:1-197).
  *
  * Field classification (F2, :62-94) is driven by the elected type of each
  * path. Quirk Q1 (dotted paths leaking into the main table because
  * `-contains '.'` never matches on strings) is fixed: children of nested
  * objects belong only to their child table. Quirk Q2 (NOT NULL tautology at
  * :237) is fixed: a column is nullable unless it occurred in every profiled
  * document with no nulls. Pass [[QuirkFlags]] to reproduce the legacy
  * behaviors.
  */
object RelationalModel {
  def childTableName(collection: String, path: String): String =
    s"${collection}_${path.replace("[]", "").replace('.', '_')}"

  def compile(profile: SchemaProfile, collection: String): Seq[TableSpec] =
    compile(profile, collection, QuirkFlags())

  def compile(profile: SchemaProfile, collection: String,
      quirks: QuirkFlags): Seq[TableSpec] = {
    val paths = profile.fields.map(_.path)
    def leaf(p: String): String = p.split('.').last

    def colSpec(path: String, name: String): ColumnSpec = {
      val f = profile(path)
      val nullable = !quirks.q2NotNullAll &&
        (f.count < profile.totalDocs || f.types.contains("null"))
      ColumnSpec(name, InferredType.fromTag(f.electedType), nullable,
        maxLen = f.maxLen, isId = name == "_id") // true length, not the ≤50-char display sample (Q4)
    }

    val topLevel = paths.filterNot(_.contains("."))
    val flat = topLevel.filter(p =>
      !Set("object", "array")(profile(p).electedType))
    // Nested objects/arrays at ANY depth (outside array elements) each get a
    // child table {T}_{path} — `a.b` nested in `a` becomes table `t_a_b`
    // with FK to the main table, mirroring the reference's per-path child
    // tables (Sql_Schema_Generator.ps1:102-181) with correct classification.
    val nestedRoots = paths.filter(p => !p.contains("[]") &&
      profile(p).electedType == "object")
    val arrayRoots = paths.filter(p => !p.contains("[]") &&
      profile(p).electedType == "array")

    // Q1 legacy mode: dotted children of nested objects ALSO appear as
    // main-table columns (named by full path), mirroring the reference's
    // broken containment check — they are never populated by the data path,
    // exactly like the reference.
    val q1Extra =
      if (!quirks.q1LegacyFlatten) Seq.empty
      else paths.filter(p => p.contains(".") && !p.contains("[]") &&
        nestedRoots.contains(p.split('.').head))

    val mainCols = (flat ++ q1Extra).sorted
    val main = TableSpec(
      name = collection, kind = TableKind.Main, sourcePath = "",
      columns = mainCols.map(p => colSpec(p, p)), // sorted, D2 :225
      primaryKey = if (flat.contains("_id")) Some("_id") else None,
      fkColumn = None, parentTable = None)

    val nestedTables = nestedRoots.sorted.map { root =>
      // direct scalar children only — deeper objects/arrays get their own
      // child tables via nestedRoots/arrayRoots above
      val children = paths.filter(p => p.startsWith(root + ".") &&
        !p.substring(root.length + 1).contains(".") &&
        !Set("object", "array")(profile(p).electedType))
      TableSpec(
        name = childTableName(collection, root), kind = TableKind.Nested,
        sourcePath = root,
        columns = children.sorted.map(p => colSpec(p, leaf(p))),
        primaryKey = None,
        fkColumn = Some(s"${collection}__id"), parentTable = Some(collection))
    }

    val arrayTables = arrayRoots.sorted.map { root =>
      val elemTypes = profile(root).arrayElementTypes
      val objectElems = elemTypes.getOrElse("object", 0L) > 0
      if (objectElems) {
        // direct SCALAR element fields only — the same filter nestedTables
        // applies and [[fromSchema]] mirrors; without it the two model
        // compilers diverge on object/array-typed element fields and every
        // decompose-aware sync of such a table takes the schema-drift
        // full-rewrite path with the extra column nulled out
        val children = paths.filter(_.startsWith(root + "[]."))
          .filter(p => !p.substring(root.length + 3).contains("."))
          .filter(p => !Set("object", "array")(profile(p).electedType))
        TableSpec(
          name = childTableName(collection, root), kind = TableKind.ArrayOfObjects,
          sourcePath = root,
          columns = children.sorted.map(p => colSpec(p, leaf(p))),
          primaryKey = None,
          fkColumn = Some(s"${collection}__id"), parentTable = Some(collection))
      } else {
        // element type election priority integer > number > boolean > varchar
        // (Sql_Schema_Generator.ps1:383-394, D5)
        val elected =
          if (elemTypes.contains("integer")) InferredType.TInteger
          else if (elemTypes.contains("number")) InferredType.TNumber
          else if (elemTypes.contains("boolean")) InferredType.TBoolean
          else InferredType.TString
        TableSpec(
          name = childTableName(collection, root), kind = TableKind.ArrayOfPrimitives,
          sourcePath = root,
          columns = Seq(ColumnSpec("value", elected, nullable = true)),
          primaryKey = None,
          fkColumn = Some(s"${collection}__id"), parentTable = Some(collection))
      }
    }

    main +: (nestedTables ++ arrayTables)
  }

  /** Static-schema model compiler — the SYNC-side twin of [[compile]]:
    * derives the same table layout (names, kinds, source paths, fk wiring,
    * column order) from a document DataFrame's StructType alone. Plan-time
    * metadata, no profiling scan — the decompose-aware incremental sync
    * re-decomposes changed documents without re-analyzing the source,
    * preserving the reference's no-per-sync-profile property (its sync
    * reads the target column list instead, Sync.ps1:411) while extending
    * it to the child tables [[compile]]-driven migration populates (Q3
    * fixed). Differences from [[compile]], both irrelevant to the data
    * path: nullability comes from the schema writer, and maxLen is
    * unknown (both only affect rendered DDL, which sync never emits).
    * Array element types come from the static element type rather than a
    * sampled election. */
  def fromSchema(schema: org.apache.spark.sql.types.StructType,
      collection: String): Seq[TableSpec] = {
    import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
    def scalar(f: StructField): Boolean =
      !f.dataType.isInstanceOf[StructType] &&
        !f.dataType.isInstanceOf[ArrayType]
    def colSpec(name: String, f: StructField): ColumnSpec =
      ColumnSpec(name, InferredType.of(f.dataType), f.nullable,
        isId = name == "_id")
    // every (dotted-path, field) reachable OUTSIDE array elements — the
    // same domain compile()'s nestedRoots/arrayRoots classify over
    def walk(prefix: String, st: StructType): Seq[(String, StructField)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        (p, f) +: (f.dataType match {
          case s: StructType => walk(p, s)
          case _ => Seq.empty
        })
      }
    val all = walk("", schema)
    val fk = Some(s"${collection}__id")
    val mainCols = schema.fields.toSeq.filter(scalar).sortBy(_.name)
    val main = TableSpec(collection, TableKind.Main, "",
      mainCols.map(f => colSpec(f.name, f)),
      primaryKey = if (mainCols.exists(_.name == "_id")) Some("_id") else None,
      fkColumn = None, parentTable = None)
    val nestedTables = all
      .collect { case (p, f) if f.dataType.isInstanceOf[StructType] =>
        (p, f.dataType.asInstanceOf[StructType]) }
      .sortBy(_._1).map { case (p, st) =>
        TableSpec(childTableName(collection, p), TableKind.Nested, p,
          st.fields.toSeq.filter(scalar).sortBy(_.name)
            .map(f => colSpec(f.name, f)),
          primaryKey = None, fkColumn = fk, parentTable = Some(collection))
      }
    val arrayTables = all
      .collect { case (p, f) if f.dataType.isInstanceOf[ArrayType] =>
        (p, f.dataType.asInstanceOf[ArrayType]) }
      .sortBy(_._1).map { case (p, at) =>
        at.elementType match {
          case st: StructType =>
            TableSpec(childTableName(collection, p),
              TableKind.ArrayOfObjects, p,
              st.fields.toSeq.filter(scalar).sortBy(_.name)
                .map(f => colSpec(f.name, f)),
              primaryKey = None, fkColumn = fk,
              parentTable = Some(collection))
          case et =>
            TableSpec(childTableName(collection, p),
              TableKind.ArrayOfPrimitives, p,
              Seq(ColumnSpec("value", InferredType.of(et), nullable = true)),
              primaryKey = None, fkColumn = fk,
              parentTable = Some(collection))
        }
      }
    main +: (nestedTables ++ arrayTables)
  }
}
