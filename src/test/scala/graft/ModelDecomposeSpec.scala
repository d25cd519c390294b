package graft

import org.apache.spark.sql.functions._
import graft.decompose.Decomposer
import graft.model.{RelationalModel, TableKind}
import graft.profile.SchemaProfiler
import graft.types.{Dialect, InferredType, TypeMapper}

/** Field classification (F2, Q1 fixed), type mapping (D6), DDL (D2/D3/D7),
  * decomposition round-trip (D4/D5, Q3 fixed). */
class ModelDecomposeSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDocs = Seq(
    ("5", "Jan", Seq(("A1", 2L), ("B2", 1L)), Seq("x", "y"), ("Utrecht", 3L)))
    .toDF("_id", "name", "items", "tags", "address")
    .selectExpr("_id", "name",
      "transform(items, x -> named_struct('sku', x._1, 'qty', x._2)) AS items",
      "tags",
      "named_struct('city', address._1, 'zip', address._2) AS address")

  test("F2/Q1: dotted children go ONLY to the child table, not the main table") {
    val model = RelationalModel.compile(
      SchemaProfiler.collectProfile(fixtureDocs), "users")
    val main = model.find(_.kind == TableKind.Main).get
    assert(main.columns.map(_.name) == Seq("_id", "name"))
    val addr = model.find(_.name == "users_address").get
    assert(addr.kind == TableKind.Nested)
    assert(addr.columns.map(_.name) == Seq("city", "zip"))
    assert(addr.fkColumn.contains("users__id"))
  }

  test("D6: type mapping per dialect") {
    import InferredType._
    assert(TypeMapper.sqlType(TString, Dialect.MySQL) == "VARCHAR(255)")
    assert(TypeMapper.sqlType(TString, Dialect.SQLServer, Some(300L)) == "VARCHAR(MAX)")
    assert(TypeMapper.sqlType(TString, Dialect.MySQL, Some(300L)) == "TEXT")
    assert(TypeMapper.sqlType(TInteger, Dialect.MySQL) == "INT")
    assert(TypeMapper.sqlType(TNumber, Dialect.MySQL) == "DECIMAL(18,2)")
    assert(TypeMapper.sqlType(TBoolean, Dialect.MySQL) == "TINYINT(1)")
    assert(TypeMapper.sqlType(TBoolean, Dialect.SQLServer) == "BIT")
    assert(TypeMapper.sqlType(TDatetime, Dialect.SQLServer) == "DATETIME2")
    assert(TypeMapper.sqlType(TNull, Dialect.MySQL) == "VARCHAR(255)")
    assert(TypeMapper.sqlType(TString, Dialect.MySQL, isId = true) == "VARCHAR(24)")
  }

  test("D2/D3/D7: DDL rendering — PK, surrogate id, FK, dialect quoting") {
    val model = RelationalModel.compile(
      SchemaProfiler.collectProfile(fixtureDocs), "users")
    val mainMy = model.find(_.kind == TableKind.Main).get.ddl(Dialect.MySQL)
    assert(mainMy.contains("CREATE TABLE `users`"))
    assert(mainMy.contains("PRIMARY KEY (`_id`)"))
    assert(mainMy.contains("`_id` VARCHAR(24) NOT NULL"))
    val itemsSs = model.find(_.name == "users_items").get.ddl(Dialect.SQLServer)
    assert(itemsSs.contains("[id] INT IDENTITY(1,1) PRIMARY KEY"))
    assert(itemsSs.contains("[array_index] INT NOT NULL"))
    assert(itemsSs.contains("FOREIGN KEY ([users__id]) REFERENCES [users]([_id])"))
  }

  test("D5: primitive-array element type election int > number > bool > varchar") {
    import graft.profile.{FieldProfile, SchemaProfile}
    def profWith(types: Map[String, Long]) = SchemaProfile(1, Seq(
      FieldProfile("a", Map("array" -> 1L), 1, false, true, types, Nil)))
    def elected(types: Map[String, Long]) =
      RelationalModel.compile(profWith(types), "t")
        .find(_.kind == TableKind.ArrayOfPrimitives).get.columns.head.inferred
    assert(elected(Map("integer" -> 1L, "number" -> 5L)) == InferredType.TInteger)
    assert(elected(Map("number" -> 1L, "boolean" -> 5L)) == InferredType.TNumber)
    assert(elected(Map("boolean" -> 1L, "string" -> 5L)) == InferredType.TBoolean)
    assert(elected(Map("string" -> 1L)) == InferredType.TString)
  }

  test("D4/Q3: decompose populates child tables with array_index round-trip") {
    val model = RelationalModel.compile(
      SchemaProfiler.collectProfile(fixtureDocs), "users")
    val tables = Decomposer.decompose(fixtureDocs, model)
    assert(tables.keySet == Set("users", "users_address", "users_items", "users_tags"))
    val items = tables("users_items").orderBy("array_index")
      .select("users__id", "array_index", "sku", "qty")
      .as[(String, Int, String, Long)].collect().toSeq
    assert(items == Seq(("5", 0, "A1", 2L), ("5", 1, "B2", 1L)))
    val tags = tables("users_tags").orderBy("array_index")
      .select("users__id", "array_index", "value")
      .as[(String, Int, String)].collect().toSeq
    assert(tags == Seq(("5", 0, "x"), ("5", 1, "y")))
    val addr = tables("users_address").select("users__id", "city", "zip")
      .as[(String, String, Long)].collect().toSeq
    assert(addr == Seq(("5", "Utrecht", 3L)))
  }

  test("Q4 fixed: VARCHAR sizing measures TRUE lengths, not truncated samples") {
    val long = "x" * 300
    val docs = Seq(("1", long), ("2", "short")).toDF("_id", "bio")
    val model = RelationalModel.compile(SchemaProfiler.collectProfile(docs), "t")
    val bio = model.head.columns.find(_.name == "bio").get
    assert(bio.maxLen.contains(300L))
    assert(bio.sqlType(Dialect.MySQL) == "TEXT")
    assert(bio.sqlType(Dialect.SQLServer) == "VARCHAR(MAX)")
  }

  test("deep nesting: a.b objects and nested arrays get their own child tables") {
    val docs = Seq(("1", (("NL", 10L), Seq(1L, 2L))))
      .toDF("_id", "geo")
      .selectExpr("_id",
        """named_struct(
          |  'country', named_struct('code', geo._1._1, 'pop', geo._1._2),
          |  'zips', geo._2) AS geo""".stripMargin)
    val model = RelationalModel.compile(SchemaProfiler.collectProfile(docs), "t")
    assert(model.map(_.name).toSet ==
      Set("t", "t_geo", "t_geo_country", "t_geo_zips"))
    // the intermediate nested table holds only scalar children
    assert(model.find(_.name == "t_geo").get.columns.isEmpty)
    assert(model.find(_.name == "t_geo_country").get.columns.map(_.name) ==
      Seq("code", "pop"))
    val tables = Decomposer.decompose(docs, model)
    val country = tables("t_geo_country").select("t__id", "code", "pop")
      .as[(String, String, Long)].collect().toSeq
    assert(country == Seq(("1", "NL", 10L)))
    val zips = tables("t_geo_zips").orderBy("array_index")
      .select("t__id", "array_index", "value")
      .as[(String, Int, Long)].collect().toSeq
    assert(zips == Seq(("1", 0, 1L), ("1", 1, 2L)))
  }

  test("docs without the array/object contribute no child rows") {
    val docs = Seq(
      ("1", Some(Seq("a"))), ("2", Option.empty[Seq[String]])
    ).toDF("_id", "tags")
    val model = RelationalModel.compile(SchemaProfiler.collectProfile(docs), "d")
    val t = Decomposer.decompose(docs, model)("d_tags")
    assert(t.count() == 1)
  }
}
