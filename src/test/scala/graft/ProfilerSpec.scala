package graft

import org.apache.spark.sql.types._
import graft.profile.SchemaProfiler
import graft.types.InferredType

/** Mirrors Tests/Analyze_scheme.Tests.ps1: type tagging, path grammar,
  * occurrence counting, array element histograms (FIXTURES.md §1.1-1.4). */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("P3: type tagging maps Spark types to reference tags") {
    assert(InferredType.of(StringType).tag == "string")
    assert(InferredType.of(LongType).tag == "integer")
    assert(InferredType.of(IntegerType).tag == "integer")
    assert(InferredType.of(DoubleType).tag == "number")
    assert(InferredType.of(DecimalType(18, 2)).tag == "number")
    assert(InferredType.of(BooleanType).tag == "boolean")
    assert(InferredType.of(TimestampType).tag == "datetime")
    assert(InferredType.of(TimestampNTZType).tag == "datetime")
    assert(InferredType.of(ArrayType(StringType)).tag == "array")
    assert(InferredType.of(StructType(Nil)).tag == "object")
  }

  test("P2/A2: occurrence counts over flat documents (fixture 1.1)") {
    // {"_id":"1","name":"Jan","age":30}, {"_id":"2","name":"Piet","age":40}
    val docs = Seq(("1", "Jan", 30L), ("2", "Piet", 40L))
      .toDF("_id", "name", "age")
    val prof = SchemaProfiler.collectProfile(docs)
    assert(prof.totalDocs == 2)
    assert(prof("name").types == Map("string" -> 2L))
    assert(prof("age").types == Map("integer" -> 2L))
    assert(prof("name").count == 2 && prof("age").count == 2)
  }

  test("P2: nested path grammar address.city (fixture 1.2)") {
    val docs = Seq(("1", ("Utrecht", "NL"))).toDF("_id", "address")
      .selectExpr("_id", "named_struct('city', address._1, 'cc', address._2) AS address")
    val prof = SchemaProfiler.collectProfile(docs)
    assert(prof("address").isNested)
    assert(prof.has("address.city"))
    assert(prof("address.city").types == Map("string" -> 1L))
  }

  test("P2: array element type histogram (fixture 1.3)") {
    val docs = Seq(("1", Seq("a", "b", "c"))).toDF("_id", "tags")
    val prof = SchemaProfiler.collectProfile(docs)
    assert(prof("tags").isArray)
    assert(prof("tags").arrayElementTypes == Map("string" -> 3L))
  }

  test("P2: array-of-objects path grammar items[].sku (fixture 1.4)") {
    val docs = Seq(("5", Seq(("A1", 2L), ("B2", 1L)))).toDF("_id", "items")
      .selectExpr("_id",
        "transform(items, x -> named_struct('sku', x._1, 'qty', x._2)) AS items")
    val prof = SchemaProfiler.collectProfile(docs)
    assert(prof("items").isArray)
    assert(prof("items").arrayElementTypes == Map("object" -> 2L))
    assert(prof("items[].sku").types == Map("string" -> 2L))
    assert(prof("items[].qty").types == Map("integer" -> 2L))
  }

  test("null values tracked as 'null' type; missing parents don't leak children") {
    val docs = Seq(
      ("1", Some("x")), ("2", None)
    ).toDF("_id", "name")
    val prof = SchemaProfiler.collectProfile(docs)
    assert(prof("name").types == Map("string" -> 1L, "null" -> 1L))
  }

  test("A3: majority-type election with deterministic tie-break") {
    import graft.profile.FieldProfile
    val f = FieldProfile("v", Map("integer" -> 3L, "string" -> 1L), 4, false, false, Map(), Nil)
    assert(f.electedType == "integer")
    val tie = FieldProfile("v", Map("string" -> 2L, "integer" -> 2L), 4, false, false, Map(), Nil)
    assert(tie.electedType == "integer") // lexicographic on tie
  }

  test("X4: sample values capped at 3 and truncated to 50 chars") {
    val long = "x" * 80
    val docs = Seq("a", "b", "c", "d", long).toDF("name")
    val prof = SchemaProfiler.collectProfile(docs)
    val s = prof("name").samples
    assert(s.size == 3)
    val profLong = SchemaProfiler.collectProfile(Seq(long).toDF("name"))
    assert(profLong("name").samples.head == "x" * 47 + "...")
  }

  test("P4: describe renders paths and summary") {
    val docs = Seq(("1", Seq("a"))).toDF("_id", "tags")
    val d = SchemaProfiler.collectProfile(docs).describe
    assert(d.contains("tags") && d.contains("1 array"))
  }

  test("P1: profile is sample-bounded") {
    val docs = (1 to 500).map(i => (i.toString, i)).toDF("_id", "v")
    val prof = SchemaProfiler.profile(docs, sampleSize = 100)
    assert(prof.totalDocs == 100)
  }
}
