package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.validate.{Normalize, Validator}

/** Mirrors Tests/Data_Migration.Tests.ps1 (which actually tests validation):
  * normalization canon, row compare, count reconciliation, status machine
  * (FIXTURES.md §1.6). */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  test("F8: normalization canon — bool→1/0, datetime format, null→empty") {
    val df = Seq((true, Timestamp.valueOf("2024-01-01 12:30:00"),
      Option.empty[String], "  pad  ", 2.5))
      .toDF("b", "ts", "n", "s", "d")
    val row = df.select(
      Normalize.canon($"b", BooleanType),
      Normalize.canon($"ts", TimestampType),
      Normalize.canon($"n", StringType),
      Normalize.canon($"s", StringType),
      Normalize.canon($"d", DoubleType)).head()
    assert(row.getString(0) == "1")
    assert(row.getString(1) == "2024-01-01 12:30:00")
    assert(row.getString(2) == "")
    assert(row.getString(3) == "pad")
    assert(row.getString(4) == "2.5")
  }

  test("V2: matching rows produce zero differences") {
    val a = Seq(("1", "Jan", 30L)).toDF("_id", "name", "age")
    assert(Validator.rowCompare(a, a, "_id", Seq("name", "age")).isEmpty)
  }

  test("V2: field missing in target reported as difference") {
    val s = Seq(("1", "Jan", 30L)).toDF("_id", "name", "age")
    val t = Seq(("1", "Jan", Option.empty[java.lang.Long])).toDF("_id", "name", "age")
    val diffs = Validator.rowCompare(s, t, "_id", Seq("name", "age"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(diffs.toSeq == Seq(("age", "30", "")))
  }

  test("V2: target row entirely missing → every field differs") {
    val s = Seq(("1", "Jan")).toDF("_id", "name")
    val t = Seq(("2", "Piet")).toDF("_id", "name")
    val diffs = Validator.rowCompare(s, t, "_id", Seq("name"))
    assert(diffs.count() == 1)
  }

  test("V1: count reconciliation match and mismatch") {
    val five = (1 to 5).toDF("v")
    val ten = (1 to 10).toDF("v")
    val ok = Validator.countReconciliation(five, five).head()
    assert(ok.getAs[Boolean]("counts_match"))
    val bad = Validator.countReconciliation(ten, five).head()
    assert(!bad.getAs[Boolean]("counts_match"))
    assert(bad.getAs[Long]("diff") == 5)
  }

  test("V3: integrity suite detects null PKs, duplicates, empty table") {
    val df = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val checks = Validator.integrity(df, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks == Map("null_pk" -> 1L, "duplicate_keys" -> 1L, "empty_table" -> 0L))
    val empty = Validator.integrity(Seq.empty[Long].toDF("k"), "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(empty("empty_table") == 1L)
  }

  test("V4: status machine PASSED / PARTIAL / FAILED") {
    assert(Validator.status(true, 10, 0, 0) == "PASSED")
    assert(Validator.status(false, 8, 2, 0) == "PARTIAL")
    assert(Validator.status(false, 2, 8, 0) == "FAILED")
    assert(Validator.status(true, 10, 0, 3) == "PARTIAL") // issues but samples pass
  }

  test("V4: statusReport end-to-end PASSED on identical tables") {
    val df = (1 to 20).map(i => (i.toString, s"n$i")).toDF("_id", "name")
    val rep = Validator.statusReport(df, df, "_id", Seq("name")).head()
    assert(rep.getAs[String]("status") == "PASSED")
  }

  test("V3 FK suite: orphans, missing children, array_index gaps — each " +
      "caught by exactly one check; clean tables report all-zero") {
    val parent = Seq("1", "2", "3").toDF("_id")
    val clean = Seq(
      ("1", 0L, "a"), ("1", 1L, "b"), ("2", 0L, "c"))
      .toDF("fk", "array_index", "v")
    val expected = Seq("1", "2").toDF("_id") // 3 never had children
    def run(child: org.apache.spark.sql.DataFrame) =
      Validator.fkIntegrity(parent, child, "_id", "fk", Some(expected))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(clean) == Map("orphaned_child_rows" -> 0L,
      "missing_children" -> 0L, "array_index_gaps" -> 0L))
    // ghost fk → orphan; drop id 2's rows → missing; shift id 1 → gap
    val bad = Seq(
      ("1", 1L, "a"), ("1", 2L, "b"), ("9", 0L, "ghost"))
      .toDF("fk", "array_index", "v")
    assert(run(bad) == Map("orphaned_child_rows" -> 1L,
      "missing_children" -> 1L, "array_index_gaps" -> 1L))
    // no array_index column (nested-object child) → gap check is 0
    val nested = Seq(("1", "x")).toDF("fk", "v")
    assert(run(nested)("array_index_gaps") == 0L)
    // no expectation frame → missing_children is 0 by construction
    val noExp = Validator.fkIntegrity(parent, bad, "_id", "fk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(noExp("missing_children") == 0L)
    // duplicate-index-plus-gap ([0,0,2]): min=0 and max=n-1 both hold,
    // only the distinct-count term catches it (round-13 advice item)
    val dupGap = Seq(
      ("1", 0L, "a"), ("1", 0L, "b"), ("1", 2L, "c"))
      .toDF("fk", "array_index", "v")
    assert(run(dupGap)("array_index_gaps") == 1L, run(dupGap))
  }

  test("V4: statusReport fails on a stale child table (orphaned rows " +
      "count as integrity issues)") {
    val df = (1 to 20).map(i => (i.toString, s"n$i")).toDF("_id", "name")
    val staleChild = Seq(("99", 0L, "orphan")).toDF("fk", "array_index", "v")
    val rep = Validator.statusReport(df, df, "_id", Seq("name"),
      children = Seq((staleChild, "fk"))).head()
    assert(rep.getAs[Long]("integrity_issues") == 1L)
    assert(rep.getAs[String]("status") != "PASSED")
    // and a consistent child keeps the report PASSED
    val okChild = df.select($"_id".as("fk"), lit(0L).as("array_index"))
    val ok = Validator.statusReport(df, df, "_id", Seq("name"),
      children = Seq((okChild, "fk"))).head()
    assert(ok.getAs[String]("status") == "PASSED")
  }

  test("V4: source smaller than sampleSize reports no phantom passes") {
    // 3 rows, all mismatching, sampleSize 10 — must be FAILED, not PARTIAL
    val src = Seq(("1", "a"), ("2", "b"), ("3", "c")).toDF("_id", "name")
    val tgt = Seq(("1", "X"), ("2", "Y"), ("3", "Z")).toDF("_id", "name")
    val rep = Validator.statusReport(src, tgt, "_id", Seq("name"), 10).head()
    assert(rep.getAs[Long]("samples_failed") == 3)
    assert(rep.getAs[Long]("samples_passed") == 0)
    assert(rep.getAs[String]("status") == "FAILED")
  }
}
