package graft

import org.apache.spark.sql.functions._

import graft.workflow.{MigrationConfig, MigrationWorkflow}

/** An empty collection must migrate to correctly-typed empty tables — a
  * 100 TB pipeline meets empty partitions routinely and cannot crash on
  * them. The profile falls back to the frame's schema (count 0 per path). */
class EmptyMigSpec extends SparkSpec {

  test("fullMigration on an empty document frame yields typed empty tables") {
    val docs = Tables.orderDocs(spark, sfDir).filter(lit(false))
    val out = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val r = MigrationWorkflow.fullMigration(spark, docs,
      MigrationConfig("odocs", out))
    assert(r.status == "PASSED") // 0 == 0 counts reconcile
    assert(r.rowCounts.keySet ==
      Set("odocs", "odocs_customer", "odocs_lineitems", "odocs_tags"))
    assert(r.rowCounts.values.forall(_ == 0L))
    // the written main table carries the full flat schema, not an empty one
    val main = spark.read.parquet(s"$out/odocs.parquet")
    assert(main.columns.sorted.toSeq == Seq("_id", "o_custkey", "o_orderdate",
      "o_orderpriority", "o_orderstatus", "o_totalprice"))
  }

  test("schema-derived profile elects schema tags with zero counts") {
    val prof = graft.profile.SchemaProfiler.collectProfile(
      Tables.orderDocs(spark, sfDir).filter(lit(false)))
    assert(prof.totalDocs == 0)
    assert(prof("customer").isNested && prof("lineitems").isArray)
    assert(prof("o_custkey").electedType == "integer")
    assert(prof("lineitems[].l_quantity").electedType == "number")
  }
}
