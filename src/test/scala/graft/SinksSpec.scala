package graft

import org.apache.spark.sql.types._
import graft.io.{Sinks, StateStore}

/** Keyed sink combinators (S10-S13, S16) and the atomic overwrite swap. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "v")

  test("S10: upsert — updates win, inserts appended") {
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val out = Sinks.upsert(base, updates, "k").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("S12: applyUpdates — only named fields overwritten, others pass through") {
    val updates = Seq((2L, "UPD")).toDF("k", "name")
    val out = Sinks.applyUpdates(base, updates, "k").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "UPD", 20.0), (3L, "c", 30.0)))
  }

  test("S13: delete via anti-join") {
    val dels = Seq(2L).toDF("k")
    val out = Sinks.delete(base, dels, "k").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 3L))
  }

  test("S11: alignToSchema — missing cols typed-null, extras dropped, casts applied") {
    val target = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("extra", DoubleType)))
    val out = Sinks.alignToSchema(base, target)
    assert(out.columns.toSeq == Seq("k", "name", "extra"))
    assert(out.schema("extra").dataType == DoubleType)
    assert(out.filter("extra IS NOT NULL").isEmpty)
  }

  test("S16/U2: mergeSchemas unions onto the superset schema") {
    val old = Seq((1L, "a")).toDF("k", "name")
    val neu = Seq((2L, "b", 5.0)).toDF("k", "name", "score")
    val out = Sinks.mergeSchemas(old, neu).orderBy("k")
    assert(out.columns.toSeq == Seq("k", "name", "score"))
    val rows = out.as[(Long, String, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(5.0))))
  }

  test("F7: missingColumns set difference") {
    val src = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    val tgt = StructType(Seq(StructField("a", LongType)))
    assert(Sinks.missingColumns(src, tgt) == Seq("b"))
  }

  test("atomic overwrite swaps cleanly and repeatedly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ow").toString
    val p = s"$dir/t.parquet"
    Sinks.atomicOverwrite(spark, Seq(1L, 2L).toDF("v"), p)
    assert(spark.read.parquet(p).count() == 2)
    Sinks.atomicOverwrite(spark, Seq(1L, 2L, 3L).toDF("v"), p)
    assert(spark.read.parquet(p).count() == 3)
  }

  test("S18: state store round-trip and empty-load schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st").toString
    val p = s"$dir/state.parquet"
    val empty = StateStore.load(spark, p)
    assert(empty.columns.toSeq == Seq("_id", "hash") && empty.isEmpty)
    StateStore.save(spark, Seq(("1", "H")).toDF("_id", "hash"), p)
    assert(StateStore.load(spark, p).count() == 1)
  }

  test("S10: dropped-column drift — upserted rows take REPLACE semantics (NULL)") {
    // a source that LOST a column still upserts: the missing column becomes
    // NULL on replaced rows (delete-then-insert a la REPLACE INTO,
    // Data_Migration.ps1:247), while untouched base rows keep their values
    val base = Seq(("1", "a", 10L), ("2", "b", 20L)).toDF("_id", "name", "age")
    val updates = Seq(("1", "A")).toDF("_id", "name") // no age column
    val out = Sinks.upsert(base, updates, "_id")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2))))).toMap
    assert(out("1") == (("A", None)))
    assert(out("2") == (("b", Some(20L))))
  }
}
