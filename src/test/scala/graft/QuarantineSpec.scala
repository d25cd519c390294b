package graft

import org.apache.spark.sql.types.LongType
import graft.io.Quarantine
import graft.io.Quarantine.CastRule
import graft.sync.{DocHash, IncrementalSync}
import graft.io.StateStore

/** §7.5 hardening: per-row quarantine and sync-time schema drift. */
class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("quarantine splits cast failures with a reason, keeps real nulls clean") {
    val df = Seq(("1", "10"), ("2", "abc"), ("3", null)).toDF("_id", "v")
    val (clean, bad) = Quarantine.split(df, Seq(CastRule("v", LongType)))
    assert(clean.schema("v").dataType == LongType)
    assert(clean.select("_id").as[String].collect().sorted.toSeq == Seq("1", "3"))
    val q = bad.select("_id", "_quarantine_reason").as[(String, String)].collect()
    assert(q.toSeq == Seq(("2", "v")))
  }

  test("quarantine reports every failing column") {
    val df = Seq(("1", "x", "y")).toDF("_id", "a", "b")
    val (_, bad) = Quarantine.split(df,
      Seq(CastRule("a", LongType), CastRule("b", LongType)))
    assert(bad.select("_quarantine_reason").as[String].head() == "a,b")
  }

  test("sync run evolves the target schema on source drift (S16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val target = s"$dir/t.parquet"
    val state = s"$dir/state.parquet"
    val v1 = Seq(("1", "a")).toDF("_id", "name")
    v1.write.parquet(target)
    StateStore.save(spark, v1
      .withColumn("hash", DocHash.docHash(Seq("_id", "name")))
      .select("_id", "hash"), state)
    // v2 adds a column and a doc
    val v2 = Seq(("1", "a", 7L), ("2", "b", 8L)).toDF("_id", "name", "score")
    val r = IncrementalSync.run(spark, v2, target, state)
    assert(r.newDocs == 1)
    val after = spark.read.parquet(target)
    assert(after.columns.toSet == Set("_id", "name", "score"))
    val rows = after.orderBy("_id").as[(String, String, Option[Long])].collect().toSeq
    // doc 1's hash changed (new field in canon) → updated with score=7
    assert(rows == Seq(("1", "a", Some(7L)), ("2", "b", Some(8L))))
  }
}
