package graft

import org.apache.spark.sql.functions._
import graft.model.{QuirkFlags, RelationalModel, TableKind}
import graft.profile.SchemaProfiler
import graft.streaming.{SessionEvent, StatefulSessions}
import graft.sync.DocHash

/** Quirk-compat flags (SURVEY §4.3) and the stateful streaming sessionizer. */
class QuirkAndStateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(("1", "Jan", ("Utrecht", "NL")), ("2", "Piet", ("A", "B")))
    .toDF("_id", "name", "address")
    .selectExpr("_id", "name",
      "named_struct('city', address._1, 'cc', address._2) AS address")

  test("Q1 legacy flatten: dotted children duplicated into the main table") {
    val prof = SchemaProfiler.collectProfile(docs)
    val fixed = RelationalModel.compile(prof, "users")
    assert(fixed.head.columns.map(_.name) == Seq("_id", "name"))
    val legacy = RelationalModel.compile(prof, "users", QuirkFlags(q1LegacyFlatten = true))
    assert(legacy.head.columns.map(_.name) ==
      Seq("_id", "address.cc", "address.city", "name"))
    // child table exists in BOTH modes (the reference also creates it)
    assert(legacy.exists(_.name == "users_address"))
  }

  test("Q2 legacy NOT NULL: every column NOT NULL regardless of occurrence") {
    val sparse = Seq(("1", Some("x")), ("2", None)).toDF("_id", "name")
    val prof = SchemaProfiler.collectProfile(sparse)
    val fixed = RelationalModel.compile(prof, "t")
    assert(fixed.head.columns.find(_.name == "name").get.nullable)
    val legacy = RelationalModel.compile(prof, "t", QuirkFlags(q2NotNullAll = true))
    assert(!legacy.head.columns.find(_.name == "name").get.nullable)
  }

  test("Q5 fixed: full-document hash sees nested edits; flat hash does not") {
    val a = docs.filter($"_id" === "1")
    val b = a.withColumn("address",
      struct(lit("CHANGED").as("city"), col("address.cc").as("cc")))
    def flat(df: org.apache.spark.sql.DataFrame) =
      DocHash.withDocHash(df).select("doc_hash").head().getString(0)
    def full(df: org.apache.spark.sql.DataFrame) =
      DocHash.fullDocHash(df).select("doc_hash").head().getString(0)
    assert(flat(a) == flat(b)) // Q5: nested edit invisible to the flat canon
    assert(full(a) != full(b)) // fixed canon sees it
  }

  test("versioned state: publish/prune/rollback/latest semantics") {
    import graft.io.StateStore
    val root = java.nio.file.Files.createTempDirectory("graft_vstate").toString
    assert(StateStore.loadLatest(spark, root).isEmpty) // no versions yet
    def st(ids: Long*) = ids.map(i => (i.toString, s"h$i")).toDF("_id", "hash")
    assert(StateStore.saveVersion(spark, st(1), root, keep = 2) == 1)
    assert(StateStore.saveVersion(spark, st(1, 2), root, keep = 2) == 2)
    assert(StateStore.saveVersion(spark, st(1, 2, 3), root, keep = 2) == 3)
    // retention pruned v1; latest is v3
    assert(StateStore.versions(spark, root) == Seq(2, 3))
    assert(StateStore.loadLatest(spark, root).count() == 3)
    // rollback deletes newer versions; latest becomes v2
    StateStore.rollback(spark, root, 2)
    assert(StateStore.versions(spark, root) == Seq(2))
    assert(StateStore.loadLatest(spark, root).count() == 2)
    // numbering continues monotonically after rollback
    assert(StateStore.saveVersion(spark, st(9), root, keep = 2) == 3)
    intercept[IllegalArgumentException](StateStore.rollback(spark, root, 7))
  }

  test("pinned state version survives retention until the reader releases") {
    import graft.io.StateStore
    val root = java.nio.file.Files.createTempDirectory("graft_pstate").toString
    def st(ids: Long*) = ids.map(i => (i.toString, s"h$i")).toDF("_id", "hash")
    val v1 = StateStore.saveVersion(spark, st(1), root, keep = 1)
    // a slow reader pins v1, then the writer publishes well past the
    // keep-window — v1 must survive (the unpinned predecessor would have
    // been pruned on the first publish)
    val token = StateStore.pinVersion(spark, root, v1)
    try {
      (2 to 5).foreach(i => StateStore.saveVersion(spark, st(1L, i.toLong),
        root, keep = 1))
      assert(StateStore.versions(spark, root).contains(v1))
      // the pinned frame is still fully readable — no FileNotFound
      assert(StateStore.loadVersion(spark, root, v1).count() == 1)
      // versions ABOVE the pin floor also survive pruning
      assert(StateStore.versions(spark, root) == Seq(1, 2, 3, 4, 5))
    } finally StateStore.unpinVersion(spark, root, token)
    // release: the next publish reaps everything outside the keep-window
    StateStore.saveVersion(spark, st(9), root, keep = 1)
    assert(StateStore.versions(spark, root) == Seq(6))
    // unpin is idempotent; pinning a missing version fails loudly
    StateStore.unpinVersion(spark, root, token)
    intercept[IllegalArgumentException](StateStore.pinVersion(spark, root, 1))
  }

  test("stateful sessionizer closes sessions on gap, keeps last session open") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      SessionEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 00:10:00"), 2.0),
      SessionEvent(1L, ts("2024-01-01 01:00:00"), 3.0), // >30 min gap → closes s1
      SessionEvent(2L, ts("2024-01-01 00:00:00"), 5.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toString
    events.toDS().write.parquet(s"$dir/ev")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/ev").schema)
      .parquet(s"$dir/ev").as[SessionEvent]
    val q = StatefulSessions.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val closed = spark.table("sessions_out")
      .select("user_id", "session_id", "n_events", "session_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    // only user 1's first session closed within the batch; open sessions
    // (user 1 s2, user 2 s1) remain in state
    assert(closed == Set((1L, 1L, 2L, 3.0)))
  }
}
