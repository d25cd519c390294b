package graft

import org.apache.spark.sql.functions._
import graft.io.Bucketing

/** §7.5 partitioning tools: shuffle-free co-located joins via bucketing,
  * salted joins for skew. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Bucketing.bucketedSave(a, "graft_bkt_a", "k", 4, Some(s"$dir/a"))
    Bucketing.bucketedSave(b, "graft_bkt_b", "k", 4, Some(s"$dir/b"))
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bkt_a")
          .join(spark.table("graft_bkt_b"), "k")
        assert(joined.count() == 1000)
        assert(Bucketing.isShuffleFree(joined),
          s"expected no Exchange:\n${joined.queryExecution.executedPlan}")
        // control: the same join on plain parquet DOES shuffle
        val plain = spark.read.parquet(s"$dir/a")
          .join(spark.read.parquet(s"$dir/b"), "k")
        assert(!Bucketing.isShuffleFree(plain))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("salted join equals plain join on skewed data") {
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = (1 to 2000).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Bucketing.saltedJoin(skewed, dim, "k", 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the content-derived salt must handle unhashable columns at ANY depth
    // (hash() rejects MapType nested inside arrays/structs too) — they feed
    // the salt through to_json instead of being dropped
    val withMap = skewed.withColumn("m",
      map(lit("a"), col("v")).cast("map<string,int>"))
      .withColumn("am", array(map(lit("b"), col("v"))))
    val saltedMap = Bucketing.saltedJoin(withMap, dim, "k", 8)
      .select("k", "v", "name")
    assert(saltedMap.count() == plain.count())
    assert(saltedMap.exceptAll(plain).isEmpty)
    // no nondeterministic fallback snuck back in
    val p = Bucketing.saltedJoin(withMap, dim, "k", 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("monotonically_increasing_id"), p)
    // a MAP-ONLY payload schema must still SPREAD a hot key: with every
    // non-key column map-typed, dropping them (the old fallback) collapses
    // the salt to hash(k) — one salt per key, a silent no-op for exactly
    // the hot-key case. The to_json path keeps the payload in the salt.
    val mapOnly = skewed.select(col("k"),
      map(lit("v"), col("v")).as("payload"))
    val hotSalts = mapOnly
      .withColumn("__salt", pmod(hash(col("k"), to_json(col("payload"))),
        lit(8)))
      .filter(col("k") === 1L).select("__salt").distinct().count()
    assert(hotSalts > 1, s"hot key collapsed to $hotSalts salt(s)")
    // and the join itself stays exact on the map-only shape (a plan-string
    // to_json pin is NOT asserted: ConvertToLocalRelation folds the salt
    // projection into the local relation for Seq-backed frames, so the
    // expression is invisible in the physical plan — the salt-spread
    // assertion above is the behavioral pin)
    val saltedMapOnly = Bucketing.saltedJoin(mapOnly, dim, "k", 8)
    assert(saltedMapOnly.count() == plain.count())
  }

  test("view-flip retention keeps the LIVE version, reaps crashed orphans") {
    import graft.sync.{DocHash, IncrementalSync}
    val dir = java.nio.file.Files.createTempDirectory("graft_orph").toString
    def src(n: Int) = (1 to n).map(i => (i.toString, s"n$i")).toDF("_id", "name")
    try {
      Bucketing.bucketedSave(src(50), "graft_orph_t", "_id", 2, Some(s"$dir/t"))
      Bucketing.bucketedSave(
        DocHash.withDocHash(src(50), "doc_hash")
          .select(col("_id"), col("doc_hash").as("hash")),
        "graft_orph_s", "_id", 2, Some(s"$dir/s"))
      // first sync converts to view-over-__v1
      IncrementalSync.runBucketed(spark, src(50), "graft_orph_t",
        "graft_orph_s", 2)
      // simulate a CRASHED second run: __v2 written, view flip never reached
      Bucketing.bucketedSave(src(60), "graft_orph_t__v2", "_id", 2)
      // next successful sync must retain v1 (what in-flight readers are on,
      // via the view) and reap the never-published orphan v2 — keying
      // retention off next-1 would do the opposite
      IncrementalSync.runBucketed(spark, src(70), "graft_orph_t",
        "graft_orph_s", 2)
      val phys = spark.sql("SHOW TABLES LIKE 'graft_orph_t__v*'")
        .collect().map(_.getString(1)).sorted
      assert(phys.toSeq == Seq("graft_orph_t__v1", "graft_orph_t__v3"),
        s"got ${phys.toSeq}")
      assert(spark.table("graft_orph_t").count() == 70)
    } finally {
      Seq("graft_orph_t", "graft_orph_s").foreach { t =>
        if (spark.catalog.tableExists(t)) {
          if (spark.catalog.getTable(t).tableType == "VIEW")
            spark.sql(s"DROP VIEW $t")
          else spark.sql(s"DROP TABLE $t")
        }
      }
      spark.sql("SHOW TABLES LIKE 'graft_orph_*'").collect()
        .map(_.getString(1)).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("bucketed sync: diff join reads the bucketed state without an exchange") {
    import graft.sync.{DocHash, IncrementalSync}
    val dir = java.nio.file.Files.createTempDirectory("graft_bsync").toString
    def src(n: Int) = (1 to n)
      .map(i => (i.toString, s"name$i", (i % 7).toLong))
      .toDF("_id", "name", "grp")
    try {
      // bootstrap: bucketed target + state from the initial snapshot
      Bucketing.bucketedSave(src(300), "graft_bs_target", "_id", 4,
        Some(s"$dir/t"))
      Bucketing.bucketedSave(
        DocHash.withDocHash(src(300), "doc_hash")
          .select(col("_id"), col("doc_hash").as("hash")),
        "graft_bs_state", "_id", 4, Some(s"$dir/s"))
      // second snapshot: 30 new, 60 modified, 20 deleted
      val snap2 = src(330).filter(expr("CAST(_id AS INT) > 20"))
        .withColumn("name", when(expr("CAST(_id AS INT) % 5 = 0"),
          concat(col("name"), lit("_v2"))).otherwise(col("name")))
      val r = IncrementalSync.runBucketed(spark, snap2,
        "graft_bs_target", "graft_bs_state", 4)
      assert(r.newDocs == 30 && r.deleted == 20)
      assert(r.updated == 56 && r.unchanged == 224) // %5==0 among 21..300
      // post-state: target matches the snapshot exactly
      val tgt = spark.table("graft_bs_target")
      assert(tgt.count() == 310)
      assert(tgt.exceptAll(snap2).isEmpty && snap2.exceptAll(tgt).isEmpty)
      // and the table stayed bucketed: a self-rejoin of target and state
      // plans with NO exchange on either stored side
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_bs_target")
          .join(spark.table("graft_bs_state"), "_id")
        assert(Bucketing.isShuffleFree(j),
          s"expected no Exchange:\n${j.queryExecution.executedPlan}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // idempotent: replaying the same snapshot is all-unchanged
      val r2 = IncrementalSync.runBucketed(spark, snap2,
        "graft_bs_target", "graft_bs_state", 4)
      assert(r2.newDocs == 0 && r2.updated == 0 && r2.deleted == 0)
      assert(r2.unchanged == 310)
      // S16 drift: a snapshot gaining a column updates every row (the hash
      // covers it) and the new column lands in the bucketed target
      val snap3 = snap2.withColumn("score", expr("CAST(_id AS INT) % 3"))
      val r3 = IncrementalSync.runBucketed(spark, snap3,
        "graft_bs_target", "graft_bs_state", 4)
      assert(r3.updated == 310 && r3.newDocs == 0 && r3.deleted == 0)
      assert(spark.table("graft_bs_target").columns.contains("score"))

      // view-flip visibility: a reader hammering the table name THROUGHOUT
      // a full replace cycle never sees a missing relation (the DROP+RENAME
      // predecessor exposed a two-catalog-op window here)
      assert(spark.catalog.getTable("graft_bs_target").tableType == "VIEW")
      val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try { spark.table("graft_bs_target").count(): Unit }
          catch { case t: Throwable => failures.set(t); stop.set(true) }
        }
      })
      reader.start()
      try {
        val r4 = IncrementalSync.runBucketed(spark, snap3,
          "graft_bs_target", "graft_bs_state", 4)
        assert(r4.unchanged == 310)
      } finally { stop.set(true); reader.join(30000) }
      assert(failures.get() == null,
        s"concurrent reader failed during replace: ${failures.get()}")
      // previous version retained for in-flight readers, older ones reaped
      val phys = spark.sql("SHOW TABLES LIKE 'graft_bs_target__v*'")
        .collect().map(_.getString(1)).sorted
      assert(phys.length == 2, s"expected current+previous, got ${phys.toSeq}")
    } finally {
      Seq("graft_bs_target", "graft_bs_state").foreach { t =>
        if (spark.catalog.tableExists(t)) {
          if (spark.catalog.getTable(t).tableType == "VIEW")
            spark.sql(s"DROP VIEW $t")
          else spark.sql(s"DROP TABLE $t")
        }
      }
      spark.sql("SHOW TABLES LIKE 'graft_bs_*'").collect().map(_.getString(1))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
