package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioning tools for the 100 TB paths (SURVEY §7.5): bucketed tables
  * for shuffle-free co-located joins, and key salting for skew. */
object Bucketing {

  /** Persist `df` as a bucketed+sorted catalog table. Two tables bucketed on
    * the same key with the same bucket count join WITHOUT a shuffle — the
    * sync diff (J1) between a bucketed state table and a bucketed target
    * becomes an exchange-free sort-merge join, which is the difference
    * between re-shuffling 100 TB per sync and streaming co-located buckets. */
  def bucketedSave(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Skew-safe equi-join: salt the (skewed) left side's key into `salt`
    * sub-keys and replicate each right row `salt` times, so one hot key
    * spreads over `salt` reducers. Correct for inner/left joins on the key
    * (each left row joins its exact replica partition). Use when a handful
    * of keys dominate and AQE's skew split isn't available (e.g. bucketed
    * inputs). */
  /** Join-key skew report — the sizing tool BEFORE reaching for
    * [[saltedJoin]] or AQE skew splits: the `topK` hottest keys with
    * exact basis-point share and a suggested salt factor
    * `ceil(share · tasks)` (how many task-sized slices the key needs at
    * `tasks`-way parallelism; 1 = no salting needed). One hash agg with
    * map-side partials + a TakeOrdered of `topK` rows — never a global
    * sort, nothing driver-resident beyond the report. */
  def skewReport(df: DataFrame, key: String, topK: Int = 10,
      tasks: Int = 32): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(tasks > 0, s"tasks must be positive: $tasks")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col(key), col("n_rows"),
        expr("(10000L * n_rows) div __t").as("share_bp"),
        expr(s"(n_rows * ${tasks}L + __t - 1L) div __t")
          .as("suggested_salts"))
      .orderBy(col("n_rows").desc, col(key).asc)
      .limit(topK)
  }

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    // the left salt MUST be deterministic in row CONTENT: a
    // nondeterministic expression (rand, monotonically_increasing_id)
    // inside a shuffle key is the SPARK-23207 correctness class — under a
    // fetch-failure stage retry the recomputed map task assigns DIFFERENT
    // salts than the lost attempt, and reducers that don't re-run lose or
    // duplicate rows. Hashing every column spreads a hot key's
    // distinct payloads across the salt space and replays identically on
    // retry; exact duplicate rows co-locating is the acceptable residue.
    // hash() rejects MapType at ANY nesting depth — detect recursively,
    // not just top-level map columns, and feed those columns to the salt
    // hash through their to_json rendering instead of DROPPING them: a
    // map-heavy schema must still spread its hot keys (dropping every
    // column would collapse the salt to hash(key) — one salt per key
    // value, a silent no-op for exactly the hot-key case salting exists
    // for). to_json of the same physical row replays identically on a
    // stage retry (deterministic upstream ⇒ identical map entry order),
    // which is the only property the salt needs.
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val saltSrc = left.schema.fields.toSeq.map { f =>
      if (hasMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }
    val sl = left.withColumn("__salt",
      pmod(hash(saltSrc: _*), lit(salt)))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    sl.join(sr, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Bloom-pruned semi-join: keep the `big` rows whose `bigKey` appears in
    * `keys.keysKey`, pruning with a bloom filter BEFORE the join's shuffle.
    *
    * The filter side aggregates to a fixed-size sketch (a distributed agg;
    * only ~`-2·n·ln(fpp)/ln(2)²` bits return to the driver), which then
    * rides into the scan as a codegen'd `might_contain` literal — so at
    * 100 TB the fact table drops to ~the dim predicate's selectivity before
    * any exchange, instead of shuffling in full and discarding rows at the
    * join. The exact left-semi join then removes the bloom's false
    * positives: the result is exactly the semi-join, the bloom only cuts
    * shuffle I/O. This is Spark's own runtime-filter pattern made explicit
    * (usable when AQE/DPP can't see the opportunity, e.g. keys from a
    * computed frame). Keys must be integral (the sketch stores longs).
    *
    * EAGER by nature: the sketch must exist before the plan can embed it,
    * so CONSTRUCTING this frame runs the key-side aggregation (like
    * `df.stat.*`) — an exception to the lazy-construction rule. `keys` is
    * evaluated again by the residual join; callers with an expensive key
    * frame should cache or [[Materialize]] it first. */
  def bloomPrunedSemiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
      keysKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    // enforce the integral-keys contract loudly: cast("long") maps a
    // fractional/unparseable key to null, might_contain(null) is null, and
    // matching rows would silently vanish before the exact residual join
    def requireIntegral(df: DataFrame, c: String): Unit = {
      val dt = df.schema(c).dataType
      require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
        s"bloomPrunedSemiJoin keys must be integral; '$c' is ${dt.typeName}")
    }
    requireIntegral(big, bigKey)
    requireIntegral(keys, keysKey)
    val bf = keys.stat.bloomFilter(keysKey, expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    big.filter(org.apache.spark.sql.graftbridge.Bridge.mightContain(
        bos.toByteArray, col(bigKey).cast("long")))
      .join(keys.select(col(keysKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** True when a physical plan string contains no shuffle exchange —
    * the assertion helper for co-located-join tests. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning")
  }
}
