package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md) plus the
  * document-shaped migration input derived from it (FIXTURES.md §2): `orders`
  * rows nested with a `customer` object and a `lineitems` array, mirroring the
  * MongoDB document collections the reference migrates
  * (reference: private/Analyze_scheme.ps1:51-62 materializes such documents).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // `events.ts` arrives in whatever physical form the fixture writer chose:
    // TIMESTAMP(NANOS) surfaces as a nanosecond long (under
    // spark.sql.legacy.parquet.nanosAsLong=true, set by the session builders)
    // and naive TIMESTAMP(MICROS) surfaces as TIMESTAMP_NTZ under default
    // inference. Normalize both to the session-zone TIMESTAMP the engine's
    // watermarks/interval math expect (UTC session tz makes the NTZ cast
    // value-preserving).
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        // integral division — long/1000 via `/` goes through double, whose
        // 2^53 mantissa cannot represent epoch nanos exactly (±256 ns)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // interpret the naive fixture value as UTC under ANY session
        // timezone: the implicit NTZ→TIMESTAMP cast reads the naive value
        // in the session zone and to_utc_timestamp(…, sessionTz) inverts
        // exactly that rendering — the two session-zone uses cancel, so a
        // foreign non-UTC session no longer shifts the instant (a bare
        // cast is value-preserving only when the session zone is UTC).
        // Known residual edge: a wall-clock that is NONEXISTENT in the
        // session zone (a DST spring-forward gap) is resolved by the cast
        // before the inverse applies, shifting that row by the gap width;
        // sessions built by EngineSession pin UTC (no DST), so this only
        // concerns foreign DST-zone sessions feeding gap timestamps.
        df.withColumn("ts", to_utc_timestamp(col("ts"),
          spark.conf.get("spark.sql.session.timeZone")))
      case _ => df
    }
  }

  /** Document collection: one document per order.
    *
    * {{{
    * { _id: "<o_orderkey>",          // stringified key, reference forces _id VARCHAR(24)
    *   o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
    *   customer:  { c_name, c_acctbal, c_mktsegment },            // nested object
    *   lineitems: [ { l_linenumber, l_partkey, l_quantity,
    *                  l_extendedprice, l_returnflag }, ... ],     // array of objects
    *   tags:      [ o_orderstatus, o_orderpriority ] }            // array of primitives
    * }}}
    *
    * `lineitems` is sorted by `l_linenumber` (struct comparison is
    * field-order lexicographic and `l_linenumber` leads) so that array
    * positions — and hence `array_index` after [[graft.decompose.Decomposer]]'s
    * posexplode — are deterministic. The aggregation is a single hash
    * aggregate keyed on the join key; at 100 TB the `lineitem` → `orders`
    * join shuffles both sides on the order key once and reuses that
    * partitioning for the array build.
    */
  /** Fail-loud document-nesting guard (SCALE.md "Known costs"): with a cap
    * configured, a join key whose group would nest more than `cap` child
    * rows raises with the OFFENDING KEY before the array aggregation ever
    * buffers it — the guard is a count-only hash aggregate (constant
    * memory per key, partial-agg friendly) whose raise_error sits inside
    * the semi-join KEY itself, so column pruning can never elide it. A
    * pathological mega-document therefore names itself instead of OOMing
    * the executor holding its collect_list state. None (the default)
    * keeps the unguarded plan byte-identical. */
  private def guardFanout(child: DataFrame, key: String, cap: Option[Int],
      who: String): DataFrame =
    cap.fold(child) { c =>
      require(c > 0, s"$who: nesting cap must be positive: $c")
      val checked = child.groupBy(col(key))
        .agg(count(lit(1)).as("__n"))
        .select(when(col("__n") > c, raise_error(concat(
            lit(s"$who: key "), col(key).cast("string"),
            lit(" nests "), col("__n").cast("string"),
            lit(s" child rows (cap $c); raise the cap or split the document"))))
          .otherwise(col(key)).as(key))
      child.join(checked, Seq(key), "left_semi")
    }

  /** Second document collection (different shape, exercises profiler/
    * decomposer genericity): one document per customer with a nested
    * `nation` object and an `orders` array sorted by `o_orderkey`. */
  def customerDocs(spark: SparkSession, sfDir: String,
      maxNestedPerKey: Option[Int] = None): DataFrame = {
    val customer = load(spark, sfDir, "customer")
    val nation = load(spark, sfDir, "nation")
    val orders = guardFanout(load(spark, sfDir, "orders"), "o_custkey",
      maxNestedPerKey, "customerDocs")
    val ords = orders.groupBy(col("o_custkey"))
      .agg(array_sort(collect_list(struct(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))).as("orders"))
    customer
      .join(nation, customer("c_nationkey") === nation("n_nationkey"), "left")
      .join(ords, customer("c_custkey") === ords("o_custkey"), "left")
      .select(
        customer("c_custkey").cast("string").as("_id"),
        customer("c_name"), customer("c_acctbal"), customer("c_mktsegment"),
        struct(nation("n_name"), nation("n_regionkey")).as("nation"),
        col("orders"))
  }

  def orderDocs(spark: SparkSession, sfDir: String): DataFrame =
    orderDocsWhere(spark, sfDir, _ => lit(true))

  /** [[orderDocs]] restricted to orders whose key satisfies `keyPred`. The
    * predicate is applied to BOTH the orders scan and the lineitem scan
    * (`l_orderkey` is the same key), so building a document SUBSET costs a
    * subset's work — the `collect_list` aggregation never processes dropped
    * orders' lineitems, which a post-construction filter could not avoid
    * (no pushdown reaches through the aggregation side of the join). */
  def orderDocsWhere(spark: SparkSession, sfDir: String,
      keyPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      maxNestedPerKey: Option[Int] = None): DataFrame = {
    val orders = load(spark, sfDir, "orders").filter(keyPred(col("o_orderkey")))
    val customer = load(spark, sfDir, "customer")
    val lineitem = guardFanout(
      load(spark, sfDir, "lineitem").filter(keyPred(col("l_orderkey"))),
      "l_orderkey", maxNestedPerKey, "orderDocs")
    val items = lineitem
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(
        col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag")))).as("lineitems"))
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .join(items, orders("o_orderkey") === items("l_orderkey"), "left")
      .select(
        orders("o_orderkey").cast("string").as("_id"),
        orders("o_custkey"), orders("o_orderstatus"), orders("o_totalprice"),
        orders("o_orderdate"), orders("o_orderpriority"),
        struct(customer("c_name"), customer("c_acctbal"),
          customer("c_mktsegment")).as("customer"),
        col("lineitems"),
        array(orders("o_orderstatus"), orders("o_orderpriority")).as("tags"))
  }
}
