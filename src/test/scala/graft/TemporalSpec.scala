package graft

import org.apache.spark.sql.functions._
import graft.scale.Temporal

/** As-of and bucketed range join semantics on handcrafted frames. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // (key, ts, quote_id, px)
    (1L, "2024-01-01 10:00:00", 100L, 1.0),
    (1L, "2024-01-01 10:05:00", 101L, 2.0),
    (2L, "2024-01-01 10:03:00", 200L, 9.0)
  ).toDF("k", "t", "quote_id", "px")
    .select($"k", to_timestamp($"t").as("t"), $"quote_id", $"px")

  private val trades = Seq(
    (1L, "2024-01-01 09:59:00", 1L), // before any quote → null match
    (1L, "2024-01-01 10:05:00", 2L), // equal ts → inclusive match (101)
    (1L, "2024-01-01 10:04:59", 3L), // strictly between → earlier quote (100)
    (2L, "2024-01-01 11:00:00", 4L), // other key → its own quote (200)
    (3L, "2024-01-01 10:00:00", 5L)  // key with no quotes → null
  ).toDF("k", "t", "trade_id")
    .select($"k", to_timestamp($"t").as("t"), $"trade_id")

  test("asOfJoin: backward inclusive match per key, null when nothing precedes") {
    val out = Temporal.asOfJoin(trades, quotes, "k", "t", Seq("quote_id", "px"))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(1L -> None, 2L -> Some(101L), 3L -> Some(100L),
      4L -> Some(200L), 5L -> None))
    // output keeps every left row and all its columns
    val cols = Temporal.asOfJoin(trades, quotes, "k", "t", Seq("quote_id", "px")).columns
    assert(cols.toSeq == Seq("k", "t", "trade_id", "quote_id", "px"))
  }

  test("asOfJoin: equal-ts right duplicates resolve deterministically (max payload)") {
    val dupQuotes = quotes.unionByName(
      Seq((1L, "2024-01-01 10:05:00", 102L, 3.0)).toDF("k", "t", "quote_id", "px")
        .select($"k", to_timestamp($"t").as("t"), $"quote_id", $"px"))
    val got = Temporal.asOfJoin(trades.filter($"trade_id" === 2L), dupQuotes,
      "k", "t", Seq("quote_id", "px"))
      .select($"quote_id").as[Long].head()
    assert(got == 102L)
  }

  private val intervals = Seq(
    // i1 spans a 1-hour bin boundary (10:30 → 11:30)
    (1L, 10L, "2024-01-01 10:30:00", "2024-01-01 11:30:00"),
    (2L, 20L, "2024-01-01 10:00:00", "2024-01-01 10:10:00")
  ).toDF("int_id", "k", "s", "e")
    .select($"int_id", $"k", to_timestamp($"s").as("s"), to_timestamp($"e").as("e"))

  private val points = Seq(
    (1L, 10L, "2024-01-01 10:45:00"), // in i1, first bin
    (2L, 10L, "2024-01-01 11:15:00"), // in i1, second bin
    (3L, 10L, "2024-01-01 11:30:00"), // at i1 end → inclusive
    (4L, 10L, "2024-01-01 11:31:00"), // past i1 end, same bin → residual drops
    (5L, 20L, "2024-01-01 10:05:00"), // in i2
    (6L, 10L, "2024-01-01 10:05:00")  // right key, before i1
  ).toDF("pid", "k", "t")
    .select($"pid", $"k", to_timestamp($"t").as("t"))

  test("rangeJoin: bin-bucketed matches equal exact BETWEEN, each pair once") {
    val out = Temporal.rangeJoin(intervals, points, "k", "s", "e", "t",
      binMicros = 3600L * 1000000)
      .select($"int_id", $"pid").as[(Long, Long)].collect().toSeq
    assert(out.sorted == Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 5L)))
    // pair uniqueness even though i1 was exploded into two bins
    assert(out.distinct.size == out.size)
  }

  test("scd2: change-only versions, chained [from,to) intervals, one " +
      "current row per key, point-in-time reconstruction") {
    val changes = Seq(
      // user 1: A A B B A  -> versions A@1, B@3, A@5
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "B"),
      (1L, 5L, "A"),
      // user 2: single state -> one open version
      (2L, 1L, "X"),
      // user 3: tie timestamps break on the tie column (id 7 then 8)
      (3L, 1L, "P"), (3L, 1L, "Q")
    ).zipWithIndex.map { case ((u, t, a), i) => (u, t, i.toLong + 1, a) }
      .toDF("k", "tsec", "id", "attr")
      .select($"k", timestamp_seconds($"tsec").as("ts"), $"id", $"attr")
    val out = Temporal.scd2(changes, "k", "ts", "id", "attr")
      .select($"k", $"version", $"attr",
        unix_seconds($"effective_from").as("from_s"),
        unix_seconds($"effective_to").as("to_s"), $"is_current")
      .as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(out(1L).map(v => (v._2, v._3, v._4, v._5)) ==
      Seq((1L, "A", 1L, Some(3L)), (2L, "B", 3L, Some(5L)),
        (3L, "A", 5L, None)))
    assert(out(2L) == Seq((2L, 1L, "X", 1L, None, true)))
    // tie order: id 7 (P) precedes id 8 (Q) at the same ts → P closes AT
    // the same instant Q opens (zero-width version, still recorded)
    assert(out(3L).map(v => (v._3, v._4, v._5)) ==
      Seq(("P", 1L, Some(1L)), ("Q", 1L, None)))
    // invariants over all keys: versions contiguous from 1, intervals
    // chain exactly, exactly one open+current row per key, no two
    // consecutive versions share the attribute
    out.foreach { case (k, vs) =>
      assert(vs.map(_._2) == (1L to vs.size).toSeq, s"key $k versions")
      vs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"key $k interval chain")
          assert(a._3 != b._3, s"key $k consecutive duplicate attr")
        case _ =>
      }
      assert(vs.count(_._6) == 1 && vs.last._6 && vs.last._5.isEmpty)
    }
    // point-in-time: state at t=4 for user 1 is the version with
    // from <= 4 < to → B
    val at4 = out(1L).filter(v => v._4 <= 4L && v._5.forall(_ > 4L))
    assert(at4.map(_._3) == Seq("B"))
    // a null attribute fails loudly instead of silently vanishing
    // through the null-propagating collapse predicate
    val withNull = Seq((1L, 1L, 1L, Some("A")), (1L, 2L, 2L, None))
      .toDF("k", "tsec", "id", "attr")
      .select($"k", timestamp_seconds($"tsec").as("ts"), $"id", $"attr")
    val e = intercept[Exception] {
      Temporal.scd2(withNull, "k", "ts", "id", "attr").collect()
    }
    assert(e.getMessage != null)
  }
}
