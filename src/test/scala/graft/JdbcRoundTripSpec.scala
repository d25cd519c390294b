package graft

import java.util.Properties

import graft.io.{JdbcSink, Sinks}

/** REAL JDBC round trip against embedded Derby (ships on the Spark
  * classpath): batched executor write, read-back, the S10 upsert shape on a
  * JDBC target (merge computed in Spark, keyed REPLACE semantics,
  * overwritten back — never one statement per row), and the S20 probe.
  * MySQL/SQL Server differ only in URL/props/DDL strings, which IoSpec
  * pins; the wire machinery exercised here is the same `DataFrameWriter
  * .jdbc` path. */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("jdbc: batched write, Spark-side keyed upsert, read-back, probe") {
    val base = Seq(("1", "a", 10L), ("2", "b", 20L)).toDF("_id", "name", "v")
    base.write.mode("overwrite").jdbc(url, "t_rt", props)
    val target = spark.read.jdbc(url, "t_rt", props)
    assert(target.count() == 2)

    // REPLACE INTO semantics on a JDBC target: merge in Spark, write back
    // (materialized first — the overwrite drops the table being read)
    val updates = Seq(("2", "B", 25L), ("3", "c", 30L)).toDF("_id", "name", "v")
    val merged = Sinks.upsert(target, updates, "_id")
    val rows = merged.collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), merged.schema)
      .write.mode("overwrite").jdbc(url, "t_rt", props)

    val after = spark.read.jdbc(url, "t_rt", props)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after == Map(
      "1" -> (("a", 10L)),   // untouched
      "2" -> (("B", 25L)),   // replaced
      "3" -> (("c", 30L))))  // inserted

    assert(JdbcSink.probe(spark, url, props, "(VALUES 1) AS probe(ok)"))
    assert(!JdbcSink.probe(spark, "jdbc:derby:memory:absent", props,
      "(VALUES 1) AS probe(ok)"))
  }
}
