package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1: document-collection sources. The reference pulls BSON documents from
  * MongoDB via the Mdbc driver (Analyze_scheme.ps1:51-62); the engine's
  * schema-on-read equivalents:
  *
  *  - JSON-lines: the universal document interchange shape — Spark infers a
  *    widened schema; the engine's own majority-vote profiler (P2/A3) then
  *    refines it statistically.
  *  - Parquet: the testdata shape.
  *  - MongoDB: the `mongodb` Spark connector exposes collections with the
  *    same `spark.read.format("mongodb")` contract; it is not present in
  *    this container's jars, so `mongo()` fails fast with a clear message
  *    rather than silently degrading.
  */
object DocumentSource {

  def jsonLines(spark: SparkSession, path: String,
      sampleRatio: Double = 1.0): DataFrame =
    spark.read
      .option("samplingRatio", sampleRatio.toString)
      .option("primitivesAsString", "false")
      .json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def mongo(spark: SparkSession, uri: String, database: String,
      collection: String): DataFrame = {
    val connectorOnClasspath =
      try { Class.forName("com.mongodb.spark.sql.connector.MongoTableProvider"); true }
      catch { case _: ClassNotFoundException => false }
    val available = connectorOnClasspath ||
      spark.sessionState.conf.getAllConfs.keys.exists(_.startsWith("spark.mongodb"))
    require(available,
      "mongodb Spark connector not on the classpath; add " +
        "org.mongodb.spark:mongo-spark-connector to use a live MongoDB source")
    spark.read.format("mongodb")
      .option("connection.uri", uri)
      .option("database", database)
      .option("collection", collection)
      .load()
  }
}
