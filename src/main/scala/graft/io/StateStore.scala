package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S18: sync-state persistence.
  *
  * The reference keeps `sync_state_{table}.json` = `{LastSyncTime,
  * DocumentHashes: {id → md5}}` as a single driver-loaded JSON file
  * (Sync.ps1:296-349). That id→hash map is O(collection) — at 100 TB it is a
  * *table*, so here state is a parquet table `(_id string, hash string)`
  * written through [[Sinks.atomicOverwrite]]; `LastSyncTime` (recorded but
  * never used for filtering in the reference — Sync.ps1:67) is file metadata.
  */
object StateStore {
  val schema: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("hash", StringType)))

  /** Zero-row state frame with the canonical `(_id, hash)` schema (first
    * sync — nothing persisted yet). */
  def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def load(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) spark.read.parquet(path)
    else emptyState(spark)
  }

  def save(spark: SparkSession, state: DataFrame, path: String): Unit =
    Sinks.atomicOverwrite(spark,
      state.select(col("_id").cast("string"), col("hash").cast("string")), path)
}
