package graft

import org.apache.spark.sql.functions._
import graft.io.StateStore
import graft.scale.Pq
import graft.streaming.StreamIndex

/** Streaming PQ-index maintenance: bootstrap trains the codebook once,
  * later batches only encode; idempotent replay; error log accumulates. */
class StreamIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("bootstrap trains once, later batches encode against the frozen " +
      "codebook, replay is a no-op, error log accumulates per batch") {
    val codes = tmp("graft_si_codes")
    val state = tmp("graft_si_state")
    val e = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val b0 = e.filter(col("vec_id") < 30)
    val b1 = e.filter(col("vec_id") >= 30 && col("vec_id") < 60)

    val r0 = StreamIndex.applyBatch(spark, b0, 0L, "vec_id", "embedding",
      codes, state)
    assert(r0.bootstrapped && !r0.replaySkipped)
    assert(r0.encoded == r0.received * 4) // m codes per vector
    assert(StateStore.versions(spark, s"$state/codebook") == Seq(1))

    val r1 = StreamIndex.applyBatch(spark, b1, 1L, "vec_id", "embedding",
      codes, state)
    assert(!r1.bootstrapped) // frozen codebook — no retrain
    assert(StateStore.versions(spark, s"$state/codebook") == Seq(1))

    // the appended batch equals a direct encode against the stored codebook
    val cb = StateStore.loadVersion(spark, s"$state/codebook", 1)
    val direct = Pq.encode(b1, cb, "vec_id", "embedding")
      .as[(Long, Int, Long)].collect().toSet
    val appended = spark.read.parquet(s"$codes/batch=1")
      .select("vec_id", "subspace", "code")
      .as[(Long, Int, Long)].collect().toSet
    assert(appended == direct)

    // replay short-circuits on the commit marker; the code table is stable
    val before = spark.read.parquet(codes).count()
    val r2 = StreamIndex.applyBatch(spark, b1, 1L, "vec_id", "embedding",
      codes, state)
    assert(r2.replaySkipped)
    assert(spark.read.parquet(codes).count() == before)

    // crash-window replay: marker lost after the writes — the overwrite
    // re-lands the identical directory (deterministic encode), never a
    // double append
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(state, "batch_1.done"), false)
    val r3 = StreamIndex.applyBatch(spark, b1, 1L, "vec_id", "embedding",
      codes, state)
    assert(!r3.replaySkipped)
    assert(spark.read.parquet(codes).count() == before)
    assert(spark.read.parquet(s"$codes/batch=1")
      .select("vec_id", "subspace", "code")
      .as[(Long, Int, Long)].collect().toSet == direct)

    // per-batch error log: one row per (batch, subspace), counts match
    val err = spark.read.parquet(s"$state/err")
      .select("batch_id", "subspace", "n")
      .as[(Long, Int, Long)].collect()
    assert(err.length == 8) // 2 batches × 4 subspaces
    assert(err.filter(_._1 == 0L).forall(_._3 == r0.received))
    assert(err.filter(_._1 == 1L).forall(_._3 == r1.received))
  }

  test("AvailableNow stream drains vector files into the index; a second " +
      "drain encodes only the new arrivals against the same codebook") {
    val src = tmp("graft_si_src")
    val codes = tmp("graft_si_codes2")
    val state = tmp("graft_si_state2")
    val ckpt = tmp("graft_si_ckpt")
    val e = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    e.filter(col("vec_id") < 40).write.mode("overwrite").parquet(src)
    StreamIndex.runAvailableNow(spark, src, "vec_id", "embedding",
      codes, state, ckpt)
    val n1 = spark.read.parquet(codes).count()
    assert(n1 == 40 * 4)
    assert(StateStore.versions(spark, s"$state/codebook") == Seq(1))
    // new files arrive; the resumed stream encodes ONLY them, against the
    // already-published codebook (no retrain, no history re-encode)
    e.filter(col("vec_id") >= 40 && col("vec_id") < 70)
      .write.mode("append").parquet(src)
    StreamIndex.runAvailableNow(spark, src, "vec_id", "embedding",
      codes, state, ckpt)
    assert(spark.read.parquet(codes).count() == 70 * 4)
    assert(StateStore.versions(spark, s"$state/codebook") == Seq(1))
    assert(spark.read.parquet(codes).select("vec_id").distinct().count() == 70)
  }
}
