package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Committed-batch compaction for the corpus-sized streaming stores
  * ([[StreamRepeats]] window/roster store, [[StreamDedup]] clean-corpus
  * store). Those stores land ONE parquet directory per committed
  * micro-batch — idempotent and 100 TB-safe per batch, but the read
  * fan-in (and the marker listing) grows linearly with batch count
  * forever. Compaction folds every committed-but-unfolded `batch=<id>`
  * directory (plus the previous base, if any) into a single
  * `base=<gen>` directory per sub-store, then retires the folded
  * per-batch directories and markers.
  *
  * Crash-safety mirrors the per-batch contract — the store is readable
  * and correct after a crash at ANY point:
  *  1. the new `base=<gen+1>` directories are written FIRST (an orphan
  *     half-written base is invisible: readers only follow the manifest);
  *  2. the manifest (`<prefix>_compact_<gen+1>.done`, carrying the full
  *     cumulative folded-id set) commits by temp-write + atomic rename —
  *     this is the single commit point;
  *  3. only after the manifest exists are folded batch directories, the
  *     old base, and folded batch markers deleted. A crash between 2 and
  *     3 leaves garbage that readers ignore and the next compaction
  *     retries.
  *
  * Replay stays a no-op across a compaction boundary: a folded batch's
  * marker may be gone, so [[isCommitted]] answers from marker OR
  * manifest folded-set — `applyBatch` must use it (both stores do).
  * Single-writer contract (same as the stores): compaction runs from the
  * stream's own maintenance turn (e.g. every K batches inside
  * foreachBatch), never concurrently with a landing batch.
  *
  * Metadata stays bounded: after compaction the state root holds one
  * manifest per generation (older manifests are deleted with the old
  * base) and one marker per UNfolded batch — not one file per batch ever
  * committed. */
object StoreCompaction {

  case class CompactResult(gen: Int, foldedNow: Long, foldedTotal: Long,
      skipped: Boolean)

  private def markerPath(stateRoot: String, prefix: String, id: Long) =
    new Path(stateRoot, s"${prefix}_$id.done")

  private def manifestPath(stateRoot: String, prefix: String, gen: Int) =
    new Path(stateRoot, s"${prefix}_compact_$gen.done")

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Committed batch ids with a live marker (manifest files and any other
    * non-numeric siblings are filtered by shape, not glob). */
  def markerIds(fs: FileSystem, stateRoot: String,
      prefix: String): Seq[Long] = {
    val re = s"^${java.util.regex.Pattern.quote(prefix)}_(\\d+)\\.done$$".r
    fs.globStatus(new Path(stateRoot, s"${prefix}_*.done")).toSeq
      .map(_.getPath.getName)
      .collect { case re(id) => id.toLong }
  }

  /** Latest committed compaction: (generation, cumulative folded ids). */
  def latestManifest(fs: FileSystem, stateRoot: String,
      prefix: String): Option[(Int, Set[Long])] = {
    val re =
      s"^${java.util.regex.Pattern.quote(prefix)}_compact_(\\d+)\\.done$$".r
    val gens = fs.globStatus(new Path(stateRoot, s"${prefix}_compact_*.done"))
      .toSeq.map(_.getPath.getName).collect { case re(g) => g.toInt }
    gens.sorted.lastOption.map { g =>
      val ids = readText(fs, manifestPath(stateRoot, prefix, g)).trim
      (g, if (ids.isEmpty) Set.empty[Long]
          else ids.split(",").map(_.toLong).toSet)
    }
  }

  /** Batch already landed? True from its marker OR from the manifest —
    * the replay-skip test every `applyBatch` must use, because compaction
    * retires folded markers. */
  def isCommitted(fs: FileSystem, stateRoot: String, prefix: String,
      batchId: Long): Boolean =
    fs.exists(markerPath(stateRoot, prefix, batchId)) ||
      latestManifest(fs, stateRoot, prefix).exists(_._2.contains(batchId))

  /** Reader view of the store: (base generation if one is committed,
    * committed-but-unfolded batch ids, ascending). */
  def view(fs: FileSystem, stateRoot: String,
      prefix: String): (Option[Int], Seq[Long]) = {
    val m = latestManifest(fs, stateRoot, prefix)
    val folded = m.map(_._2).getOrElse(Set.empty[Long])
    (m.map(_._1),
      markerIds(fs, stateRoot, prefix).filterNot(folded).sorted)
  }

  /** The parquet paths a reader of sub-store root `subRoot` must union. */
  def readPaths(subRoot: String, baseGen: Option[Int],
      tail: Seq[Long]): Seq[String] =
    baseGen.map(g => s"$subRoot/base=$g").toSeq ++
      tail.map(id => s"$subRoot/batch=$id")

  /** Fold every committed-but-unfolded batch (and the previous base) of
    * each sub-store under one new `base=<gen>`; commit the manifest; then
    * retire the folded directories and markers. No-op (skipped = true)
    * when nothing is unfolded. `fold` (applied to EACH sub-store's union —
    * callers with heterogeneous sub-stores leave it None) lets a
    * mergeable store pre-aggregate its base (e.g.
    * [[graft.scale.Dedup.mergeChunkMaps]]) so the base holds merged rows,
    * not concatenated history; it must be a no-op on already-folded input
    * (idempotent under re-fold), which any associative merge is. */
  def compact(spark: SparkSession, stateRoot: String, prefix: String,
      subRoots: Seq[String],
      fold: Option[DataFrame => DataFrame] = None): CompactResult = {
    require(subRoots.nonEmpty, "compact: no sub-stores given")
    val fs = new Path(stateRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = latestManifest(fs, stateRoot, prefix)
    val prevGen = m.map(_._1)
    val prevFolded = m.map(_._2).getOrElse(Set.empty[Long])
    val tail = markerIds(fs, stateRoot, prefix).filterNot(prevFolded).sorted
    if (tail.isEmpty)
      return CompactResult(prevGen.getOrElse(0), 0, prevFolded.size,
        skipped = true)
    val gen = prevGen.getOrElse(0) + 1
    // 1. fold each sub-store into its new base (overwrite heals any
    //    orphan from a previously crashed attempt at this generation)
    subRoots.foreach { root =>
      val unioned = spark.read.parquet(readPaths(root, prevGen, tail): _*)
      fold.fold(unioned)(f => f(unioned))
        .write.mode("overwrite").parquet(s"$root/base=$gen")
    }
    // 2. the commit point: manifest via temp-write + atomic rename
    val folded = prevFolded ++ tail
    val manifest = manifestPath(stateRoot, prefix, gen)
    val tmp = new Path(stateRoot, s"${prefix}_compact_$gen.tmp")
    val out = fs.create(tmp, true)
    try out.write(folded.toSeq.sorted.mkString(",")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(manifest)) fs.delete(manifest, false)
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(
        s"compaction manifest commit failed: $tmp -> $manifest")
    // 3. retire the folded inputs — failures here leave ignorable garbage
    subRoots.foreach { root =>
      tail.foreach(id =>
        fs.delete(new Path(s"$root/batch=$id"), true))
      prevGen.foreach(g => fs.delete(new Path(s"$root/base=$g"), true))
    }
    tail.foreach(id => fs.delete(markerPath(stateRoot, prefix, id), false))
    prevGen.foreach(g =>
      fs.delete(manifestPath(stateRoot, prefix, g), false))
    CompactResult(gen, tail.size, folded.size, skipped = false)
  }
}
