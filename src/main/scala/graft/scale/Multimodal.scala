package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata structs, plus a batched decode/feature
  * pipeline whose Spark-side shape (schema, partitioning, batch iteration)
  * is real while the codec itself is a STUB — the image/audio libraries are
  * not in this container, so the decoder is a clearly-marked deterministic
  * fake keyed on the payload bytes.
  */
object Multimodal {

  /** Wrap a text corpus as a multimodal table: payload = UTF-8 bytes (stand-in
    * for image/audio bytes), metadata = typed struct. Establishes the schema
    * contract: (id, payload binary, meta struct<modality,source,n_bytes>). */
  def asMultimodal(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text").as("modality"),
        col(sourceCol).as("source"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** Cheap payload features computable without a codec: byte length and
    * content digest — all built-ins, no UDF. */
  def payloadFeatures(mm: DataFrame): DataFrame =
    mm.select(
      col("id"),
      col("meta.modality").as("modality"),
      col("meta.source").as("source"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_hash"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB DECODER — deterministic fake standing in for a real image decode
    * (e.g. JPEG → RGB → resize → embed). A real deployment replaces
    * `fakeDecode` with the codec call; everything around it — the
    * mapPartitions batching (one decoder init per partition, the Scala
    * analogue of a Pandas-UDF batch), the output schema, the row shape — is
    * the production plumbing and is tested. */
  def decodePayloads(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    val rows: Dataset[Row] = mm.select(col("id").cast("long"), col("payload"))
    val rdd = rows.rdd.mapPartitions { it =>
      // per-partition "decoder" init happens here (once, not per row)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, feats) = fakeDecode(bytes)
        Row(id, w, h, feats)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** The stub: derives a fake (width, height, 4-dim feature vector) purely
    * from the byte content — deterministic, so tests can assert on it.
    * ??? in spirit; a real codec goes here. */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Seq[Float]) = {
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    val w = (n % 640) + 1
    val h = (sum % 480).toInt + 1
    val feats = Seq(n.toFloat, sum.toFloat, (sum % 255).toFloat,
      (if (n > 0) sum.toFloat / n else 0f))
    (w, h, feats)
  }

  /** Resize stand-in (nearest-neighbor over the byte axis): produce a new
    * `targetBytes`-byte payload whose i-th byte is the source byte at
    * `floor((i-1)·n/target)` — the codec-free analogue of image resize,
    * demonstrating payload→payload transforms (including the binary
    * reconstruction via hex/unhex, byte-safe for arbitrary blobs) with
    * built-ins only; the metadata struct's `n_bytes` tracks the new
    * payload. Empty payloads pass through unchanged. A real deployment
    * swaps this for the codec's resampler inside [[decodePayloads]]'
    * batched loop. */
  def resizePayload(mm: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val n = octet_length(col("payload"))
    // (i-1)·n in LONG: 32-bit arithmetic overflows (ANSI error / negative
    // index) once n exceeds ~Int.MaxValue/targetBytes — ~134 MB at 16
    val resized = unhex(concat_ws("",
      transform(sequence(lit(1), lit(targetBytes)), i =>
        hex(substring(col("payload"),
          floor((i - 1).cast("long") * n / lit(targetBytes)).cast("int") + 1,
          lit(1))))))
    mm.select(col("id"),
      when(n > 0, resized).otherwise(col("payload")).as("payload"),
      struct(
        col("meta.modality").as("modality"),
        col("meta.source").as("source"),
        when(n > 0, lit(targetBytes.toLong)).otherwise(lit(0L)).as("n_bytes"))
        .as("meta"))
  }

  /** Chunk-level content fingerprints: split the payload into fixed
    * `chunkBytes` windows (byte-based `substring` on binary) and MD5 each —
    * the storage-dedup signature that catches re-containered or partially
    * edited media a single whole-file hash misses. One row per
    * (id, chunk_idx, chunk_hash); empty payloads yield no rows. Per-row
    * explode, no shuffle. */
  def chunkFingerprints(mm: DataFrame, chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive: $chunkBytes")
    val n = octet_length(col("payload")).cast("long")
    val nChunks = floor((n + chunkBytes - 1) / chunkBytes).cast("int")
    mm.select(col("id"), col("payload"),
      explode(when(n > 0, sequence(lit(1), nChunks))
        .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("id"), (col("i") - 1).cast("long").as("chunk_idx"),
        md5(substring(col("payload"),
          (col("i") - 1) * chunkBytes + 1, lit(chunkBytes))).as("chunk_hash"))
  }

  /** Content-defined chunking (windowed Rabin fingerprinting, the storage
    * -dedup boundary rule): a chunk boundary falls at byte position `i`
    * when the polynomial hash of the trailing 16-byte window masks to
    * zero — so boundaries move WITH the content: after an insertion,
    * every boundary more than a window past the edit sits at the same
    * CONTENT position (shifted, not destroyed), and downstream chunk
    * hashes re-align, where [[chunkFingerprints]]' fixed windows shift
    * forever and share nothing after the edit (MultimodalSpec measures
    * exactly this). Average chunk ≈ 2^`maskBits` bytes; a forced cut
    * closes the final partial chunk.
    *
    * All int64: `h_i = Horner_{k=15..0}(33, mix(b_{i−k})) mod 2³¹` with
    * `mix(b) = b·2654435761 mod 2³¹` — a FIXED-WIDTH window hash, not a
    * sequential reset-state recurrence, deliberately: it computes as 16
    * `lag`s over one per-byte window (the dHash byte-row shape — no
    * per-element lambda re-evaluating an O(n) transform, and no foldl
    * the oracle engine would have to replay statefully; DuckDB 1.0's
    * `list_reduce` silently corrupts list-typed accumulators under
    * vectorized batches, verified per-row-correct/batch-wrong).
    *
    * Scale shape: payloads are pre-split into `segBytes` SEGMENTS with a
    * window−1 (15-byte) overlap, so the per-byte window partitions by
    * (id, seg) — parallelism scales with total bytes, not #payloads, and
    * no single task ever materializes a whole payload's byte rows (the
    * fixed-width window is what makes the overlap trick exact: every
    * boundary hash reads only the 15 bytes before its position, so a
    * segment that also READS its predecessor's last 15 bytes — while
    * OWNING only its own positions — reproduces the unsplit hashes
    * bit-for-bit; MultimodalSpec proves split == unsplit). One segment
    * explode + one byte explode + one (id, seg)-keyed window + one
    * cut-rows-only id agg. Empty payloads yield no rows. A payload whose
    * cut count exceeds `maxChunks` fails loud with its id — the per-key
    * cuts array is the one per-id reduction left, and a pathological
    * mega-payload should name itself, not OOM an executor. */
  def cdcChunks(mm: DataFrame, maskBits: Int = 6,
      segBytes: Int = 1 << 20, maxChunks: Int = 1 << 20): DataFrame = {
    require(maskBits >= 1 && maskBits <= 20,
      s"maskBits out of [1, 20]: $maskBits")
    require(segBytes >= 16, s"segBytes must be >= 16: $segBytes")
    require(maxChunks >= 1, s"maxChunks must be positive: $maxChunks")
    val M = 2147483648L // 2^31
    val mask = 1L << maskBits
    val L = segBytes.toLong
    val n = octet_length(col("payload")).cast("long")
    val base = mm.filter(n > 0)
      .select(col("id").as("__cdc_id"), col("payload"), n.as("__cdc_n"))
    // segment seg OWNS positions (seg·L, (seg+1)·L] and additionally
    // reads the 15 bytes before its first owned position (exact overlap)
    val rows = base
      .select(col("__cdc_id"), col("payload"), col("__cdc_n"),
        explode(sequence(lit(0L),
          floor((col("__cdc_n") - 1L) / L).cast("long"))).as("__cdc_seg"))
      .select(col("__cdc_id"), col("__cdc_seg"), col("payload"),
        explode(sequence(
          greatest(lit(1L), col("__cdc_seg") * L - 14L),
          least(col("__cdc_n"), (col("__cdc_seg") + 1L) * L)))
          .as("__cdc_pos"))
      .select(col("__cdc_id"), col("__cdc_seg"), col("__cdc_pos"),
        ((conv(hex(substring(col("payload"), col("__cdc_pos").cast("int"),
          lit(1))), 16, 10).cast("long") * 2654435761L) % M).as("__cdc_v"))
    val w = Window.partitionBy("__cdc_id", "__cdc_seg").orderBy("__cdc_pos")
    val h = (15 to 0 by -1).map(k => lag(col("__cdc_v"), k).over(w))
      .reduce((acc, x) => (acc * 33L + x) % M)
    // overlap rows exist only to feed owned positions' lags: a cut may
    // fire only at a position the segment owns (h is null inside seg 0's
    // first 15 positions — fewer than 16 lags — and the pos >= 16 guard
    // covers the rest)
    val cut = col("__cdc_pos") > col("__cdc_seg") * L &&
      col("__cdc_pos") >= 16L && h % mask === 0L
    val cuts = rows
      .withColumn("__cdc_cut", when(cut, col("__cdc_pos")))
      .filter(col("__cdc_cut").isNotNull)
      .groupBy(col("__cdc_id"))
      .agg(sort_array(collect_list(col("__cdc_cut"))).as("__cdc_cuts"))
    // forced final cut at n (unless a content cut already landed there);
    // cut-less payloads re-enter via the left join (one whole-payload chunk)
    val ends = base
      .join(cuts, Seq("__cdc_id"), "left_outer")
      .select(col("__cdc_id").as("id"), col("payload"),
        when(coalesce(size(col("__cdc_cuts")), lit(0)) > maxChunks,
          raise_error(concat(
            lit(s"cdcChunks: payload "), col("__cdc_id").cast("string"),
            lit(s" produced more than $maxChunks cuts; raise maskBits" +
              " or maxChunks"))))
        .when(col("__cdc_cuts").isNotNull
            && element_at(col("__cdc_cuts"), -1) === col("__cdc_n"),
          col("__cdc_cuts"))
        .otherwise(concat(
          coalesce(col("__cdc_cuts"), array().cast("array<long>")),
          array(col("__cdc_n"))))
        .as("__cdc_ends"))
    ends
      .select(col("id"), col("payload"), col("__cdc_ends"),
        posexplode(col("__cdc_ends")))
      // previous end from the ends array itself: `pos` is the 0-based
      // chunk index and element_at is 1-based, so ends[pos] IS the
      // previous chunk's end position
      .withColumn("start_pos",
        when(col("pos") === 0, lit(1L))
          .otherwise(element_at(col("__cdc_ends"), col("pos").cast("int"))
            + 1L))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("start_pos"),
        (col("col") - col("start_pos") + 1L).as("chunk_len"),
        md5(substring(col("payload"), col("start_pos").cast("int"),
          (col("col") - col("start_pos") + 1L).cast("int")))
          .as("chunk_hash"))
  }

  /** Chunk-overlap near-duplicate candidates: pairs of payloads sharing at
    * least `minFracBp`/10000 of the smaller side's distinct chunks. The
    * pair join is keyed on `chunk_hash` — bucketed, never all-pairs — and
    * chunks appearing in more than `maxDocFreq` payloads are dropped first:
    * a chunk shared by k docs would emit k² pairs, and a that-common chunk
    * is boilerplate (container headers, padding), not identity. Overlap is
    * measured against the FULL distinct-chunk counts (`na`/`nb`), so docs
    * related only through dropped boilerplate do not pair. Integer-exact
    * threshold arithmetic — engine-portable. */
  def chunkDedupPairs(mm: DataFrame, chunkBytes: Int, minFracBp: Int,
      maxDocFreq: Int): DataFrame =
    pairsFromFingerprints(chunkFingerprints(mm, chunkBytes),
      minFracBp, maxDocFreq)

  /** [[chunkDedupPairs]] over ANY (id, chunk_hash) fingerprint frame —
    * the seam that lets content-defined chunks ([[cdcChunks]]) feed the
    * same overlap machinery: CDC fingerprints pair INSERTION-edited
    * near-copies that fixed-window chunks structurally cannot
    * (their hashes all shift at the edit; ScaleSpec demonstrates). */
  def pairsFromFingerprints(fingerprints: DataFrame, minFracBp: Int,
      maxDocFreq: Int): DataFrame = {
    require(minFracBp > 0 && minFracBp <= 10000,
      s"minFracBp out of (0, 10000]: $minFracBp")
    require(maxDocFreq > 0, s"maxDocFreq must be positive: $maxDocFreq")
    val fp = fingerprints
      .select(col("id"), col("chunk_hash")).distinct()
    val counts = fp.groupBy("id").agg(count(lit(1)).as("n_chunks"))
    val hot = fp.groupBy("chunk_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select("chunk_hash")
    val kept = fp.join(hot, Seq("chunk_hash"), "left_anti")
    val pairs = kept.select(col("chunk_hash"), col("id").as("a"))
      .join(kept.select(col("chunk_hash"), col("id").as("b")), Seq("chunk_hash"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
    pairs
      .join(counts.select(col("id").as("a"), col("n_chunks").as("na")), Seq("a"))
      .join(counts.select(col("id").as("b"), col("n_chunks").as("nb")), Seq("b"))
      .filter(col("shared") * 10000 >= least(col("na"), col("nb")) * minFracBp)
      .select("a", "b", "shared", "na", "nb")
  }

  /** dHash-style PERCEPTUAL signature over the payload's canonical byte
    * grid: the payload is average-pooled into `bits`+1 equal byte blocks
    * (the codec-free analogue of dHash's grayscale resize) and bit i is
    * the sign of the gradient between blocks i and i+1. Robust to
    * re-encoding that preserves the coarse byte profile — in particular a
    * [[resizePayload]] re-encode keeps block means approximately equal,
    * so original and re-encoded payloads land within a small Hamming
    * radius, where [[chunkFingerprints]]-based dedup (exact bytes) sees
    * nothing. Block means are compared by INTEGER cross-multiplication
    * (sum_i·cnt_j vs sum_j·cnt_i) — no division, no float, so any engine
    * derives the identical signature (block index math is exact:
    * i·n ≤ 61·2³¹ ≪ 2⁵³). Empty payloads hash to 0 (they pair only with
    * each other, at distance 0). `bits` ≤ 60 keeps the signature clear of
    * the int64 sign bit, the [[Similarity.srpSignature]] convention.
    *
    * A real deployment computes this inside [[decodePayloads]]' batched
    * codec loop over decoded pixels; the byte-grid stand-in exercises the
    * identical downstream banding/pairing machinery. */
  def dHash(mm: DataFrame, idCol: String, payloadCol: String,
      outCol: String, bits: Int = 60): DataFrame = {
    require(bits >= 1 && bits <= 60, s"bits out of [1, 60]: $bits")
    val g = bits + 1
    // Shuffle-based block sums — one row PER BYTE, two hash aggregations
    // — instead of per-row array lambdas: both an inlined expression AND
    // a staged-withColumn form re-evaluate the O(n) byte transform once
    // per block (CollapseProject collapses a once-referenced alias into
    // the consuming transform lambda, and lambda bodies re-evaluate per
    // element — the round-2 lesson; the first cut here cost 123 s at
    // sf0.1, this shape costs ~2 s). The explode factor is bytes/payload
    // — the same scale shape as every tokenizer/n-gram operator.
    val pl = mm.select(col(idCol).as("__dh_id"),
      col(payloadCol).as("__dh_pl"))
    val nCol = octet_length(col("__dh_pl")).cast("long")
    // byte j (1-based) belongs to block floor((j·g − 1)/n) — the exact
    // inverse of the oracle's [floor(b·n/g), floor((b+1)·n/g)) windows
    val occ = pl
      .select(col("__dh_id"), col("__dh_pl"), nCol.as("__dh_n"),
        explode(sequence(lit(1L), greatest(nCol, lit(1L)))).as("__dh_j"))
      .filter(col("__dh_n") > 0)
      .select(col("__dh_id"),
        floor((col("__dh_j") * g - 1) / col("__dh_n")).cast("int")
          .as("__dh_b"),
        conv(hex(substring(col("__dh_pl"), col("__dh_j").cast("int"),
          lit(1))), 16, 10).cast("long").as("__dh_v"))
    val blocks = occ.groupBy("__dh_id", "__dh_b")
      .agg(sum(col("__dh_v")).as("s"), count(lit(1)).as("c"))
    val packed = blocks.groupBy("__dh_id")
      .agg(map_from_arrays(collect_list(col("__dh_b")),
        collect_list(struct(col("s"), col("c")))).as("__dh_m"))
    val zero = struct(lit(0L).as("s"), lit(0L).as("c"))
    // the cross-multiplication runs in DECIMAL: in int64, s ≈ 255·n/g
    // times c ≈ n/g overflows for small `bits` on large payloads (e.g.
    // bits = 1 at ~400 MB), silently flipping signature bits. Bounds:
    // s ≤ 255·2³¹, c ≤ 2³¹ → product ≤ ~1.2·10²¹ (22 digits), exact in
    // decimal(38,0); the 60-bit oracle instantiation never overflows
    // int64 (n/61 would need to exceed 1.9·10⁸), so the DuckDB BIGINT
    // product stays equal — and DuckDB errors loudly on overflow anyway.
    def dec(c: Column): Column = c.cast("decimal(20,0)")
    val sig = (0 until bits).map { i =>
      val a = coalesce(element_at(col("__dh_m"), lit(i)), zero)
      val b = coalesce(element_at(col("__dh_m"), lit(i + 1)), zero)
      when(dec(a.getField("s")) * dec(b.getField("c")) <
          dec(b.getField("s")) * dec(a.getField("c")),
        lit(1L << (bits - 1 - i))).otherwise(lit(0L))
    }.reduce(_ + _)
    val sigs = packed.select(col("__dh_id"), sig.as(outCol))
    // empty payloads emit no byte rows → left-join null → signature 0
    mm.join(sigs, mm(idCol) === sigs("__dh_id"), "left")
      .drop("__dh_id")
      .withColumn(outCol, coalesce(col(outCol), lit(0L)))
  }

  /** Perceptual-hash near-duplicate pairs over the payload column: dHash
    * each payload, then banded Hamming pairing via
    * [[Similarity.hammingBandPairs]] — one (band, value)-keyed shuffle,
    * never an all-pairs join; pigeonhole-exact within Hamming distance
    * < `bands`. Catches re-encoded (e.g. resized) media that byte-exact
    * [[chunkDedupPairs]] misses. Returns (id_a, id_b, hamming). */
  def phashNearDup(mm: DataFrame, bits: Int, bands: Int,
      maxHamming: Int): DataFrame =
    graft.scale.Similarity.hammingBandPairs(
      // materialized: the banded self-join reads the signature frame on
      // BOTH sides — without this the byte-explode aggregation runs twice
      graft.io.Materialize(
        dHash(mm.select(col("id"), col("payload")), "id", "payload",
          "phash", bits).select("id", "phash")),
      "id", "phash", bits, bands, maxHamming)

  /** Frame-sample stand-in: take every `stride`-th byte of the payload as a
    * "frame key" array (substring on binary + hex decode — byte-safe for
    * arbitrary blobs) — demonstrates array-typed extraction from binary
    * without a codec; built-ins only. */
  def frameSample(mm: DataFrame, stride: Int): DataFrame = {
    // integral frame count — `/` on columns is double division, which
    // sequence() rejects
    val nFrames = greatest(
      (octet_length(col("payload")) / stride).cast("int"), lit(1))
    mm.select(col("id"),
      transform(
        sequence(lit(1), nFrames),
        i => conv(hex(substring(col("payload"), (i - 1) * stride + 1, lit(1))), 16, 10)
          .cast("int"))
        .as("frame_bytes"))
  }
}
