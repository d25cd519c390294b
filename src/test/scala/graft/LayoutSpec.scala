package graft

import org.apache.spark.sql.functions._

import graft.scale.Layout

/** Z-order layout clustering: Morton-code correctness against a bit-level
  * reference, the out-of-range guard, and the property the op exists
  * for — files written from a z-clustered frame cover small
  * hyper-rectangles of BOTH clustering columns, so min/max footer stats
  * prune on either (a linear sort only bounds its leading column). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue2 matches the bit-level Morton reference on the full 4-bit grid") {
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val out = grid.toDF("a", "b")
      .withColumn("zv", Layout.zValue2($"a", $"b", bits = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (a, b) =>
      assert(out((a, b)) == mortonRef(a, b, 4), s"($a,$b)")
    }
    // the z-curve is a bijection on the grid
    assert(out.values.toSet.size == grid.size)
  }

  test("zValue2 rejects out-of-range and null inputs loudly") {
    val bad = Seq((16L, 0L)).toDF("a", "b")
      .withColumn("zv", Layout.zValue2($"a", $"b", bits = 4))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] { Layout.zValue2($"a", $"b", 0) }
  }

  test("z-clustered files bound BOTH columns; linear sort only the leading") {
    // a 64x64 grid: every (x, y) cell once — the adversarial case for a
    // linear sort, whose files each span the full y domain
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val files = 16
    def boxArea(df: org.apache.spark.sql.DataFrame): Double = {
      val spans = df
        .withColumn("part", spark_partition_id())
        .groupBy("part")
        .agg((max($"x") - min($"x") + 1).as("wx"),
          (max($"y") - min($"y") + 1).as("wy"))
        .select(($"wx" * $"wy").cast("double").as("area"))
        .collect().map(_.getDouble(0))
      spans.sum
    }
    val zArea = boxArea(Layout.zOrderCluster(grid, "x", "y", files, bits = 6))
    val linArea = boxArea(
      grid.repartitionByRange(files, $"x").sortWithinPartitions($"x"))
    // each z-file covers ~a square (area ~ 4096/16 = 256 + bucket slack);
    // each linear file covers a full-height stripe (area = 4 * 64 = 256
    // only if x splits perfectly; with 16 files it does: 4-wide stripes).
    // The discriminating assertion is the per-file Y-SPAN: z-files must
    // bound y, linear files cannot.
    val zYspan = Layout.zOrderCluster(grid, "x", "y", files, bits = 6)
      .withColumn("part", spark_partition_id())
      .groupBy("part").agg((max($"y") - min($"y") + 1).as("wy"))
      .agg(max($"wy")).head().getLong(0)
    val linYspan = grid.repartitionByRange(files, $"x")
      .sortWithinPartitions($"x")
      .withColumn("part", spark_partition_id())
      .groupBy("part").agg((max($"y") - min($"y") + 1).as("wy"))
      .agg(max($"wy")).head().getLong(0)
    assert(linYspan == 64L, s"linear layout should span full y: $linYspan")
    assert(zYspan <= 24L,
      s"z layout must bound y per file: $zYspan (areas z=$zArea lin=$linArea)")
  }

  test("zOrderValue ranks respect the cut arrays and zv is within 2*bits range") {
    val df = (1L to 1000L).map(i => (i, i % 97, (i * 31) % 89))
      .toDF("id", "a", "b")
    val (cutsA, cutsB, out) = Layout.zOrderValue(df, "a", "b", bits = 3)
    assert(cutsA.length == 7 && cutsB.length == 7)
    val maxZ = out.agg(max($"zv")).head().getLong(0)
    assert(maxZ < (1L << 6), s"zv out of 6-bit range: $maxZ")
  }

  test("hilbert: bijection on the full grid, engine == reference, and the " +
      "adjacency property the z-curve lacks") {
    val bits = 4; val n = 1 << bits
    // run the distributed transform on raw grid coordinates by cutting at
    // every integer (cuts k=1..n-1 make rank(v) == v on 0..n-1 inputs)
    val grid = (for (x <- 0L until n; y <- 0L until n) yield (x, y))
      .toDF("x", "y")
    val (_, _, withH) = Layout.hilbertOrderValue(grid
      .withColumn("x", $"x".cast("double"))
      .withColumn("y", $"y".cast("double")), "x", "y", bits,
      accuracy = 1000000)
    val got = withH.select($"x".cast("long"), $"y".cast("long"), $"hv")
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, h) => (x, y) -> h }.toMap
    // engine == driver-side canonical reference, pointwise...
    // (rank(v)==v only if the sketch cut exactly at integers; verify via
    // the reference on the RANKS the engine actually used — simpler: the
    // reference property suite below uses hilbertXY2D directly)
    val ref = (for (x <- 0L until n; y <- 0L until n)
      yield (x, y) -> Layout.hilbertXY2D(bits, x, y)).toMap
    // bijection + range for the engine output regardless of rank mapping
    assert(got.values.toSet.size == n * n)
    assert(got.values.forall(h => h >= 0 && h < n.toLong * n))
    // reference itself is the canonical curve: bijective and every
    // consecutive pair of indices is a GRID NEIGHBOR (|dx|+|dy| == 1) —
    // the locality guarantee Morton order does not have
    assert(ref.values.toSet.size == n * n)
    val byD = ref.toSeq.map { case ((x, y), h) => h -> (x, y) }
      .sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    case _ => }
    // morton violates adjacency somewhere on the same grid
    val mByD = (for (x <- 0L until n; y <- 0L until n)
      yield mortonRef(x, y, bits) -> (x, y)).sortBy(_._1).map(_._2)
    assert(mByD.sliding(2).exists { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    case _ => false })
    // engine == reference pointwise when ranks are the identity: with
    // integer-valued inputs and a max-accuracy sketch the cuts land on
    // 0..n-2, so rank(v) == v exactly
    got.foreach { case ((x, y), h) =>
      assert(h == ref((x, y)), s"engine ($x,$y)=$h ref=${ref((x, y))}")
    }
  }

  test("filePlan: ceil-div file counts, deterministic slots, and the " +
      "written table really lands the planned file count per partition") {
    import graft.scale.Sampling
    // part a: 10 rows x 1000B = 10000B -> 4 files @3000; part b: 1 row ->
    // 1 file; part c: 3000B exactly -> 1 file
    val rows = (1L to 10L).map(i => (i, "a", "x" * 1000)) ++
      Seq((11L, "b", "y"), (12L, "c", "z" * 3000))
    val df = rows.toDF("id", "part", "payload")
    val plan = Layout.filePlan(df, "part",
      length($"payload").cast("long"), targetBytes = 3000L)
    val p = plan.select($"part", $"n_files".cast("long"))
      .as[(String, Long)].collect().toMap
    assert(p == Map("a" -> 4L, "b" -> 1L, "c" -> 1L), p.toString)
    // slot assignment: deterministic across runs, within [0, n_files)
    val s1 = Layout.applyFilePlan(df, "id", "part", plan)
      .select($"id", $"file_slot").as[(Long, Long)].collect().toMap
    val s2 = Layout.applyFilePlan(df, "id", "part", plan)
      .select($"id", $"file_slot").as[(Long, Long)].collect().toMap
    assert(s1 == s2)
    assert((1L to 10L).forall(i => s1(i) >= 0 && s1(i) < 4))
    assert(s1(11L) == 0 && s1(12L) == 0)
    // end to end: repartition by (part, slot) + partitionBy(part) writes
    // exactly the planned number of data files into each partition dir
    val dir = java.nio.file.Files.createTempDirectory("fileplan").toString
    // range-repartition into exactly the planned total file count: with
    // one task per (part, slot) key, each partition dir gets its planned
    // file count (hash repartition would merge keys into shared tasks)
    val totalFiles = p.values.sum.toInt
    Layout.applyFilePlan(df, "id", "part", plan)
      .repartitionByRange(totalFiles, $"part", $"file_slot")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    def dataFiles(sub: String): Int =
      new java.io.File(s"$dir/part=$sub").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    // a slot with no rows writes no file, so counts are <= planned and
    // >= 1; with 10 rows over 4 slots all 4 are hit w.h.p. — assert the
    // planned count for the deterministic hash we actually use
    val hit = (1L to 10L).map(s1).distinct.size
    assert(dataFiles("a") == hit && hit == 4, s"a: ${dataFiles("a")} hit=$hit")
    assert(dataFiles("b") == 1 && dataFiles("c") == 1)
    // misuse guard
    intercept[IllegalArgumentException](
      Layout.filePlan(df, "part", length($"payload").cast("long"), 0L))
  }

  test("hilbert rejects out-of-range ranks loudly and clusters per file") {
    // hilbertCluster: every file spans a bounded region of BOTH columns
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val hYspan = Layout.hilbertCluster(grid, "x", "y", 16, bits = 6)
      .withColumn("part", spark_partition_id())
      .groupBy("part").agg((max($"y") - min($"y") + 1).as("wy"))
      .agg(max($"wy")).head().getLong(0)
    assert(hYspan <= 24L, s"hilbert layout must bound y per file: $hYspan")
    intercept[IllegalArgumentException](Layout.hilbertXY2D(4, 16L, 0L))
    intercept[IllegalArgumentException](
      Layout.hilbertOrderValue(grid, "x", "y", bits = 0))
  }

  test("null layout inputs fail loud in zorder AND hilbert ranks — never " +
      "a silent top-cell placement") {
    val bad = Seq((Option(1L), 2L), (Option.empty[Long], 3L)).toDF("x", "y")
    val e1 = intercept[Exception] {
      Layout.zOrderValue(bad, "x", "y", 4)._3.collect()
    }
    assert(e1.getMessage.contains("zorder: null input"), e1.getMessage)
    val e2 = intercept[Exception] {
      Layout.hilbertOrderValue(bad, "x", "y", 4)._3.collect()
    }
    assert(e2.getMessage.contains("hilbert: null input"), e2.getMessage)
  }
}
