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
}
