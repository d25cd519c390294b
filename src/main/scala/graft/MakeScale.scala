package graft

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator (round-14 verdict item 2): builds an ~Nx
  * copy of an sf dir by id-shifted union-multiply, so the scale sweep can
  * measure per-query runtime RATIOS (sf0.1 → sf1) for the sync, dedup and
  * ANN families instead of arguing 100 TB behavior from plan shape alone.
  *
  * Shifts preserve the gates' id arithmetic: order keys shift by a
  * multiple of 10 (so `o_orderkey % 10 == 0` subset membership carries to
  * every replica) and lineitem uses the SAME shift so FK joins stay
  * aligned. Document text is perturbed per replica (a replica-suffix
  * token) so the near-dup families see realistic high-similarity — not
  * purely byte-identical — mass. Dimension-like tables (region, nation,
  * customer, supplier, part, events) byte-copy: the scaled fact sides keep
  * joining them exactly as the gates expect.
  *
  * Usage: runMain graft.MakeScale <srcSfDir> <dstDir> [mult=10]
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeScale <srcSfDir> <dstDir> [mult]")
    val src = args(0)
    val dst = args(1)
    val mult = if (args.length > 2) args(2).toInt else 10
    require(mult >= 1, s"mult must be >= 1: $mult")
    val spark = graft.io.EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dst).getFileSystem(conf)
    fs.mkdirs(new Path(dst))
    Seq("region", "nation", "customer", "supplier", "part", "events")
      .foreach { t =>
        val d = new Path(s"$dst/$t.parquet")
        if (fs.exists(d)) fs.delete(d, true)
        FileUtil.copy(fs, new Path(s"$src/$t.parquet"), fs, d, false, conf)
      }
    def replicate(name: String, key: String, shift: Long,
        perturb: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until mult).map { i =>
        perturb(base.withColumn(key, col(key) + lit(i * shift)), i)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    // one shift for orders AND lineitem, from the orders key domain,
    // rounded up to a multiple of 10 (subset-membership preservation)
    val orderShift = {
      val maxKey = spark.read.parquet(s"$src/orders.parquet")
        .agg(max(col("o_orderkey"))).head().getLong(0)
      (maxKey / 10 + 1) * 10
    }
    replicate("orders", "o_orderkey", orderShift)
    replicate("lineitem", "l_orderkey", orderShift)
    val docShift = spark.read.parquet(s"$src/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0) + 1
    replicate("documents", "doc_id", docShift, (df, i) =>
      if (i == 0) df
      else df.withColumn("text", concat(col("text"), lit(s" r$i"))))
    val vecShift = spark.read.parquet(s"$src/embeddings.parquet")
      .agg(max(col("vec_id"))).head().getLong(0) + 1
    replicate("embeddings", "vec_id", vecShift)
    val nDocs = spark.read.parquet(s"$dst/documents.parquet").count()
    val nOrd = spark.read.parquet(s"$dst/orders.parquet").count()
    spark.stop()
    println(s"""{"made":"$dst","mult":$mult,"documents":$nDocs,"orders":$nOrd}""")
  }
}
