package graft

import org.apache.spark.sql.functions._
import graft.io.Bucketing

/** §7.5 partitioning tools: shuffle-free co-located joins via bucketing,
  * salted joins for skew. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Bucketing.bucketedSave(a, "graft_bkt_a", "k", 4, Some(s"$dir/a"))
    Bucketing.bucketedSave(b, "graft_bkt_b", "k", 4, Some(s"$dir/b"))
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bkt_a")
          .join(spark.table("graft_bkt_b"), "k")
        assert(joined.count() == 1000)
        assert(Bucketing.isShuffleFree(joined),
          s"expected no Exchange:\n${joined.queryExecution.executedPlan}")
        // control: the same join on plain parquet DOES shuffle
        val plain = spark.read.parquet(s"$dir/a")
          .join(spark.read.parquet(s"$dir/b"), "k")
        assert(!Bucketing.isShuffleFree(plain))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("salted join equals plain join on skewed data") {
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = (1 to 2000).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Bucketing.saltedJoin(skewed, dim, "k", 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
