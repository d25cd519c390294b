package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.profile.SchemaProfiler
import graft.sync.DocHash

/** ScalaCheck properties (SURVEY §5 strategy): profiler invariants under
  * document permutation, hash canon determinism/sensitivity, minhash set
  * semantics. Small generators — each property spins Spark jobs. */
object ProfilerProps extends Properties("Profiler") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val docsGen: Gen[List[(String, Option[String], Option[Long])]] =
    Gen.choose(1, 12).flatMap { n =>
      Gen.listOfN(n, for {
        id <- Gen.choose(0, 10000)
        name <- Gen.option(Gen.alphaStr.map(_.take(8)))
        age <- Gen.option(Gen.choose(0L, 99L))
      } yield (id.toString, name, age))
    }

  property("profile invariant under document permutation") =
    forAll(docsGen) { docs =>
      val a = SchemaProfiler.collectProfile(docs.toDF("_id", "name", "age"))
      val b = SchemaProfiler.collectProfile(docs.reverse.toDF("_id", "name", "age"))
      a.totalDocs == b.totalDocs &&
        a.fields.map(f => (f.path, f.types, f.count)) ==
        b.fields.map(f => (f.path, f.types, f.count))
    }

  property("occurrence counts bounded by total docs; types sum to count") =
    forAll(docsGen) { docs =>
      val p = SchemaProfiler.collectProfile(docs.toDF("_id", "name", "age"))
      p.fields.forall(f => f.count <= p.totalDocs &&
        f.types.values.sum == f.count &&
        f.types.keySet.contains(f.electedType))
    }
}

object HashProps extends Properties("DocHash") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0, 1000).map(_.toString)
    name <- Gen.alphaNumStr.map(_.take(12))
    v <- Gen.choose(0L, 1000L)
  } yield (id, name, v)

  property("hash is deterministic and 32 uppercase hex chars") =
    forAll(rowGen) { case (id, name, v) =>
      val df = Seq((id, name, v)).toDF("_id", "name", "v")
      val h1 = df.select(DocHash.docHash(Seq("_id", "name", "v"))).head().getString(0)
      val h2 = df.select(DocHash.docHash(Seq("_id", "name", "v"))).head().getString(0)
      h1 == h2 && h1.length == 32 && h1 == h1.toUpperCase &&
        h1.forall(c => c.isDigit || ('A' to 'F').contains(c))
    }

  property("hash changes when a hashed field changes") =
    forAll(rowGen) { case (id, name, v) =>
      val a = Seq((id, name, v)).toDF("_id", "name", "v")
        .select(DocHash.docHash(Seq("_id", "name", "v"))).head().getString(0)
      val b = Seq((id, name + "X", v)).toDF("_id", "name", "v")
        .select(DocHash.docHash(Seq("_id", "name", "v"))).head().getString(0)
      a != b
    }

  property("canonical json independent of column order (W2)") =
    forAll(rowGen) { case (id, name, v) =>
      val a = Seq((id, name, v)).toDF("_id", "name", "v")
        .select(DocHash.canonicalJson(Seq("_id", "name", "v"))).head().getString(0)
      val b = Seq((v, id, name)).toDF("v", "_id", "name")
        .select(DocHash.canonicalJson(Seq("v", "_id", "name"))).head().getString(0)
      a == b
    }
}

object MinhashProps extends Properties("Minhash") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val wordsGen =
    Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta"))

  property("signature invariant under token order and duplication") =
    forAll(wordsGen) { words =>
      val t1 = words.mkString(" ")
      val t2 = (words.reverse ++ words).mkString(" ") // same SET
      val sigs = Seq(t1, t2).toDF("text")
        .select(graft.scale.Dedup.minhashSignature(col("text"), 8).as("s"))
        .as[Seq[Long]].collect()
      sigs(0) == sigs(1)
    }

}

object IncrementalDedupProps extends Properties("IncrementalDedup") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // each case spins several Spark jobs (LSH chains); bound the case count
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  // multi-word docs over a tiny pool: near-dups arise often
  private val docGen: Gen[String] =
    Gen.choose(3, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("red", "blue", "green", "fish", "cat"))
        .map(_.mkString(" ")))

  property("minhash incremental pairs = full run's batch-endpoint pairs") =
    forAll(Gen.listOfN(6, docGen), Gen.choose(1, 5)) { (texts, cut) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val hist = docs.filter($"doc_id" < cut)
      val batch = docs.filter($"doc_id" >= cut)
      val full = graft.scale.Dedup.minhashCandidates(
        docs, "doc_id", "text", 16, 4, 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val state = graft.scale.Dedup.minhashState(hist, "doc_id", "text", 16, 3)
      val inc = graft.scale.Dedup.minhashIncremental(state, batch,
        "doc_id", "text", 16, 4, 0.5)._1
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      inc == full.filter { case (a, b) => a >= cut || b >= cut }
    }

  // small corpora with forced duplicate texts (tiny word pool)
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(2, 12).flatMap { n =>
      Gen.listOfN(n, Gen.choose(1, 4).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  property("batch-folded exact dedup == batch-at-once survivors") =
    forAll(corpusGen, Gen.choose(0, 12)) { (docs, cutRaw) =>
      val cut = cutRaw % docs.size
      val df = docs.toDF("doc_id", "text")
      val whole = graft.scale.Dedup
        .exactSurvivors(df, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      // fold: state from the first `cut` docs, then the rest as a batch
      val first = df.filter($"doc_id" < cut)
      val rest = df.filter($"doc_id" >= cut)
      val state0 = graft.scale.Dedup.exactState(first, "doc_id", "text")
      val (surv, _) = graft.scale.Dedup
        .exactIncremental(state0, rest, "doc_id", "text")
      val folded = graft.scale.Dedup
        .exactSurvivors(first, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet ++
        surv.select("doc_id").as[Long].collect().toSet
      folded == whole
    }

  property("chunk-map merge over ANY batch split == batch-at-once map") =
    forAll(corpusGen, Gen.choose(0, 12)) { (docs, cutRaw) =>
      val cut = cutRaw % docs.size
      val df = docs.toDF("doc_id", "text")
      def asMap(d: org.apache.spark.sql.DataFrame) =
        d.select("chunk_hash", "n_occ", "rep_doc_id", "rep_chunk_idx")
          .as[(String, Long, Long, Long)].collect().toSet
      val whole = asMap(
        graft.scale.Dedup.chunkDedupMap(df, "doc_id", "text", 2, 1))
      val state = graft.scale.Dedup.chunkDedupMap(
        df.filter($"doc_id" < cut), "doc_id", "text", 2, 1)
      val merged = asMap(graft.scale.Dedup.chunkDedupIncremental(
        state, df.filter($"doc_id" >= cut), "doc_id", "text", 2, 1))
      merged == whole
    }

  property("segment-dedup incremental == batch-at-once restricted to the " +
      "batch ids") =
    forAll(corpusGen, Gen.choose(0, 12)) { (docs, cutRaw) =>
      val cut = cutRaw % docs.size
      val df = docs.toDF("doc_id", "text")
      val whole = graft.scale.Dedup.segmentDedup(df, "doc_id", "text", 2)
        .as[(Long, String)].collect().toMap.filter(_._1 >= cut)
      val state = graft.scale.Dedup.segmentState(
        df.filter($"doc_id" < cut), "doc_id", "text", 2)
      val inc = graft.scale.Dedup.segmentDedupIncremental(
        state, df.filter($"doc_id" >= cut), "doc_id", "text", 2)._1
        .as[(Long, String)].collect().toMap
      inc == whole
    }
}

object TemperatureProps extends Properties("TemperatureSample") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(2, 4).flatMap { g =>
      Gen.listOfN(g, Gen.choose(1, 40)).map { sizes =>
        sizes.zipWithIndex.flatMap { case (n, gi) =>
          (1 to n).map(i => ((gi * 1000 + i).toLong, s"g$gi"))
        }
      }
    }

  property("kept set grows monotonically with alpha; alpha=1 keeps all") =
    forAll(corpusGen, Gen.choose(1, 9), Gen.choose(1, 9)) { (rows, a, b) =>
      val df = rows.toDF("id", "g")
      def keep(alphaBp: Int): Set[Long] =
        graft.scale.Sampling.temperatureSample(df, "g", "id", alphaBp)
          .select("id").as[Long].collect().toSet
      val (lo, hi) = (math.min(a, b) * 1000, math.max(a, b) * 1000)
      // flattening harder (smaller alpha) can only DROP docs of common
      // groups, never add: keep rates are monotone in alpha per group
      keep(lo).subsetOf(keep(hi)) && keep(10000).size == rows.size
    }
}

object HammingBandProps extends Properties("HammingBand") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  // small random float corpora; ids 0..n-1, queries = first 2
  private val corpusGen: Gen[List[List[Float]]] =
    Gen.choose(2, 12).flatMap { n =>
      Gen.listOfN(n, Gen.listOfN(6, Gen.chooseNum(-5.0f, 5.0f)))
    }

  property("pigeonhole: every pair closer than `bands` bits is found, " +
      "and in-radius results equal the full scan, any valid banding") =
    forAll(corpusGen, Gen.oneOf(1, 2, 3, 4, 6)) { (vecs, bands) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val q = df.filter(col("vec_id") < 2)
      val n = vecs.size
      val full = graft.scale.Similarity.hammingTopK(q, df,
          "vec_id", "embedding", bits = 48, k = n)
        .as[(Long, Int, Long, Long)].collect()
      val band = graft.scale.Similarity.hammingBandTopK(q, df,
          "vec_id", "embedding", bits = 48, bands = bands, k = n)
        .as[(Long, Int, Long, Long)].collect()
      val near = full.filter(_._4 < bands).map(r => (r._1, r._3, r._4)).toSet
      val bandNear = band.filter(_._4 < bands)
        .map(r => (r._1, r._3, r._4)).toSet
      near == bandNear
    }
}

object KmvProps extends Properties("KmvSketch") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, hash, lit, pmod}

  private val corpusGen: Gen[List[(String, String)]] =
    Gen.choose(1, 3).flatMap { g =>
      Gen.listOfN(g, Gen.choose(1, 60)).map { sizes =>
        sizes.zipWithIndex.flatMap { case (n, gi) =>
          (1 to n).map(i => (s"g$gi", s"v${(i * 13) % 40}"))
        }
      }
    }

  property("merge of any split == retrain on the whole, for any k") =
    forAll(corpusGen, Gen.choose(1, 16), Gen.choose(0, 100)) {
      (rows, k, cutPct) =>
        val df = rows.toDF("g", "v")
        val whole = graft.scale.Sketches.kmv(df, "g", col("v"), k)
          .select("grp", "h", "rank")
          .as[(String, Long, Int)].collect().toSet
        // deterministic split (a limit-based one could pick different rows
        // per evaluation); duplicates of a value land on one side — fine,
        // kmv distincts its input
        val side = pmod(hash(col("g"), col("v")), lit(100)) < cutPct
        val left = df.filter(side)
        val right = df.filter(!side)
        val merged = graft.scale.Sketches.kmvMerge(
            graft.scale.Sketches.kmv(left, "g", col("v"), k),
            graft.scale.Sketches.kmv(right, "g", col("v"), k), k)
          .select("grp", "h", "rank")
          .as[(String, Long, Int)].collect().toSet
        merged == whole
    }
}

object CmsProps extends Properties("CountMinSketch") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, hash, lit, pmod}
  import graft.scale.Sketches

  // occurrence lists (duplicates meaningful — CMS counts occurrences)
  private val corpusGen: Gen[List[(String, String)]] =
    Gen.choose(1, 3).flatMap { g =>
      Gen.listOfN(g, Gen.choose(1, 50)).map { sizes =>
        sizes.zipWithIndex.flatMap { case (n, gi) =>
          (1 to n).map(i => (s"g$gi", s"t${(i * 7) % 12}"))
        }
      }
    }

  property("merge of any split == retrain (counters are linear)") =
    forAll(corpusGen, Gen.choose(1, 4), Gen.choose(4, 32),
        Gen.choose(0, 100)) { (rows, d, w, cutPct) =>
      val df = rows.toDF("g", "tok")
      val whole = Sketches.cms(df, "g", "tok", d, w)
        .select("grp", "row_j", "bucket", "cnt").as[(String, Int, Long, Long)].collect().toSet
      val side = pmod(hash(col("g"), col("tok")), lit(100)) < cutPct
      val merged = Sketches.cmsMerge(
          Sketches.cms(df.filter(side), "g", "tok", d, w),
          Sketches.cms(df.filter(!side), "g", "tok", d, w))
        .select("grp", "row_j", "bucket", "cnt").as[(String, Int, Long, Long)].collect().toSet
      merged == whole
    }

  property("point estimates never under-count the true frequency") =
    forAll(corpusGen, Gen.choose(1, 4), Gen.choose(4, 32)) { (rows, d, w) =>
      val df = rows.toDF("g", "tok")
      val sk = Sketches.cms(df, "g", "tok", d, w)
      val est = Sketches.cmsEstimate(sk, df, "g", "tok", d, w)
        .as[(String, String, Long)].collect()
      val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      est.nonEmpty && est.forall { case (g, t, e) => e >= truth((g, t)) }
    }
}

object SqProps extends Properties("Sq8Quantizer") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.scale.Similarity

  private val vecGen: Gen[List[Float]] =
    Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f)))

  property("codes stay in [-127, 127] and reconstruct within scale/2 " +
      "per element (the round guarantee)") =
    forAll(Gen.nonEmptyListOf(vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .withColumn("scale", Similarity.int8Scale(col("v")))
        .withColumn("q", Similarity.int8Quantize(col("v"), col("scale")))
      df.select("v", "scale", "q")
        .as[(Seq[Float], Double, Seq[Int])].collect()
        .forall { case (v, s, q) =>
          q.forall(c => c >= -127 && c <= 127) &&
            (s == 0.0 || v.zip(q).forall { case (x, c) =>
              math.abs(c * s - x.toDouble) <= s / 2 + 1e-12 })
        }
    }
}

object AmsProps extends Properties("AmsSketch") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, hash, lit, pmod}
  import graft.scale.Sketches

  private val corpusGen: Gen[List[(String, String)]] =
    Gen.choose(1, 3).flatMap { g =>
      Gen.listOfN(g, Gen.choose(1, 50)).map { sizes =>
        sizes.zipWithIndex.flatMap { case (n, gi) =>
          (1 to n).map(i => (s"g$gi", s"t${(i * 5) % 11}"))
        }
      }
    }

  property("merge of any split == retrain (signed counters are linear)") =
    forAll(corpusGen, Gen.choose(1, 8), Gen.choose(0, 100)) {
      (rows, r, cutPct) =>
        val df = rows.toDF("g", "tok")
        val whole = Sketches.amsSketch(df, "g", "tok", r)
          .as[(String, Int, Long)].collect().toSet
        val side = pmod(hash(col("g"), col("tok")), lit(100)) < cutPct
        val merged = Sketches.amsMerge(
            Sketches.amsSketch(df.filter(side), "g", "tok", r),
            Sketches.amsSketch(df.filter(!side), "g", "tok", r))
          .as[(String, Int, Long)].collect().toSet
        merged == whole
    }

  property("every counter is bounded by the group's occurrence count") =
    forAll(corpusGen, Gen.choose(1, 8)) { (rows, r) =>
      val df = rows.toDF("g", "tok")
      val sk = Sketches.amsSketch(df, "g", "tok", r)
        .as[(String, Int, Long)].collect()
      val occ = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      sk.nonEmpty && sk.forall { case (g, _, z) => math.abs(z) <= occ(g) }
    }
}

object RepeatEpochsProps extends Properties("RepeatEpochs") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val corpusGen: Gen[List[(Long, String, Long)]] =
    Gen.choose(2, 4).flatMap { g =>
      Gen.listOfN(g, Gen.choose(1, 25)).map { sizes =>
        sizes.zipWithIndex.flatMap { case (n, gi) =>
          (1 to n).map(i =>
            ((gi * 1000 + i).toLong, s"g$gi", (1 + (i * 7) % 50).toLong))
        }
      }
    }

  property("per-group served tokens land within one max-doc of the " +
      "target, for any budget and weights") =
    forAll(corpusGen, Gen.choose(100L, 100000L), Gen.choose(0, 10000)) {
      (rows, budget, w0) =>
        val df = rows.toDF("id", "g", "n_tokens")
        val out = graft.scale.Sampling.repeatEpochs(df, "g", "id",
            "n_tokens", budget, Map("g0" -> w0), 1500)
          .select("id", "g", "n_tokens", "epochs")
          .as[(Long, String, Long, Long)].collect()
        out.length == rows.length && out.groupBy(_._2).forall {
          case (g, grp) =>
            val target = budget * (if (g == "g0") w0 else 1500) / 10000
            val served = grp.map(r => r._3 * r._4).sum
            val maxDoc = grp.map(_._3).max
            served >= target - maxDoc && served <= target + maxDoc &&
              grp.forall(_._4 >= 0)
        }
    }
}

object AnomalyProps extends Properties("AnomalyMonitor") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val evGen: Gen[List[(Long, Int, String)]] =
    Gen.choose(5, 40).flatMap { n =>
      Gen.listOfN(n, for {
        d <- Gen.choose(1, 12)
        tpe <- Gen.oneOf("a", "b")
      } yield (d, tpe)).map(_.zipWithIndex.map {
        case ((d, tp), i) => (i.toLong, d, tp)
      })
    }

  property("merged per-batch daily counts flag exactly like a full replay") =
    forAll(evGen, Gen.choose(2, 5)) { (evs, parts) =>
      val df = evs.map { case (id, d, tp) =>
        (id, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"), 1L, tp)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val whole = graft.streaming.EventStream.anomalousDays(df, 4, 2)
        .as[(String, String, Long, Long, Long)].collect().toSet
      // an arbitrary id-hash batch split, merged pairwise left to right
      val merged = (0 until parts)
        .map(p => graft.streaming.EventStream.dailyCounts(
          df.filter(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("event_id"),
            org.apache.spark.sql.functions.lit(parts)) === p)))
        .reduce(graft.streaming.EventStream.mergeDailyCounts(_, _))
      val folded = graft.streaming.EventStream
        .anomaliesFromDaily(merged, 4, 2)
        .as[(String, String, Long, Long, Long)].collect().toSet
      folded == whole
    }
}

object FunnelProps extends Properties("Funnel") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // random event streams over a small user/type pool
  private val eventsGen: Gen[List[(Long, Int, Long, String)]] =
    Gen.choose(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        user <- Gen.choose(1L, 4L)
        tpe <- Gen.oneOf("view", "click", "purchase")
        t <- Gen.choose(0, 59)
      } yield (user, t, tpe)).map(_.zipWithIndex.map {
        case ((u, t, tp), i) => (i.toLong, t, u, tp)
      })
    }

  property("step counts are monotone non-increasing and order-insensitive") =
    forAll(eventsGen) { evs =>
      val df = evs.map { case (id, t, u, tp) =>
        (id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$t%02d:00"), u, tp)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val out = graft.streaming.EventStream
        .funnel(df, Seq("view", "click", "purchase"))
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._1).map(_._3)
      val shuffled = graft.streaming.EventStream
        .funnel(df.orderBy($"event_type"), Seq("view", "click", "purchase"))
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._1).map(_._3)
      out.zip(out.tail).forall { case (a, b) => a >= b } && out == shuffled
    }
}

/** Round-5 canonicalization guards: the reworked gate queries promise
  * engine-portable outputs (pure integers, exact decimal sums, or
  * literal-constant scoring). These properties pin the promise on random
  * corpora: exact agreement with a driver-side BigDecimal/Long reference,
  * and invariance under re-partitioning (the cross-engine proxy — an
  * order-dependent float sum fails it). */
object CanonProps extends Properties("Canonicalization") {
  import org.scalacheck.Test
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff")
  private val docGen: Gen[List[(Long, String)]] =
    Gen.choose(2, 10).flatMap { n =>
      Gen.listOfN(n, Gen.choose(1, 8).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  property("tokenDriftCounts equals the integer reference") =
    forAll(docGen, docGen) { (da, db) =>
      val out = graft.scale.TextAnalysis.tokenDriftCounts(
          da.toDF("doc_id", "text"), db.toDF("doc_id", "text"), "text")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), BigInt(r.getDecimal(3).toBigInteger)))
        .toMap
      val ca = da.flatMap(d => toks(d._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val cb = db.flatMap(d => toks(d._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val na = ca.values.sum
      val nb = cb.values.sum
      val ref = (ca.keySet ++ cb.keySet).map { t =>
        val a = ca.getOrElse(t, 0L); val b = cb.getOrElse(t, 0L)
        t -> ((a, b, (BigInt(a) * nb - BigInt(b) * na).abs))
      }.toMap
      out == ref
    }

  property("componentSums equals the integer micro-unit reference") = {
    val vecGen = Gen.choose(2, 8).flatMap { n =>
      Gen.listOfN(n, Gen.listOfN(3,
        Gen.choose(-1000000, 1000000).map(_ / 1000.0f)))
    }
    forAll(vecGen) { vecs =>
      val out = graft.scale.Similarity.componentSums(
          vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
            .toDF("id", "embedding"), "embedding")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val ref = (1 to 3).map { pos =>
        val xs = vecs.map(v =>
          math.floor(v(pos - 1).toDouble * 1e6).toLong)
        pos.toLong -> ((vecs.size.toLong, xs.sum, xs.map(x => x * x).sum))
      }.toMap
      out == ref
    }
  }

  property("importanceWeightsFromRatios is partition-invariant") =
    forAll(docGen) { ds =>
      val df = ds.toDF("doc_id", "text")
      val ratios = graft.scale.Sampling.importanceRatios(
        df, "text", $"doc_id" % 2 === 0, buckets = 16)
      def weights(parts: Int): Map[Long, BigDecimal] =
        graft.scale.Sampling.importanceWeightsFromRatios(
            df.repartition(parts), "text", ratios)
          .select($"doc_id", $"weight").collect()
          .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
      weights(1) == weights(7)
    }

  property("micro gate weights equal the decimal view × 10⁶ exactly") =
    forAll(docGen) { ds =>
      val df = ds.toDF("doc_id", "text")
      val ratios = graft.scale.Sampling.importanceRatios(
        df, "text", $"doc_id" % 2 === 0, buckets = 16)
      val dec = graft.scale.Sampling.importanceWeightsFromRatios(
          df, "text", ratios)
        .select($"doc_id", $"weight").collect()
        .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
      val mic = graft.scale.Sampling.importanceWeightsMicroFromRatios(
          df, "text", ratios)
        .select($"doc_id", $"weight_micro").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      dec.keySet == mic.keySet &&
        dec.forall { case (id, w) => (w * 1000000).toLongExact == mic(id) }
    }

  property("nbTopCounts: merge of split batches equals full retrain") =
    forAll(docGen, Gen.choose(0, 9)) { (ds, cut) =>
      val df = ds.toDF("doc_id", "text")
      val pos = $"doc_id" % 3 === 0
      def counts(d: org.apache.spark.sql.DataFrame) =
        graft.scale.TextAnalysis.nbCounts(d, "text", pos)
      def dump(c: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
        graft.scale.TextAnalysis.nbTopCounts(c, vocab = 64)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      dump(graft.scale.TextAnalysis.nbMergeCounts(
        counts(df.filter($"doc_id" < cut)),
        counts(df.filter($"doc_id" >= cut)))) == dump(counts(df))
    }

  property("powerIterationState sums are partition-invariant") = {
    val vecGen = Gen.choose(3, 8).flatMap { n =>
      Gen.listOfN(n, Gen.listOfN(3,
        Gen.choose(1, 1000000).map(_ / 1000.0f)))
    }
    forAll(vecGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "embedding")
      def state(parts: Int): (Seq[Double], Map[Long, java.math.BigDecimal]) = {
        val (v, sums) = graft.scale.Similarity.powerIterationState(
          df.repartition(parts), "embedding", iters = 2)
        (v, sums.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap)
      }
      state(1) == state(5)
    }
  }
}

/** Round-9 operator properties: the skew-safe grouped ntile must equal
  * Spark's own window ntile on ARBITRARY grouped data (the two-level
  * prefix-sum rank is only correct if ANY order-consistent bucketing
  * yields identical ranks — exactly the claim randomness can attack),
  * and winnowing's density/coverage guarantees must hold on random token
  * streams, not just the handcrafted fixtures. */
object GroupedRankProps extends Properties("GroupedRank") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  private val grouped: Gen[List[(String, Long)]] =
    Gen.choose(1, 60).flatMap { n =>
      Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        k <- Gen.choose(0L, 9L) // heavy ties on purpose
      } yield (g, k))
    }

  property("groupedNtile == window ntile for random groups/ties/k") =
    forAll(grouped, Gen.choose(1, 7)) { (rows, k) =>
      val df = rows.zipWithIndex.map { case ((g, key), i) =>
        (g, key, i.toLong) }.toDF("g", "key", "id")
      val got = graft.scale.Sampling
        .groupedNtile(df, "g", "key", "id", k, buckets = 4)
        .select("g", "id", "ntile").as[(String, Long, Long)]
        .collect().map(t => (t._1, t._2) -> t._3).toMap
      val want = df.withColumn("ntile", ntile(k).over(
        Window.partitionBy(col("g")).orderBy(col("key"), col("id")))
        .cast("long"))
        .select("g", "id", "ntile").as[(String, Long, Long)]
        .collect().map(t => (t._1, t._2) -> t._3).toMap
      got == want
    }

  property("groupedRank is a per-group bijection 1..n under ties") =
    forAll(grouped) { rows =>
      val df = rows.zipWithIndex.map { case ((g, key), i) =>
        (g, key, i.toLong) }.toDF("g", "key", "id")
      val out = graft.scale.Sampling
        .groupedRank(df, "g", "key", "id", buckets = 4)
        .select("g", "rank").as[(String, Long)].collect()
      out.groupBy(_._1).forall { case (_, rs) =>
        rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq
      }
    }
}

/** Round-10 operator properties: the curriculum schedule's grouped ranks
  * must equal Spark's own window truth on ARBITRARY banded data (same
  * attack surface as GroupedRankProps — order-consistent bucketing), and
  * budgetSelect's running totals must equal the global window sum under
  * arbitrary score ties. */
object CurriculumProps extends Properties("Curriculum") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  private val banded: Gen[List[Int]] =
    Gen.choose(1, 50).flatMap(n => Gen.listOfN(n, Gen.choose(1, 4)))

  property("curriculumInterleave == window truth (band_rank, ikey, " +
      "global_pos) for random bands") =
    forAll(banded, Gen.choose(0L, 99L)) { (bands, seed) =>
      val df = bands.zipWithIndex.map { case (b, i) =>
        (i.toLong, b.toLong) }.toDF("id", "band")
      val got = graft.scale.Sampling
        .curriculumInterleave(df, "id", "band", seed, buckets = 4)
        .select("id", "band_rank", "ikey", "global_pos")
        .as[(Long, Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      val ck = graft.scale.Dedup.tokenHash60(
        concat(lit(s"$seed:"), col("id").cast("string")))
      val want = df.withColumn("ck", ck)
        .withColumn("band_rank", row_number().over(
          Window.partitionBy("band").orderBy(col("ck"), col("id")))
          .cast("long"))
        .withColumn("n_band", count(lit(1)).over(
          Window.partitionBy("band")))
        .withColumn("ikey", expr(
          s"((band_rank * 2L - 1L) * ${1L << 20}L) div n_band"))
        .withColumn("global_pos", row_number().over(
          Window.orderBy(col("ikey"), col("band"), col("band_rank")))
          .cast("long"))
        .select("id", "band_rank", "ikey", "global_pos")
        .as[(Long, Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      got == want
    }

  private val scored: Gen[List[(Long, Long)]] =
    Gen.choose(1, 50).flatMap(n => Gen.listOfN(n, for {
      s <- Gen.choose(0L, 9L) // heavy score ties on purpose
      t <- Gen.choose(0L, 20L)
    } yield (s, t)))

  property("budgetSelect == global window sum; selected is the exact " +
      "no-overshoot prefix") =
    forAll(scored, Gen.choose(1L, 300L)) { (rows, budget) =>
      val df = rows.zipWithIndex.map { case ((s, t), i) =>
        (i.toLong, s, t) }.toDF("id", "score", "n_tok")
        .withColumn("__ord", -col("score"))
      val got = graft.scale.Sampling
        .budgetSelect(df, "__ord", "id", "n_tok", budget, buckets = 4)
        .select("id", "cum_tokens", "selected")
        .as[(Long, Long, Boolean)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      val want = df.withColumn("cum_tokens", sum(col("n_tok")).over(
          Window.orderBy(col("__ord"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("id"), col("cum_tokens"),
          (col("cum_tokens") <= budget).as("selected"))
        .as[(Long, Long, Boolean)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      got == want
    }
}

object WinnowProps extends Properties("Winnowing") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val docGen: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee")))

  property("density: first pick ≤ w, consecutive picks ≤ w apart; " +
      "positions valid; deterministic") =
    forAll(docGen) { toks =>
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val k = 3; val w = 4
      def run() = graft.scale.TextAnalysis
        .winnowFingerprints(df, "doc_id", "text", k, w)
        .select("fp_pos").as[Long].collect().sorted.toSeq
      val ps = run()
      val grams = math.max(toks.length - (k - 1), 0)
      if (grams == 0) ps.isEmpty
      else {
        ps.nonEmpty && ps.head <= w && ps.last <= grams &&
          ps.forall(p => p >= 1) &&
          ps.sliding(2).forall {
            case Seq(a, b) => b - a <= w
            case _ => true
          } && ps == run()
      }
    }
}

object DoremiProps extends Properties("DoremiWeights") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import graft.scale.{Sampling, TextAnalysis}

  // each case trains a bigram LM + two state folds — bound the case count
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  // multi-word docs over a tiny pool (bigrams always exist), 2-3 sources
  private val corpusGen: Gen[List[(Long, String, String)]] =
    Gen.choose(3, 10).flatMap { n =>
      Gen.listOfN(n, for {
        len <- Gen.choose(2, 6)
        ws <- Gen.listOfN(len, Gen.oneOf("red", "blue", "green", "fish"))
        src <- Gen.oneOf("s0", "s1", "s2")
      } yield (ws.mkString(" "), src))
        .map(_.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) })
    }

  property("merge == retrain on a random split under the pinned LM") =
    forAll(corpusGen, Gen.choose(0, 10)) { (rows, cut) =>
      val dd = rows.toDF("doc_id", "text", "source")
      // PINNED proxy LM: trained once on the full corpus
      val stats = TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
        TextAnalysis.bigramLm(dd, "text"))
      val merged = Sampling.doremiWeightsFromState(Sampling.doremiMerge(
        Sampling.doremiState(stats.filter($"doc_id" < cut), dd,
          "doc_id", "source"),
        Sampling.doremiState(stats.filter($"doc_id" >= cut), dd,
          "doc_id", "source")))
        .orderBy("source").collect().map(_.toSeq).toSeq
      val full = Sampling.doremiWeights(stats, dd, "doc_id", "source")
        .orderBy("source").collect().map(_.toSeq).toSeq
      merged == full
    }

  property("some source sits at the mean (w_nano = 1e9 exactly); " +
      "weight_bp non-decreasing in ce_micro; bp sum ≤ 10000") =
    forAll(corpusGen) { rows =>
      val dd = rows.toDF("doc_id", "text", "source")
      val w = Sampling.doremiWeights(
        TextAnalysis.lmCrossEntropyStats(dd, "doc_id", "text",
          TextAnalysis.bigramLm(dd, "text")), dd, "doc_id", "source")
        .select("source", "ce_micro", "excess_micro", "w_nano", "weight_bp")
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      if (w.isEmpty) true // degenerate: no doc produced a scored bigram
      else {
        // the min-ce source is at or below the weighted mean -> excess 0
        val atMean = w.exists(r => r._2 == 0L && r._3 == 1000000000L)
        val sorted = w.sortBy(_._1)
        val monotone = sorted.map(_._4).toSeq.sliding(2).forall {
          case Seq(x, y) => x <= y
          case _ => true
        }
        atMean && monotone && w.map(_._4).sum <= 10000L &&
          w.forall(_._3 >= 1000000000L)
      }
    }
}

object RrfProps extends Properties("RrfFusion") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._
  import graft.scale.Similarity

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  // a ranked list = a random subset of ids 0..9 ranked 1..n
  private val listGen: Gen[List[(Long, Int)]] =
    Gen.someOf(0L to 9L).map(ids =>
      ids.toList.zipWithIndex.map { case (id, i) => (id, i + 1) })

  property("fused score equals the plain-Scala reference sum; absent " +
      "ranks are 0; fusion is commutative in list order") =
    forAll(listGen, listGen) { (la, lb) =>
      val a = la.toDF("id", "rnk")
      val b = lb.toDF("id", "rnk")
      val ab = Similarity.rrfFuse(Seq("a" -> a, "b" -> b), "id", "rnk")
        .select("id", "a_rnk", "b_rnk", "rrf_micro")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val ma = la.toMap; val mb = lb.toMap
      def term(r: Option[Int]) = r.map(x => 1000000L / (60L + x))
        .getOrElse(0L)
      val ref = (ma.keySet ++ mb.keySet).toSeq.sorted.map(id =>
        (id, ma.getOrElse(id, 0).toLong, mb.getOrElse(id, 0).toLong,
          term(ma.get(id)) + term(mb.get(id))))
      val ba = Similarity.rrfFuse(Seq("b" -> b, "a" -> a), "id", "rnk")
        .select("id", "a_rnk", "b_rnk", "rrf_micro")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      ab == ref && ba == ref
    }
}

/** Round-14 verdict item 6: feed-replay batching property. A CDC feed is a
  * TOTAL ORDER of upsert/delete ops; a replayer may re-partition that order
  * into any consecutive batches (order-consistent re-batching). The engine
  * contract: every re-batching whose batches are internally unambiguous
  * (no id twice on the upsert side, no id on both sides of one batch)
  * applies to the SAME final target+state as the in-order op fold — and an
  * ambiguous batch fails LOUDLY before mutating anything, leaving exactly
  * the prefix of completed batches applied. Runs the REAL feed path
  * (runFromChangeFeed) against a cloned bucketed bootstrap per case; the
  * default 100 ScalaCheck cases each drive a full random scenario. */
object FeedReplayProps extends Properties("FeedReplay") {
  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.functions.col
  import org.scalacheck.Prop.propBoolean
  import spark.implicits._
  import graft.sync.IncrementalSync

  // the verdict's done-bar: green over >= 100 cases — pin it explicitly
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(100)

  private case class Op(id: Long, up: Boolean, payload: String)

  private val nBase = 6L
  private val nB = 2

  // one bucketed bootstrap, cloned per case (a filesystem copy IS a
  // re-bootstrap — the sync output is deterministic)
  private lazy val template: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_frp0").toString
    IncrementalSync.runPartitioned(spark,
      (1L to nBase).map(i => (i, s"base$i")).toDF("_id", "payload"),
      s"$dir/t", s"$dir/s", nB)
    dir
  }

  private def clone_(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_frp").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    for (p <- Seq("t", "s"))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$template/$p"), fs,
        new org.apache.hadoop.fs.Path(s"$dir/$p"), false, conf)
    dir
  }

  private val scenarioGen: Gen[(List[Op], Set[Int])] = for {
    k <- Gen.choose(1, 5)
    ops <- Gen.listOfN(k, for {
      id <- Gen.choose(1L, nBase + 2)
      up <- Gen.oneOf(true, false)
      p <- Gen.choose(0, 999).map(v => s"p$v")
    } yield Op(id, up, p))
    cuts <- if (k <= 1) Gen.const(Set.empty[Int])
      else Gen.someOf(1 until k).map(_.toSet)
  } yield (ops, cuts)

  private def split(ops: List[Op], cuts: Set[Int]): List[List[Op]] =
    ops.zipWithIndex.foldLeft(List(List.empty[Op])) { case (acc, (o, i)) =>
      if (i > 0 && cuts(i)) List(o) :: acc
      else (acc.head :+ o) :: acc.tail
    }.reverse

  private def ambiguous(b: List[Op]): Boolean =
    b.groupBy(_.id).values.exists(g =>
      g.count(_.up) > 1 || (g.exists(_.up) && g.exists(!_.up)))

  private def fold(ops: List[Op]): Map[Long, String] =
    ops.foldLeft((1L to nBase).map(i => i -> s"base$i").toMap) { (m, o) =>
      if (o.up) m + (o.id -> o.payload) else m - o.id
    }

  property("any order-consistent re-batching == the in-order fold; an " +
      "ambiguous batch fails loud BEFORE mutating, leaving the clean " +
      "prefix applied") = forAll(scenarioGen) { case (ops, cuts) =>
    val dir = clone_()
    val (t, st) = (s"$dir/t", s"$dir/s")
    val bs = split(ops, cuts)
    val firstAmb = bs.indexWhere(ambiguous)
    def applyBatch(b: List[Op]): Unit =
      IncrementalSync.runFromChangeFeed(spark,
        b.filter(_.up).map(o => (o.id, o.payload)).toDF("_id", "payload"),
        b.filterNot(_.up).map(_.id).toDF("_id"), t, st, nB)
    def liveTarget(): Map[Long, String] =
      spark.read.parquet(t).select("_id", "payload")
        .as[(Long, String)].collect().toMap
    def stateConsistent(expected: Map[Long, String]): Boolean = {
      // exactly one state row per surviving id, hash == engine hash of
      // the live row (carry-forward correctness)
      val live = spark.read.parquet(t).drop("__bucket")
      val rehash = DocHash.withDocHash(live)
        .select(col("_id").cast("string").as("_id"),
          col("doc_hash").as("hash"))
      val state = spark.read.parquet(st).drop("__bucket")
        .select("_id", "hash")
      state.count() == expected.size &&
        state.exceptAll(rehash).isEmpty && rehash.exceptAll(state).isEmpty
    }
    try {
      bs.foreach(applyBatch)
      val expected = fold(ops)
      (firstAmb == -1) :| "ambiguous batch applied silently" &&
        (liveTarget() == expected) :| "target != in-order fold" &&
        stateConsistent(expected) :| "state inconsistent with target"
    } catch {
      case e: IllegalArgumentException =>
        val msg = Option(e.getMessage).getOrElse("")
        val prefixOps = bs.take(firstAmb).flatten
        val expected = fold(prefixOps)
        (firstAmb >= 0) :| s"loud failure on a clean batching: $msg" &&
          (msg.contains("feed batch")) :| s"wrong loud message: $msg" &&
          (liveTarget() == expected) :| "failed batch half-applied" &&
          stateConsistent(expected) :| "failed batch advanced state"
    }
  }
}

/** Round-14 churn-scoped schema drift, generalized beyond the
  * `o3_sync_feed_drift` gate's single scenario: a CDC feed whose batches
  * introduce a NEW column at a random point (and mix upserts carrying it,
  * upserts without it, deletes, and unknown-id deletes in random order)
  * must leave a target whose schema-pinned read equals the in-order op
  * fold exactly — pre-drift files surface the column as null — while
  * every batch rewrites ONLY buckets its own ids hash to (the 100 TB
  * contract: write cost ∝ churn even under drift). Runs the REAL feed
  * path against a cloned bucketed bootstrap per case. */
object FeedDriftProps extends Properties("FeedDrift") {
  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.functions.{col, lit}
  import org.scalacheck.Prop.propBoolean
  import spark.implicits._
  import graft.sync.IncrementalSync

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(60)

  private case class Op(id: Long, del: Boolean, payload: String,
      extra: Option[String])

  private val nBase = 6L
  private val nB = 4 // several buckets, so un-churned ones stay pre-drift

  private lazy val template: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fdp0").toString
    IncrementalSync.runPartitioned(spark,
      (1L to nBase).map(i => (i, s"base$i")).toDF("_id", "payload"),
      s"$dir/t", s"$dir/s", nB)
    dir
  }

  private def clone_(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fdp").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    for (p <- Seq("t", "s"))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$template/$p"), fs,
        new org.apache.hadoop.fs.Path(s"$dir/$p"), false, conf)
    dir
  }

  // batches of per-id-distinct ops (unambiguous by construction): ids
  // beyond nBase exercise inserts and unknown-id deletes
  private val batchesGen: Gen[List[List[Op]]] = for {
    k <- Gen.choose(1, 3)
    bs <- Gen.listOfN(k, for {
      ids <- Gen.someOf(1L to nBase + 2)
      ops <- Gen.sequence[List[Op], Op](ids.toList.map(id => for {
        del <- Gen.frequency(1 -> true, 3 -> false)
        p <- Gen.choose(0, 99).map(v => s"p$v")
        ex <- Gen.option(Gen.choose(0, 9).map(v => s"x$v"))
      } yield Op(id, del, p, ex)))
    } yield ops)
  } yield bs

  // one Spark job for the whole (tiny) id domain — the engine's own
  // bucket expression, evaluated once and memoized
  private lazy val bucketOf: Map[Long, Int] =
    (1L to nBase + 2).map(_.toString).toDF("_id")
      .select(col("_id"), org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("_id")), lit(nB)).as("b"))
      .collect().map(r => r.getString(0).toLong -> r.getInt(1)).toMap

  private def census(dir: String): Map[String, Set[(String, Long, Long)]] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    fs.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("__bucket=")).map { d0 =>
      d0.getPath.getName -> fs.listStatus(d0.getPath).filter(_.isFile)
        .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
        .toSet
    }.toMap
  }

  property("random drift feeds: schema-pinned read == in-order fold; " +
      "every batch rewrites only its own ids' buckets") =
    forAll(batchesGen) { batches =>
      val dir = clone_()
      val (t, st) = (s"$dir/t", s"$dir/s")
      var scoped = true
      batches.foreach { b =>
        val ups = b.filterNot(_.del)
        val carries = ups.exists(_.extra.isDefined)
        val upDf =
          if (carries)
            ups.map(o => (o.id, o.payload, o.extra.orNull))
              .toDF("_id", "payload", "extra")
          else ups.map(o => (o.id, o.payload)).toDF("_id", "payload")
        val delDf = b.filter(_.del).map(_.id).toDF("_id")
        val before = census(t)
        IncrementalSync.runFromChangeFeed(spark, upDf, delDf, t, st, nB)
        val after = census(t)
        val rewritten = (before.keySet ++ after.keySet)
          .filter(k => before.get(k) != after.get(k))
        val churn = b.map(o => s"__bucket=${bucketOf(o.id)}").toSet
        scoped &&= rewritten.subsetOf(churn)
      }
      val expected = batches.flatten.foldLeft(
          (1L to nBase).map(i => i -> (s"base$i", Option.empty[String]))
            .toMap) { (m, o) =>
        if (o.del) m - o.id else m + (o.id -> (o.payload, o.extra))
      }
      val ta = IncrementalSync.readTarget(spark, t).drop("__bucket")
      val got =
        if (ta.columns.contains("extra"))
          ta.select("_id", "payload", "extra").as[(Long, String, Option[String])]
            .collect().map(r => r._1 -> (r._2, r._3)).toMap
        else ta.select("_id", "payload").as[(Long, String)]
          .collect().map(r => r._1 -> (r._2, Option.empty[String])).toMap
      val stateN = spark.read.parquet(st).count()
      (got == expected) :| s"read != fold: got=$got expected=$expected" &&
        scoped :| "a batch rewrote a bucket outside its own ids' churn" &&
        (stateN == expected.size.toLong) :|
          s"state rows $stateN != ${expected.size}"
    }
}
