package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.VectorHashExpressions
import graft.scale.{Dedup, TextAnalysis}

/** The codegen kernels ([[graft.functions.HashKernels]]) must be
  * bit-identical to the built-in HOF formulations they replace — the HOF
  * chains are kept in [[Dedup]] as the executable specification and compared
  * here on generated inputs (unicode tokens, null elements, empty arrays). */
object VectorHashProps extends Properties("VectorHash") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(10)),
    Gen.oneOf("über", "naïve", "東京", "🙂", "", " ", "a b"))
  private val arrGen: Gen[List[String]] = Gen.listOf(tokenGen)

  /** HOF reference formulation of [[VectorHashExpressions.hashTokens]]. */
  private def hofHashTokens(elems: org.apache.spark.sql.Column) =
    transform(elems, t => Dedup.tokenHash(t))

  /** HOF reference formulation of [[VectorHashExpressions.minhashSig]]. */
  private def hofMinhash(hashed: org.apache.spark.sql.Column, k: Int) =
    array((0 until k).map { i =>
      val a = 2L * i + 1
      val b = 7919L * i + 1
      array_min(transform(hashed, h => (h * a + b) % Dedup.MinhashPrime))
    }: _*)

  property("hash_tokens == HOF md5/conv chain") = forAll(arrGen) { toks =>
    val df = Seq(Tuple1(toks)).toDF("tk")
    val r = df.select(
      VectorHashExpressions.hashTokens(col("tk")).as("kernel"),
      hofHashTokens(col("tk")).as("hof")).head()
    r.getSeq[Long](0) == r.getSeq[Long](1)
  }

  property("minhash_sig == HOF array_min/transform passes") =
    forAll(arrGen, Gen.choose(1, 16)) { (toks, k) =>
      val df = Seq(Tuple1(toks)).toDF("tk")
        .select(VectorHashExpressions.hashTokens(col("tk")).as("h"))
      val r = df.select(
        VectorHashExpressions.minhashSig(col("h"), k).as("kernel"),
        hofMinhash(col("h"), k).as("hof")).head()
      r.getSeq[java.lang.Long](0) == r.getSeq[java.lang.Long](1)
    }

  private val vecGen: Gen[List[Float]] =
    Gen.listOf(Gen.chooseNum(-10.0f, 10.0f))

  /** HOF reference formulation of [[graft.functions.VectorDot]]. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  property("vector_dot == HOF aggregate/zip_with fold (bit-identical)") =
    forAll(vecGen, vecGen) { (va, vb) =>
      val df = Seq((va, vb)).toDF("a", "b")
      val r = df.select(
        graft.functions.VectorDot(col("a"), col("b")).as("kernel"),
        hofDot(col("a"), col("b")).as("hof")).head()
      // ragged pairs → both null; else compare exact bits, not ==
      (r.isNullAt(0) && r.isNullAt(1)) ||
        (java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }

  /** HOF reference formulation of [[graft.functions.VectorSqL2]]. */
  private def hofSqL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  property("vector_sql2 == HOF aggregate/zip_with fold (bit-identical)") =
    forAll(vecGen, vecGen) { (va, vb) =>
      val df = Seq((va, vb)).toDF("a", "b")
      val r = df.select(
        graft.functions.VectorSqL2(col("a"), col("b")).as("kernel"),
        hofSqL2(col("a"), col("b")).as("hof")).head()
      (r.isNullAt(0) && r.isNullAt(1)) ||
        (java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }

  /** HOF reference formulation of [[graft.functions.SrpSignature]]: one
    * `aggregate∘zip_with` projection fold per plane, sign bit per plane —
    * each plane's accumulation runs in element order, exactly the kernel's
    * per-plane running sum. */
  private def hofSrpSignature(vec: org.apache.spark.sql.Column, bits: Int) =
    (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), i =>
          ((i * (2 * j + 1) + 3 * j) % 127 - 63).cast("double")),
          (x, wgt) => x.cast("double") * wgt),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  property("srp_signature == HOF per-plane aggregate/zip_with folds") =
    forAll(vecGen, Gen.choose(1, 60)) { (v, bits) =>
      val df = Seq(Tuple1(v)).toDF("vec")
      val r = df.select(
        graft.functions.SrpSignature(col("vec"), bits).as("kernel"),
        hofSrpSignature(col("vec"), bits).as("hof")).head()
      r.getLong(0) == r.getLong(1)
    }

  property("simhash == HOF md5-hex nibble votes") =
    forAll(arrGen, Gen.choose(1, 32)) { (toks, bits) =>
      val text = toks.mkString(" ")
      val df = Seq(Tuple1(text)).toDF("text")
      val r = df.select(
        Dedup.simhash(col("text"), bits).as("kernel"),
        Dedup.simhashFromHashes(Dedup.tokenMd5s(col("text")), bits).as("hof"))
        .head()
      r.getLong(0) == r.getLong(1)
    }
}

/** Text kernels vs their HOF executable specs ([[TextAnalysis]]). */
object TextKernelProps extends Properties("TextKernels") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf("aa", "bb", "cc", "d", "é", "詞", "x!",
      "aa")).map(_.mkString(" ")),
    Gen.asciiPrintableStr.map(_.take(40)),
    Gen.const(""), Gen.const("   "), Gen.const("a a a a a"))

  property("char_entropy kernel == sorted-run fold (raw bits)") =
    forAll(textGen) { text =>
      val r = Seq(Tuple1(text)).toDF("text").select(
        TextAnalysis.charEntropy(col("text")).as("kernel"),
        TextAnalysis.charEntropyFold(col("text")).as("hof")).head()
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))
    }

  property("ngram kernel == slice/concat_ws HOF") =
    forAll(textGen, Gen.choose(2, 4)) { (text, n) =>
      val df = Seq(Tuple1(text)).toDF("text")
        .select(TextAnalysis.tokens(lower(col("text"))).as("tk"))
      val r = df.select(
        TextAnalysis.ngramsAll(col("tk"), n).as("kernel"),
        TextAnalysis.ngramsAllHof(col("tk"), n).as("hof")).head()
      r.getSeq[String](0) == r.getSeq[String](1)
    }

  property("char ngram kernel == per-index substr HOF (incl. non-BMP)") =
    forAll(Gen.oneOf(textGen, Gen.const("a😀bé詞"), Gen.const("😀😀")),
        Gen.choose(2, 4)) { (text, n) =>
      val r = Seq(Tuple1(text)).toDF("text").select(
        TextAnalysis.charNgramsOf(col("text"), n).as("kernel"),
        TextAnalysis.charNgramsOfHof(col("text"), n).as("hof")).head()
      r.getSeq[String](0) == r.getSeq[String](1)
    }

  property("ngram repetition struct == dup/top HOF fractions (raw bits)") =
    forAll(textGen, Gen.choose(1, 3)) { (text, n) =>
      val df = Seq(Tuple1(text)).toDF("text")
        .select(TextAnalysis.tokens(lower(col("text"))).as("tk"))
      val r = df.select(
        graft.functions.TextExpressions.ngramRepetition(col("tk"), n).as("k"),
        TextAnalysis.dupFractionOfGrams(
          TextAnalysis.ngramsAllHof(col("tk"), n)).as("dup"),
        TextAnalysis.topFractionOfGrams(
          TextAnalysis.ngramsAllHof(col("tk"), n)).as("top")).head()
      val k = r.getStruct(0)
      java.lang.Double.doubleToRawLongBits(k.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)) &&
        java.lang.Double.doubleToRawLongBits(k.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(2))
    }

  property("max token run kernel == fold") =
    forAll(textGen) { text =>
      val df = Seq(Tuple1(text)).toDF("text")
        .select(TextAnalysis.tokens(lower(col("text"))).as("tk"))
      val r = df.select(
        TextAnalysis.maxTokenRun(col("tk")).as("kernel"),
        TextAnalysis.maxTokenRunFold(col("tk")).as("hof")).head()
      r.getInt(0) == r.getInt(1)
    }
}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("kernels handle null elements and empty arrays like the HOF forms") {
    val df = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq.empty[String]),
      (3L, Seq[String](null, null))).toDF("id", "tk")
    val r = df.select(col("id"),
      VectorHashExpressions.hashTokens(col("tk")).as("kh"),
      transform(col("tk"), t => Dedup.tokenHash(t)).as("hh"),
      VectorHashExpressions.minhashSig(
        VectorHashExpressions.hashTokens(col("tk")), 4).as("km"))
      .orderBy("id").collect()
    r.foreach { row =>
      assert(row.getSeq[Any](1) == row.getSeq[Any](2))
    }
    // no non-null element → every signature position is null (array_min form)
    assert(r(1).getSeq[Any](3) == Seq(null, null, null, null))
    assert(r(2).getSeq[Any](3) == Seq(null, null, null, null))
  }

  test("vector_dot: null elements poison, double arrays and mixed types work") {
    val df = Seq((Seq[java.lang.Float](1f, null, 3f), Seq(1.0, 2.0, 3.0)))
      .toDF("f", "d")
    val r = df.select(
      graft.functions.VectorDot(col("f"), col("d")).as("poisoned"),
      graft.functions.VectorDot(col("d"), col("d")).as("dd"),
      graft.functions.VectorDot(col("f"), col("f")).as("ff")).head()
    assert(r.isNullAt(0))           // null element → null, like the HOF fold
    assert(r.getDouble(1) == 14.0)  // double/double
    assert(r.isNullAt(2))           // float side still carries the null
  }

  test("vector_sql2: null poisoning, ragged null, mixed types, exactness") {
    val df = Seq((Seq[java.lang.Float](1f, null, 3f), Seq(1.0, 2.0, 4.0),
        Seq(1.0, 2.0)))
      .toDF("f", "d", "short")
    val r = df.select(
      graft.functions.VectorSqL2(col("f"), col("d")).as("poisoned"),
      graft.functions.VectorSqL2(col("d"), col("d")).as("zero"),
      graft.functions.VectorSqL2(col("d"), col("short")).as("ragged"),
      graft.functions.VectorSqL2(col("short"), col("short")).as("ss")).head()
    assert(r.isNullAt(0))           // null element → null, like the HOF fold
    assert(r.getDouble(1) == 0.0)   // self-distance exactly zero
    assert(r.isNullAt(2))           // ragged pair → null (zip_with padding)
    assert(r.getDouble(3) == 0.0)
  }

  test("null input: hash/sig propagate null, simhash keeps HOF's 0") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("text")
    val r = df.select(
      VectorHashExpressions.hashTokens(TextAnalysis.tokens(col("text"))).as("kh"),
      Dedup.simhash(col("text"), 16).as("sh"),
      Dedup.simhashFromHashes(Dedup.tokenMd5s(col("text")), 16).as("hof"))
      .head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("SQL registration: register() exposes graft_* on an existing session") {
    VectorHashExpressions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_simhash(array('alpha','beta'), 16) AS sh, " +
        "graft_minhash_sig(graft_hash_tokens(array('alpha','beta')), 4) AS sig")
      .head()
    val viaCol = Seq(Tuple1(Seq("alpha", "beta"))).toDF("tk").select(
      VectorHashExpressions.simhash(col("tk"), 16).as("sh"),
      VectorHashExpressions.minhashSig(
        VectorHashExpressions.hashTokens(col("tk")), 4).as("sig")).head()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    // builder-time route is the same injection list — must apply cleanly
    new graft.functions.GraftExtensions()(new SparkSessionExtensions)
  }

  test("kernel expressions stay inside whole-stage codegen") {
    // literal input constant-folds to LocalTableScan; a parquet scan forces
    // a real codegen stage with the kernel expressions inside it
    val df = spark.read.parquet(sf("documents"))
      .select(VectorHashExpressions.minhashSig(
        VectorHashExpressions.hashTokens(
          TextAnalysis.tokens(lower(col("text")))), 8).as("sig"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("graft_minhash_sig"), plan)
    // the Project carrying the kernels must be INSIDE a codegen stage
    // ("Project [codegen id : n]" in formatted mode), not interpreted
    assert(plan.linesIterator.exists(l =>
      l.contains("Project [codegen id :")), plan)
    df.limit(5).collect() // and the generated code must actually compile/run

    val sig = spark.read.parquet(sf("embeddings"))
      .select(graft.functions.SrpSignature(col("embedding"), 48).as("sg"))
    val sigPlan = sig.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(sigPlan.contains("graft_srp_signature"), sigPlan)
    assert(sigPlan.linesIterator.exists(l =>
      l.contains("Project [codegen id :")), sigPlan)
    sig.limit(5).collect()
  }
}
