package graft

import org.apache.spark.sql.functions._
import graft.scale.{TextAnalysis, Unigram}

/** Unigram-LM tokenizer: vocabulary determinism, greedy longest-prefix
  * semantics, round-trip losslessness, encode surface invariants. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("greedy longest-prefix segmentation on a toy vocabulary") {
    val words = Seq(("abab", 3L), ("aba", 2L), ("c", 1L))
      .toDF("w", "freq")
    val vocab = Seq("a", "b", "c", "ab").toDF("piece")
    val segs = Unigram.segmentWords(words, vocab, maxPieceLen = 2,
        maxRounds = 4)
      .select("w", "segs").as[(String, Seq[String])].collect().toMap
    // longest match first: "abab" -> ab|ab, "aba" -> ab|a (greedy, not
    // the a|ba a backtracking segmenter might pick)
    assert(segs("abab") == Seq("ab", "ab"))
    assert(segs("aba") == Seq("ab", "a"))
    assert(segs("c") == Seq("c"))
  }

  test("a vocabulary missing a character fails loudly, never drops the word") {
    val words = Seq(("axb", 1L)).toDF("w", "freq")
    val vocab = Seq("a", "b").toDF("piece") // no "x"
    val ex = intercept[Exception] {
      Unigram.segmentWords(words, vocab, 2, 4).collect()
    }
    assert(ex.getMessage.contains("no vocabulary piece matches"))
  }

  test("unconsumed input after maxRounds fails loudly") {
    val words = Seq(("aaaaaa", 1L)).toDF("w", "freq")
    val vocab = Seq("a").toDF("piece")
    val ex = intercept[Exception] {
      Unigram.segmentWords(words, vocab, 1, maxRounds = 3).collect()
    }
    assert(ex.getMessage.contains("not fully consumed"))
  }

  test("trained vocabulary: every corpus character kept, multi-char " +
      "pieces capped, and the result is layout-invariant") {
    val vocab = Unigram.train(docs, "text", maxPieceLen = 6, seedMulti = 24,
      keepMulti = 12, maxRounds = 8)
    val rows = vocab.as[(String, Long)].collect()
    val corpusChars = docs
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .select(explode(TextAnalysis.charSymbols(col("w"))).as("c"))
      .distinct().as[String].collect().toSet
    assert(rows.filter(_._1.length == 1).map(_._1).toSet == corpusChars)
    assert(rows.count(_._1.length >= 2) <= 12)
    assert(rows.forall(_._2 >= 0))
    val again = Unigram.train(docs.repartition(7), "text", 6, 24, 12, 8)
      .as[(String, Long)].collect()
    assert(again.toSet == rows.toSet)
  }

  test("round trip is lossless: every vocabulary word rebuilds from its " +
      "pieces exactly") {
    val vocab = Unigram.train(docs, "text", 6, 24, 12, 8)
    val rt = Unigram.roundTrip(docs, "text", vocab, 6, 8)
      .as[(String, String)].collect()
    assert(rt.nonEmpty)
    rt.foreach { case (w, rebuilt) =>
      assert(rebuilt == w, s"lossy segmentation: '$w' -> '$rebuilt'")
    }
  }

  test("encode surface: n_pieces >= n_words per doc, empty docs restored " +
      "with zero counts") {
    val withEmpty = docs.select("doc_id", "text").unionByName(
      Seq((99999L, "   ")).toDF("doc_id", "text"))
    val vocab = Unigram.train(docs, "text", 6, 24, 12, 8)
    val enc = Unigram.encode(withEmpty, "doc_id", "text", vocab, 6, 8)
      .as[(Long, Long, Long, String)].collect()
    assert(enc.length == withEmpty.count())
    enc.foreach { case (id, nw, np, _) =>
      assert(np >= nw, s"doc $id: fewer pieces ($np) than words ($nw)")
    }
    val empty = enc.find(_._1 == 99999L).get
    assert(empty._2 == 0L && empty._3 == 0L)
  }
}
