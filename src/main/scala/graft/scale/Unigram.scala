package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (SentencePiece-style vocabulary learning —
  * Kudo '18, arXiv:1804.10959 — beside the BPE family in
  * [[TextAnalysis.bpeTrain]]): seed a piece vocabulary from corpus
  * substring statistics, segment, re-estimate piece usage (the EM M-step),
  * prune to a target size, and re-segment under the pruned vocabulary.
  *
  * Deliberate deviations from the paper, for cross-engine determinism (the
  * OracleLits/gate contract): inference is GREEDY LONGEST-PREFIX match
  * (the WordPiece rule) instead of Viterbi — Viterbi's log-probability DP
  * would put transcendentals on the compared surface (the banned class;
  * see SCALE.md "Cross-engine determinism") while longest-prefix is pure
  * integer/string comparison any engine reproduces bit-for-bit; and the
  * EM "loss" of a piece is approximated by its frequency-weighted USAGE
  * under the current segmentation (prune = drop lowest-usage pieces),
  * which is the count statistic the M-step already produces. Every
  * single-character piece of the corpus is retained unconditionally, so
  * segmentation is total and encoding is LOSSLESS by construction
  * (concat(pieces) == word — property-tested).
  *
  * Scale shape (the BPE playbook): the corpus collapses ONCE to the
  * distinct-word frequency table ([[TextAnalysis.wordFreqs]], hash agg,
  * vocabulary-bounded); vocabulary seeding, both segmentation passes, and
  * usage re-estimation all run on that bounded frame — corpus size never
  * appears inside the loop. Each greedy round is one prefix explode
  * (≤ maxPieceLen rows/word) + one equi-join against the piece table +
  * one per-word argmax window, lineage-severed per round. Encoding joins
  * the per-word segmentation back to one corpus token explode — the
  * [[TextAnalysis.bpeEncode]] shape exactly. */
object Unigram {

  /** Candidate piece scores: every substring of length 1..maxPieceLen of
    * every distinct word, scored by frequency-weighted occurrence count.
    * Returns (piece, score). Vocabulary-bounded input; the explode factor
    * is ≤ maxLen·maxPieceLen per WORD, not per corpus row. */
  def pieceScores(words: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    words
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")))).as("st"))
      .select(col("w"), col("freq"), col("st"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - col("st") + 1))).as("l"))
      .select(col("w").substr(col("st"), col("l")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).cast("long").as("score"))
  }

  /** One greedy longest-prefix segmentation pass of the distinct-word
    * frame against a piece vocabulary: returns (w, freq, segs) with
    * concat(segs) == w. `vocab` must contain every single character that
    * occurs in the words (the trainer guarantees this); a remainder with
    * no matching piece — or unconsumed input after `maxRounds` — fails
    * LOUDLY rather than dropping or truncating the word. */
  def segmentWords(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    // The vocabulary is BOUNDED by construction (chars + a capped
    // multi-piece head — [[train]] caps it at seedMulti), so collect it
    // once and run the whole greedy loop as ONE expression per word:
    // `aggregate` over maxRounds steps, each taking the first piece — the
    // pieces are pre-sorted longest-first — that prefixes the remainder.
    // The previous shape (maxRounds driver rounds of prefix-explode +
    // broadcast join + per-word window, each round lineage-severed
    // through a localCheckpoint) paid ~2 Spark jobs plus a driver gap PER
    // ROUND for a vocabulary-bounded frame. Results are bit-identical:
    // pieces are distinct, so the longest matching prefix is unique (two
    // equal-length prefixes of one string are equal), and both error
    // paths keep their trigger conditions and messages. Pieces longer
    // than maxPieceLen could never match in the prefix-explode form (it
    // only tried prefixes up to maxPieceLen), so they are dropped here
    // too.
    val pieces = vocab.select(col("piece")).distinct()
      .collect().map(_.getString(0))
      .filter(_.length <= maxPieceLen)
      .sortBy(p => (-p.length, p))
    val pieceArr = array(pieces.map(lit).toSeq: _*)
    val step = (acc: Column, _: Column) => {
      val rem = acc.getField("rem")
      val matched = filter(pieceArr, p => rem.startsWith(p))
      // try_element_at: NULL (not an ANSI index error) on an empty match
      // set — the no-piece-matches case must reach the raise_error branch
      val best0 = try_element_at(matched, lit(1))
      val best = when(best0.isNull, raise_error(concat(
          lit("unigram: no vocabulary piece matches '"), rem,
          lit("' (single chars missing from vocab?)"))).cast("string"))
        .otherwise(best0)
      // consumed (or null) remainders pass through unchanged — the old
      // loop's filter(length(rem) > 0) gate, expressed per element
      when(length(rem) > 0,
        struct(
          rem.substr(length(best) + 1, length(rem)).as("rem"),
          concat(acc.getField("segs"), array(best)).as("segs")))
        .otherwise(acc)
    }
    words.select(col("w"), col("freq"),
        aggregate(
          sequence(lit(1), lit(maxRounds)),
          struct(col("w").as("rem"),
            array().cast("array<string>").as("segs")),
          step).as("__st"))
      .select(col("w"), col("freq"),
        when(length(col("__st.rem")) > 0, raise_error(concat(
          lit("unigram: word not fully consumed after "),
          lit(maxRounds).cast("string"), lit(" rounds: '"), col("w"),
          lit("'"))).cast("array<string>"))
          .otherwise(col("__st.segs")).as("segs"))
  }

  /** Train the unigram vocabulary: seed with all single characters plus
    * the `seedMulti` highest-scoring multi-char substrings, segment the
    * word table, re-estimate frequency-weighted piece usage (M-step),
    * keep all characters plus the `keepMulti` highest-usage multi-char
    * pieces. Returns (piece, usage) — usage under the SEED segmentation
    * (characters that were never used carry 0). All orderings are total
    * ((score|usage) desc, piece asc), so the vocabulary is deterministic
    * on any engine. */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int,
      seedMulti: Int, keepMulti: Int, maxRounds: Int): DataFrame = {
    require(seedMulti >= keepMulti && keepMulti >= 0,
      s"need seedMulti ($seedMulti) >= keepMulti ($keepMulti) >= 0")
    val words = graft.io.Materialize(TextAnalysis.wordFreqs(df, textCol))
    val scored = graft.io.Materialize(pieceScores(words, maxPieceLen))
    val chars = scored.filter(length(col("piece")) === 1)
    val seed = chars.select("piece").unionByName(
      scored.filter(length(col("piece")) >= 2)
        .orderBy(col("score").desc, col("piece").asc).limit(seedMulti)
        .select("piece"))
    val segged = segmentWords(words, seed, maxPieceLen, maxRounds)
    val usage = segged
      .select(explode(col("segs")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).cast("long").as("usage"))
    chars.select(col("piece")).join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
      .unionByName(usage.filter(length(col("piece")) >= 2)
        .orderBy(col("usage").desc, col("piece").asc).limit(keepMulti))
  }

  /** Encode the corpus under a trained vocabulary: per document, word
    * count, piece count, and an order-exact MD5 of the piece stream —
    * the [[TextAnalysis.bpeEncode]] gate shape (empty documents restored
    * with zero counts). One corpus token explode + one join against the
    * per-word segmentation + one per-doc aggregation. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int, maxRounds: Int): DataFrame = {
    val words = TextAnalysis.wordFreqs(df, textCol)
    val segged = segmentWords(words, vocab, maxPieceLen, maxRounds)
      .select(col("w"), array_join(col("segs"), " ").as("enc"),
        size(col("segs")).cast("long").as("n_pieces"))
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("pos", "w")))
    val perDoc = toks.join(segged, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).cast("long").as("n_pieces"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          x => x.getField("enc")), " ")).as("enc_md5"))
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("enc_md5"), md5(lit(""))).as("enc_md5"))
  }

  /** Round-trip reconstruction per word: (w, rebuilt) — `rebuilt` is the
    * concatenation of the word's pieces; losslessness means rebuilt == w
    * for every word (the bpe_roundtrip invariant). */
  def roundTrip(df: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int, maxRounds: Int): DataFrame =
    segmentWords(TextAnalysis.wordFreqs(df, textCol), vocab, maxPieceLen,
      maxRounds)
      .select(col("w"), array_join(col("segs"), "").as("rebuilt"))

  /** Convenience: trained-and-encoded in one call (the query-registry
    * entry point; constants are the gate fixture's). */
  def trainEncode(df: DataFrame, idCol: String, textCol: String,
      maxPieceLen: Int, seedMulti: Int, keepMulti: Int,
      maxRounds: Int): DataFrame = {
    val vocab = train(df, textCol, maxPieceLen, seedMulti, keepMulti,
      maxRounds)
    encode(df, idCol, textCol, vocab, maxPieceLen, maxRounds)
  }
}
