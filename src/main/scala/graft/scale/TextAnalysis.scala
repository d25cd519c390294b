package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, document fingerprinting.
  * All are per-row built-in expressions (split/filter/aggregate/regexp —
  * whole-stage codegen'd): at 100 TB these run as one embarrassingly
  * parallel scan with zero shuffles. */
object TextAnalysis {

  /** Whitespace tokenization. Empty/whitespace-only text yields an EMPTY
    * array — `split` alone would return `[""]`, silently giving empty
    * documents one phantom token (and corrupting min-token quality
    * filters). */
  def tokens(text: Column): Column =
    array_remove(split(trim(text), "\\s+"), "")

  /** BPE-ish subword split: lowercase word pieces, digits, punctuation as
    * separate tokens (regex analogue of a byte-pair pre-tokenizer). */
  def subwordTokens(text: Column): Column =
    // space-delimit every word / digit-run / punctuation token, then split;
    // empty text yields an empty array (same phantom-token guard as tokens)
    array_remove(split(trim(regexp_replace(lower(text),
      "([a-z]+|[0-9]+|[^a-z0-9\\s])", " $1 ")), "\\s+"), "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Per-document sliding token chunks with overlap — the embedding/RAG
    * pipeline chunker. [[graft.scale.Sampling.packSequences]] is the
    * corpus-CONCATENATION packer (documents fused into fixed context
    * windows); this one keeps document boundaries and re-reads
    * `chunkTokens − strideTokens` tokens of overlap between consecutive
    * chunks so no retrieval chunk loses cross-boundary context. Chunk i
    * starts at token `i·strideTokens`; chunks are emitted until one
    * reaches the document's end (the final chunk truncates there, so
    * every token is covered exactly and no start position past the end
    * is generated). Empty documents yield no rows. Zero shuffle: one
    * tokenize + per-row sequence explode + slice. */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens]: $strideTokens")
    df.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__tk"), col("__n"),
        explode(sequence(lit(0L), expr(
          s"(greatest(__n - ${chunkTokens}L, 0L) + ${strideTokens - 1}L)" +
            s" div ${strideTokens}L"))).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * strideTokens)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(chunkTokens.toLong), col("__n") - col("start_tok"))
          .as("n_tok"),
        array_join(slice(col("__tk"),
          (col("start_tok") + 1L).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Quality scoring: token count, mean token length, stopword ratio,
    * punctuation ratio, alpha ratio. Heuristics in the spirit of published
    * web-corpus quality filters (C4/Gopher-style length+symbol rules). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val tkC = Cols.fresh("__tk", df.columns)
    val withToks = df.withColumn(tkC, tokens(t)) // tokenize once per row
    val toks = col(tkC)
    val nTok = size(toks).cast("long")
    val stop = size(filter(toks, w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
      .cast("long")
    val nChars = length(t).cast("long")
    val punct = (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("long")
    val alpha = (length(t) - length(regexp_replace(t, "[a-zA-Z]", ""))).cast("long")
    withToks.withColumn("n_tokens", nTok)
      .withColumn("n_stopwords", stop)
      .withColumn("stopword_ratio",
        when(nTok > 0, stop.cast("double") / nTok.cast("double")).otherwise(lit(0.0)))
      .withColumn("mean_token_len",
        when(nTok > 0, (nChars - (nTok - 1)).cast("double") / nTok.cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(nChars > 0, punct.cast("double") / nChars.cast("double")).otherwise(lit(0.0)))
      .withColumn("alpha_ratio",
        when(nChars > 0, alpha.cast("double") / nChars.cast("double")).otherwise(lit(0.0)))
      .drop(tkC)
  }

  /** Language ID via marker-token evidence (n-gram-frequency heuristic):
    * counts hits of per-language marker sets and elects the max, defaulting
    * to "und" when no marker fires. Deterministic, oracle-expressible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "en"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq("de", "shi", "le", "bu"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(lower(text))
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, w =>
        w.isin(markers.map(_.asInstanceOf[Any]): _*))).cast("long")
    }
  }

  /** Elect the argmax marker score; ties break to the earliest language in
    * [[langMarkers]] (the outermost `when` wins); all-zero → "und". */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lang).otherwise(acc)
    }
  }

  /** Mixed-language detection (corpus curation: documents whose language
    * flips mid-text are concatenation artifacts, boilerplate sandwiches,
    * or scraping errors — a standard drop/flag signal): the document is
    * cut into non-overlapping `chunkSize`-token chunks, each chunk's
    * language elected by [[langId]], and the per-document election
    * distribution summarized as `(n_chunks, n_langs, majority_lang,
    * n_majority)` — `n_langs > 1` (or a low `n_majority / n_chunks`)
    * flags the mix. Pure integer + string output: nothing to canonicalize
    * across engines. Documents with no tokens yield no chunks and drop
    * out (score them by length instead).
    *
    * Shuffle shape: one chunk explode (per-row), one (doc, lang) hash agg
    * with map-side partials, one doc-partitioned ranking window over the
    * ≤ |langs|-row per-doc distribution, one final doc agg — bounded by
    * chunks, never by pairwise anything. */
  def langMixture(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 50): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val tkC = Cols.fresh("__tk", df.columns)
    val perLang = df
      .withColumn(tkC, tokens(lower(col(textCol))))
      .select(col(idCol).as("doc_id"),
        explode(chunkTokens(col(tkC), chunkSize, 0)).as("__chunk"))
      .select(col("doc_id"), langId(col("__chunk")).as("lang"))
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("__c").desc, col("lang").asc)
    perLang
      .withColumn("__rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("n_chunks"),
        count(lit(1)).as("n_langs"),
        max(when(col("__rn") === 1, col("lang"))).as("majority_lang"),
        max(when(col("__rn") === 1, col("__c"))).as("n_majority"))
  }

  /** Document fingerprint: MD5 over the whitespace-collapsed, lowercased,
    * trimmed text — the exact-dedup key (rolling-hash analogue with a single
    * stable digest). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD '03): hash every token `k`-gram, slide a window of `w`
    * consecutive gram hashes, and in each window select the minimum hash —
    * RIGHTMOST position on ties (the paper's rule; encoded as the
    * lexicographic `min` of `(hash, −pos)`). Guarantees the paper proves:
    * any shared token run of ≥ `w + k − 1` tokens yields a shared
    * fingerprint (coverage), and consecutive selected positions are ≤ `w`
    * apart (density ~ 2/(w+1)) — the bounded-size local alternative to
    * [[fingerprint]]'s whole-document digest for partial-overlap detection.
    *
    * A document with fewer than `w` grams degenerates to one window over
    * all its grams (so every ≥ k-token doc still fingerprints). Output:
    * one row per distinct selected `(doc_id, fp_pos, fp_hash)` — int64
    * gate surface via the engine-portable md5-prefix hash family
    * ([[Dedup.tokenHash]]).
    *
    * 100 TB shape: gram hashing is ROWS (posexplode + codegen hash —
    * never a per-element lambda re-evaluating the tokenizer), and both
    * window passes partition on `doc_id` with the same spec (one shuffle,
    * partitions bounded by document length, never corpus-order). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(w >= 1, s"w must be >= 1: $w")
    val grams = df
      .select(col(idCol).as("doc_id"),
        posexplode(ngramsAll(tokens(lower(col(textCol))), k)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        Dedup.tokenHash(col("col")).as("gh"))
    val wSel = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val wCnt = Window.partitionBy("doc_id")
    grams
      .withColumn("__sel",
        min(struct(col("gh"), (-col("pos")).as("negpos"))).over(wSel))
      .withColumn("__g", count(lit(1)).over(wCnt))
      // valid window starts only; < w grams → the single pos-1 window
      .filter(col("pos") <= greatest(col("__g") - (w - 1), lit(1L)))
      .select(col("doc_id"), (-col("__sel.negpos")).as("fp_pos"),
        col("__sel.gh").as("fp_hash"))
      .distinct()
  }

  /** Word n-gram shingles (distinct) over a precomputed token-array column.
    * Callers should materialize the token array into its own column first
    * (one `split` per row); embedding the tokenizer inside this expression
    * would re-evaluate it per element inside the lambda. */
  def shinglesOf(toks: Column, n: Int): Column =
    array_distinct(ngramsAll(toks, n))

  /** Word n-gram shingles from raw text (convenience; for hot paths prefer
    * tokenizing into a column and calling [[shinglesOf]]). */
  def shingles(text: Column, n: Int): Column =
    shinglesOf(tokens(lower(text)), n)

  /** ALL word n-grams of a token array (with repeats — the repetition
    * denominators), unlike [[shinglesOf]] which dedupes. Codegen kernel
    * ([[graft.functions.TextExpressions.NgramArray]]) — one fused loop
    * instead of a per-gram interpreted slice+concat lambda; bit-identical
    * to [[ngramsAllHof]] by property test. */
  def ngramsAll(toks: Column, n: Int): Column =
    if (n <= 1) toks
    else graft.functions.TextExpressions.ngramArray(toks, n)

  /** HOF formulation of [[ngramsAll]] — kept as the executable spec the
    * kernel is property-tested against. */
  def ngramsAllHof(toks: Column, n: Int): Column =
    if (n <= 1) toks
    else transform(
      slice(toks, lit(1), greatest(size(toks) - (n - 1), lit(0))),
      (_, i) => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** Fixed-size token chunks with overlap (the training-data windowing
    * step: context-length-bounded chunks whose `overlap` leading tokens
    * repeat the previous chunk's tail). Chunk i covers tokens
    * [i·stride+1, i·stride+chunkSize], stride = chunkSize − overlap; the
    * last chunk may be short, and any non-empty document yields at least
    * one chunk. Returns an array of space-joined chunk strings — per-row
    * expression over a PRE-MATERIALIZED token column, zero shuffles. */
  def chunkTokens(toks: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val stride = chunkSize - overlap
    val n = greatest(
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    // empty docs: guard BEFORE sequence(0, n-1) — sequence infers step -1
    // for a descending range, so sequence(0, -1) would not be empty
    when(size(toks) > 0,
      transform(sequence(lit(0), n - 1),
        i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunkSize)))))
      .otherwise(array())
  }

  /** Fraction of n-gram occurrences that are repeats of an earlier n-gram
    * (Gopher-style "duplicate n-gram fraction", Rae et al. '21 §A1.1):
    * 1 - distinct/total, over a PRE-MATERIALIZED n-gram array column (build
    * it once with [[ngramsAll]] + `withColumn`). Per-row expression — zero
    * shuffles at any corpus size. */
  def dupFractionOfGrams(grams: Column): Column = {
    val total = size(grams)
    when(total > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram (Gopher "top n-gram fraction"), over a PRE-MATERIALIZED n-gram
    * array column. The max frequency of any element equals the longest
    * equal-element run of the SORTED array, so this is array_sort +
    * [[maxTokenRun]]'s linear fold — O(n log n) per row instead of the
    * O(distinct × total) pairwise-counting formulation. */
  def topFractionOfGrams(grams: Column): Column = {
    val total = size(grams)
    when(total > 0,
      maxTokenRun(array_sort(grams)).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Corpus-level n-gram heavy hitters: explode each document's n-grams and
    * count globally. One hash-aggregation shuffle on the gram (map-side
    * partial counts collapse before the exchange) and a top-k that plans as
    * TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    * never a global sort. Ties break lexicographically for determinism.
    * The token array is materialized as a column before the gram lambda
    * consumes it (the engine-wide lambda rule). */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(tokens(lower(col(textCol))).as("__tk"))
      .select(explode(ngramsAll(col("__tk"), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)

  /** Convenience forms over a token column — fine for ad-hoc use; hot paths
    * should materialize [[ngramsAll]] into a column and call the
    * `*OfGrams` variants (see those docs for why). */
  def dupNgramFraction(toks: Column, n: Int): Column =
    dupFractionOfGrams(ngramsAll(toks, n))
  def topNgramFraction(toks: Column, n: Int): Column =
    topFractionOfGrams(ngramsAll(toks, n))

  /** Symbol-to-token ratio (Gopher: '#' and ellipsis counted against word
    * count) — a boilerplate/markup signal. */
  def symbolRatio(text: Column, toks: Column): Column = {
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    // three-char "..." sequences; regexp count via length delta / 3
    val ellipses = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    when(size(toks) > 0,
      (hashes + ellipses).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Max run length of consecutive equal tokens — long runs of one token
    * are a classic low-quality-document signal. A left fold carrying
    * (best, current) over per-position "same as previous?" flags; the
    * empty-array guard matters because zip_with pads the shorter side with
    * nulls (an unguarded fold would see one (null, null) pair and report a
    * run of 1). */
  def maxTokenRun(toks: Column): Column =
    graft.functions.TextExpressions.maxTokenRun(toks)

  /** HOF formulation of [[maxTokenRun]] — the executable spec the codegen
    * kernel is property-tested against. */
  def maxTokenRunFold(toks: Column): Column =
    when(size(toks) === 0, lit(0)).otherwise(aggregate(
      zip_with(toks, concat(array(lit(null).cast("string")),
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0)))),
        (cur, prev) => cur <=> prev),
      struct(lit(0).as("best"), lit(0).as("cur")),
      (acc, same) => {
        val cur = when(same, acc.getField("cur") + 1).otherwise(lit(1))
        struct(greatest(acc.getField("best"), cur).as("best"), cur.as("cur"))
      },
      acc => acc.getField("best")))

  /** Shannon entropy (bits) of a text's character distribution — a cheap
    * perplexity proxy for quality filtering: low-entropy documents are
    * repetitive/boilerplate, abnormally high values flag binary junk.
    * Computed per row from the SORTED char array's run lengths (one linear
    * fold over a lambda variable — no per-distinct-char rescans), zero
    * shuffles at any corpus size. Rounded to 6 decimals so the value is
    * stable across engines' float-summation orders. Codegen kernel
    * ([[graft.functions.TextExpressions.CharEntropy]]); [[charEntropyFold]]
    * is the HOF spec it is property-tested against. */
  def charEntropy(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(round(graft.functions.TextExpressions.charEntropy(text), 6))

  /** Integer-micro gate surface of [[charEntropy]]: `floor(raw·10⁶)` of
    * the unrounded kernel value — same 10⁻⁶ granularity as the rounded
    * view, but no round-half mode for engine builds to disagree on and an
    * int64 compared surface (the pattern-1 gate contract, SCALE.md). */
  def charEntropyMicro(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(floor(
        graft.functions.TextExpressions.charEntropy(text) * lit(1e6)))

  /** HOF formulation of [[charEntropy]] (the executable spec): a single
    * fold over the sorted char array's runs. */
  def charEntropyFold(text: Column): Column = {
    val cs = array_sort(charSymbols(text))
    val n = length(text).cast("double")
    def term(k: Column): Column = {
      val p = k.cast("double") / n
      -p * log2(p)
    }
    // single fold over a FLAT accumulator (prev char, current run length,
    // entropy so far): each run boundary folds its term in immediately —
    // an array-building accumulator would copy O(run count) state per
    // element, turning the fold O(n²) per row (measured 8 s at sf0.1
    // before this shape; 1-2 s after)
    val acc0 = struct(lit("").as("prev"), lit(0L).as("cnt"), lit(0.0).as("ent"))
    val ent = aggregate(cs, acc0,
      (acc, c) => {
        val prev = acc.getField("prev")
        val cnt = acc.getField("cnt")
        val e = acc.getField("ent")
        when(cnt === 0L, struct(c.as("prev"), lit(1L).as("cnt"), e.as("ent")))
          .when(c === prev,
            struct(prev.as("prev"), (cnt + 1L).as("cnt"), e.as("ent")))
          .otherwise(struct(c.as("prev"), lit(1L).as("cnt"),
            (e + term(cnt)).as("ent")))
      },
      acc => when(acc.getField("cnt") > 0L,
        acc.getField("ent") + term(acc.getField("cnt")))
        .otherwise(acc.getField("ent")))
    when(length(text) === 0, lit(0.0)).otherwise(round(ent, 6))
  }

  /** Benchmark decontamination: drop documents whose word n-gram set
    * overlaps a contamination list (eval-set n-grams — the standard
    * training-data hygiene step). The list must be broadcast-sized (eval
    * sets are). Shape: grams explode under a Generate (whose child
    * projection materializes the token array ONCE per row — a plain
    * `withColumn` + filter would be projection-collapsed, inlining the
    * tokenizer into the gram lambda and re-running it per gram, O(tokens²)
    * per row), matching grams reduce to a small id set, and the id set
    * anti-joins the corpus (AQE broadcasts it). */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
      contaminated: Seq[String], n: Int): DataFrame = {
    require(contaminated.nonEmpty, "contamination list is empty")
    val tkC = Cols.fresh("__tk", df.columns)
    val gC = Cols.fresh("__g", df.columns)
    val matched = df
      .select(col(idCol), tokens(lower(col(textCol))).as(tkC))
      .select(col(idCol), explode(array_distinct(ngramsAll(col(tkC), n))).as(gC))
      .filter(col(gC).isin(contaminated.map(_.asInstanceOf[Any]): _*))
      .select(idCol)
    df.join(matched, Seq(idCol), "left_anti")
  }

  /** Blocklist screening (the bad-words pass every web-corpus filter chain
    * runs before training): count of lowercased tokens matching `terms`.
    * The list rides inside the plan as an array literal — effectively a
    * broadcast — and the count is a per-row higher-order filter over the
    * token array: zero shuffles, codegen-friendly, scales per-row. Counts
    * token OCCURRENCES (a doc repeating one bad word n times scores n). */
  def blocklistHits(text: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty, "blocklist is empty")
    val lits = typedLit(terms)
    size(filter(tokens(lower(text)), t => array_contains(lits, t)))
  }

  /** Per-word frequency table — the bounded state BPE training runs on:
    * corpus-sized input reduces to vocabulary-sized rows in one hash agg. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    // tokenize+explode is the heavy map side here; fan a narrow-scan
    // corpus out so it doesn't run single-task (no-op at scale)
    graft.io.FanOut(df.select(col(textCol)))
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Character-split of a string (the initial BPE symbol sequence; also the
    * entropy alphabet). One regex-split pass — per-index `substring` would
    * seek from the string start each time (UTF-8 is variable-width), making
    * extraction O(n²) per row. The empty-string artifacts of zero-width
    * splitting are removed (real elements are never empty).
    *
    * Splits on CODE POINTS, not UTF-16 code units: Spark's `split` runs on
    * UTF8String and a zero-width match never lands inside a multi-byte
    * sequence, so a supplementary-plane char (emoji) stays one symbol —
    * the same semantics as DuckDB's code-point `substr`/`length`, which
    * the `bpe_pair_freqs` oracle relies on. Pinned by the non-BMP test in
    * ScaleSpec ("charSymbols: code points, not UTF-16 units"). */
  def charSymbols(w: Column): Column =
    array_remove(split(w, ""), "")

  /** Adjacent-symbol pair counts weighted by word frequency — the BPE
    * statistic. `symCol` is an `array<string>` symbol column, `freqCol` the
    * word count. One hash-agg shuffle over vocabulary-sized input. */
  def pairCounts(vocab: DataFrame, symCol: String, freqCol: String): DataFrame =
    vocab
      .select(col(freqCol).as("freq"), explode(zip_with(
        slice(col(symCol), lit(1), greatest(size(col(symCol)) - 1, lit(0))),
        slice(col(symCol), lit(2), greatest(size(col(symCol)) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("freq"))

  /** Byte-pair-encoding tokenizer training (Sennrich et al. '16), shaped
    * for scale: the corpus collapses to a word-frequency table once (hash
    * agg, vocabulary-bounded), and each merge round is one vocabulary-sized
    * pair-count aggregation + a single-row argmax — corpus size never
    * appears in the loop. The chosen pair is applied with a greedy
    * left-to-right fold (classic BPE merge order); each round's vocabulary
    * is lineage-severed via [[graft.io.Materialize]] so plans stay flat.
    * Returns the merge table (rank, left, right, pair_freq) — ties on
    * frequency break lexicographically for determinism. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = graft.io.Materialize(
      wordFreqs(df, textCol).select(charSymbols(col("w")).as("sym"), col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(vocab, "sym", "freq")
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, a, b, f))
        val merged = a + b
        // greedy left fold: consume (a, b) pairs left-to-right, so "aaa"
        // under merge (a,a) becomes (aa, a) — standard BPE application
        vocab = graft.io.Materialize(vocab.select(
          aggregate(col("sym"), array().cast("array<string>"), (acc, s) =>
            when(size(acc) > 0 &&
              element_at(acc, -1) === lit(a) && s === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
              .otherwise(concat(acc, array(s)))).as("sym"),
          col("freq")))
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
  }

  /** Apply a trained BPE merge table ([[bpeTrain]] output, rank order) to
    * tokenize documents. Scale shape: merges are applied to the DISTINCT
    * word vocabulary, never the corpus — each word's symbol sequence is a
    * control-char-delimited string (the same cell encoding the bpe_merges
    * oracle uses) and each merge is one literal `replace`, whose
    * left-to-right non-overlapping scan IS the greedy BPE fold. The
    * encoded vocabulary then equi-joins one corpus token explode (AQE
    * broadcasts it when small) and a single per-doc aggregation emits
    * counts plus an order-exact MD5 of the joined symbol stream. Corpus
    * cost: one explode + one join + one agg, independent of merge count. */
  /** Per-WORD BPE encoding over the corpus' distinct-word vocabulary:
    * (w, enc, n_syms) with `enc` the space-joined subword sequence. The
    * merge fold runs on the vocabulary only — the corpus is never
    * re-scanned per merge. */
  def bpeEncodeWords(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val d1 = "\u0001"
    val d2 = "\u0002"
    val words = df
      .select(explode(tokens(lower(col(textCol)))).as("w")).distinct()
    val init = array_join(
      transform(charSymbols(col("w")), c => concat(lit(d1), c, lit(d2))), "")
    val folded = merges.foldLeft(init) { case (s, (a, b)) =>
      replace(s, lit(d1 + a + d2 + d1 + b + d2), lit(d1 + a + b + d2))
    }
    // strip the outer delimiters, then cell boundary d2+d1 -> space
    val body = folded.substr(lit(2), length(folded) - 2)
    words.select(col("w"),
      replace(body, lit(d2 + d1), lit(" ")).as("enc"),
      size(split(body, d2 + d1)).as("n_syms"))
  }

  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val wordEnc = bpeEncodeWords(df, textCol, merges)
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "w")))
    val perDoc = toks.join(wordEnc, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).cast("long").as("n_bpe_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          x => x.getField("enc")), " ")).as("enc_md5"))
    // empty documents have no tokens to explode — restore them with zeros
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("enc_md5"), md5(lit(""))).as("enc_md5"))
  }

  /** The PII families, IN REDACTION ORDER — order is load-bearing:
    * email first (its digits must not feed the number families), IPv6
    * before IPv4 (mixed-notation addresses contain a dotted quad), IPv4 /
    * SSN / card all before the greedy phone pattern (which would swallow
    * a dotted quad, a 123-45-6789 SSN, or a 16-digit card as one "long
    * digit run"). SSN (9 digits) and card (13+ digits) cannot overlap.
    * Patterns kept regex-dialect-portable (character classes + bounded
    * repetition only — no shorthand classes, lookarounds, backreferences)
    * so the same strings run under Java regex and RE2/DuckDB. IPv6 covers
    * the uncompressed ≥4-group forms; `::`-compressed addresses are out
    * of scope (a portable pattern for them collides with time ranges). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "<EMAIL>", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]+"),
    ("ipv6", "<IPV6>", "[0-9a-fA-F]{1,4}(:[0-9a-fA-F]{1,4}){3,7}"),
    ("ipv4", "<IPV4>", "([0-9]{1,3}[.]){3}[0-9]{1,3}"),
    ("ssn", "<SSN>", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("card", "<CARD>", "[0-9]([ -]?[0-9]){12,18}"),
    ("phone", "<PHONE>", "[+]?[0-9][0-9 ()+.-]{7,}[0-9]"))

  /** PII redaction: every [[piiPatterns]] family replaced with its typed
    * token, applied in family order. Zero-shuffle per-row projection. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, tok, pat)) =>
      regexp_replace(c, pat, tok)
    }

  /** Per-family redaction counters — the operational report a curation
    * run needs next to the redacted text (how much PII, of what kind,
    * per document). Each family's matches are counted on the text AS IT
    * LOOKS WHEN THAT FAMILY RUNS (the staged [[redactPii]] order), so a
    * string is attributed to exactly one family and Σcounts = tokens
    * inserted. Every stage lands in its own column (multi-referenced —
    * count + next stage — so CollapseProject keeps it un-inlined and each
    * regex runs once per row); output is (id, n_<family>… int64,
    * redacted), a zero-shuffle scan. */
  def redactPiiStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stageC = Cols.fresh("__stage", df.columns)
    var cur = df.select(col(idCol), col(textCol).as(stageC))
    piiPatterns.foreach { case (name, tok, pat) =>
      cur = cur
        .withColumn(s"n_$name",
          size(regexp_extract_all(col(stageC), lit(pat), lit(0)))
            .cast("long"))
        .withColumn(stageC, regexp_replace(col(stageC), pat, tok))
    }
    cur.select(col(idCol) +:
      piiPatterns.map(p => col(s"n_${p._1}")) :+
      col(stageC).as("redacted"): _*)
  }

  /** Per-(doc, term) TF-IDF over the lowercased whitespace tokenizer:
    * tf = raw term count in the doc, idf = ln((N+1)/(df+1)) + 1 (smoothed,
    * sklearn-style so unseen terms stay finite), score = tf·idf rounded to
    * 6 decimals (rank-stable across engines/partitionings).
    *
    * Shuffle shape: one hash agg on (doc, term), one on term (vocabulary-
    * sized doc frequencies — stays distributed, never collected), a
    * shuffle join back on term, and a one-row broadcast for N. No step
    * holds more than a partition's terms in memory. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tfidfRaw(df, idCol, textCol)
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("score_raw"), 6).as("score"))

  /** The raw-score frame behind [[tfidf]]: `score_raw` is the unrounded
    * double `tf · (ln((N+1)/(df+1)) + 1)`. Gate consumers truncate it to
    * integer micro units (`floor(raw·10⁶)` — same 10⁻⁶ granularity as the
    * rounded view, but no round-half mode and an int64 compared surface);
    * [[tfidf]] keeps the rounded-double view for interactive use. */
  def tfidfRaw(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
          .as("score_raw"))
  }

  /** Corpus bigram language model: one row per observed bigram with its
    * add-one-smoothed conditional log2-probability
    * `log2((c(w1 w2) + 1) / (c(w1 ·) + V))`, V = corpus vocabulary size.
    *
    * Shuffle shape: one hash agg on the bigram (map-side combine collapses
    * repeats before the exchange), one vocabulary-sized agg on `w1` for the
    * continuation denominators re-joined on `w1`, and two one-row
    * broadcasts (V). The LM is `#distinct bigrams` rows — bounded by the
    * vocabulary squared, not the corpus — and stays a DataFrame: at 100 TB
    * it feeds the scorer through an ordinary shuffle join (or a broadcast
    * when the vocabulary is small), never driver memory.
    *
    * `logp` is quantized to DECIMAL(18,6) so downstream per-document sums
    * are exact-decimal (order-independent under repartitioning/AQE) and
    * the last digit is out of reach of JVM-vs-libm `ln` ULP differences
    * (the same cross-engine granularity as [[tokenDriftTerms]]). */
  def bigramLm(df: DataFrame, textCol: String): DataFrame = {
    val toks = df.select(tokens(lower(col(textCol))).as("__tk"))
    val vocab = toks.select(explode(col("__tk")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val c12 = toks.select(explode(ngramsAll(col("__tk"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(split(col("bigram"), " ")(0).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    c12.withColumn("w1", split(col("bigram"), " ")(0))
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("bigram"),
        (log((col("c12") + lit(1.0)) / (col("c1") + col("v"))) / log(lit(2.0)))
          .cast("decimal(18,6)").as("logp"))
  }

  /** All character n-grams of the lowercased text (positions 1..len-n+1),
    * via the O(len) codegen kernel
    * ([[graft.functions.TextExpressions.CharNgramArray]]) — the HOF form
    * [[charNgramsOfHof]] stays as the executable spec (property-tested
    * equal) but its per-index `substr` re-seeks the UTF-8 string from the
    * start each time, O(len²) per row. */
  def charNgramsOf(text: Column, n: Int): Column =
    coalesce(
      graft.functions.TextExpressions.charNgramArray(lower(text), n),
      array())

  /** HOF executable spec for [[charNgramsOf]]. Texts shorter than n yield
    * an EMPTY array — the guard must come before `sequence`, which infers
    * step -1 for a descending range, so sequence(1, 0) would be [1, 0],
    * not [] (same pitfall as [[chunkTokens]]). */
  def charNgramsOfHof(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)), i => t.substr(i, lit(n))))
      .otherwise(array())
  }

  /** Character-n-gram language identification (the Cavnar-Trenkle '94
    * shape): per-language char-trigram count profiles are TRAINED from the
    * labeled corpus and each document is classified by cosine similarity
    * of integer n-gram count vectors — train and classify in one plan.
    *
    * Shuffle shape: ONE corpus explode feeding the (doc, lang, gram) hash
    * agg; the language profiles REUSE that aggregate (lang rides the doc
    * grouping key — it is functionally dependent on the doc — so the
    * per-language counts are a second, vocabulary-sized aggregation over
    * the doc vectors, and Spark's exchange reuse runs the expensive gram
    * explode exactly once for all three consumers). Then a join on the
    * gram and a per-doc ranking window; the language norms broadcast. Dot
    * products are exact integer sums; the cosine is rounded to 6 decimals
    * so the argmax is stable across engines (ties break to the
    * lexicographically first language). Complements [[langId]]'s fixed
    * marker-token election with a data-driven model.
    *
    * `profileTopN` > 0 restricts each language profile to its top-N
    * grams ((count desc, gram) total order) — Cavnar-Trenkle's actual
    * formulation (they use ~300) and the scale lever: the docGrams⋈profile
    * join's fan-out is bounded by the grams the PROFILES share instead of
    * the corpus vocabulary, cutting the join roughly 10× while the argmax
    * is unchanged for any N past the decision margin. The pruning is the
    * skew-safe two-phase topPerGroup (no single-task vocabulary sort). */
  def charNgramLangId(df: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int = 3, profileTopN: Int = 0): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      explode(charNgramsOf(col(textCol), n)).as("g"))
    val docVec = grams.groupBy("doc_id", "lang", "g").agg(count(lit(1)).as("dc"))
    val langVecAll = docVec.groupBy("lang", "g").agg(sum(col("dc")).as("lc"))
    val langVec =
      if (profileTopN <= 0) langVecAll
      else Sampling.topPerGroup(langVecAll, "lang", col("g"), profileTopN,
        Seq(col("lc").desc, col("g").asc)).drop("rank")
    // the doc's OWN lang is training metadata — it must not collide with
    // the candidate lang every doc is scored against below
    val docGrams = docVec.drop("lang")
    val docNorm = docGrams.groupBy("doc_id")
      .agg(sqrt(sum(col("dc") * col("dc"))).as("dn"))
    val langNorm = langVec.groupBy("lang")
      .agg(sqrt(sum(col("lc") * col("lc"))).as("ln"))
    val dots = docGrams.join(langVec, "g")
      .groupBy("doc_id", "lang").agg(sum(col("dc") * col("lc")).as("dot"))
    val scored = dots.join(docNorm, "doc_id").join(broadcast(langNorm), "lang")
      .select(col("doc_id"), col("lang"),
        round(col("dot") / (col("dn") * col("ln")), 6).as("cos"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("cos").desc, col("lang").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("predicted_lang"))
  }

  /** Corpus collocations by pointwise mutual information: bigrams whose
    * observed frequency beats the independence expectation —
    * `pmi = log2( (c_ab/N_bi) / ((c_a/N_tok)·(c_b/N_tok)) )` — the phrase
    * detection step of tokenizer/vocabulary construction (Mikolov et al.
    * '13 use the same ratio test). `minCount` suppresses the low-frequency
    * noise PMI is notorious for.
    *
    * Shuffle shape: one bigram hash agg (the bigram total derives from it
    * before the min-count filter — no third corpus scan), one unigram hash
    * agg joined to both bigram endpoints, two one-row broadcasts for the
    * totals; PMI is rounded to 6 decimals so top-k ranking is
    * engine-stable (ties break lexicographically). */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame =
    collocationsScored(df, textCol, minCount)
      .select(col("bigram"), col("c_ab"), round(col("__pmi"), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)

  /** Integer-micro gate surface of [[collocations]]: `pmi_micro =
    * floor(raw·10⁶)` (same 10⁻⁶ granularity as the rounded view, no
    * round-half mode, int64 compared surface) ranked by the integer total
    * order (pmi_micro desc, bigram). */
  def collocationsMicro(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame =
    collocationsScored(df, textCol, minCount)
      .select(col("bigram"), col("c_ab"),
        floor(col("__pmi") * lit(1e6)).as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram").asc)
      .limit(k)

  /** The shared raw-PMI frame behind [[collocations]]/[[collocationsMicro]]:
    * one row per surviving bigram with the unrounded double `__pmi`. */
  private def collocationsScored(df: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    val toks = df.select(tokens(lower(col(textCol))).as("__tk"))
    val uni = toks.select(explode(col("__tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val nTok = uni.agg(sum(col("c_w")).as("n_tok"))
    val biAll = toks.select(explode(ngramsAll(col("__tk"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
    val nBi = biAll.agg(sum(col("c_ab")).as("n_bi"))
    val bi = biAll.filter(col("c_ab") >= minCount)
    bi.withColumn("w1", split(col("bigram"), " ")(0))
      .withColumn("w2", split(col("bigram"), " ")(1))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_2")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .select(col("bigram"), col("c_ab"),
        (log((col("c_ab").cast("double") / col("n_bi")) /
          ((col("c_1").cast("double") / col("n_tok")) *
            (col("c_2").cast("double") / col("n_tok")))) / log(lit(2.0)))
          .as("__pmi"))
  }

  /** Corpus drift detection: per-token Jensen-Shannon divergence terms
    * between two corpus snapshots' token distributions (the crawl-over-
    * crawl monitoring statistic; JS is symmetric, bounded by 1 bit, and
    * defined even for tokens present on only one side).
    *
    * Returns one row per token in either vocabulary with its contribution
    * `0.5·p·log2(p/m) + 0.5·q·log2(q/m)` (m = (p+q)/2; a side's term is 0
    * where its probability is 0), quantized to DECIMAL(18,6) — coarse
    * enough that JVM-vs-libm `ln` ULP differences cannot flip the last
    * digit across engines, fine enough that drift ranking is unaffected —
    * so the
    * total divergence is an exact-decimal `sum(js_term)`, stable under
    * partitioning, and the heaviest drifting tokens rank directly.
    *
    * Shuffle shape: one token hash agg per side (map-side combine), a
    * full-outer join on the token, two one-row broadcasts for the totals.
    * Vocabulary-bounded output; nothing driver-resident. */
  def tokenDriftTerms(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.select(explode(tokens(lower(col(textCol)))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("c"))
    val ca = counts(a)
    val cb = counts(b)
    val na = ca.agg(sum(col("c")).as("n_a"))
    val nb = cb.agg(sum(col("c")).as("n_b"))
    val lg2 = log(lit(2.0))
    def term(p: Column, m: Column): Column =
      when(p > 0, p * (log(p / m) / lg2) * 0.5).otherwise(lit(0.0))
    ca.withColumnRenamed("c", "c_a")
      .join(cb.withColumnRenamed("c", "c_b"), Seq("token"), "full_outer")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("token"), {
        val p = coalesce(col("c_a"), lit(0L)).cast("double") / col("n_a")
        val q = coalesce(col("c_b"), lit(0L)).cast("double") / col("n_b")
        val m = (p + q) / 2
        (term(p, m) + term(q, m)).cast("decimal(18,6)").as("js_term")
      })
  }

  /** Integer-exact drift ranking — the engine-portable companion of
    * [[tokenDriftTerms]]: per token, `drift_x = |c_a·n_b − c_b·n_a|`, the
    * cross-multiplied total-variation contribution (equal to
    * `n_a·n_b·|p − q|`). Ranking by `drift_x` orders tokens exactly as
    * `|p − q|` does, with NO floating point anywhere — no division, no
    * log, no quantization — so the result is bit-identical across engines
    * by construction (the canonicalization pattern of `nb_calibration` /
    * `bpe_fertility`). Products are carried in DECIMAL(37,0): at 100 TB
    * the per-side token totals can pass 2^31, and an int64 product of two
    * such counts would overflow.
    *
    * Same shuffle shape as [[tokenDriftTerms]]: one token agg per side,
    * a full-outer join on the token, two 1-row broadcasts. */
  def tokenDriftCounts(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.select(explode(tokens(lower(col(textCol)))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("c"))
    val ca = counts(a)
    val cb = counts(b)
    val na = ca.agg(sum(col("c")).as("n_a"))
    val nb = cb.agg(sum(col("c")).as("n_b"))
    ca.withColumnRenamed("c", "c_a")
      .join(cb.withColumnRenamed("c", "c_b"), Seq("token"), "full_outer")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("token"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"),
        abs(coalesce(col("c_a"), lit(0L)).cast("decimal(18,0)") *
            col("n_b").cast("decimal(18,0)") -
          coalesce(col("c_b"), lit(0L)).cast("decimal(18,0)") *
            col("n_a").cast("decimal(18,0)")).as("drift_x"))
  }

  /** Per-document cross-entropy under a corpus bigram LM (the CCNet/KenLM-
    * style perplexity quality filter: docs that surprise the corpus LM are
    * boilerplate, gibberish, or off-distribution): mean −log2 P(w2|w1) over
    * the document's bigrams, with repeats. Documents with fewer than two
    * tokens have no bigrams and drop out (score them by length instead).
    *
    * The per-doc aggregation sums the LM's DECIMAL-quantized logp exactly,
    * so the result is bit-stable under any partitioning; the mean is
    * rounded to 4 decimals. One shuffle join on the bigram + one hash agg
    * on the doc id. When the LM was trained on the same corpus every
    * bigram hits (inner join is lossless); against a foreign LM, feed
    * `lm` through a left join + OOV floor first. */
  def lmCrossEntropy(df: DataFrame, idCol: String, textCol: String,
      lm: DataFrame): DataFrame =
    df.select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("__tk"))
      .select(col("doc_id"), explode(ngramsAll(col("__tk"), 2)).as("bigram"))
      .join(lm, "bigram")
      .groupBy("doc_id")
      .agg(round((-sum(col("logp"))).cast("double") / count(lit(1)), 4)
        .as("cross_entropy_bits"),
        count(lit(1)).as("n_bigrams"))

  /** Division-free gate surface of [[lmCrossEntropy]]: the per-doc
    * `(Σ −logp, n)` sufficient statistics with the exact 6-decimal logp
    * sum carried as int64 micro units (`neg_logp_sum_micro = Σ −logp ×
    * 10⁶` exactly — the logp quantities are exact decimals, so this is
    * pure integer arithmetic end to end). Mean bits = sum/10⁶/n, derived
    * by callers; nothing on the compared surface divides or floats. */
  def lmCrossEntropyStats(df: DataFrame, idCol: String, textCol: String,
      lm: DataFrame): DataFrame =
    df.select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("__tk"))
      .select(col("doc_id"), explode(ngramsAll(col("__tk"), 2)).as("bigram"))
      .join(lm, "bigram")
      .groupBy("doc_id")
      .agg(((-sum(col("logp"))) * 1000000).cast("long")
        .as("neg_logp_sum_micro"),
        count(lit(1)).as("n_bigrams"))

  /** Cross-source n-gram overlap matrix (corpus QA: which sources share
    * content — mirror sites, syndication, cross-source contamination):
    * Jaccard similarity of the DISTINCT n-gram sets of every source pair.
    * Pairs with zero overlap are omitted (inner-join semantics).
    *
    * 100 TB shape: the (group, gram) table is reduced by `distinct` FIRST,
    * so the gram-keyed self-join expands each gram to at most
    * |groups|²/2 pairs (groups = sources, a small set) — never a
    * document-level cross join; everything downstream of the distinct is
    * bounded by |groups|² rows. Jaccard divides exact integers in IEEE
    * double (both < 2^53 — deterministic), quantized DECIMAL(18,6). */
  def sourceOverlap(docs: DataFrame, groupCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val grams = docs
      .select(col(groupCol).as("grp"),
        explode(ngramsAll(tokens(lower(col(textCol))), n)).as("gram"))
      .distinct()
    val sizes = grams.groupBy("grp").agg(count(lit(1)).as("sz"))
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("grp", "grp_a")
        .withColumnRenamed("sz", "sz_a"), Seq("grp_a"))
      .join(sizes.withColumnRenamed("grp", "grp_b")
        .withColumnRenamed("sz", "sz_b"), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("n_common"),
        (col("sz_a") + col("sz_b") - col("n_common")).as("n_union"),
        (col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")).cast("double"))
          .cast("decimal(18,6)").as("jaccard"))
  }

  /** Multinomial Naive-Bayes quality model trained in-engine (the
    * fastText/CCNet-shaped "does this look like the curated pool?" filter
    * used by GPT-3/LLaMA-style data pipelines): token counts per class →
    * top-`vocab` tokens under the TOTAL order (count desc, token asc) →
    * add-1-smoothed log likelihoods per class, quantized to DECIMAL(18,6)
    * in-engine so downstream score sums are exact.
    *
    * 100 TB shape: one explode+groupBy(token) with map-side partials, a
    * top-`vocab` TakeOrderedAndProject (no global sort), and a 1-row
    * broadcast for the in-vocab totals. The model is `vocab` rows —
    * broadcastable by construction. */
  def nbTrain(docs: DataFrame, textCol: String, isPositive: Column,
      vocab: Int = 512): DataFrame =
    nbFromCounts(nbCounts(docs, textCol, isPositive), vocab)

  /** Per-class token counts — the MERGEABLE sufficient statistic behind
    * [[nbTrain]]: counts are additive, so a growing corpus trains
    * incrementally by [[nbMergeCounts]]-ing each batch's counts into the
    * persisted state and re-finalizing with [[nbFromCounts]] — no re-scan
    * of history, the same state-plus-batch shape as the incremental dedup
    * family. One explode+groupBy(token) with map-side partials. */
  def nbCounts(docs: DataFrame, textCol: String, isPositive: Column): DataFrame =
    docs
      .select(isPositive.as("__pos"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("c_neg"))

  /** Merge two [[nbCounts]] states (token-keyed sum — one shuffle on the
    * vocabulary-sized frames, never on documents). */
  def nbMergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("token")
      .agg(sum("c_pos").as("c_pos"), sum("c_neg").as("c_neg"))

  /** The vocabulary restriction of [[nbFromCounts]] WITHOUT the log
    * finalize: top-`vocab` tokens with their raw per-class counts — the
    * integer-exact model surface (sufficient statistics; callers derive
    * likelihoods via [[nbFromCounts]]). Because the output is pure int64,
    * it is bit-identical across engines with no canonicalization contract
    * at all — the gate-facing shape for model dumps. */
  def nbTopCounts(counts: DataFrame, vocab: Int): DataFrame = {
    require(vocab > 0, s"vocab must be positive: $vocab")
    counts
      .orderBy((col("c_pos") + col("c_neg")).desc, col("token").asc)
      .limit(vocab)
      .select(col("token"), col("c_pos"), col("c_neg"))
  }

  /** Finalize a counts state into the likelihood model: top-`vocab` tokens
    * under the (count desc, token) TOTAL order, add-1 log likelihoods
    * quantized DECIMAL(18,6). Because counts are additive and the vocab
    * order is a function of the counts alone, finalize(merge(batches)) is
    * IDENTICAL to retraining on the concatenated corpus. */
  def nbFromCounts(counts: DataFrame, vocab: Int): DataFrame = {
    require(vocab > 0, s"vocab must be positive: $vocab")
    val top = counts
      .orderBy((col("c_pos") + col("c_neg")).desc, col("token").asc)
      .limit(vocab)
    val totals = top.agg(sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"))
    // keep the arithmetic shape (c + 1.0) / (n + V) bit-identical to the
    // DuckDB oracle; the one quantized ln absorbs libm ULP differences
    top.crossJoin(broadcast(totals))
      .select(col("token"),
        log((col("c_pos") + 1.0) / (col("n_pos") + vocab))
          .cast("decimal(18,6)").as("logp_pos"),
        log((col("c_neg") + 1.0) / (col("n_neg") + vocab))
          .cast("decimal(18,6)").as("logp_neg"))
  }

  /** Score every document under a [[nbTrain]] model: prior log-odds plus
    * the per-occurrence sum of `logp_pos − logp_neg` over the document's
    * in-vocabulary tokens (out-of-vocabulary tokens are ignored — the
    * standard vocabulary-restricted NB). `predicted` = 1 iff score > 0.
    *
    * One broadcast join token→model (no shuffle), one groupBy(id) with
    * map-side partials, one id-keyed join back for vocab-less documents
    * (they score the bare prior). All sums are exact decimal arithmetic —
    * partition-order-stable, bit-equal across engines. */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      isPositive: Column, vocab: Int = 512): DataFrame = {
    val model = nbTrain(docs, textCol, isPositive, vocab)
    val prior = docs
      .agg(sum(when(isPositive, 1L).otherwise(0L)).as("np"),
        sum(when(isPositive, 0L).otherwise(1L)).as("nn"))
      .select(log((col("np") + 1.0) / (col("nn") + 1.0))
        .cast("decimal(18,6)").as("__prior"))
    nbScoreWith(docs, idCol, textCol, model, prior)
  }

  /** Score against an EXISTING model frame `(token, logp_pos, logp_neg)`
    * and 1-row prior frame `(__prior)` — the deployment shape (a trained
    * model is state, not something every scoring job re-derives), and the
    * seam that lets a caller who has already materialized the model feed
    * it back without paying the training aggregation twice. */
  def nbScoreWith(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, prior: DataFrame): DataFrame = {
    val delta = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .join(broadcast(model), Seq("token"))
      .groupBy(idCol)
      .agg(sum(col("logp_pos") - col("logp_neg")).as("__delta"))
    docs.select(col(idCol))
      .join(delta, Seq(idCol), "left_outer")
      .crossJoin(broadcast(prior))
      .select(col(idCol),
        (coalesce(col("__delta"), lit(0)) + col("__prior"))
          .cast("decimal(18,6)").as("score"))
      .withColumn("predicted",
        when(col("score") > 0, 1L).otherwise(0L))
  }

  /** Integer-micro gate surface of [[nbScoreWith]]: score against a model
    * whose 6-decimal log likelihoods are shipped as exact MICRO-UNIT longs
    * (`(token, lpos_micro, lneg_micro)`, value × 10⁶ — integral by
    * construction) plus a 1-row micro prior (`__prior_micro`). The per-doc
    * score is a pure int64 sum — `score_micro = score × 10⁶` exactly, and
    * `predicted` is the same integer comparison. No DECIMAL/DOUBLE on the
    * compared surface (the cross-engine "pattern 1" contract, SCALE.md).
    * Same plan shape as [[nbScoreWith]]: broadcast token→model join,
    * one groupBy(id), left join back for vocab-less docs. */
  def nbScoreMicroWith(docs: DataFrame, idCol: String, textCol: String,
      modelMicro: DataFrame, priorMicro: DataFrame): DataFrame = {
    val delta = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .join(broadcast(modelMicro), Seq("token"))
      .groupBy(idCol)
      .agg(sum(col("lpos_micro") - col("lneg_micro")).as("__delta"))
    docs.select(col(idCol))
      .join(delta, Seq(idCol), "left_outer")
      .crossJoin(broadcast(priorMicro))
      .select(col(idCol),
        (coalesce(col("__delta"), lit(0L)) + col("__prior_micro"))
          .as("score_micro"))
      .withColumn("predicted",
        when(col("score_micro") > 0, 1L).otherwise(0L))
  }

  /** Reliability diagram for a [[nbScore]] classifier — the standard
    * calibration QA before a learned quality filter gates a corpus
    * (a filter that says "0.9" should be right ~90% of the time; NB is
    * famously over-confident and this table is how you SEE it). Scores map
    * to probabilities via the logistic sigmoid, land in `bins` fixed-width
    * probability bins, and each bin reports volume, actual positives, and
    * the exact MICRO-UNIT integer sum of predicted probabilities
    * (`sum_pred_micro` = Σp × 10⁶ exactly; mean predicted vs
    * `n_pos`/`n_docs` is the calibration gap). Division-free and pure
    * int64 on the compared surface — the pattern-1 gate contract.
    *
    * 100 TB shape: scoring is [[nbScore]]'s broadcast-join scan; the
    * diagram itself is one `bins`-row aggregate with map-side partials.
    * Determinism: sigmoid (the one transcendental) is quantized HALF_UP at
    * 6 decimals — the scores it sees are already exact decimals, so both
    * engines feed identical doubles to exp — and binning/summation happen
    * on the quantized value only. */
  def nbCalibration(docs: DataFrame, idCol: String, textCol: String,
      isPositive: Column, vocab: Int = 512, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of range: $bins")
    val scored = nbScore(docs, idCol, textCol, isPositive, vocab)
      .join(docs.select(col(idCol), isPositive.as("__pos")), Seq(idCol))
    val p6 = (lit(1.0) / (lit(1.0) + exp(-col("score").cast("double"))))
      .cast("decimal(18,6)")
    scored
      .withColumn("__p", p6)
      // exact decimal × int, exact floor; p = 1.0 folds into the top bin
      .withColumn("bin", least(floor(col("__p") * bins), lit(bins - 1))
        .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        // p6 is an exact 6-decimal quantity, so ×10⁶ is integer-valued
        // and the per-bin sum is a pure int64
        sum((col("__p") * 1000000).cast("long")).as("sum_pred_micro"))
  }

  /** The logistic-regression quality model's feature columns, derived from
    * [[qualityFeatures]]' INTEGER sufficient statistics by fixed-order
    * IEEE arithmetic (int→double casts + one division each — identical
    * bits on any engine; the formulas are mirrored verbatim in the DuckDB
    * oracle). Order defines the weight vector: intercept, capped length,
    * stopword ratio, punctuation ratio, alpha ratio. */
  val lrFeatureNames: Seq[String] =
    Seq("intercept", "x1_len", "x2_stop", "x3_tlen", "x4_alpha")

  /** Adds `x1..x4` to a [[qualityFeatures]] output frame, derived from its
    * INTEGER sufficient statistics by fixed-order IEEE arithmetic (each a
    * cast + one or two divisions — identical bits on any engine; mirrored
    * verbatim in the DuckDB oracle). Scaled so the corpus spread is O(1)
    * around the decision region — plain GD stalls when the boundary lives
    * in a 0.05-wide feature sliver. */
  def lrFeatures(stats: DataFrame): DataFrame =
    stats
      .withColumn("x1",
        least(col("n_tokens"), lit(400L)).cast("double") / lit(50.0))
      .withColumn("x2",
        when(col("n_tokens") > 0,
          (lit(20.0) * col("n_stopwords").cast("double"))
            / col("n_tokens").cast("double")).otherwise(lit(0.0)))
      .withColumn("x3", col("mean_token_len") / lit(10.0))
      .withColumn("x4", col("alpha_ratio"))

  /** Distributed logistic-regression quality classifier (the supervised
    * "looks curated?" filter of fastText/CCNet lineage, trained as full
    * -batch gradient descent): `iters` rounds, each ONE corpus aggregation
    * producing the gradient `Σ (σ(w·x) − y)·x` with every per-row
    * contribution quantized to DECIMAL(18,9) BEFORE the sum — the sums are
    * exact decimals, so training is partition-order-stable and
    * retry-deterministic (a float sum would give different weights on
    * every run). The weight update runs driver-side in `BigDecimal`
    * (scale 9, HALF_UP): `w ← w − η·G/n` — bounded state (5 numbers), and
    * the whole trajectory is reproducible by an external implementation
    * (tools/lit_check.py re-derives it from the fixtures).
    *
    * `isPositive` is evaluated against the [[qualityFeatures]] output
    * frame, so labels may reference the integer stat columns (the
    * distillation shape: a multi-signal heuristic rubric is the teacher,
    * the 5-weight linear scorer the deployable student).
    *
    * 100 TB shape: `iters` scans with map-side partial aggregation to a
    * 5-column decimal row; the feature frame is cached across iterations.
    * Returns the scale-9 weights in [[lrFeatureNames]] order. */
  def lrTrain(df: DataFrame, textCol: String, isPositive: Column,
      iters: Int = 20, eta: java.math.BigDecimal =
        new java.math.BigDecimal("0.5")): Seq[java.math.BigDecimal] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    require(iters >= 1 && iters <= 1000, s"iters out of range: $iters")
    val feats = lrFeatures(qualityFeatures(df, textCol))
      .select(when(isPositive, lit(1.0)).otherwise(lit(0.0)).as("y"),
        col("x1"), col("x2"), col("x3"), col("x4"))
      .cache()
    try {
      val n = feats.count()
      if (n == 0) return Seq.fill(5)(JBD.ZERO.setScale(9))
      val nBD = new JBD(n)
      var w = Array.fill(5)(JBD.ZERO.setScale(9))
      for (_ <- 0 until iters) {
        // margin in fixed left-associated order — the oracle-mirrored
        // IEEE evaluation sequence
        val margin = lit(w(0).doubleValue) +
          lit(w(1).doubleValue) * col("x1") +
          lit(w(2).doubleValue) * col("x2") +
          lit(w(3).doubleValue) * col("x3") +
          lit(w(4).doubleValue) * col("x4")
        val g = (lit(1.0) / (lit(1.0) + exp(-margin))) - col("y")
        val grads = feats.agg(
          sum(g.cast("decimal(18,9)")).as("g0"),
          sum((g * col("x1")).cast("decimal(18,9)")).as("g1"),
          sum((g * col("x2")).cast("decimal(18,9)")).as("g2"),
          sum((g * col("x3")).cast("decimal(18,9)")).as("g3"),
          sum((g * col("x4")).cast("decimal(18,9)")).as("g4")).collect()(0)
        w = w.zipWithIndex.map { case (wj, j) =>
          val gj = grads.getDecimal(j)
          wj.subtract(eta.multiply(gj).divide(nBD, 9, RoundingMode.HALF_UP))
            .setScale(9, RoundingMode.HALF_UP)
        }
      }
      w.toSeq
    } finally feats.unpersist()
  }

  /** Score every document under an [[lrTrain]] weight vector, given as
    * int64 NANO units (scale-9 weights × 10⁹ — the engine-portable
    * integer form; both engines reconstruct the double by one IEEE
    * division). Gate surface: `margin_nano = floor(margin·10⁹)` int64 and
    * the integer keep verdict — per-row, zero shuffles. */
  def lrScoreNano(df: DataFrame, idCol: String, textCol: String,
      weightsNano: Seq[Long]): DataFrame = {
    require(weightsNano.size == 5, s"need 5 weights: $weightsNano")
    val wd = weightsNano.map(nano => nano.toDouble / 1.0e9)
    val margin = lit(wd(0)) + lit(wd(1)) * col("x1") +
      lit(wd(2)) * col("x2") + lit(wd(3)) * col("x3") +
      lit(wd(4)) * col("x4")
    lrFeatures(qualityFeatures(df, textCol))
      .withColumn("margin_nano", floor(margin * lit(1.0e9)).cast("long"))
      .select(col(idCol), col("margin_nano"),
        (col("margin_nano") > 0L).as("predicted"))
  }

  /** Heaps-law vocabulary-growth curve: at each of `points` corpus-prefix
    * checkpoints (by the id order — exact integer cuts of `max(id)+1`),
    * the prefix's document count, total token count, and DISTINCT
    * vocabulary size. The tokenizer/vocab sizing signal (V ≈ K·N^β):
    * a flattening curve says the vocabulary is saturating; a linear one
    * says the corpus keeps bringing new tokens (noise, boilerplate IDs,
    * or genuinely fresh domains).
    *
    * 100 TB shape: vocabulary reduces to one (token → first-doc) frame
    * (vocab-bounded) and per-doc token counts to one row per doc; both
    * cross only the `points`-row checkpoint table. No prefix is ever
    * re-scanned — cumulative answers come from the inequality join
    * against first-occurrence ids. */
  def heapsCurve(df: DataFrame, idCol: String, textCol: String,
      points: Int = 10): DataFrame = {
    require(points >= 1 && points <= 1000, s"points out of range: $points")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("__doc"),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val firstDoc = toks.groupBy("tok").agg(min(col("__doc")).as("fd"))
    val docCounts = df.select(col(idCol).as("__doc"),
      size(tokens(lower(col(textCol)))).cast("long").as("nt"))
    // exact integer checkpoint cuts — both engines derive the identical
    // values from max(id), no sketch, no literal shipping needed
    val mxRow = df.agg(max(col(idCol)).cast("long")).collect()(0)
    if (mxRow.isNullAt(0))
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("checkpoint", "n_docs", "total_tokens", "vocab_size")
    val n = mxRow.getLong(0) + 1L
    val ks = (1 to points).map(i => n * i / points).distinct.toDF("k")
    val vocabAt = firstDoc.crossJoin(broadcast(ks))
      .filter(col("fd") < col("k"))
      .groupBy("k").agg(count(lit(1)).as("vocab_size"))
    val tokensAt = docCounts.crossJoin(broadcast(ks))
      .filter(col("__doc") < col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"))
    tokensAt.join(vocabAt, Seq("k"))
      .select(col("k").as("checkpoint"), col("n_docs"),
        col("total_tokens"), col("vocab_size"))
  }

  /** Per-domain quality prior (the Gopher/RefinedWeb URL-level filtering
    * shape): aggregate a per-document pass verdict to its source/domain as
    * an exact basis-point rate — the bounded side table that lets a
    * curation run treat domain reputation as a signal ("a borderline page
    * on a 90%-clean domain is probably fine; the same page on a spam farm
    * is not"). Pure int64: `pass_bp = (10000·n_pass) div n_docs`. One
    * group-by bounded by domain cardinality; callers broadcast-join it
    * back (zero extra corpus shuffles). */
  def domainPrior(df: DataFrame, groupCol: String,
      isPass: Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(isPass, 1L).otherwise(0L)).as("n_pass"))
      .withColumn("pass_bp",
        expr("(10000L * n_pass) div n_docs"))

  /** Capped inverted-index posting lists — the retrieval-side artifact of a
    * training-data pipeline (BM25 retrieval, contamination lookup, corpus
    * search all start here): for the `topTerms` highest-document-frequency
    * terms, the document frequency, total occurrence count, and the first
    * `cap` containing doc ids (ascending, comma-joined so the artifact is
    * an engine-portable scalar column).
    *
    * 100 TB shape: one explode + (token, doc) pre-aggregation — map-side
    * partials absorb within-doc repeats — then the per-token doc cap runs
    * through the skew-safe salted [[Sampling.topPerGroup]] (a stopword's
    * posting list is corpus-sized; no single task ever sorts one), and
    * only ≤ `cap` doc ids per term are ever collected. Term selection is
    * `TakeOrderedAndProject` under the (df desc, token) total order — no
    * global sort. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      topTerms: Int = 50, cap: Int = 20): DataFrame =
    postingsTop(postingsState(docs, idCol, textCol, cap), topTerms)

  /** Full mergeable index state for [[postings]]: one row per vocabulary
    * term with `(df, cf, postings)` where `postings` holds the `cap`
    * SMALLEST containing doc ids ascending. This is the persistable form —
    * [[postingsMerge]] folds a new batch's state in without re-scanning
    * old batches, and [[postingsTop]] finalizes, so
    * `finalize(merge(states)) == retrain-on-everything` exactly (df/cf are
    * additive over doc-disjoint batches; the cap-smallest ids of a union
    * always survive inside the union of each side's cap-smallest). */
  def postingsState(docs: DataFrame, idCol: String, textCol: String,
      cap: Int = 20): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val td = docs
      .select(col(idCol).as("doc"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token", "doc").agg(count(lit(1)).as("n_occ"))
    val capped = Sampling.topPerGroup(td.select("token", "doc"),
        "token", col("doc"), cap, Seq(col("doc").asc))
      .groupBy("token")
      .agg(array_sort(collect_list(col("doc"))).as("postings"))
    td.groupBy("token")
      .agg(count(lit(1)).as("df"), sum("n_occ").as("cf"))
      .join(capped, Seq("token"))
  }

  /** Merge two [[postingsState]] frames. CONTRACT: the states must come
    * from doc-DISJOINT batches (each document indexed exactly once across
    * all merged states) — df/cf additivity has no way to detect a doc
    * counted on both sides. One token-keyed aggregation; posting arrays
    * concatenate to ≤ 2·cap elements before re-capping, so per-group state
    * stays bounded at any vocabulary size. */
  def postingsMerge(a: DataFrame, b: DataFrame, cap: Int = 20): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    a.unionByName(b)
      .groupBy("token")
      .agg(sum("df").as("df"), sum("cf").as("cf"),
        slice(array_sort(flatten(collect_list(col("postings")))), 1, cap)
          .as("postings"))
  }

  /** Finalize a [[postingsState]]: the `topTerms` highest-df terms (ties
    * by token — a total order) with the posting list rendered as the
    * engine-portable comma-joined string. TakeOrderedAndProject — no
    * global sort of the vocabulary. */
  def postingsTop(state: DataFrame, topTerms: Int): DataFrame = {
    require(topTerms > 0, s"topTerms must be positive: $topTerms")
    state.orderBy(col("df").desc, col("token").asc)
      .limit(topTerms)
      .select(col("token"), col("df"), col("cf"),
        array_join(transform(col("postings"), _.cast("string")), ",")
          .as("postings"))
  }

  /** BM25 retrieval over the corpus (Robertson-Spärck Jones; the standard
    * k1/b formulation) for a literal query string — the op that makes the
    * inverted index USEFUL: contamination lookup, eval-set retrieval, and
    * corpus search are all "score docs against a query, take top k".
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)), summed over distinct query
    * terms present in the doc.
    *
    * 100 TB shape: the query's term stats are a ≤|query| row frame
    * broadcast into a per-row scan — no corpus join, no shuffle on the
    * data path; top-k plans TakeOrderedAndProject. Determinism: each
    * per-term contribution quantizes HALF_UP at 6 decimals (the repo's
    * cross-engine granularity) and the per-doc score is an EXACT decimal
    * sum of those — order-independent, bit-stable. The default k1/b are
    * binary-exact doubles (1.5, 0.75 — inside the standard BM25 range) so
    * an external engine's decimal-literal parsing cannot drift from
    * Scala's double literals. */
  /** The bounded corpus statistics behind [[bm25]], computed driver-side:
    * `(N, Σdl, per-present-term (term, df, idf))` with idf the RAW JVM
    * double `ln(1 + (N−df+0.5)/(df+0.5))` — exposed so the oracle can
    * receive the transcendental constants as literals (the
    * `graft.queries.OracleLits` contract) instead of re-deriving `ln`.
    * Two tiny jobs: a 1-row stats agg and a ≤|query|-row df agg. */
  def bm25TermStats(docs: DataFrame, textCol: String,
      query: String): (Long, Long, Seq[(String, Long, Double)]) = {
    val qTerms = tokens(lower(lit(query)))
    val withToks = docs.select(tokens(lower(col(textCol))).as("__tk"))
    val st = withToks.agg(count(lit(1)).as("n"),
      sum(size(col("__tk"))).as("sumdl")).head()
    val n = st.getLong(0)
    val sumdl = if (st.isNullAt(1)) 0L else st.getLong(1)
    // idf evaluated through the SAME Catalyst expression shape bm25 uses,
    // so the literal is bit-identical to the in-query double (a JVM
    // Math/StrictMath log could differ by 1 ulp from Catalyst's)
    val terms = withToks
      .select(explode(array_distinct(array_intersect(col("__tk"), qTerms)))
        .as("__qt"))
      .groupBy("__qt").agg(count(lit(1)).as("__df"))
      .withColumn("__idf", log(lit(1.0) + (lit(n) - col("__df") + lit(0.5)) /
        (col("__df") + lit(0.5))))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy((t: (String, Long, Double)) => t._1)
    (n, sumdl, terms)
  }

  def bm25(docs: DataFrame, idCol: String, textCol: String, query: String,
      k: Int = 20, k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    bm25Contrib(docs, idCol, textCol, query, k1, b, nanoIdf = false)
      // the per-term contribution quantizes before the exact per-doc sum
      .withColumn("__c6", col("__contrib").cast("decimal(18,6)"))
      .groupBy(idCol)
      .agg(sum(col("__c6")).cast("decimal(18,6)").as("score"))
      .orderBy(col("score").desc, col(idCol).asc).limit(k)
  }

  /** Integer-nano gate surface of [[bm25]]: per-term contributions are
    * truncated to NANO-UNITS (`floor(c·10⁹)` — IEEE multiply + floor, both
    * bit-deterministic given identical input doubles, no round-half tie)
    * and the per-doc score is a pure int64 sum ordered by the integer
    * total order (score_nano desc, id). No DECIMAL/DOUBLE on the compared
    * surface, and the one transcendental (idf's ln) is itself truncated to
    * an INTEGER nano value before use (`idf9 = floor(ln(…)·10⁹)`, then
    * `idf9/10⁹` — one deterministic IEEE division), so the oracle receives
    * idf as an integer literal via `OracleLits` and no float literal needs
    * parsing anywhere in the gate chain. Overflow-safe: a contribution is
    * ≤ idf·(k1+1) ≲ 10² → ≤ 10¹¹ nano per (doc, term); a doc needs ~10⁸
    * matching query terms to overflow int64. */
  def bm25Nano(docs: DataFrame, idCol: String, textCol: String, query: String,
      k: Int = 20, k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    bm25Contrib(docs, idCol, textCol, query, k1, b, nanoIdf = true)
      .withColumn("__cn", floor(col("__contrib") * lit(1e9)))
      .groupBy(idCol)
      .agg(sum(col("__cn")).as("score_nano"))
      .orderBy(col("score_nano").desc, col(idCol).asc).limit(k)
  }

  /** The shared scoring scan behind [[bm25]]/[[bm25Nano]]: one row per
    * (doc, present-query-term) with the RAW double contribution
    * (`__contrib`) — broadcast stats + broadcast per-term df, no shuffle
    * on the data path. `nanoIdf` routes idf through the integer-nano
    * truncation (the gate path); the library view keeps the raw log. */
  private def bm25Contrib(docs: DataFrame, idCol: String, textCol: String,
      query: String, k1: Double, b: Double, nanoIdf: Boolean): DataFrame = {
    val qTerms = tokens(lower(lit(query)))
    val withToks = docs.select(col(idCol), tokens(lower(col(textCol))).as("__tk"))
    // corpus stats: N and avgdl (one tiny agg, broadcast as a scalar row);
    // integer dl sum keeps avgdl an exact rational before ONE division
    val stats = withToks.agg(count(lit(1)).as("__n"),
      sum(size(col("__tk"))).as("__sumdl"))
    // per-query-term df over distinct containment (≤ |query| rows)
    val df = withToks
      .select(explode(array_distinct(array_intersect(col("__tk"), qTerms)))
        .as("__qt"))
      .groupBy("__qt").agg(count(lit(1)).as("__df"))
    withToks
      .crossJoin(broadcast(stats))
      .withColumn("__dl", size(col("__tk")))
      .select(col(idCol), col("__tk"), col("__n"), col("__sumdl"), col("__dl"),
        explode(array_distinct(array_intersect(col("__tk"), qTerms)))
          .as("__qt"))
      .withColumn("__tf",
        size(filter(col("__tk"), t => t === col("__qt"))))
      .join(broadcast(df), Seq("__qt"))
      // idf and the length-normalized tf fraction are double math; op
      // grouping mirrored EXACTLY by the DuckDB oracle: dl·N is an exact
      // integer product, so dl/avgdl is ONE double division
      .withColumn("__idf", {
        val raw = log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5)))
        if (nanoIdf) floor(raw * lit(1e9)).cast("double") / lit(1e9) else raw
      })
      .withColumn("__contrib",
        col("__idf") *
          (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * (col("__dl") * col("__n") / col("__sumdl")))))
  }
}
