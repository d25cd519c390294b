package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the engine's operators
  * chained the way a 100 TB corpus pass actually runs:
  *
  *  1. quality gate (token count / stopword / alpha heuristics),
  *  2. language identification,
  *  3. exact dedup (fingerprint survivors),
  *  4. fuzzy dedup (MinHash-LSH candidates → Jaccard verify → connected
  *     components → keep each cluster's representative),
  *  5. corpus stats.
  *
  * Everything up to the LSH band join is a single narrow scan; the whole
  * pipeline shuffles on (fingerprint), (band, band_hash), and (component)
  * only. The iterative component step is the one driver-controlled loop. */
object CurationPipeline {

  case class Config(
      minTokens: Long = 10,
      minAlphaRatio: Double = 0.5,
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.9)

  /** Rows of `docs` (idCol, textCol) surviving the full pipeline, with
    * `predicted_lang` attached. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    curateTrace(docs, idCol, textCol, cfg)._1

  /** [[curate]] plus per-document provenance: every input row labeled with
    * the stage that dropped it (`quality_fail` / `exact_dup` / `near_dup`)
    * or `kept` — the explainability record a production pipeline publishes
    * alongside its output (why did my document disappear?). Three marker
    * left-joins over the stage frames the pipeline already computes. */
  def curateTrace(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    // 1. quality gate — per-row expressions, no shuffle
    val quality = TextAnalysis.qualityFeatures(docs, textCol)
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("alpha_ratio") >= cfg.minAlphaRatio)
      .select(col(idCol), col(textCol))
    // 2. language id — per-row
    val tagged = quality.withColumn("predicted_lang",
      TextAnalysis.langId(col(textCol)))
    // 3. exact dedup — one fingerprint shuffle. Materialized once
    // (Materialize: lineage severed, reliable checkpoint when configured):
    // the survivor set feeds both the LSH pair mining (consumed by the
    // component loop) and the final anti-join — without this the corpus
    // scan + fingerprint window would run twice.
    val exact = graft.io.Materialize(
      Dedup.exactSurvivors(tagged, idCol, textCol))
    // 4. fuzzy dedup — banded LSH + verification + clustering; each cluster
    // keeps its minimal id (the component label)
    val pairs = Dedup.minhashCandidates(exact, idCol, textCol,
      k = 16, bands = 4, jaccardThreshold = cfg.jaccardThreshold,
      shingleN = cfg.shingleN)
    val dupIds = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("component")) // non-representatives drop
      .select(col("id").as(idCol))
    val kept = exact.join(dupIds, Seq(idCol), "left_anti")
    // marker columns avoid the caller's names (the module-wide Cols.fresh
    // convention — a user idCol named "__q" must not become a join key)
    val Seq(qC, eC, nC) = Seq("q", "e", "n")
      .map(s => Cols.fresh(s"__$s", Seq(idCol)))
    val provenance = docs.select(col(idCol))
      .join(quality.select(col(idCol)).withColumn(qC, lit(true)),
        Seq(idCol), "left")
      .join(exact.select(col(idCol)).withColumn(eC, lit(true)),
        Seq(idCol), "left")
      .join(dupIds.withColumn(nC, lit(true)), Seq(idCol), "left")
      .select(col(idCol),
        when(col(qC).isNull, "quality_fail")
          .when(col(eC).isNull, "exact_dup")
          .when(col(nC).isNotNull, "near_dup")
          .otherwise("kept").as("stage"))
    (kept, provenance)
  }

  /** Per-language corpus stats after curation. */
  def stats(curated: DataFrame): DataFrame =
    curated.groupBy("predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("predicted_lang")
}
