package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-P: optimized product quantization via a deterministic
  * variance-balancing dimension permutation ahead of the subspace split
  * (Ge, He, Ke, Sun, "Optimized Product Quantization", CVPR 2013 — the
  * parametric/permutation family: full OPQ learns an orthogonal rotation
  * R; the permutation member of that family captures the inter-subspace
  * variance-balancing gain while keeping the pipeline a pure column
  * shuffle, so [[Pq.codebook]] / [[Pq.encode]] / [[Pq.adcTopK]] run
  * UNCHANGED on the permuted vectors).
  *
  * Plain PQ splits dims CONTIGUOUSLY, so a variance-skewed layout (PCA-
  * ordered dims, block-structured encoders) concentrates the hard-to-
  * quantize directions in one subspace — its k centroids are overloaded
  * while other subspaces idle. The fix: rank dims by variance and deal
  * them to the m subspaces in serpentine (boustrophedon) order, balancing
  * the variance mass each subspace must cover.
  *
  * Determinism / cross-engine contract: the ranking key derives from
  * [[Similarity.componentSums]]'s PURE-INT64 surface — key(pos) =
  * n·Σxq² − (Σxq)², xq = floor(x·10⁶) — evaluated in exact BigInt
  * arithmetic (the micro-quantized population-variance numerator). No
  * float comparison anywhere; ties break to the smaller dim index; so any
  * engine re-derives the identical permutation from the raw table (the
  * oracle rebuilds it in SQL — no shipped constants).
  *
  * 100 TB shape: one componentSums scan (map-side partials over dim
  * keys), one dim-row bounded collect, and the permutation rides every
  * subsequent operator as a plan literal — zero extra shuffles vs plain
  * PQ. */
object Opq {

  /** Integer variance keys per dimension: (pos 1-based, key), key =
    * n·Σxq² − (Σxq)² in exact BigInt math over the int64 micro sums. */
  private def varianceKeys(df: DataFrame, vecCol: String): Array[(Int, BigInt)] =
    Similarity.componentSums(df, vecCol)
      .select("pos", "n", "s_micro", "sq_micro").collect()
      .map { r =>
        val (pos, n, s, sq) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        (pos.toInt, BigInt(n) * BigInt(sq) - BigInt(s) * BigInt(s))
      }

  /** Variance-balancing permutation: element i (0-based) is the 1-based
    * OLD position that lands at NEW position i+1. New positions are laid
    * out subspace-major (subspace 0's dims first; within a subspace,
    * ascending old position), so [[Pq.subvectors]]' contiguous D/m slices
    * recover exactly the serpentine-balanced dimension groups. */
  def permutation(df: DataFrame, vecCol: String, m: Int): Seq[Int] = {
    val keyed = varianceKeys(df, vecCol)
    require(keyed.nonEmpty, "opq permutation needs a non-empty corpus")
    val dims = keyed.length
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    val ranked = keyed.sortBy { case (pos, k) => (-k, pos) }
    // serpentine deal: rank r goes to subspace r%m on even rows of the
    // deal, m-1-r%m on odd rows — large-variance dims pair with small
    val assigned = ranked.zipWithIndex.map { case ((pos, _), r) =>
      val j = r % m
      val sub = if ((r / m) % 2 == 0) j else m - 1 - j
      (sub, pos)
    }
    assigned.sortBy { case (sub, pos) => (sub, pos) }.map(_._2).toSeq
  }

  /** The permuted vector as a column: an element_at gather over the plan-
    * literal permutation (codegen'd; element type preserved). `perm`
    * holds 1-based old positions in new order, as [[permutation]] emits. */
  def permute(vecCol: Column, perm: Seq[Int]): Column = {
    require(perm.sorted == (1 to perm.length), s"not a permutation: $perm")
    array(perm.map(p => element_at(vecCol, p)): _*)
  }
}
