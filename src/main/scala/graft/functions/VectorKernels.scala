package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Primitive-loop kernel behind [[VectorDotExpression]]. Replicates the
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, v) => acc + v)` fold bit-for-bit: sequential left-to-right
  * double accumulation, float elements widened exactly like `CAST(float AS
  * double)`, and the HOF null contract — a ragged pair (zip_with pads with
  * null) or any null element poisons the whole sum to null. */
object VectorKernels {

  /** Boxed so codegen can represent the null outcome; isFloatX selects the
    * accessor (no whole-array cast pass on float embeddings). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Squared-L2 fold behind [[VectorSqL2Expression]]: replicates
    * `aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0.0, +)`
    * bit-for-bit — sequential accumulation of `d·d` with `d = x − y`
    * evaluated once per element, same null/ragged poisoning as [[dot]]. */
  def sqL2(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }
}
