package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight JVM kernels behind the graft hash expressions. Spark's higher-order
  * functions (`transform`/`filter`/`aggregate`) evaluate their lambda
  * interpreted per element — for the minhash/simhash hot paths that means an
  * interpreted expression-tree walk per token. These kernels do the same
  * arithmetic as the built-in formulations (bit-for-bit, see the property
  * tests) in one primitive loop, and are invoked from generated code by the
  * expressions in [[VectorHashExpressions]].
  *
  * Every kernel is a static method on a top-level object so whole-stage
  * codegen can call it by fully-qualified name.
  */
object HashKernels {

  private val mdRef = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  @inline private def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = mdRef.get()
    d.reset()
    d.digest(bytes)
  }

  /** First 4 MD5-digest bytes as an unsigned 32-bit value — identical to
    * `conv(substring(md5(t), 1, 8), 16, 10)` without materializing the hex
    * string or parsing it back. */
  def tokenHash(t: UTF8String): Long = {
    val d = md5(t.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Per-element [[tokenHash]] (null elements pass through as null) —
    * the kernel form of `transform(arr, t => tokenHash(t))`. */
  def hashTokens(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = java.lang.Long.valueOf(tokenHash(arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over pre-hashed elements: sig_i = min over non-null
    * elements of ((h·(2i+1) + (7919i+1)) mod (2^31−1)), i < k — one pass
    * over the array with k running minimums instead of k `array_min ∘
    * transform` passes. Positions with no non-null element are null, exactly
    * like `array_min` over an empty/all-null array. */
  def minhashSig(hashed: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val n = hashed.numElements()
    var i = 0
    while (i < n) {
      if (!hashed.isNullAt(i)) {
        any = true
        val h = hashed.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * (2L * j + 1) + (7919L * j + 1)) % 2147483647L
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins)
  }

  /** SimHash over raw tokens: per token one MD5 digest; bit j votes on
    * digest nibble j (hex char j of the md5 hex string) ≥ 8; votes =
    * 2·hits − n with n counting ALL elements including nulls (null tokens
    * never hit, matching the `size(filter(...))`/`size(arr)` formulation);
    * bit set iff votes > 0. One digest + one nibble loop per token instead
    * of a hex-string array plus `bits` interpreted filter passes. */
  def simhash(tokens: ArrayData, bits: Int): Long = {
    val n = tokens.numElements()
    val hits = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val d = md5(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          val b = d(j >> 1) & 0xff
          val nib = if ((j & 1) == 0) b >>> 4 else b & 0xf
          if (nib >= 8) hits(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (2L * hits(j) - n > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
