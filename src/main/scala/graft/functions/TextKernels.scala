package graft.functions

import java.util.{Arrays => JArrays, HashMap => JHashMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-loop kernels behind the text-analysis expressions. Each
  * replicates a HOF formulation in [[graft.scale.TextAnalysis]] bit-for-bit
  * (property-tested): same float-operation order, same null contracts.
  * Static methods on a top-level object so generated code can call them. */
object TextKernels {

  /** Shannon entropy of the character distribution — replicates the
    * `aggregate(array_sort(charSymbols(text)), …)` fold: terms −p·log2(p)
    * accumulate in ascending character order (binary UTF8 order), p =
    * run/numChars. Characters are UTF-16 units exactly like `split(text,
    * "")`; the denominator is `length(text)` (code points) exactly like the
    * fold's `n`. Returns the raw (un-rounded) sum; the Column wrapper keeps
    * the `round(…, 6)` and empty-text guard. */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    // count per UTF-16 unit; sort keys by UTF8String binary order (what
    // array_sort uses for strings) by encoding each unit once
    val counts = new JHashMap[UTF8String, Long]()
    var i = 0
    while (i < s.length) {
      val k = UTF8String.fromString(String.valueOf(s.charAt(i)))
      counts.merge(k, 1L, (a, b) => a + b)
      i += 1
    }
    val keys = counts.keySet().toArray(new Array[UTF8String](0))
    JArrays.sort(keys, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val n = text.numChars().toDouble
    var ent = 0.0
    val log2 = math.log(2)
    var j = 0
    while (j < keys.length) {
      val p = counts.get(keys(j)).toDouble / n
      ent += -p * (math.log(p) / log2)
      j += 1
    }
    ent
  }

  /** All word n-grams joined with " "— replicates `ngramsAll`:
    * max(size − (n−1), 0) grams, gram i = concat_ws(" ", toks[i…i+n−1])
    * with concat_ws's skip-null contract (a slice short of n tokens at the
    * tail cannot occur because the gram count is clamped first). */
  def ngramArray(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val count = math.max(sz - (n - 1), 0)
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        if (!toks.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All character n-grams of a string — replicates `charNgramsOfHof`:
    * gram i = code points [i, i+n) (SQL substr semantics), max(numChars −
    * (n−1), 0) grams. ONE pass over the UTF-8 bytes: code-point start
    * offsets are collected once, each gram is a byte-range copy — O(len),
    * where the HOF's per-index `substr(i, n)` seeks from the string start
    * every time (UTF-8 is variable-width) and is O(len²) per row. That
    * quadratic seek was the single hottest kernel in the corpus lang-id
    * path at sf0.1. */
  def charNgramArray(text: UTF8String, n: Int): ArrayData = {
    val numChars = text.numChars()
    val count = math.max(numChars - (n - 1), 0)
    if (count == 0) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes // one defensive copy; grams then share it
    // byte offset of each code point start, plus the terminal offset
    val offs = new Array[Int](numChars + 1)
    var cp = 0
    var b = 0
    while (b < bytes.length) {
      offs(cp) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      cp += 1
    }
    offs(numChars) = bytes.length
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Duplicate-gram and top-gram fractions over the n-grams of a token
    * array, one counting pass — replicates `dupFractionOfGrams` /
    * `topFractionOfGrams` over `ngramsAll(toks, n)`: dup = 1.0 −
    * distinct/total, top = maxCount/total (the longest equal run of the
    * sorted gram array IS the max multiplicity), both 0.0 when no grams. */
  def ngramRepetition(toks: ArrayData, n: Int): InternalRow = {
    val grams = ngramArray(toks, n)
    val total = grams.numElements()
    if (total == 0) return new GenericInternalRow(Array[Any](0.0, 0.0))
    val counts = new JHashMap[UTF8String, Int]()
    var maxCnt = 0
    var i = 0
    while (i < total) {
      val g = grams.getUTF8String(i)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > maxCnt) maxCnt = c
      i += 1
    }
    val t = total.toDouble
    new GenericInternalRow(Array[Any](
      1.0 - counts.size().toDouble / t, maxCnt.toDouble / t))
  }

  /** Longest run of consecutive null-safe-equal tokens — replicates
    * [[graft.scale.TextAnalysis.maxTokenRun]]'s fold (empty array → 0). */
  def maxTokenRun(toks: ArrayData): Int = {
    val sz = toks.numElements()
    if (sz == 0) return 0
    var best = 0
    var cur = 0
    var i = 0
    while (i < sz) {
      val same =
        if (i == 0) false
        else if (toks.isNullAt(i) || toks.isNullAt(i - 1))
          toks.isNullAt(i) && toks.isNullAt(i - 1)
        else toks.getUTF8String(i) == toks.getUTF8String(i - 1)
      cur = if (same) cur + 1 else 1
      if (cur > best) best = cur
      i += 1
    }
    best
  }
}
