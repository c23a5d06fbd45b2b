package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document-level hash sketches as single custom expressions.
  *
  * The lambda (HOF) formulations evaluate an interpreted expression tree
  * per shingle × per permutation (MinHash: |sh|×32 evals/doc; SimHash:
  * |words|×63) — measured as the dominant cost of the dedup queries. These
  * expressions do the same work in one eval call with tight JVM loops over
  * the array data, hashing each element exactly once with Spark's own
  * XXH64 (seed 42, same as the xxhash64 builtin).
  *
  * CodegenFallback is fine here: the per-row cost (thousands of ALU ops)
  * dwarfs the fallback overhead, and keeping eval-only avoids generated-
  * code bloat. Both are deterministic pure functions of their input array.
  */
final case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // hash every shingle once
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      hs(i) = ((h % P) + P) % P
      i += 1
    }
    val sig = new Array[Long](numPerm)
    var j = 0
    while (j < numPerm) {
      val a = j * 2L + 1L
      val b = j * 97911L
      var mn = Long.MaxValue
      var k = 0
      while (k < n) {
        val v = (hs(k) * a + b) % P
        if (v < mn) mn = v
        k += 1
      }
      sig(j) = if (n == 0) 0L else mn
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 63-bit SimHash over a word array: one XXH64 per word; bit i's ±1 vote is
  * bit i of the word hash. Bit 63 unused (sign).
  */
final case class SimHash63(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](63)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < 63) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 63) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object hashExprs {
  import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}

  def minhash_signature(shingles: Column, numPerm: Int): Column =
    toCol(MinHashSignature(toExpr(shingles), numPerm))

  def simhash63(words: Column): Column =
    toCol(SimHash63(toExpr(words)))
}
