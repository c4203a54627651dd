package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Fused word-gram MinHash: the full Kirsch–Mitzenmacher signature of
  * a token array's space-joined word n-grams in ONE native pass —
  * gram bytes assembled into the shared scratch buffer
  * ([[GramHashes.Scratch]]), both seeded hashes taken in place, the
  * `numHashes` mins folded inline. Bit-identical to building the
  * shingle-string array and applying [[MinhashSignature]] (same gram
  * byte layout as `concat_ws(' ', slice(tokens, i, n))`, same
  * `xxhash64(1, s)` / `xxhash64(2, s)` chains, same rotate/XOR mixing)
  * — which in turn is parity-pinned to the aggregate formulation. The
  * difference is cost: no interpreted `transform` lambda, no shingle
  * String/UTF8String allocation per gram.
  *
  * Gram-count rule matches [[GramHashes]]: `max(numTokens − n + 1, 1)`
  * (short docs yield one short gram). Null array → null; null
  * elements contribute empty bytes (unreachable from the tokenizers).
  */
case class MinhashWordGrams(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n > 0, s"gram size must be positive, got $n")
  require(numHashes > 0 && numHashes <= 1024,
    s"numHashes must be in [1, 1024], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_word_grams"

  override def nullSafeEval(v: Any): Any =
    MinhashWordGrams.compute(v.asInstanceOf[ArrayData], n, numHashes,
      GramHashes.threadScratch.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scratch = ctx.addMutableState(
      classOf[GramHashes.Scratch].getName, "mwgScratch",
      v => s"$v = new ${classOf[GramHashes.Scratch].getName}();")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
        ${ev.value} = graft.expressions.MinhashWordGrams$$.MODULE$$
          .compute($arr, $n, $numHashes, $scratch);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashWordGrams =
    copy(child = newChild)
}

object MinhashWordGrams {

  /** xxhash64 running states after the leading int literal — the same
    * `xxhash64(1, s)` / `xxhash64(2, s)` chains as [[MinhashSignature]]. */
  private val Seed1 = XXH64.hashInt(1, 42L)
  private val Seed2 = XXH64.hashInt(2, 42L)
  private val Golden = 0x9E3779B97F4A7C15L

  def compute(arr: ArrayData, n: Int, numHashes: Int,
              scratch: GramHashes.Scratch): UnsafeArrayData = {
    val nTok = arr.numElements()
    val count = math.max(nTok - n + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var g = 0
    while (g < count) {
      val end = math.min(g + n, nTok)
      var len = 0
      var i = g
      while (i < end) {
        if (!arr.isNullAt(i)) len += arr.getUTF8String(i).numBytes
        i += 1
      }
      len += (end - g - 1)
      if (len < 0) len = 0
      val buf = scratch.ensure(math.max(len, 1))
      var pos = 0
      i = g
      while (i < end) {
        if (i > g) { buf(pos) = ' '; pos += 1 }
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val nb = s.numBytes
          Platform.copyMemory(s.getBaseObject, s.getBaseOffset,
            buf, Platform.BYTE_ARRAY_OFFSET + pos, nb)
          pos += nb
        }
        i += 1
      }
      val h1 = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, Seed1)
      val h2 = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, Seed2)
      var k = 0
      while (k < numHashes) {
        val gk = h1 ^ java.lang.Long.rotateLeft(h2, k & 63) ^ (k.toLong * Golden)
        if (gk < mins(k)) mins(k) = gk
        k += 1
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
