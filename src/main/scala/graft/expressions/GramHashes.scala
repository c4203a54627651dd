package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Hashed word n-grams of an `array<string>` token list as one native
  * Catalyst expression: element g = `xxhash64` (seed 42) of the UTF-8
  * bytes of `tokens[g..g+n-1]` joined by a single space — hash-
  * identical to the Column form
  * `xxhash64(concat_ws(' ', slice(tokens, g+1, n)))` that
  * [[graft.operators.Dedup.gramTable]] evaluated through an
  * interpreted `transform` lambda, building a String per gram.
  *
  * Why native: the gram table underlies every Jaccard near-dup and
  * decontamination pipeline; per gram the lambda interpreter built a
  * slice array, a concatenated String and an UTF8String before
  * hashing. Here the gram bytes are assembled into one REUSED scratch
  * buffer (grown geometrically, owned per task via codegen mutable
  * state / a thread-local on the interpreted path) and hashed in
  * place — zero per-gram allocation beyond the output array.
  *
  * Gram-count rule matches the Column form: `max(numTokens − n + 1, 1)`
  * — a doc with fewer than `n` tokens yields ONE short gram of all its
  * tokens. Null array → null; null ELEMENTS contribute empty bytes
  * between separators (the tokenizers never produce null tokens, so
  * the case is unreachable — noted because `concat_ws` would also
  * drop the null's separator).
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"gram size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(v: Any): Any =
    GramHashes.compute(v.asInstanceOf[ArrayData], n,
      GramHashes.threadScratch.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scratch = ctx.addMutableState(
      classOf[GramHashes.Scratch].getName, "gramScratch",
      v => s"$v = new ${classOf[GramHashes.Scratch].getName}();")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
        ${ev.value} = graft.expressions.GramHashes$$.MODULE$$
          .compute($arr, $n, $scratch);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {

  /** Reused gram-byte buffer; one per generated-class instance (task)
    * or per thread on the interpreted path — never shared. */
  final class Scratch {
    var buf: Array[Byte] = new Array[Byte](256)
    def ensure(len: Int): Array[Byte] = {
      if (buf.length < len) {
        var cap = buf.length
        while (cap < len) cap <<= 1
        buf = new Array[Byte](cap)
      }
      buf
    }
  }

  private[expressions] val threadScratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** One pass over the token array: for each gram, copy the member
    * tokens' UTF-8 bytes (space-separated) into the scratch buffer and
    * hash in place. Called from both eval and generated code. */
  def compute(arr: ArrayData, n: Int, scratch: Scratch): UnsafeArrayData = {
    val nTok = arr.numElements()
    val count = math.max(nTok - n + 1, 1)
    val out = new Array[Long](count)
    var g = 0
    while (g < count) {
      val end = math.min(g + n, nTok)
      var len = 0
      var i = g
      while (i < end) {
        if (!arr.isNullAt(i)) len += arr.getUTF8String(i).numBytes
        i += 1
      }
      len += (end - g - 1) // single-space separators (concat_ws)
      if (len < 0) len = 0 // all-null gram: no tokens, no separators
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
      out(g) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
