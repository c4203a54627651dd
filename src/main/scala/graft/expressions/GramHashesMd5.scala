package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Md5-hashed word n-grams of an `array<string>` token list as one
  * native Catalyst expression — the ENGINE-NEUTRAL sibling of
  * [[GramHashes]]: element g is the first 15 hex digits of the md5
  * digest of `tokens[g..g+n-1]` joined by a single space, as a
  * (positive, 60-bit) long. Value-identical to the Column form
  * `conv(substring(md5(concat_ws(' ', slice(tokens, g+1, n))), 1, 15),
  * 16, 10)::long` that [[graft.operators.TextAnalysis.winnowFingerprints]]
  * evaluated through an interpreted `transform` lambda.
  *
  * Why native: the md5 gram hash exists so an external SQL engine can
  * recompute every fingerprint (the q88/q89 oracle contract), but the
  * lambda route it forced — a CodegenFallback higher-order function
  * building a slice array, a concatenated String, an UTF8String, a
  * 32-char hex String and a base-conversion String PER GRAM — made the
  * fingerprint projection the whole cost of the winnow family (q88's
  * census: one shuffle, zero aggregates, ~6 s of pure projection).
  * Here the gram bytes land in one reused scratch buffer
  * ([[GramHashes.Scratch]]) and the digest's first 60 bits are read
  * directly ([[SimhashSignatureMd5.hash60]] semantics) — one JDK
  * `MessageDigest` per task, zero per-gram allocation beyond the
  * output array.
  *
  * Gram-count rule matches the Column form: `max(numTokens − n + 1, 1)`
  * — a doc with fewer than `n` tokens yields ONE short gram of all its
  * tokens. Null array → null; null ELEMENTS contribute empty bytes
  * between separators (unreachable from the tokenizers, which never
  * produce null tokens — same note as [[GramHashes]]).
  */
case class GramHashesMd5(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"gram size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes_md5"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any =
    GramHashesMd5.compute(v.asInstanceOf[ArrayData], n,
      GramHashes.threadScratch.get(), md)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scratch = ctx.addMutableState(
      classOf[GramHashes.Scratch].getName, "gramMd5Scratch",
      v => s"$v = new ${classOf[GramHashes.Scratch].getName}();")
    val digest = ctx.addMutableState("java.security.MessageDigest", "gramMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
               catch (java.security.NoSuchAlgorithmException e) {
                 throw new RuntimeException(e); }""")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
        ${ev.value} = graft.expressions.GramHashesMd5$$.MODULE$$
          .compute($arr, $n, $scratch, $digest);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashesMd5 =
    copy(child = newChild)
}

object GramHashesMd5 {

  /** One pass over the token array: per gram, copy the member tokens'
    * UTF-8 bytes (space-separated) into the scratch buffer, digest in
    * place, keep the first 60 bits. Called from both eval and
    * generated code. */
  def compute(arr: ArrayData, n: Int, scratch: GramHashes.Scratch,
              md: MessageDigest): UnsafeArrayData = {
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
      md.reset()
      md.update(buf, 0, pos)
      val dig = md.digest()
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (dig(k) & 0xFFL); k += 1 }
      out(g) = (h << 4) | ((dig(7) & 0xFFL) >>> 4)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
