package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.Platform

/** Per-row DSIR importance score over an `array<string>` token list:
  * Σ over hashed unigram+bigram features of `table[hash mod B]`,
  * where `table` is the DENSE per-bucket log-likelihood-ratio array a
  * [[graft.operators.Curation.fitDsir]] model provides (B =
  * `table.length`, every bucket pre-filled — unseen buckets carry the
  * smoothed default, so the lookup is one array index, no map).
  *
  * Feature hashing matches the batch operator's Column form
  * exactly: `xxhash64` (seed 42) of the feature string's UTF-8 bytes,
  * bigrams space-joined, assembled in a reused scratch buffer (the
  * [[GramHashes]] discipline — zero per-feature allocation). A
  * document with fewer than two tokens contributes no bigrams
  * (mirroring the zip-with-shift Column form, NOT GramHashes' short-
  * gram rule); a document with no tokens (or only the empty token a
  * whitespace-only text splits to) returns null, matching the batch
  * scorer's absent-row semantics.
  *
  * Why native: scoring is the admission filter of a streaming ingest
  * pipeline — per row it must be a pure projection (no stream state,
  * no join) and per feature O(1) (a map LITERAL's `element_at` is a
  * linear scan per lookup). Summation runs in document order
  * (unigrams then bigrams), so scores agree with the batch operator's
  * bucket-sorted fold to float-addition reordering — round before
  * comparing across the two.
  */
case class DsirScore(child: Expression, table: Array[Double])
    extends UnaryExpression {

  require(table.nonEmpty, "ratio table must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dsir_score"

  override def nullSafeEval(v: Any): Any =
    DsirScore.compute(v.asInstanceOf[ArrayData], table,
      GramHashes.threadScratch.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("dsirTable", table, "double[]")
    val scratch = ctx.addMutableState(
      classOf[GramHashes.Scratch].getName, "dsirScratch",
      v => s"$v = new ${classOf[GramHashes.Scratch].getName}();")
    val code = nullSafeCodeGen(ctx, ev, arr => {
      s"""
        java.lang.Double r = graft.expressions.DsirScore$$.MODULE$$
          .compute($arr, $tbl, $scratch);
        if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
      """
    })
    code
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirScore {

  /** Returns null (boxed) for docs with no features. */
  def compute(arr: ArrayData, table: Array[Double],
              scratch: GramHashes.Scratch): java.lang.Double = {
    val nTok = arr.numElements()
    val b = table.length
    if (nTok == 0) return null
    if (nTok == 1) {
      val s = arr.getUTF8String(0)
      if (s == null || s.numBytes == 0) return null
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      return java.lang.Double.valueOf(table(pmod(h, b)))
    }
    var sum = 0.0
    var i = 0
    while (i < nTok) { // unigrams
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        sum += table(pmod(h, b))
      }
      i += 1
    }
    i = 0
    while (i < nTok - 1) { // bigrams, space-joined in the scratch buffer
      val x = arr.getUTF8String(i)
      val y = arr.getUTF8String(i + 1)
      val xb = if (x == null) 0 else x.numBytes
      val yb = if (y == null) 0 else y.numBytes
      val len = xb + 1 + yb
      val buf = scratch.ensure(len)
      if (xb > 0) Platform.copyMemory(x.getBaseObject, x.getBaseOffset,
        buf, Platform.BYTE_ARRAY_OFFSET, xb)
      buf(xb) = ' '
      if (yb > 0) Platform.copyMemory(y.getBaseObject, y.getBaseOffset,
        buf, Platform.BYTE_ARRAY_OFFSET + xb + 1, yb)
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      sum += table(pmod(h, b))
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }

  private def pmod(h: Long, b: Int): Int = {
    val m = (h % b).toInt
    if (m < 0) m + b else m
  }
}
