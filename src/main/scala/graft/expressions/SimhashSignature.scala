package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of an `array<string>` token list as one native
  * Catalyst expression: every token occurrence votes ±1 on each bit of
  * its `xxhash64` (seed 42 — SQL `xxhash64(tok)`), and the sign vector
  * packs into one long — bit-identical to
  * [[graft.operators.Dedup.simhash]]'s 64-sum-buffer aggregate over
  * the exploded token table with the default token hash.
  *
  * Why native: the aggregate form explodes every token to a row and
  * shuffles the whole token table into 64 sum buffers; per document
  * row this is a closed computation, so as a projection it is one
  * fused loop and the downstream band-bucket join becomes the
  * pipeline's first exchange. The aggregate form remains the route for
  * pluggable token hashes (the engine-neutral md5 variant that pins
  * the q25 oracle).
  *
  * Votes are over the token MULTISET (each occurrence counts — unlike
  * MinHash, duplicates matter). Null array → null; null elements are
  * skipped (`split` never produces them); an empty array yields 0
  * (every vote count 0, `> 0` false on all bits — same as the
  * aggregate form's all-zero sums... which cannot emit a row for a
  * tokenless doc at all, so the case is unreachable from
  * [[graft.operators.Dedup.simhashNearDups]]).
  */
case class SimhashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1L else votes(b) -= 1L
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val votes = ctx.addMutableState("long[]", "shVotes",
        v => s"$v = new long[64];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
        final int $n = $arr.numElements();
        java.util.Arrays.fill($votes, 0L);
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i)) {
            final org.apache.spark.unsafe.types.UTF8String $s =
              $arr.getUTF8String($i);
            final long $h = $xxh.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            for (int $b = 0; $b < 64; $b++) {
              $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
            }
          }
        }
        ${ev.value} = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashSignature =
    copy(child = newChild)
}
