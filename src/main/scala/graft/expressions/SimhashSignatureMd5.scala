package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of an `array<string>` token list under the
  * ENGINE-NEUTRAL md5-derived token hash — bit-identical to
  * [[graft.operators.Dedup.simhash]]'s 64-sum-buffer aggregate with
  * `tokenHash = Dedup.md5Hash60`, i.e. each token occurrence votes ±1
  * per bit of `conv(substring(md5(tok), 1, 15), 16, 10)` (the first 15
  * hex digits of the md5 digest as a 60-bit long; bits 60–63 are
  * always 0, so those sketch bits collect only −1 votes and stay 0,
  * exactly as in the SQL form).
  *
  * Why native: the md5 token hash exists so an external SQL engine can
  * recompute every sketch (the q25/q72 oracle contract), but the
  * aggregate route it forced — explode every token to a row, shuffle
  * the whole token table into 64 sum buffers — was the single
  * heaviest computation in the bench catalog (q72's 27.9 s floor).
  * Per document the sketch is a closed computation over the in-row
  * token array, so like [[SimhashSignature]] it belongs in a fused
  * projection loop: one JDK `MessageDigest` per task (reused across
  * rows), zero exchanges. The aggregate form remains only for
  * arbitrary caller-supplied hashes.
  *
  * Semantics mirror [[SimhashSignature]]: votes are over the token
  * MULTISET, null array → null, null elements skipped, empty array →
  * 0L.
  */
case class SimhashSignatureMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_md5"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SimhashSignatureMd5.hash60(md, arr.getUTF8String(i).getBytes)
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
      val digest = ctx.addMutableState("java.security.MessageDigest", "shMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                 catch (java.security.NoSuchAlgorithmException e) {
                   throw new RuntimeException(e); }""")
      val votes = ctx.addMutableState("long[]", "shMd5Votes",
        v => s"$v = new long[64];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val dig = ctx.freshName("dig")
      val h = ctx.freshName("h")
      s"""
        final int $n = $arr.numElements();
        java.util.Arrays.fill($votes, 0L);
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i)) {
            $digest.reset();
            final byte[] $dig = $digest.digest($arr.getUTF8String($i).getBytes());
            long $h = 0L;
            for (int $k = 0; $k < 7; $k++) {
              $h = ($h << 8) | ($dig[$k] & 0xFFL);
            }
            $h = ($h << 4) | (($dig[7] & 0xFFL) >>> 4);
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

  override protected def withNewChildInternal(newChild: Expression): SimhashSignatureMd5 =
    copy(child = newChild)
}

object SimhashSignatureMd5 {
  /** First 15 hex digits of the md5 digest as a (positive, 60-bit)
    * long — value-identical to SQL
    * `conv(substring(md5(tok), 1, 15), 16, 10)`: hex chars 1–15 are
    * digest bytes 0–6 in full plus the high nibble of byte 7. */
  def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val dig = md.digest(bytes)
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (dig(k) & 0xFFL); k += 1 }
    (h << 4) | ((dig(7) & 0xFFL) >>> 4)
  }
}
