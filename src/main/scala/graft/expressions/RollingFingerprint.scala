package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rabin-Karp rolling fingerprint of an `array<string>` token list as
  * one native Catalyst expression:
  * `h = Σ pmod(xxhash64(tok_i), p) · 31^(n-1-i) mod p` with
  * `p = 100000000000000003` — value-identical to
  * [[graft.operators.TextAnalysis.rollingFingerprint]]'s
  * `aggregate(...)` fold with the default token hash (same seed-42
  * xxhash64 over the token bytes, same left-fold order, same positive
  * mod at every step).
  *
  * Why native: the higher-order `aggregate`'s interpreted lambda not
  * only evaluates the fold slowly, it disables whole-stage codegen for
  * the ENTIRE projection hosting it — in the document-profile
  * projection that silently turns the language-ID regexes and quality
  * arithmetic interpreted too (the same failure mode measured and
  * documented on langId's scaladoc). As a native expression the fold
  * is a primitive loop and the profile projection stays codegen'd.
  * The HOF form remains the route for pluggable token hashes (the
  * engine-neutral md5 variant pinning the q32 oracle).
  *
  * Overflow-safe by construction: acc < p ≈ 1e17, so
  * `acc·31 + pmod(h, p) < 3.2e18 < 2^63`. Null array → null; null
  * elements are skipped (`split` never produces them); an empty array
  * folds to 0 (the HOF's initial accumulator).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"

  private val P = 100000000000000003L

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        acc = Math.floorMod(acc * 31L + Math.floorMod(h, P), P)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
        final int $n = $arr.numElements();
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i)) {
            final org.apache.spark.unsafe.types.UTF8String $s =
              $arr.getUTF8String($i);
            final long $h = $xxh.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            $acc = Math.floorMod($acc * 31L + Math.floorMod($h, ${P}L), ${P}L);
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
