package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Feature-hashed embedding (Weinberger et al. 2009's hashing trick)
  * of an `array<string>` token list as ONE native Catalyst
  * expression — value-identical to the SQL higher-order-function form
  * ([[graft.operators.TextAnalysis.hashEmbedHof]]): each token
  * occurrence adds ±1 to the bucket its engine-neutral md5-derived
  * hash owns,
  *
  *   - `h = conv(substring(md5(tok), 1, 15), 16, 10)` — the first 15
  *     hex digits of the digest as a 60-bit non-negative long
  *     ([[SimhashSignatureMd5.hash60]], the q130 oracle contract);
  *   - `bucket = h mod dim`; `sign = +1 if (h div dim) even else −1`,
  *
  * so dots/norms stay exact small integers an external SQL engine
  * replays bit-for-bit.
  *
  * Why native: the HOF form folds `aggregate(transform(...))` and
  * REBUILDS the full dim-length array once per token
  * (`transform(acc, …)` allocates a fresh array — O(tokens × dim)
  * churn per document) and evaluates the md5 twice per token (lambda
  * bodies get no common-subexpression elimination — the
  * [[graft.operators.Dedup]] shingles trap). Here each token costs
  * ONE digest and ONE `acc[bucket] += sign` into a scratch buffer:
  * O(tokens + dim) per document, flat in `dim` per token, so
  * production dims (1024–4096) cost the same per token as dim=64.
  * Still a pure projection — no explode, no shuffle, no state; legal
  * in a stream.
  *
  * Null/empty semantics mirror the HOF form: null array → null
  * (`aggregate` over a null array is null), empty array → the zero
  * vector, null elements skipped (the tokenizer's `filter` drops
  * them before the fold).
  */
case class HashEmbedMd5(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim >= 1 && dim <= 65536,
    s"dim must be in [1, 65536], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Double](dim)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SimhashSignatureMd5.hash60(md, arr.getUTF8String(i).getBytes)
        val b = (h % dim).toInt
        acc(b) += (if ((h / dim) % 2 == 0L) 1.0 else -1.0)
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val digest = ctx.addMutableState("java.security.MessageDigest", "heMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                 catch (java.security.NoSuchAlgorithmException e) {
                   throw new RuntimeException(e); }""")
      // scratch accumulator reused across rows (re-zeroed per row);
      // the result is copied out because the returned ArrayData escapes
      val acc = ctx.addMutableState("double[]", "heAcc",
        v => s"$v = new double[$dim];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val dig = ctx.freshName("dig")
      val h = ctx.freshName("h")
      s"""
        final int $n = $arr.numElements();
        java.util.Arrays.fill($acc, 0.0);
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i)) {
            $digest.reset();
            final byte[] $dig =
              $digest.digest($arr.getUTF8String($i).getBytes());
            long $h = 0L;
            for (int $k = 0; $k < 7; $k++) {
              $h = ($h << 8) | ($dig[$k] & 0xFFL);
            }
            $h = ($h << 4) | (($dig[7] & 0xFFL) >>> 4);
            $acc[(int) ($h % $dim)] += (($h / $dim) % 2 == 0L) ? 1.0 : -1.0;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($acc, $dim));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HashEmbedMd5 =
    copy(child = newChild)
}
