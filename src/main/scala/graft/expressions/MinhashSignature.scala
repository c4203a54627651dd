package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of an `array<string>` shingle list as one native
  * Catalyst expression: element k = min over shingles of
  * `g_k(s) = h1(s) XOR rotl(h2(s), k mod 64) XOR K_k` — the
  * Kirsch–Mitzenmacher double-hash family
  * [[graft.operators.Dedup.minhashSignatures]] computes with
  * `numHashes` min-aggregate buffers over the exploded shingle table.
  *
  * Why native: as an aggregate, signature building costs the explode
  * of every shingle to its own row plus a full shuffle of the shingle
  * table into `numHashes` agg buffers. As a projection the signature
  * is computed per document row in one fused loop — NO shuffle, no
  * shingle explosion — and the banding/bucket join that follows is the
  * pipeline's first exchange. min over the in-row shingle array equals
  * min over the distinct shingle table (duplicates never change a
  * min), so the output is bit-identical to the aggregate form:
  * same `xxhash64(1, s)` / `xxhash64(2, s)` hash chain (int literal
  * hashed into the 42 seed at plan build, then the string bytes), same
  * rotate/XOR mixing, same `K_k = k · 0x9E3779B97F4A7C15` wrapping
  * constants.
  *
  * Null/empty semantics: null array → null; an EMPTY array yields all
  * `Long.MaxValue` (the aggregate form emits no row for a doc with no
  * shingles — the shingle builders guarantee ≥1, so the case is
  * unreachable from [[graft.operators.Dedup.minhashNearDups]]); null
  * elements are skipped (the builders never produce them).
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 1024,
    s"numHashes must be in [1, 1024], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  /** xxhash64 running state after the leading int literal (1 or 2) —
    * matches SQL `xxhash64(lit(k), s)`: seed 42, int hashed first. */
  private lazy val seed1 = XXH64.hashInt(1, 42L)
  private lazy val seed2 = XXH64.hashInt(2, 42L)
  private val Golden = 0x9E3779B97F4A7C15L

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, seed1)
        val h2 = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, seed2)
        var k = 0
        while (k < numHashes) {
          val g = h1 ^ java.lang.Long.rotateLeft(h2, k & 63) ^ (k.toLong * Golden)
          if (g < mins(k)) mins(k) = g
          k += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      // scratch min array reused across rows (re-filled per row); the
      // result is copied out because the returned ArrayData escapes
      val mins = ctx.addMutableState("long[]", "mhMins",
        v => s"$v = new long[$numHashes];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val g = ctx.freshName("g")
      s"""
        final int $n = $arr.numElements();
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i)) {
            final org.apache.spark.unsafe.types.UTF8String $s =
              $arr.getUTF8String($i);
            final long $h1 = $xxh.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed1}L);
            final long $h2 = $xxh.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed2}L);
            for (int $k = 0; $k < $numHashes; $k++) {
              final long $g = $h1 ^ Long.rotateLeft($h2, $k & 63)
                ^ ((long) $k * ${Golden}L);
              if ($g < $mins[$k]) $mins[$k] = $g;
            }
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($mins, $numHashes));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
