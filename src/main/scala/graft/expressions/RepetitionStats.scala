package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics over an `array<string>` unit
  * list (word tokens, lines, or paragraphs), for every requested gram
  * size, as ONE native expression — the aggregation-free form of the
  * Gopher repetition rules (Rae et al. 2021, Appendix A).
  *
  * For each `n` in `ns`, groups the document's word n-grams (unit
  * sequences of length `n`; a document with fewer than `n` units
  * contributes no n-grams) and emits one struct:
  *
  *  - `n_grams`: total gram occurrences, `n_distinct`: distinct grams
  *  - `top_chars`: max over grams of count × gramChars
  *  - `dup_chars`: Σ over grams with count > 1 of count × gramChars
  *  - `rep_chars`: Σ over grams of (count − 1) × gramChars
  *  - `all_chars`: Σ over grams of count × gramChars
  *
  * where gramChars = member-unit character lengths + (n − 1)
  * single-space separators — the character length of the space-joined
  * gram string the Column form grouped by.
  *
  * Why native: these statistics are INTRA-document, but the Column
  * form had to explode every (doc, n, gram string) row — 9 string
  * allocations per token position for the paper's sizes — through two
  * corpus-wide hash aggregates and a join back. Here the whole
  * computation happens inside the row: member units are grouped with
  * an open-addressed table keyed by combined unit hashes and VERIFIED
  * by unit-sequence equality on hash collision (units carry no
  * whitespace, so unit-sequence equality is exactly gram-string
  * equality — the counts are EXACT, not hash-approximate), and the
  * operator becomes a pure projection: no explode, no shuffle, no
  * join, embarrassingly parallel at any corpus size.
  *
  * Null array → null row. Null elements hash/compare as empty strings
  * (unreachable from `split`-based tokenizers — noted for safety).
  */
case class RepetitionStats(child: Expression, ns: Seq[Int])
    extends UnaryExpression {

  require(ns.nonEmpty && ns.forall(_ > 0), s"gram sizes must be positive: $ns")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("rep_chars", LongType, nullable = false),
    StructField("all_chars", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_repetition_stats"

  private lazy val nsArray: Array[Int] = ns.toArray

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[ArrayData], nsArray,
      RepetitionStats.threadScratch.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", nsArray, "int[]")
    val scratch = ctx.addMutableState(
      classOf[RepetitionStats.Scratch].getName, "repScratch",
      v => s"$v = new ${classOf[RepetitionStats.Scratch].getName}();")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
        ${ev.value} = graft.expressions.RepetitionStats$$.MODULE$$
          .compute($arr, $nsRef, $scratch);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  /** Reused per-task working arrays (grown geometrically, cleared per
    * use) — one per generated-class instance or per thread on the
    * interpreted path, never shared. */
  final class Scratch {
    var tokHash: Array[Long] = new Array[Long](64)
    var charPrefix: Array[Long] = new Array[Long](65)
    // open-addressing table: gram start position (-1 = empty slot),
    // combined hash, occurrence count
    var slotPos: Array[Int] = new Array[Int](128)
    var slotHash: Array[Long] = new Array[Long](128)
    var slotCnt: Array[Long] = new Array[Long](128)
    def ensureTokens(n: Int): Unit = {
      if (tokHash.length < n) {
        var cap = tokHash.length
        while (cap < n) cap <<= 1
        tokHash = new Array[Long](cap)
        charPrefix = new Array[Long](cap + 1)
      }
    }
    /** capacity must be a power of two ≥ 2·entries. */
    def ensureTable(cap: Int): Unit = {
      if (slotPos.length < cap) {
        var c = slotPos.length
        while (c < cap) c <<= 1
        slotPos = new Array[Int](c)
        slotHash = new Array[Long](c)
        slotCnt = new Array[Long](c)
      }
      java.util.Arrays.fill(slotPos, 0, cap, -1)
    }
  }

  private[expressions] val threadScratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  private def tok(arr: ArrayData, i: Int): UTF8String = {
    val s = arr.getUTF8String(i)
    if (s == null) UTF8String.EMPTY_UTF8 else s
  }

  private def gramsEqual(arr: ArrayData, a: Int, b: Int, n: Int): Boolean = {
    var j = 0
    while (j < n) {
      if (!tok(arr, a + j).equals(tok(arr, b + j))) return false
      j += 1
    }
    true
  }

  def compute(arr: ArrayData, ns: Array[Int], scratch: Scratch): ArrayData = {
    val nTok = arr.numElements()
    scratch.ensureTokens(math.max(nTok, 1))
    val th = scratch.tokHash
    val cp = scratch.charPrefix
    var i = 0
    cp(0) = 0L
    while (i < nTok) {
      val s = tok(arr, i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      cp(i + 1) = cp(i) + s.numChars
      i += 1
    }
    val rows = new Array[Any](ns.length)
    var k = 0
    while (k < ns.length) {
      val n = ns(k)
      val count = nTok - n + 1
      if (count <= 0) {
        rows(k) = new GenericInternalRow(
          Array[Any](n, 0L, 0L, 0L, 0L, 0L, 0L))
      } else {
        var cap = 4
        while (cap < count * 2) cap <<= 1
        scratch.ensureTable(cap)
        val pos = scratch.slotPos
        val hsh = scratch.slotHash
        val cnt = scratch.slotCnt
        val mask = cap - 1
        var p = 0
        while (p < count) {
          var h = 0x9E3779B97F4A7C15L
          var j = p
          val end = p + n
          while (j < end) { h = XXH64.hashLong(th(j), h); j += 1 }
          var idx = (h & mask).toInt
          var done = false
          while (!done) {
            if (pos(idx) < 0) {
              pos(idx) = p; hsh(idx) = h; cnt(idx) = 1L; done = true
            } else if (hsh(idx) == h && gramsEqual(arr, pos(idx), p, n)) {
              cnt(idx) += 1L; done = true
            } else idx = (idx + 1) & mask
          }
          p += 1
        }
        var nDistinct = 0L; var topChars = 0L; var dupChars = 0L
        var repChars = 0L; var allChars = 0L
        var idx = 0
        while (idx < cap) {
          if (pos(idx) >= 0) {
            val g = pos(idx)
            val len = cp(g + n) - cp(g) + (n - 1)
            val c = cnt(idx)
            nDistinct += 1L
            val covered = c * len
            if (covered > topChars) topChars = covered
            if (c > 1L) { dupChars += covered; repChars += (c - 1L) * len }
            allChars += covered
          }
          idx += 1
        }
        rows(k) = new GenericInternalRow(Array[Any](
          n, count.toLong, nDistinct, topChars, dupChars, repChars, allChars))
      }
      k += 1
    }
    new GenericArrayData(rows)
  }
}
