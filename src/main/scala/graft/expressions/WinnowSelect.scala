package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the
  * MOSS algorithm) over a per-row gram-hash array: slide a window of
  * `w` consecutive hashes and select the RIGHTMOST minimum of each
  * window; the distinct selected positions (1-based, ascending) are
  * the fingerprint anchors. Guarantees of the paper: any shared run of
  * ≥ `w + gramSize − 1` tokens between two documents shares at least
  * one selected fingerprint, and the expected density of selections is
  * 2/(w+1) — position-robust where a fixed-stride sample is not
  * (an insertion shifts every downstream stride anchor, but the
  * window minima re-align).
  *
  * Hash-agnostic: selection is a pure function of the `array<long>`
  * hash values, so the same expression serves the native xxhash64
  * production path AND the md5-hashed oracle path (the cross-engine
  * gate recomputes gram hashes in SQL and replays this selection with
  * list functions).
  *
  * One O(G) pass per row via a monotonic deque (indices with
  * increasing hash value; an incoming equal-or-smaller hash evicts
  * from the back, so the front is always the window's rightmost
  * minimum). Arrays shorter than `w` hashes form one window of
  * everything. Null array → null; null elements cannot occur
  * (upstream gram hashers emit non-null primitives).
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {

  require(w > 0, s"winnow window must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    // a null ELEMENT has no defined window-minimum semantics (compute()
    // reads raw longs); reject at plan time so SQL callers passing
    // array<bigint> with containsNull get an analysis error, not an NPE
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> without null elements; " +
        "Catalyst marks transform-lambda results nullable even when " +
        "they never are — wrap the lambda body in coalesce(expr, 0L) " +
        "to carry the non-null proof (filter(x, x -> x is not null) " +
        "does NOT help: ArrayFilter preserves the containsNull flag)")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_winnow_select"

  override def nullSafeEval(v: Any): Any =
    WinnowSelect.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
        ${ev.value} = graft.expressions.WinnowSelect$$.MODULE$$
          .compute($arr, $w);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {

  /** Monotonic-deque sliding-window rightmost-minimum scan; marks
    * selected indices, then emits them once in ascending order.
    * Called from both eval and generated code. */
  def compute(arr: ArrayData, w: Int): UnsafeArrayData = {
    val g = arr.numElements()
    if (g == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val win = math.min(w, g)
    val selected = new Array[Boolean](g)
    // deque of indices; hashes strictly increasing front→back
    val dq = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < g) {
      val h = arr.getLong(i)
      // equal values evict too: the rightmost occurrence must win
      while (tail > head && arr.getLong(dq(tail - 1)) >= h) tail -= 1
      dq(tail) = i
      tail += 1
      val s = i - win + 1 // window start for the window ENDING at i
      if (s >= 0) {
        while (dq(head) < s) head += 1
        selected(dq(head)) = true
      }
      i += 1
    }
    var count = 0
    i = 0
    while (i < g) { if (selected(i)) count += 1; i += 1 }
    val out = new Array[Int](count)
    var o = 0
    i = 0
    while (i < g) {
      if (selected(i)) { out(o) = i + 1; o += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
