package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature of an `array<double>` vector as one
  * native Catalyst expression: bit p = sign(v · plane_p), where
  * plane_p's ±1 components are derived from `xxhash64(p, dim)` — the
  * corpus-hashing step of [[graft.operators.Similarity]]'s LSH index
  * and cosine near-dup candidate generation.
  *
  * Why native: the Column formulation runs `planes` separate
  * `aggregate(zip_with(vec, sequence(...), ...))` chains per row —
  * allocating `planes` index arrays and `planes` zipped arrays, and
  * evaluating `planes × dims` interpreted xxhash64 calls + lambda
  * closures. Here the per-plane seeds `xxhash64_state(p, seed=42)` are
  * folded at plan-build time, and one fused loop over the dimensions
  * accumulates every plane's projection — zero per-row allocation
  * beyond one reused scratch array.
  *
  * Bit-for-bit identical to the Column form: same hash chain
  * (`XXH64.hashInt(dim, XXH64.hashInt(p, 42))`, matching SQL
  * `xxhash64(p, dim)` over two int inputs), same ascending-dimension
  * double accumulation per plane, `proj > 0` bit rule, and the HOF
  * null semantics (null vector or any null element → signature 0,
  * because a null poisons every projection and `when(null > 0)` takes
  * the otherwise-0 branch).
  */
case class HyperplaneSignature(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes > 0 && planes <= 63, s"planes must be in [1, 63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hyperplane_sig"

  /** xxhash64 running state after the plane index: seed 42, first int
    * input hashed in — constant per plane, folded at plan build. */
  private lazy val planeSeeds: Array[Long] =
    Array.tabulate(planes)(p => XXH64.hashInt(p, 42L))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val proj = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L
      val x = arr.getDouble(i)
      var p = 0
      while (p < planes) {
        if ((XXH64.hashInt(i, planeSeeds(p)) & 1L) == 1L) proj(p) += x
        else proj(p) -= x
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      if (proj(p) > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val xxh = classOf[XXH64].getName
    // scratch projection array reused across rows (zeroed per row)
    val proj = ctx.addMutableState("double[]", "hpProj",
      v => s"$v = new double[$planes];")
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val x = ctx.freshName("x")
    val p = ctx.freshName("p")
    val anyNull = ctx.freshName("anyNull")
    val accum = (0 until planes).map { pl =>
      s"$proj[$pl] += (($xxh.hashInt($i, ${planeSeeds(pl)}L) & 1L) == 1L) ? $x : -$x;"
    }.mkString("\n")
    val code =
      code"""
        ${childGen.code}
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
          final int $n = $arr.numElements();
          boolean $anyNull = false;
          java.util.Arrays.fill($proj, 0.0);
          for (int $i = 0; $i < $n; $i++) {
            if ($arr.isNullAt($i)) { $anyNull = true; break; }
            final double $x = $arr.getDouble($i);
            $accum
          }
          if (!$anyNull) {
            for (int $p = 0; $p < $planes; $p++) {
              if ($proj[$p] > 0) { ${ev.value} |= (1L << $p); }
            }
          } else {
            ${ev.value} = 0L;
          }
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}
