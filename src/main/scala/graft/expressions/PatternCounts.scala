package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping match counts of several regex patterns over one
  * string column, as a single native expression returning
  * `array<int>` (one count per pattern, in order).
  *
  * Why native: the profile/quality/language-ID operators need ~8
  * counts per document, and each Column-level form pays for work the
  * count never uses — `size(regexp_extract_all(...))` materializes a
  * UTF8String per match just to take the array's size, and
  * `length(regexp_replace(...))` rebuilds the whole string to count
  * what was removed. Each also re-converts the row's UTF8String for
  * its own matcher. Here the row converts ONCE and each pattern runs
  * one allocation-free `Matcher.find()` loop over the shared String —
  * the same java.util.regex engine the built-ins use, so counts are
  * identical by construction.
  *
  * Case-insensitive needs are expressed with `(?i)` inside the
  * pattern (ASCII-only folding in java.util.regex — equivalent to
  * matching lowercase literals against `lower(text)` for ASCII
  * patterns, which is what the stopword heuristics do).
  */
case class PatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "at least one pattern required")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pattern_counts"

  @transient private lazy val compiled: Array[Pattern] =
    patterns.map(Pattern.compile).toArray

  override def nullSafeEval(v: Any): Any =
    PatternCounts.compute(v.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compile once per generated-class instance, not per row: the
    // source strings serialize with the plan, the Patterns are rebuilt
    // lazily task-side
    val pats = ctx.addMutableState("java.util.regex.Pattern[]", "graftPats",
      forceInline = true)
    val src = ctx.addReferenceObj("patternSrc", patterns.toArray,
      "java.lang.String[]")
    // fresh loop var: the generated method's InternalRow param is `i`
    val j = ctx.freshName("pIdx")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        if ($pats == null) {
          $pats = new java.util.regex.Pattern[$src.length];
          for (int $j = 0; $j < $src.length; $j++) {
            $pats[$j] = java.util.regex.Pattern.compile($src[$j]);
          }
        }
        ${ev.value} = graft.expressions.PatternCounts$$.MODULE$$
          .compute($s, $pats);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PatternCounts =
    copy(child = newChild)
}

object PatternCounts {

  def compute(s: UTF8String, pats: Array[Pattern]): UnsafeArrayData = {
    val str = s.toString
    val out = new Array[Int](pats.length)
    var i = 0
    while (i < pats.length) {
      val m = pats(i).matcher(str)
      var c = 0
      while (m.find()) c += 1
      out(i) = c
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
