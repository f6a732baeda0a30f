package graft.plans

import graft.functions.text
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** fuzz.ratio as a native Catalyst expression (SURVEY.md §4 custom-concern
  * 3: the one custom Expression the engine needs — exact parity with the
  * reference's python-levenshtein ratio, reference pipeline.py:29).
  *
  * Codegen emits a direct static call on the two UTF8Strings — no ScalaUDF
  * encoder boxing, stays inside whole-stage codegen (the UDF form breaks
  * the codegen stage around it). Null-safe: null input → null.
  */
case class IndelRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IndelRatio.ratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.IndelRatio.ratio($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IndelRatio =
    copy(left = newLeft, right = newRight)
}

object IndelRatio {

  private val dpRow = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }

  private val maskTL = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Fast paths, all byte-level off the UTF8String buffers (no String
    * allocation):
    *  - ASCII with |b| ≤ 64: Allison–Dix (1986) bit-parallel LCS — the
    *    whole DP row is one machine word, ~10× the classic DP.
    *  - ASCII otherwise: single-row byte DP with a thread-local buffer.
    *  - non-ASCII: the String reference implementation.
    * All three compute the same value (randomized parity asserted in
    * PlanSpec against text.fuzzRatio). */
  def ratio(a: UTF8String, b: UTF8String): Int = {
    val n = a.numChars(); val m = b.numChars()
    if (n != a.numBytes() || m != b.numBytes()) // non-ASCII: correct fallback
      return text.fuzzRatio(a.toString, b.toString)
    val total = n + m
    if (total == 0) return 100
    if (n == 0 || m == 0) return 0
    val lcs =
      if (m <= 64) {
        val mask = maskTL.get()
        var j = 0
        while (j < m) { mask(b.getByte(j) & 0xFF) |= (1L << j); j += 1 }
        var row = 0L
        var i = 0
        while (i < n) {
          val x = mask(a.getByte(i) & 0xFF) | row
          row = x & ~(x - ((row << 1) | 1L))
          i += 1
        }
        j = 0
        while (j < m) { mask(b.getByte(j) & 0xFF) = 0L; j += 1 }
        java.lang.Long.bitCount(row)
      } else {
        var dp = dpRow.get()
        if (dp.length < m + 1) { dp = new Array[Int](m + 1); dpRow.set(dp) }
        java.util.Arrays.fill(dp, 0, m + 1, 0)
        var i = 1
        while (i <= n) {
          val ai = a.getByte(i - 1)
          var diag = 0
          var j = 1
          while (j <= m) {
            val tmp = dp(j)
            dp(j) =
              if (ai == b.getByte(j - 1)) diag + 1
              else if (dp(j) >= dp(j - 1)) dp(j) else dp(j - 1)
            diag = tmp
            j += 1
          }
          i += 1
        }
        dp(m)
      }
    // half-even (= Python 3 round, fuzzywuzzy's int(round(...))) — keep in
    // lockstep with text.fuzzRatio; PlanSpec asserts randomized parity
    math.rint(100.0 * (2 * lcs).toDouble / total).toInt
  }

  /** Column API: fuzz_ratio(a, b) ∈ [0, 100]. */
  def fuzzRatio(a: Column, b: Column): Column =
    GraftBridge.column(IndelRatio(GraftBridge.expression(a), GraftBridge.expression(b)))
}
