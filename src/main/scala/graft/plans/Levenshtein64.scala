package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Levenshtein distance as a native Catalyst expression with the
  * Myers (1999, "A fast bit-vector algorithm for approximate string
  * matching based on dynamic programming", JACM 46(3)) bit-parallel fast
  * path: when the shorter ASCII operand fits one machine word (≤64
  * bytes), the whole DP column is five word operations per text char —
  * ~10× Spark's built-in cell-by-cell DP on the q272 all-pairs audit
  * (measured 8.8 s → ~2 s warm at sf0.1). The IndelRatio sibling
  * (Allison–Dix LCS) computes the INDEL distance; this one computes true
  * Levenshtein (substitutions cost 1), the metric the dedup oracles
  * replay via DuckDB's levenshtein().
  *
  * Codegen emits a direct static call on the two UTF8Strings — no
  * ScalaUDF boxing, stays inside whole-stage codegen. Non-ASCII or
  * both-sides-long inputs take Spark's own UTF8String.levenshteinDistance
  * (the reference implementation; byte-identical results, randomized
  * parity asserted in PlanSpec). Null-safe: null input → null. */
case class Levenshtein64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Levenshtein64.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.Levenshtein64.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Levenshtein64 =
    copy(left = newLeft, right = newRight)
}

object Levenshtein64 {

  private val peqTL = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def dist(a: UTF8String, b: UTF8String): Int = {
    val asciiA = a.numChars() == a.numBytes()
    val asciiB = b.numChars() == b.numBytes()
    if (!asciiA || !asciiB)
      return a.levenshteinDistance(b) // correct non-ASCII fallback
    // pattern = the shorter side (must fit one word); text = the other
    val (p, t) = if (a.numBytes() <= b.numBytes()) (a, b) else (b, a)
    val m = p.numBytes(); val n = t.numBytes()
    if (m == 0) return n
    if (m > 64) return a.levenshteinDistance(b)
    val peq = peqTL.get()
    var j = 0
    while (j < m) { peq(p.getByte(j) & 0xFF) |= (1L << j); j += 1 }
    // Myers 1999: VP/VN are the vertical delta bit-vectors of DP column j
    var vp = if (m == 64) -1L else (1L << m) - 1L
    var vn = 0L
    var score = m
    val top = 1L << (m - 1)
    // Hyyrö's (2001) canonical presentation of the Myers cell
    var i = 0
    while (i < n) {
      val eq = peq(t.getByte(i) & 0xFF)
      val d0 = (((eq & vp) + vp) ^ vp) | eq | vn
      val hp = vn | ~(d0 | vp)
      val hn = vp & d0
      if ((hp & top) != 0L) score += 1
      if ((hn & top) != 0L) score -= 1
      val x = (hp << 1) | 1L
      vp = (hn << 1) | ~(d0 | x)
      vn = x & d0
      i += 1
    }
    j = 0
    while (j < m) { peq(p.getByte(j) & 0xFF) = 0L; j += 1 }
    score
  }

  /** Column API: lev(a, b) over string columns. */
  def lev(a: Column, b: Column): Column =
    GraftBridge.column(Levenshtein64(GraftBridge.expression(a), GraftBridge.expression(b)))
}
