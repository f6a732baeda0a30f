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
  /** Static entry point shared by interpreted eval and generated code. */
  def ratio(a: UTF8String, b: UTF8String): Int =
    text.fuzzRatio(a.toString, b.toString)

  /** Column API: fuzz_ratio(a, b) ∈ [0, 100]. */
  def fuzzRatio(a: Column, b: Column): Column =
    GraftBridge.column(IndelRatio(GraftBridge.expression(a), GraftBridge.expression(b)))
}
