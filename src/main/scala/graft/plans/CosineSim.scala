package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity over two array<float> columns as a native Catalyst
  * expression (SURVEY.md §2.8 F13 / §2.3 J4; the custom-operator ladder's
  * rung (b) — a scalar Expression beats a UDF).
  *
  * Why not the UDF: a Scala UDF deserializes each array to Seq[Float]
  * (boxing every element) and breaks the surrounding whole-stage-codegen
  * span; this expression reads ArrayData floats in place and inlines a
  * static call into generated code. Arithmetic is the same
  * sequential-double accumulation as fasthash.cosine, so results (and the
  * DuckDB list_cosine_similarity oracle parity) are bit-identical.
  *
  * Null handling: null if either input is null (BinaryExpression default);
  * array elements are assumed non-null (embedding vectors).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.sim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosineSim.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** array<double> × array<double> variant of [[CosineSim]] — the float
  * getter reads garbage on a double-backed ArrayData, so computed vectors
  * (e.g. k-means centroids, which are per-dim means) need their own
  * accessor. Callers cast the raw embedding side to array<double> too
  * (float→double widening is exact, so results are unchanged). */
case class CosineSimD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.simD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosineSim.simD($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimD =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Static entry point shared by interpreted eval and generated code —
    * identical arithmetic to fasthash.cosine (sequential double). */
  def sim(a: ArrayData, b: ArrayData): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Same sequential accumulation over double-element arrays. */
  def simD(a: ArrayData, b: ArrayData): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Column API: cosine(a, b) over array<float> columns. */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API: cosine(a, b) over array<double> columns. */
  def cosineD(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimD(GraftBridge.expression(a), GraftBridge.expression(b)))
}
