package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §2/§4, custom-operator
  * ladder rung (c)): registers the engine's native expressions as SQL
  * functions, so `spark.sql("... fuzz_ratio(a, b) ...")` works anywhere
  * the library's Column API does.
  *
  * Usage: .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * on the session builder, or `GraftExtensions.registerInto(spark)` for a
  * session that already exists (extensions only bind at creation).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // ladder rung (c) whole-operator surface: the native as-of join's
    // planner strategy (NativeAsOf.asOfJoin installs it lazily too)
    ext.injectPlannerStrategy(_ => NativeAsOf.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fuzz_ratio"),
      info("fuzz_ratio",
        "fuzz_ratio(a, b) - fuzzywuzzy-parity indel similarity ratio in [0, 100]"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "fuzz_ratio takes 2 arguments")
        IndelRatio(children.head, children(1))
      }),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two array<float> vectors"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes 2 arguments")
        CosineSim(children.head, children(1))
      }))

  /** Same registrations on an already-built session. */
  def registerInto(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, b) =>
      GraftBridge.registerFunction(spark, id, inf, b)
    }
}
