package graft

import graft.ops.AsOf
import graft.plans.NativeAsOf
import org.apache.spark.sql.functions._

/** Custom-operator ladder rung (c): the native as-of join (LogicalPlan +
  * Strategy + merge-scan SparkPlan) must agree row-for-row with the
  * composed rung-(a) operator that the q58 DuckDB-ASOF oracle already
  * hash-verifies — transitively pinning the custom exec to the oracle. */
class NativeAsOfSpec extends SparkSpec {

  private def clicksAndPurchases(t: Tables) = {
    val ev = t.events
    (ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value")))
  }

  test("native as-of join equals the composed (oracle-verified) operator") {
    val (clicks, purchases) = clicksAndPurchases(sf0001)
    val native = NativeAsOf.asOfJoin(clicks, purchases, "user_id", "ts", "value")
      .select("user_id", "event_id", "asof_value", "asof_ts")
      .orderBy("user_id", "event_id").collect()
    val composed = AsOf.asOfJoin(clicks, purchases, "user_id", "ts", "value")
      .select("user_id", "event_id", "asof_value", "asof_ts")
      .orderBy("user_id", "event_id").collect()
    assert(native.length == composed.length && native.length > 0)
    native.zip(composed).foreach { case (n, c) =>
      assert(n.toSeq == c.toSeq, s"native=$n composed=$c")
    }
  }

  test("plan: AsOfJoinExec with EnsureRequirements-inserted shuffles and sorts, no union/window") {
    val (clicks, purchases) = clicksAndPurchases(sf0001)
    val df = NativeAsOf.asOfJoin(clicks, purchases, "user_id", "ts", "value")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix; no "!" prefix = references all bound
    assert(plan.contains("AsOfJoin") && !plan.contains("!AsOfJoin"),
      s"custom exec missing or unresolved:\n$plan")
    assert(plan.contains("Sort"), "children must be sorted (key, ts)")
    assert(!plan.contains("Window"), "native path must not fall back to the window composition")
    assert(!plan.contains("Union"), "native path must not union the sides")
  }

  test("left rows with no matching right row carry nulls") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 60L, 7.5), (3L, 1L, 9.9)).toDF("k", "t", "v")
    val out = NativeAsOf.asOfJoin(left, right, "k", "t", "v")
      .orderBy("k", "t").collect()
    // (1,50): no purchase ≤ 50 → null; (1,100): 60 ≤ 100 → 7.5; (2,10): no key → null
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(r.fieldIndex("asof_v"))))).toSeq ==
      Seq((1L, 50L, None), (1L, 100L, Some(7.5)), (2L, 10L, None)))
  }

  test("null timestamps: null left ts emits the null row, null right ts is skipped") {
    import spark.implicits._
    // java.lang.Long so the ts column is nullable
    val left = Seq[(Long, java.lang.Long, String)](
      (1L, null, "null-ts"), (1L, 100L, "ok"))
      .toDF("k", "t", "tag")
    val right = Seq[(Long, java.lang.Long, Double)](
      (1L, null, 99.9), // must never match anything ("≤ ts" is unknowable)
      (1L, 60L, 7.5))
      .toDF("k", "t", "v")
    val out = NativeAsOf.asOfJoin(left, right, "k", "t", "v")
      .collect()
      .map(r => (Option(r.get(r.fieldIndex("t"))),
        Option(r.get(r.fieldIndex("asof_v"))))).toSet
    // null left ts → unmatched (null payload); real ts matches only the
    // non-null right row — no NPE through the interpreted orderings
    assert(out == Set((None, None), (Some(100L), Some(7.5))), out.toString)
  }

  test("inclusive bound: right row at exactly left ts matches") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 1.0), (1L, 99L, 2.0)).toDF("k", "t", "v")
    val out = NativeAsOf.asOfJoin(left, right, "k", "t", "v").collect()
    assert(out.head.getDouble(out.head.fieldIndex("asof_v")) == 1.0)
    assert(out.head.getLong(out.head.fieldIndex("asof_ts")) == 100L)
  }
}
