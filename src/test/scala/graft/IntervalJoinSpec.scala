package graft

import org.apache.spark.sql.functions._

/** q97: keyless interval join via bin bucketization — the rewrite must be
  * (a) BNLJ-free in the plan and (b) row-identical to the direct
  * inequality join it replaces. */
class IntervalJoinSpec extends SparkSpec {

  test("q97: bucketized plan has no nested-loop join") {
    val plan = ops.AsOf.q97IntervalJoin(sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "interval join fell back to an all-pairs plan:\n" + plan.take(1500))
  }

  test("q97: bucketized join equals the direct inequality join") {
    val t = sf0001
    val ev = t.events
    val windows = ev.select(to_date(col("ts")).as("d")).distinct()
      .filter(dayofmonth(col("d")) % 3 === 0)
      .select(col("d").cast("string").as("window_id"),
        (col("d").cast("timestamp") + expr("INTERVAL 6 HOURS")).as("w_start"),
        (col("d").cast("timestamp") + expr("INTERVAL 18 HOURS")).as("w_end"))
    // the naive reference plan: join on the range condition alone
    val direct = ev.join(windows,
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("window_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val binned = ops.AsOf.q97IntervalJoin(t)
      .select(col("window_id"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(direct.nonEmpty)
    assert(binned == direct)
  }
}
