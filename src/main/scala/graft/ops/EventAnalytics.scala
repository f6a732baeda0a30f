package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-funnel and cohort-retention analytics over the events table —
  * the classic product-analytics workloads (the batch form of what the
  * reference's time-bounded queries feed; SURVEY §2.10 T3 adjacency).
  * Both are integer/date-exact end to end: no float ever enters the
  * output, so the DuckDB hash gate pins them bit-for-bit.
  */
object EventAnalytics {

  /** Q104: strictly-ordered funnel view → click → purchase with a 12-hour
    * per-step conversion window. A user converts at step k only if step
    * k's FIRST qualifying event lands in [t_{k−1}, t_{k−1} + 12 h). Three
    * chained per-user conditional aggregates (each a hash aggregate on
    * user_id — same key, so Spark reuses one Exchange's partitioning
    * across stages; at 100 TB this is one shuffle of |events| then
    * |users|-sized joins, broadcastable on the dim side). Output is one
    * row of stage counts — pure longs; the timestamp comparisons are
    * microsecond-exact cross-engine. */
  def qFunnel(t: Tables): DataFrame = {
    val ev = t.events.select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") >= col("t1") &&
        col("ts") < col("t1") + expr("INTERVAL 12 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts") >= col("t2") &&
        col("ts") < col("t2") + expr("INTERVAL 12 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    // one row of stage counts via left joins on the shared user_id key
    // (a crossJoin of the three 1-row aggregates would plan a
    // BroadcastNestedLoopJoin — PlanAuditSpec forbids NLJ engine-wide)
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .agg(
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_view_click_purchase"))
  }

  val qFunnelSql: String =
    """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, MIN(ev.ts) AS t2
      |       FROM ev JOIN s1 ON ev.user_id = s1.user_id
      |       WHERE ev.event_type = 'click' AND ev.ts >= s1.t1
      |         AND ev.ts < s1.t1 + INTERVAL '12 hours' GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, MIN(ev.ts) AS t3
      |       FROM ev JOIN s2 ON ev.user_id = s2.user_id
      |       WHERE ev.event_type = 'purchase' AND ev.ts >= s2.t2
      |         AND ev.ts < s2.t2 + INTERVAL '12 hours' GROUP BY ev.user_id)
      |SELECT COUNT(s1.t1)::BIGINT AS n_view,
      |       COUNT(s2.t2)::BIGINT AS n_view_click,
      |       COUNT(s3.t3)::BIGINT AS n_view_click_purchase
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |        LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin

  /** Q105: cohort retention — users grouped by first-activity day, counted
    * once per (cohort, day-offset) they were active. The (user, cohort,
    * offset) distinct is the only |events|-scale shuffle; the final
    * aggregate is |cohorts × offsets|. Date arithmetic only — exact. */
  def qRetention(t: Tables): DataFrame = {
    val ev = t.events.select(col("user_id"), to_date(col("ts")).as("d"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    ev.join(first, "user_id")
      .select(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  val qRetentionSql: String =
    """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      |first AS (SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY user_id)
      |SELECT cohort, CAST(date_diff('day', cohort, d) AS INT) AS day_offset,
      |  COUNT(*)::BIGINT AS n_active
      |FROM (SELECT DISTINCT f.cohort, ev.d, ev.user_id
      |      FROM ev JOIN first f ON ev.user_id = f.user_id)
      |GROUP BY cohort, day_offset ORDER BY cohort, day_offset""".stripMargin
}
