package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Error envelopes for the approximate (sketch) aggregates — the 100 TB
  * substitutes for exact distinct/percentile. */
class SketchSpec extends SparkSpec {

  test("HLL++ approx distinct within its 1% rsd envelope (q23)") {
    val rows = Relational.qApproxDistinct(sf0001).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("t-digest approx percentiles near the exact interpolated values (q60 vs q51)") {
    val approx = Relational.qApproxPercentile(sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Relational.q51Percentiles(sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (p50, p95)) =>
      val (a50, a95) = approx(flag)
      assert(math.abs(a50 - p50) / p50 < 0.02, s"$flag p50 $a50 vs $p50")
      assert(math.abs(a95 - p95) / p95 < 0.02, s"$flag p95 $a95 vs $p95")
    }
  }
}
