package graft

import org.apache.spark.sql.functions._

/** q94 data profiling: one aggregate pass for all non-distinct stats,
  * separate exact-distinct aggregates joined back (q23 lesson: never mix
  * multiple COUNT(DISTINCT)s — or a distinct with a sketch — in one agg). */
class ProfilingSpec extends SparkSpec {

  test("q94: per-column stats are consistent with direct queries") {
    val t = sf0001
    val out = ops.Profiling.q94Profile(t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate"))

    val total = t.lineitem.count()
    out.values.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == total, r.toString) // n + n_null
    }
    val flags = t.lineitem.select(countDistinct(col("l_returnflag"))).head.getLong(0)
    assert(out("l_returnflag").getLong(3) == flags)
    val minKey = t.lineitem.agg(min(col("l_orderkey"))).head.getLong(0)
    assert(out("l_orderkey").getString(4) == minKey.toString)
    // decimal-cast formatting is fixed-scale (trailing zeros kept)
    assert(out("l_extendedprice").getString(4).matches("""\d+\.\d\d"""))
    assert(out("l_shipdate").getString(4).matches("""\d{4}-\d{2}-\d{2}"""))
  }
}
