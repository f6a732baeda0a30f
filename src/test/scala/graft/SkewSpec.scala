package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join result is identical to the plain join") {
    val li = sf0001.lineitem.select("l_orderkey", "l_partkey", "l_quantity", "l_linenumber")
    val part = sf0001.part.select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(part, "l_partkey")
      .groupBy("p_brand").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    val salted = Skew.saltedJoin(li, part, "l_partkey",
        saltFrom = col("l_orderkey") * 10 + col("l_linenumber"))
      .groupBy("p_brand").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(salted == plain)
  }

  test("skew-safe two-phase aggregation equals direct groupBy") {
    val ev = sf0001.events
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val safe = Skew.skewSafeSumCount(ev, "event_type", "value", col("event_id"))
      .select("event_type", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(safe == direct)
  }
}
