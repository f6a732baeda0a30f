package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  test("typed top-k aggregator matches the window row_number path") {
    val spark0 = spark
    import spark0.implicits._
    val orders = sf0001.orders
      .select(col("o_custkey").as[Long], col("o_totalprice").as[Double],
        col("o_orderkey").as[Long])

    val viaAgg = orders
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(3).toColumn)
      .flatMap { case (cust, top) => top.map(t => (cust, t._2, t._1)) }
      .collect().toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = sf0001.orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey").as[Long], col("o_orderkey").as[Long],
        col("o_totalprice").as[Double])
      .collect().toSet

    assert(viaAgg == viaWindow)
  }
}
