package graft

import org.apache.spark.sql.functions._

/** Bucketing (the 100 TB co-located-join story): both sides written
  * bucketed by the join key → the sort-merge join needs NO Exchange.
  * At cluster scale this is how repeated fact⋈fact joins avoid
  * re-shuffling 100 TB per query. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) under the default metastore
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    sf0001.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    sf0001.orders.select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))

    // force a sort-merge path so bucketing (not broadcast) carries the join
    val smj = joined.hint("merge")
    val plan = smj.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      "bucketed join still shuffles the lineitem side:\n" + plan.take(2000))

    // and it is correct
    val viaBuckets = smj.orderBy("l_orderkey").limit(5).collect()
    val plain = sf0001.lineitem
      .join(sf0001.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
      .orderBy("l_orderkey").limit(5).collect()
    assert(viaBuckets.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
