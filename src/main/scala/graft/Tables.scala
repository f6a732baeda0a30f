package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Each table is one parquet file under the scale-factor directory. Reads are
  * plain `spark.read.parquet`, so Catalyst pushes filters and prunes columns
  * into the scan — at 100 TB the same code reads a partitioned table and
  * partition pruning applies unchanged.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized parquet
    * reader rejects; read nanos as long and truncate to microsecond
    * timestamps (what the DuckDB oracle sees after CAST(ts AS TIMESTAMP)).
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the SESSION
    * (set by the Verify/Bench/spec builders — a table loader must not
    * mutate shared session conf; VERDICT r2 item 5). Fails fast with a
    * pointer at the conf if the session lacks it. */
  private def eventsRaw: DataFrame = {
    require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (see Verify/Bench builders)")
    t("events")
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    eventsRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Fan a scan out across all cores before per-row-expensive work (JSON
    * parse, tokenize chains, ML featurization). The driver's test tables are
    * single-file/single-row-group parquet, which Spark cannot split — every
    * scan is ONE task regardless of maxPartitionBytes. At 100 TB tables have
    * thousands of row groups and scans parallelize natively, so this
    * round-robin exchange is a small-file mitigation, not the scale plan;
    * its cost here is one shuffle of the (column-pruned) input. */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)
}

object Tables {
  /** A 0-row frame with the given columns — the empty-input result for
    * spark.ml-fit wrappers (KMeans/LDA/CountVectorizer throw on an empty
    * corpus; a library query should return an empty result instead). */
  private[graft] def emptyFrame(spark: SparkSession,
      fields: (String, org.apache.spark.sql.types.DataType)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields.map { case (n, dt) =>
        org.apache.spark.sql.types.StructField(n, dt)
      }))
}
