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

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet's `ts` column has shifted physical/read types across
    * driver and Spark versions (TIMESTAMP(NANOS) read as long under the
    * legacy `nanosAsLong` conf; Spark 4.1.2 ignores that conf and reads
    * nanos/micros NTZ natively — VERDICT r7). Dispatch on the type the
    * reader ACTUALLY produced, never on conf presence; all branches land on
    * the same microsecond TimestampType instant the DuckDB oracle sees via
    * CAST(ts AS TIMESTAMP). */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.col
    Tables.normalizeEventTs(t("events"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** True when this sfDir's layout gives scans native parallelism ≥ the
    * core count, making [[fanout]] a no-op. Decided once per Tables
    * instance from the documents table's files (every table in a dir
    * shares the generator's layout style) by estimating Spark's actual
    * SPLIT count — file COUNT alone is wrong: FilePartition PACKING
    * coalesces small files (maxPartitionBytes 128 MB, openCost 4 MB per
    * file), so 32 tiny part files become ~2 scan tasks and per-row-heavy
    * work runs underparallelized again (measured: q236's PNG codec 3.5×
    * slower under a naive file-count heuristic). Splits ≈
    * min(nFiles, ceil(Σ(bytes + openCost) / maxPartitionBytes)) — the
    * bin-packing bound Spark's FilePartition.getFilePartitions obeys. */
  private lazy val multiFileLayout: Boolean = {
    val p = new java.io.File(s"$sfDir/documents.parquet")
    val files = Option(p.listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    if (!p.isDirectory || files.isEmpty) false
    else {
      def bytesConf(key: String, dflt: Long): Long =
        try {
          val v = spark.conf.get(key, dflt.toString)
          if (v.forall(_.isDigit)) v.toLong else dflt
        } catch { case _: Throwable => dflt }
      val maxPB = bytesConf("spark.sql.files.maxPartitionBytes", 128L << 20)
      val openCost = bytesConf("spark.sql.files.openCostInBytes", 4L << 20)
      val total = files.map(_.length + openCost).sum
      val splits = math.min(files.length.toLong,
        (total + maxPB - 1) / maxPB)
      splits >= spark.sparkContext.defaultParallelism
    }
  }

  /** Fan a scan out across all cores before per-row-expensive work (JSON
    * parse, tokenize chains, ML featurization). The driver's test tables are
    * single-file/single-row-group parquet, which Spark cannot split — every
    * scan is ONE task regardless of maxPartitionBytes. At 100 TB tables have
    * thousands of row groups and scans parallelize natively, so this
    * round-robin exchange is a small-file mitigation, not the scale plan —
    * and on a multi-file layout (VERDICT r12 item 5; graft.MultiFile writes
    * one) it is skipped entirely; its cost on the single-file layout is one
    * shuffle of the (column-pruned) input. */
  def fanout(df: DataFrame): DataFrame =
    if (multiFileLayout) df
    else df.repartition(spark.sparkContext.defaultParallelism)
}

object Tables {
  /** Normalize an events frame's `ts` column to session-zone TimestampType
    * (microsecond instants), dispatching on the type the parquet reader
    * actually produced:
    *  - LongType — legacy `nanosAsLong` read of TIMESTAMP(NANOS): integer-
    *    divide nanos to micros (truncation, matching DuckDB's NS→US cast);
    *  - TimestampNTZType — Spark ≥4.1 native read (nanos already micros-
    *    truncated, or a plain micros NTZ file): cast to TimestampType;
    *    sessions run UTC, so the NTZ wall-clock IS the UTC instant;
    *  - TimestampType — already normalized.
    * Every consumer — batch (`events`) AND streaming (Events.scala,
    * StreamingSpec) — must route ts through here; hand-rolled per-site
    * conversions are how q101 silently divided twice (VERDICT r7 item 2). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other — extend Tables.normalizeEventTs")
    }
  }

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
