package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Storage-layout operators — the two techniques that decide whether a
  * 100 TB fact⋈fact workload shuffles the lake per query or not:
  *
  *  - '''bucketing''' (q91): both join sides written `bucketBy(join key)` +
  *    `sortBy` → every subsequent sort-merge join on that key needs NO
  *    Exchange and NO Sort; the shuffle is paid ONCE at write time and
  *    amortized over every later query. BucketingSpec asserts the
  *    no-Exchange plan; q91 puts the result under the driver's hash gate.
  *  - '''partitioned layout + partition pruning''' (q93): the table written
  *    `partitionBy(low-cardinality column)` → a filter on that column
  *    prunes whole directories at planning time (PartitionFilters in the
  *    scan, files never opened). At 100 TB this is the difference between
  *    scanning 5 TB and 100 TB for a per-language slice.
  *
  * Both queries physically WRITE the laid-out copy into a per-SF temp dir
  * once per JVM (cached below), then answer from it. The layout step is a
  * deliberate part of the measured work: it is exactly what a production
  * pipeline pays at ingest, and re-using it across bench reps mirrors how
  * the amortization works on a cluster. Results are layout-independent, so
  * the DuckDB oracles run on the original parquet.
  */
object Layout {

  private def dsum2(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** One laid-out copy per (session, sfDir) per JVM. Tables, paths, and
    * the cache key all carry the SAME session-scoped tag: two live
    * sessions on one sfDir get disjoint metastore tables and temp dirs
    * (no overwrite race), and a restarted session gets a fresh tag (a
    * rebuild is never skipped against a stopped session's catalog — the
    * identity-hash-reuse hazard the old key had). Tags are a monotonic
    * counter held in a WeakHashMap, so they restart per JVM and paths
    * from a previous run get overwritten rather than accumulating. */
  private val prepared = scala.collection.concurrent.TrieMap[String, Unit]()

  private val sessionTags = new java.util.WeakHashMap[SparkSession, String]()
  private val sessionCtr = new java.util.concurrent.atomic.AtomicInteger()
  private[graft] def sessionTag(spark: SparkSession): String = sessionTags.synchronized {
    var t = sessionTags.get(spark)
    if (t == null) { t = s"s${sessionCtr.incrementAndGet()}"; sessionTags.put(spark, t) }
    t
  }

  private def sfTag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  private def layoutRoot(t: Tables): java.nio.file.Path =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-layout-${sessionTag(t.spark)}-${sfTag(t.sfDir)}")

  /** Table names are per-(session, SF) so one session can hold several SFs
    * (specs) and concurrent sessions never collide in the metastore. */
  private def bucketNames(t: Tables): (String, String) = {
    val tag = s"${sessionTag(t.spark)}_${sfTag(t.sfDir)}".replaceAll("[^A-Za-z0-9_]", "_")
    (s"graft_li_bkt_$tag", s"graft_ord_bkt_$tag")
  }

  /** Write lineitem + orders bucketed by their join key (8 buckets, sorted
    * within buckets), projected to the columns q91 needs — a pruned write,
    * like a real ingest job materializing a join-optimized layout. */
  private def ensureBucketed(t: Tables): (String, String) = {
    val (liName, ordName) = bucketNames(t)
    val key = s"${sessionTag(t.spark)}#bkt#${t.sfDir}"
    prepared.getOrElseUpdate(key, {
      val root = layoutRoot(t)
      t.lineitem
        .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
        .write.mode("overwrite")
        .option("path", root.resolve("lineitem_bkt").toString)
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liName)
      t.orders
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite")
        .option("path", root.resolve("orders_bkt").toString)
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordName)
    })
    (liName, ordName)
  }

  /** Build both laid-out copies (idempotent, cached per JVM). Bench calls
    * this in its sfDir warmup so q91/q93 measure QUERY time off the layout,
    * not the one-time ingest write the layout amortizes away — mirroring a
    * cluster where the bucketed/partitioned table already exists. Verify
    * (correctness) still pays it inline, which is fine: results are
    * layout-independent. */
  def prepare(t: Tables): Unit = {
    ensureBucketed(t)
    ensurePartitionedDocs(t)
  }

  /** The co-located join itself, pre-aggregation — exposed so BucketingSpec
    * can assert the physical plan has no Exchange under the join. The merge
    * hint forces the sort-merge path (a broadcast would also skip the
    * shuffle here, but only because the test orders table is small — the
    * bucketed SMJ is the shape that survives fact⋈fact at 100 TB). */
  def bucketedJoined(t: Tables): DataFrame = {
    val (liName, ordName) = ensureBucketed(t)
    t.spark.table(liName).hint("merge")
      .join(t.spark.table(ordName), col("l_orderkey") === col("o_orderkey"))
  }

  /** Q91: revenue by order priority × return flag off the bucketed layout.
    * Plan: bucketed scan → zero-Exchange SMJ → partial agg → shuffle of
    * O(groups) rows. The only full-width shuffle in the query's lifetime
    * happened at layout time. Oracle: the same join/agg in ANSI SQL on the
    * original parquet — results are layout-independent by definition. */
  def q91BucketedJoin(t: Tables): DataFrame =
    bucketedJoined(t)
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"), col("l_returnflag"))

  val q91Sql: String =
    """SELECT o_orderpriority, l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority, l_returnflag
      |ORDER BY o_orderpriority, l_returnflag""".stripMargin

  /** Write documents partitioned by lang (hive-style directories). */
  private def ensurePartitionedDocs(t: Tables): String = {
    val dir = layoutRoot(t).resolve("docs_by_lang").toString
    val key = s"${sessionTag(t.spark)}#part#${t.sfDir}"
    prepared.getOrElseUpdate(key, {
      t.documents.write.mode("overwrite").partitionBy("lang").parquet(dir)
    })
    dir
  }

  /** Q93: per-language corpus stats answered from the lang-partitioned
    * layout with a partition-pruning filter — the scan opens only the
    * en/de directories (PartitionFilters; asserted in BucketingSpec). At
    * 100 TB with ~40 language partitions this reads ~2/40ths of the lake.
    * Oracle: same aggregate on the unpartitioned original. */
  def q93PartitionPrune(t: Tables): DataFrame = {
    // explicit schema: a 0-row source writes no data files and inference
    // fails; partition discovery (and pruning) still applies
    val docs = t.spark.read.schema(t.documents.schema)
      .parquet(ensurePartitionedDocs(t))
    docs.filter(col("lang").isin("en", "de"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("source"))
  }

  /** Exposed for the pruning plan assertion. */
  def partitionPrunedScan(t: Tables): DataFrame =
    t.spark.read.schema(t.documents.schema)
      .parquet(ensurePartitionedDocs(t))
      .filter(col("lang").isin("en", "de"))

  val q93Sql: String =
    """SELECT lang, source, COUNT(*) AS n,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE lang IN ('en', 'de')
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin
}
