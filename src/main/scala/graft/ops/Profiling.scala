package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the "ANALYZE TABLE" surface a pipeline runs before it
  * trusts a new drop of data: per-column null rate, distinct count, range.
  *
  * Scale shape: ONE aggregate pass over the table computes every column's
  * non-distinct stats simultaneously (count/min/max are all map-side
  * partial aggregates; the shuffle carries one partial-state row per
  * partition, not data). The per-column rows are then produced by
  * unpivoting the single aggregate row — a 1-row transform, not N scans.
  * count(DISTINCT …) over several columns in one aggregate would explode
  * rows (the distinct-rewrite multiplies input by the number of distinct
  * aggregates — the q23 lesson), so distincts run as their own
  * two-phase aggregates and broadcast-join back onto the per-column rows
  * (each is one scan + O(column cardinality) shuffle — the documented
  * price of EXACT distincts; swap in approx_count_distinct sketches when
  * ±2% is acceptable and one scan must cover everything).
  *
  * Cross-engine stringification: doubles are cast through DECIMAL before
  * printing (Spark's double→string is shortest-repr Ryu, DuckDB's is not —
  * decimal printing is fixed-scale on both), timestamps through DATE.
  */
object Profiling {

  private case class ProfCol(name: String, fmt: Column => Column)

  /** Q94: profile of lineitem's key numeric/date/string columns. Output is
    * one row per column: n, n_null, n_distinct, min/max (as strings — one
    * schema across heterogeneous column types, the df.summary() contract). */
  def q94Profile(t: Tables): DataFrame = {
    val li = t.lineitem
    val cols = Seq(
      ProfCol("l_orderkey", _.cast("string")),
      ProfCol("l_quantity", _.cast("decimal(18,1)").cast("string")),
      ProfCol("l_extendedprice", _.cast("decimal(18,2)").cast("string")),
      ProfCol("l_returnflag", _.cast("string")),
      ProfCol("l_shipdate", _.cast("date").cast("string")))

    // pass 1: every non-distinct stat in one aggregate (one scan)
    def statsFor(pc: ProfCol): Seq[Column] = Seq(
      count(col(pc.name)).as(s"${pc.name}__n"),
      (count(lit(1)) - count(col(pc.name))).as(s"${pc.name}__nulls"),
      pc.fmt(min(col(pc.name))).as(s"${pc.name}__min"),
      pc.fmt(max(col(pc.name))).as(s"${pc.name}__max"))
    val allStats = cols.flatMap(statsFor)
    val profile = li.agg(allStats.head, allStats.tail: _*)

    // per-column exact distincts, stacked into a 5-row dim
    val distincts = cols.map { pc =>
      li.select(col(pc.name)).distinct()
        .agg(count(lit(1)).as("n_distinct"))
        .select(lit(pc.name).as("column"), col("n_distinct"))
    }.reduce(_.unionAll(_))

    // unpivot the 1-row profile to (column, stat…) rows
    val stacked = profile.select(explode(array(cols.map { pc =>
      struct(lit(pc.name).as("column"), col(s"${pc.name}__n").as("n"),
        col(s"${pc.name}__nulls").as("n_null"),
        col(s"${pc.name}__min").as("min_value"),
        col(s"${pc.name}__max").as("max_value"))
    }: _*)).as("s")).select(col("s.*"))

    stacked.join(broadcast(distincts), Seq("column"))
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min_value"), col("max_value"))
      .orderBy(col("column"))
  }

  /** The oracle replays the same stats column-by-column (DuckDB re-scans the
    * small parquet per branch; the SINGLE-scan plan is the Spark side's
    * contract). DECIMAL/DATE casts mirror the Spark formatters exactly. */
  val q94Sql: String = {
    def one(c: String, minExpr: String, maxExpr: String): String =
      s"""SELECT '$c' AS "column", CAST(COUNT($c) AS BIGINT) AS n,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $minExpr AS min_value, $maxExpr AS max_value FROM lineitem""".stripMargin
    Seq(
      one("l_orderkey",
        "CAST(MIN(l_orderkey) AS VARCHAR)", "CAST(MAX(l_orderkey) AS VARCHAR)"),
      one("l_quantity",
        "CAST(CAST(MIN(l_quantity) AS DECIMAL(18,1)) AS VARCHAR)",
        "CAST(CAST(MAX(l_quantity) AS DECIMAL(18,1)) AS VARCHAR)"),
      one("l_extendedprice",
        "CAST(CAST(MIN(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR)",
        "CAST(CAST(MAX(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR)"),
      one("l_returnflag", "MIN(l_returnflag)", "MAX(l_returnflag)"),
      one("l_shipdate",
        "CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR)",
        "CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR)"),
    ).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** Q108: distribution-drift monitor — Laplace-smoothed Population
    * Stability Index of events.value between the first and second half of
    * the time range (the check a pipeline runs between snapshots before
    * retraining: PSI > 0.2 ⇒ the feature moved). Reference deciles come
    * from an exact NTILE over the first half (total order on (value,
    * event_id) ⇒ identical decile membership on any engine); the second
    * half is binned against the first half's decile upper bounds via a
    * 10-arm CASE ladder (bounds are 10 driver-collected doubles — a
    * broadcast-scalar pattern, not a data join; an inequality join against
    * the bounds would plan the NLJ this repo bans). Halving point is
    * integer MICROSECONDS ((min+max)/2 — exact both engines). p's are
    * ratios of exact ints with +0.5/+5 smoothing (no empty-decile infs);
    * psi_term = (p2−p1)·ln(p2/p1) round(6).
    * Scale shape (r9): the reference deciles are EXACT ntile(10) over
    * (value, event_id), but computed as the q144 two-phase bucket prefix
    * instead of a global window: (1) rows bucket by a value-range grid
    * (256 cells; bucket is value-monotone, so bucket asc then (value,
    * event_id) asc IS the global order); (2) per-bucket counts ride the
    * driver (<=257 rows, bounded fetch) and come back as broadcast rank
    * offsets; (3) global rank = offset + row_number partitioned BY BUCKET
    * (bounded partitions, no single-task sort), and the ntile decile
    * falls out of integer math on (rank, N): the first N%10 deciles take
    * floor(N/10)+1 rows, the rest floor(N/10) — provably identical
    * membership to ntile(10), so the NTILE oracle replays bit-identical.
    * Bucket assignment uses double arithmetic, but it only PLACES a row's
    * rank computation — membership derives from the exact (value,
    * event_id) order, so float bucketing cannot shift the result. */
  def qDriftPsi(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t.events.select(col("event_id"), col("value"),
      unix_micros(col("ts")).as("us"))
    val mm = ev.agg(min(col("us")), max(col("us"))).head()
    // empty-table guard: min/max are NULL with no events and getLong
    // throws; the PSI of an empty window is an empty report, not a crash
    if (mm.isNullAt(0)) {
      import org.apache.spark.sql.types._
      return t.spark.createDataFrame(
        t.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("dec", LongType), StructField("n1", LongType),
          StructField("n2", LongType), StructField("psi_term", DoubleType))))
    }
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val h1v = ev.filter(col("us") < mid)
    val vr = h1v.agg(min(col("value")), max(col("value")), count(lit(1))).head()
    // all-events-in-one-instant guard (min==max ts => empty first half):
    // the old plan emitted 0 rows (empty p1 left-joined); keep that contract
    if (vr.isNullAt(0)) {
      import org.apache.spark.sql.types._
      return t.spark.createDataFrame(
        t.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("dec", LongType), StructField("n1", LongType),
          StructField("n2", LongType), StructField("psi_term", DoubleType))))
    }
    val (vmin, vmax, n) = (vr.getDouble(0), vr.getDouble(1), vr.getLong(2))
    val nBuckets = 256
    val width = (vmax - vmin) / nBuckets
    val bucketCol =
      if (width > 0)
        least(floor((col("value") - lit(vmin)) / lit(width)), lit(nBuckets - 1L))
          .cast("int")
      else lit(0) // degenerate constant-value half: one bucket
    val hb = h1v.withColumn("bkt", bucketCol)
    val offsets = {
      val cnts = hb.groupBy(col("bkt")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      cnts.map { case (b, c) => val o = (b, acc); acc += c; o }
    }
    import t.spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("bkt", "off"))
    // ntile(10) closed form on the 1-based global rank: deciles 1..rem hold
    // big = floor(N/10)+1 rows, deciles rem+1..10 hold floor(N/10)
    val qsz = n / 10
    val rem = n % 10
    val big = qsz + 1
    val cut = rem * big // global rank of the last row in the big deciles
    val rn = Window.partitionBy(col("bkt"))
      .orderBy(col("value"), col("event_id"))
    // integer ceil-division via floor((r + b - 1)/b): ranks < 2^53, exact
    val h1 = hb.join(offDf, Seq("bkt"))
      .withColumn("rank", col("off") + row_number().over(rn))
      .withColumn("dec",
        when(col("rank") <= cut, floor((col("rank") + lit(big - 1)) / lit(big)))
          .otherwise(lit(rem) +
            floor((col("rank") - lit(cut) + lit(math.max(qsz, 1L) - 1)) /
              lit(math.max(qsz, 1L))))
          .cast("int"))
    val bounds = h1.groupBy(col("dec")).agg(max(col("value")).as("hi"))
      .orderBy(col("dec")).collect().map(r => (r.getInt(0), r.getDouble(1)))
    val p1 = h1.groupBy(col("dec")).agg(count(lit(1)).as("n1"))
    val decCase = bounds.foldRight(lit(10): Column) { case ((d, hi), acc) =>
      when(col("value") <= hi, d).otherwise(acc)
    }
    // foldRight builds when(<=hi1,1).otherwise(when(<=hi2,2)...(10)) — the
    // arms must test ascending bounds first, which foldRight preserves
    val h2 = ev.filter(col("us") >= mid).withColumn("dec", decCase)
    val p2 = h2.groupBy(col("dec")).agg(count(lit(1)).as("n2"))
    // Smoothing denominators WITHOUT the unpartitioned window the old plan
    // used (it warned single-partition even on this 10-row frame): the
    // post-join totals are exact driver scalars — Σn1 = |h1| = n, and Σn2 =
    // the second-half rows whose decile exists in p1 (all of them when
    // n ≥ 10; the decCase '10' arm is unmatched when h1 spans fewer
    // deciles). Both are integer-valued ≤ 2^53, so lit(total + 5.0) is the
    // IDENTICAL double the oracle's SUM(...) OVER () + 5.0 produces.
    val n2total = h2.filter(col("dec") <= math.min(n, 10L)).count()
    p1.join(p2, Seq("dec"), "left")
      .withColumn("n2", coalesce(col("n2"), lit(0L)))
      .withColumn("p1s", (col("n1").cast("double") + 0.5) /
        lit(n.toDouble + 5.0))
      .withColumn("p2s", (col("n2").cast("double") + 0.5) /
        lit(n2total.toDouble + 5.0))
      .select(col("dec").cast("long").as("dec"), col("n1"), col("n2"),
        round((col("p2s") - col("p1s")) * log(col("p2s") / col("p1s")), 6)
          .as("psi_term"))
      .orderBy(col("dec"))
  }

  /** Q113: join-key skew audit — the diagnostic a pipeline runs over its
    * fact-table join keys BEFORE launching the 100 TB join that one hot key
    * would stall. Emits one row per audited key column: row/key counts, the
    * hottest key's count, skew_ratio (max over mean — 1.0 ⇒ uniform) and
    * the share of rows held by the 10 hottest keys.
    *
    * Scale shape: ONE scan builds all three per-key count tables via
    * GROUPING SETS (Expand ×3 feeding a single map-side-combinable hash
    * aggregate — the shuffle carries |keys| partial counts, never rows).
    * The top-10 cut is the typed TopKAggregator (U6): a bounded 10-element
    * heap per partial, merged k-way — so NO per-column window sorts the
    * whole count table in one task (the row_number shape this replaced
    * pulled every l_orderkey count through a single partition; at 100 TB
    * that column alone is billions of keys). Everything after the Expand
    * is a single partial+final aggregate pair. */
  def qSkewAudit(t: Tables): DataFrame = {
    val keys = Seq("l_partkey", "l_suppkey", "l_orderkey")
    val counts = t.lineitem
      .groupingSets(keys.map(k => Seq(col(k))), keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(
        // lineitem keys are non-null, so the one non-null group column
        // identifies the grouping set (no grouping_id() bit math needed)
        coalesce(keys.map(k => when(col(k).isNotNull, lit(k))): _*)
          .as("key_col"),
        coalesce(keys.map(col): _*).as("k"),
        col("cnt"))
    // counts are exact longs ≪ 2^53, so the Double score is lossless; ties
    // break toward the smaller key id, matching the old (cnt DESC, k) order
    val top10 = udaf(new graft.functions.TopKAggregator(10))
    counts
      .groupBy(col("key_col"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        top10(col("cnt").cast("double"), col("k")).as("top10"))
      .withColumn("top10_rows",
        expr("CAST(aggregate(top10, 0D, (acc, e) -> acc + e._1) AS BIGINT)"))
      .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_cnt"),
        round(col("max_cnt").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double"), 6).as("skew_ratio"),
        round(col("top10_rows").cast("double") / col("n_rows").cast("double"), 6)
          .as("top10_share"))
      .orderBy(col("key_col"))
  }

  /** Oracle replays each column as its own CTE chain (DuckDB re-scans the
    * small parquet; the single-scan GROUPING SETS plan is the Spark side's
    * contract). Float terms are the same (a·b)/c IEEE sequence, round(6). */
  val qSkewAuditSql: String = {
    def one(c: String): String =
      s"""SELECT '$c' AS key_col, n_rows, n_keys, max_cnt,
         |  round(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS skew_ratio,
         |  round(CAST(top10_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS top10_share
         |FROM (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
         |    MAX(cnt) AS max_cnt,
         |    CAST(SUM(CASE WHEN rn <= 10 THEN cnt ELSE 0 END) AS BIGINT) AS top10_rows
         |  FROM (
         |    SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, k) AS rn
         |    FROM (SELECT $c AS k, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY $c)))""".stripMargin
    Seq("l_partkey", "l_suppkey", "l_orderkey").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
  }

  /** Q114: join pre-flight — EXACT join-output cardinality and skew
    * amplification for three candidate joins, computed from per-side
    * key-count tables without running the join. est_rows = Σ cnt_l·cnt_r
    * over matching keys is the true inner-join output size; max_key_rows
    * is the single hottest key's output (what lands in ONE task of a
    * sort-merge join). The strategy column encodes the planning ladder a
    * 100 TB pipeline applies: broadcast when the build side is small,
    * salt when one key dominates the average by 20×, plain shuffle join
    * otherwise (Skew.saltedJoin is the engine's salted implementation).
    *
    * Scale shape: each side contributes one map-side-combinable per-key
    * count aggregate (shuffle O(|keys|)); the count tables then meet in a
    * single full-outer equi-join on the key and ONE aggregate derives all
    * five stats simultaneously (side totals sum the non-null counts,
    * match stats sum/max the null-propagating product) — no 1-row scalar
    * combines, so constant folding can't degrade any join to a nested
    * loop. Integer-only arithmetic — the skew test compares
    * max_key_rows · matching_keys > 20 · est_rows to avoid cross-engine
    * float division. */
  def qJoinPreflight(t: Tables): DataFrame = {
    def keyCounts(df: DataFrame, key: String, as: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as(as))
    def preflight(name: String, left: DataFrame, lKey: String,
        right: DataFrame, rKey: String): DataFrame = {
      val l = keyCounts(left, lKey, "cnt_l")
      val r = keyCounts(right, rKey, "cnt_r")
      l.join(r, Seq("k"), "full_outer")
        .agg(
          sum(col("cnt_l")).as("left_rows"),
          sum(col("cnt_r")).as("right_rows"),
          count(when(col("cnt_l").isNotNull && col("cnt_r").isNotNull, lit(1)))
            .as("matching_keys"),
          sum(col("cnt_l") * col("cnt_r")).as("est_rows"),
          max(col("cnt_l") * col("cnt_r")).as("max_key_rows"))
        .select(lit(name).as("join_name"), col("left_rows"), col("right_rows"),
          col("matching_keys"), col("est_rows"), col("max_key_rows"),
          when(col("right_rows") <= 50000L, "broadcast")
            .when(col("max_key_rows") * col("matching_keys") > col("est_rows") * 20L,
              "salted_shuffle_join")
            .otherwise("shuffle_join").as("strategy"))
    }
    val li = t.lineitem
    preflight("lineitem_orders", li, "l_orderkey", t.orders, "o_orderkey")
      .unionAll(preflight("lineitem_part", li, "l_partkey", t.part, "p_partkey"))
      .unionAll(preflight("lineitem_self_partkey", li, "l_partkey", li, "l_partkey"))
      .orderBy(col("join_name"))
  }

  val qJoinPreflightSql: String = {
    def one(name: String, lTbl: String, lKey: String,
        rTbl: String, rKey: String): String =
      s"""SELECT '$name' AS join_name,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $lTbl) AS left_rows,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $rTbl) AS right_rows,
         |  CAST(COUNT(*) AS BIGINT) AS matching_keys,
         |  CAST(SUM(cnt_l * cnt_r) AS BIGINT) AS est_rows,
         |  CAST(MAX(cnt_l * cnt_r) AS BIGINT) AS max_key_rows,
         |  CASE WHEN (SELECT COUNT(*) FROM $rTbl) <= 50000 THEN 'broadcast'
         |       WHEN MAX(cnt_l * cnt_r) * COUNT(*) > SUM(cnt_l * cnt_r) * 20 THEN 'salted_shuffle_join'
         |       ELSE 'shuffle_join' END AS strategy
         |FROM (SELECT $lKey AS k, CAST(COUNT(*) AS BIGINT) AS cnt_l FROM $lTbl GROUP BY $lKey) l
         |JOIN (SELECT $rKey AS k, CAST(COUNT(*) AS BIGINT) AS cnt_r FROM $rTbl GROUP BY $rKey) r USING (k)""".stripMargin
    Seq(
      one("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      one("lineitem_self_partkey", "lineitem", "l_partkey", "lineitem", "l_partkey"),
    ).mkString("", "\nUNION ALL\n", "\nORDER BY join_name")
  }

  /** Q126: data-quality expectations (the Deequ / Great-Expectations
    * operator class) — the assertion suite a pipeline runs on every new
    * drop BEFORE it joins the lake: uniqueness, completeness, referential
    * integrity, range and accepted-values checks, each emitted as one row
    * of (check, n_rows, violations, pass).
    *
    * Scale shape: every check is ONE aggregate over a single scan
    * (count + conditional count are map-side combinable; the shuffle per
    * check is one partial-state row per partition). Referential integrity
    * rides a left join against the unique parent key — at 100 TB that is
    * the one check with a real shuffle, and it is exactly the join the
    * pipeline is about to run anyway (q114's preflight sizes it). */
  def qExpectations(t: Tables): DataFrame = {
    def shaped(name: String, agg: DataFrame): DataFrame =
      agg.select(lit(name).as("check_name"), col("n_rows"), col("violations"),
        (col("violations") === 0L).as("pass"))
    val uniq = shaped("events.event_id is unique",
      t.events.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("violations")))
    val complete = shaped("orders.o_custkey is complete",
      t.orders.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("o_custkey"))).as("violations")))
    val refInt = shaped("lineitem.l_orderkey references orders",
      t.lineitem.select(col("l_orderkey"))
        .join(t.orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("o_orderkey").isNull, lit(1))).as("violations")))
    val range = shaped("events.value is non-negative",
      t.events.agg(count(lit(1)).as("n_rows"),
        count(when(col("value") < 0d, lit(1))).as("violations")))
    val accepted = shaped("lineitem.l_returnflag in (A,N,R)",
      t.lineitem.agg(count(lit(1)).as("n_rows"),
        count(when(!col("l_returnflag").isin("A", "N", "R"), lit(1)))
          .as("violations")))
    uniq.unionAll(complete).unionAll(refInt).unionAll(range).unionAll(accepted)
      .orderBy(col("check_name"))
  }

  val qExpectationsSql: String =
    """SELECT * FROM (
      |  SELECT 'events.event_id is unique' AS check_name,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS violations,
      |    COUNT(*) - COUNT(DISTINCT event_id) = 0 AS pass
      |  FROM events
      |  UNION ALL
      |  SELECT 'orders.o_custkey is complete',
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
      |    COUNT(*) - COUNT(o_custkey) = 0
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey references orders',
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT),
      |    COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) = 0
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'events.value is non-negative',
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(CASE WHEN value < 0 THEN 1 END) AS BIGINT),
      |    COUNT(CASE WHEN value < 0 THEN 1 END) = 0
      |  FROM events
      |  UNION ALL
      |  SELECT 'lineitem.l_returnflag in (A,N,R)',
      |    CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END) AS BIGINT),
      |    COUNT(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END) = 0
      |  FROM lineitem)
      |ORDER BY check_name""".stripMargin

  val qDriftPsiSql: String =
    """WITH ev AS (
      |  SELECT event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS m FROM ev),
      |h1 AS (SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS dec
      |       FROM ev, mid WHERE us < m),
      |bounds AS (SELECT dec, MAX(value) AS hi FROM h1 GROUP BY dec),
      |p1 AS (SELECT dec, COUNT(*)::BIGINT AS n1 FROM h1 GROUP BY dec),
      |h2 AS (SELECT COALESCE((SELECT MIN(b.dec) FROM bounds b WHERE ev.value <= b.hi), 10) AS dec
      |       FROM ev, mid WHERE us >= m),
      |p2 AS (SELECT dec, COUNT(*)::BIGINT AS n2 FROM h2 GROUP BY dec),
      |j AS (SELECT p1.dec, p1.n1, COALESCE(p2.n2, 0) AS n2
      |      FROM p1 LEFT JOIN p2 ON p1.dec = p2.dec)
      |SELECT dec, n1, n2,
      |  round(((CAST(n2 AS DOUBLE) + 0.5) / (SUM(CAST(n2 AS DOUBLE)) OVER () + 5.0)
      |         - (CAST(n1 AS DOUBLE) + 0.5) / (SUM(CAST(n1 AS DOUBLE)) OVER () + 5.0))
      |        * ln(((CAST(n2 AS DOUBLE) + 0.5) / (SUM(CAST(n2 AS DOUBLE)) OVER () + 5.0))
      |             / ((CAST(n1 AS DOUBLE) + 0.5) / (SUM(CAST(n1 AS DOUBLE)) OVER () + 5.0))), 6) AS psi_term
      |FROM j ORDER BY dec""".stripMargin

  /** Q173: chi-square test of independence on the (source, lang)
    * contingency table — the categorical-association audit a corpus
    * monitor runs ("did the crawler's language mix shift per source?"),
    * the categorical sibling of q108's numeric PSI. Observed counts are
    * exact BIGINTs; expected = row_total·col_total/N and each cell's
    * (o−e)²/e are the IDENTICAL IEEE tree in both engines; the statistic
    * is the round(6)+DECIMAL sum of cell terms (cross-partition
    * aggregation order — the established discipline), dof exact.
    *
    * Scale shape: one (source, lang) count aggregate; marginals via two
    * windows over the |sources|·|langs| cell table — nothing driver-side,
    * no scalar joins. */
  def q173ChiSquare(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val cells = t.documents.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("o"))
    val bySrc = Window.partitionBy(col("source"))
    val byLang = Window.partitionBy(col("lang"))
    val all = Window.partitionBy()
    cells
      .withColumn("rt", sum(col("o")).over(bySrc))
      .withColumn("ct", sum(col("o")).over(byLang))
      .withColumn("n", sum(col("o")).over(all))
      .withColumn("e", (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
      .withColumn("term", round(
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e"), 6))
      .agg(
        sum(col("term").cast(DecimalType(28, 6))).cast("double").as("chi2"),
        ((countDistinct(col("source")) - 1) * (countDistinct(col("lang")) - 1))
          .as("dof"),
        max(col("n")).as("n"))
      .select(col("chi2"), col("dof"), col("n"))
  }

  val q173Sql: String =
    """WITH cells AS (
      |  SELECT source, lang, COUNT(*)::BIGINT AS o
      |  FROM documents GROUP BY 1, 2),
      |m AS (
      |  SELECT *,
      |    SUM(o) OVER (PARTITION BY source) AS rt,
      |    SUM(o) OVER (PARTITION BY lang) AS ct,
      |    SUM(o) OVER () AS n
      |  FROM cells),
      |terms AS (
      |  SELECT *,
      |    round((CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
      |          * (CAST(o AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
      |          / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS term
      |  FROM m)
      |SELECT CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE) AS chi2,
      |  CAST((COUNT(DISTINCT source) - 1) * (COUNT(DISTINCT lang) - 1) AS BIGINT)
      |    AS dof,
      |  CAST(MAX(n) AS BIGINT) AS n
      |FROM terms""".stripMargin

  /** Q174: Benford first-digit audit on order totals — the forensic
    * data-quality screen (synthetic or fabricated numeric columns
    * diverge from Benford's log distribution; a generator that samples
    * uniformly FAILS it, which is itself a useful fact about test data).
    * The first digit comes from the BIGINT cents value's STRING form —
    * integer-to-string is identical cross-engine, unlike double
    * formatting; expected Benford mass ln(1+1/d)/ln(10) and the
    * per-digit deviation are identical IEEE trees over exact counts.
    *
    * Scale shape: one map-side digit extraction + 9-row aggregate. */
  def q174Benford(t: Tables): DataFrame = {
    val digits = t.orders
      .select(expr("cast(substring(cast(cast(round(o_totalprice * 100) as bigint) as string), 1, 1) as bigint)")
        .as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    digits
      .withColumn("total", sum(col("n")).over(all))
      .withColumn("observed", col("n").cast("double") / col("total").cast("double"))
      .withColumn("expected",
        log(lit(1.0) + lit(1.0) / col("d").cast("double")) / log(lit(10.0)))
      .withColumn("abs_dev", abs(col("observed") - col("expected")))
      .select(col("d"), col("n"), col("observed"), col("expected"), col("abs_dev"))
      .orderBy(col("d"))
  }

  val q174Sql: String =
    """WITH digits AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS BIGINT) AS d,
      |    COUNT(*)::BIGINT AS n
      |  FROM orders GROUP BY 1)
      |SELECT d, n,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS observed,
      |  ln(1.0 + 1.0 / CAST(d AS DOUBLE)) / ln(10.0) AS expected,
      |  abs(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
      |      - ln(1.0 + 1.0 / CAST(d AS DOUBLE)) / ln(10.0)) AS abs_dev
      |FROM digits ORDER BY d""".stripMargin

  /** Q171: referential-integrity graph audit — orphan analysis over the
    * schema's full FK graph (lineitem→orders, lineitem→part,
    * lineitem→supplier, orders→customer, customer→nation,
    * supplier→nation, nation→region): one row per edge with child
    * cardinality, orphan count (children whose parent key is missing)
    * and unreferenced-parent count (parents no child points at). The
    * catalog-wide extension of q126's single-pair check — what a
    * lakehouse runs before declaring constraints the optimizer can use
    * (join elimination needs PROVEN referential integrity).
    *
    * Scale shape: each edge is one left-anti-style aggregate pair — a
    * co-partitioned join on the key with the parent side distinct
    * (broadcastable for dims); edges union at O(1) rows each. */
  def q171FkAudit(t: Tables): DataFrame = {
    // fully in-plan: per edge, child keys pre-aggregated to (k, cnt),
    // full-outer joined with the distinct parent side, ONE aggregate —
    // no driver-side counts (a 21-action version of this measured 5.3 s
    // at sf0.1; the 7 unioned branches run as a single job)
    def edge(child: DataFrame, childTable: String, fk: String,
        parent: DataFrame, parentTable: String, pk: String): DataFrame = {
      val c = child.groupBy(col(fk).as("ck")).agg(count(lit(1)).as("cnt"))
      val p = parent.select(col(pk).as("pk")).distinct()
      c.join(p, col("ck") === col("pk"), "full_outer")
        .agg(
          coalesce(sum(col("cnt")), lit(0L)).as("n_children"),
          coalesce(sum(when(col("pk").isNull, col("cnt"))), lit(0L))
            .as("n_orphans"),
          count(when(col("ck").isNull, lit(1))).as("n_unreferenced_parents"))
        .select(lit(s"$childTable.$fk").as("fk_edge"),
          lit(s"$parentTable.$pk").as("pk_side"),
          col("n_children"), col("n_orphans"), col("n_unreferenced_parents"),
          (col("n_orphans") === 0L).as("integrity_ok"))
    }
    edge(t.lineitem, "lineitem", "l_orderkey", t.orders, "orders", "o_orderkey")
      .unionAll(edge(t.lineitem, "lineitem", "l_partkey", t.part, "part", "p_partkey"))
      .unionAll(edge(t.lineitem, "lineitem", "l_suppkey", t.supplier, "supplier", "s_suppkey"))
      .unionAll(edge(t.orders, "orders", "o_custkey", t.customer, "customer", "c_custkey"))
      .unionAll(edge(t.customer, "customer", "c_nationkey", t.nation, "nation", "n_nationkey"))
      .unionAll(edge(t.supplier, "supplier", "s_nationkey", t.nation, "nation", "n_nationkey"))
      .unionAll(edge(t.nation, "nation", "n_regionkey", t.region, "region", "r_regionkey"))
      .orderBy(col("fk_edge"))
  }

  val q171Sql: String = {
    def edge(ct: String, fk: String, pt: String, pk: String): String =
      s"""SELECT '$ct.$fk' AS fk_edge, '$pt.$pk' AS pk_side,
         |  (SELECT COUNT(*) FROM $ct)::BIGINT AS n_children,
         |  (SELECT COUNT(*) FROM $ct
         |   WHERE $fk NOT IN (SELECT $pk FROM $pt))::BIGINT AS n_orphans,
         |  (SELECT COUNT(*) FROM (SELECT DISTINCT $pk FROM $pt)
         |   WHERE $pk NOT IN (SELECT $fk FROM $ct))::BIGINT
         |    AS n_unreferenced_parents,
         |  (SELECT COUNT(*) FROM $ct
         |   WHERE $fk NOT IN (SELECT $pk FROM $pt)) = 0 AS integrity_ok""".stripMargin
    Seq(edge("lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders", "o_custkey", "customer", "c_custkey"),
      edge("customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
  }

  /** Q162: functional-dependency discovery — the schema-inference pass of
    * a data profiler (Deequ/Metanome class): a candidate A → B holds iff
    * |distinct(A)| = |distinct(A,B)|; the gap counts determinant values
    * with >1 dependent (the violation witness). Candidates span true key
    * FDs (nationkey → regionkey, orderkey → custkey) and attribute pairs
    * that genuinely fail in the data — a useful profiler must report
    * both. Each check is one exact two-countDistinct aggregate (bounded
    * ×2 distinct-rewrite expand — the q143 note; never a sketch mix);
    * checks on different tables union at O(1) rows each.
    *
    * At 100 TB this is how a lakehouse catalog discovers undeclared
    * keys/hierarchies for optimizer constraints (join elimination,
    * grouping pushdown). */
  def q162FdDiscovery(t: Tables): DataFrame = {
    def check(df: DataFrame, table: String, det: String, dep: String): DataFrame =
      df.agg(countDistinct(col(det)).as("nd_det"),
        countDistinct(col(det), col(dep)).as("nd_pair"))
        .select(lit(table).as("table_name"), lit(det).as("determinant"),
          lit(dep).as("dependent"), col("nd_det"), col("nd_pair"),
          (col("nd_det") === col("nd_pair")).as("is_fd"),
          (col("nd_pair") - col("nd_det")).as("violations"))
    check(t.nation, "nation", "n_nationkey", "n_regionkey")
      .unionAll(check(t.orders, "orders", "o_orderkey", "o_custkey"))
      .unionAll(check(t.customer, "customer", "c_nationkey", "c_mktsegment"))
      .unionAll(check(t.part, "part", "p_brand", "p_type"))
      .unionAll(check(t.lineitem, "lineitem", "l_orderkey", "l_returnflag"))
      .orderBy(col("table_name"), col("determinant"))
  }

  val q162Sql: String = {
    def check(table: String, det: String, dep: String): String =
      s"""SELECT '$table' AS table_name, '$det' AS determinant,
         |  '$dep' AS dependent,
         |  COUNT(DISTINCT $det)::BIGINT AS nd_det,
         |  COUNT(DISTINCT ($det, $dep))::BIGINT AS nd_pair,
         |  COUNT(DISTINCT $det) = COUNT(DISTINCT ($det, $dep)) AS is_fd,
         |  COUNT(DISTINCT ($det, $dep))::BIGINT
         |    - COUNT(DISTINCT $det)::BIGINT AS violations
         |FROM $table""".stripMargin
    Seq(check("nation", "n_nationkey", "n_regionkey"),
      check("orders", "o_orderkey", "o_custkey"),
      check("customer", "c_nationkey", "c_mktsegment"),
      check("part", "p_brand", "p_type"),
      check("lineitem", "l_orderkey", "l_returnflag"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, determinant")
  }

  /** Q199: deletion-cascade impact plan — the right-to-be-forgotten /
    * retention-enforcement dry run: given a seed deletion predicate
    * (customers with negative balances), compute exactly what a cascading
    * FK delete would remove per table BEFORE running it — rows to delete,
    * table totals, and the fraction — across customer → orders →
    * lineitem. The operational sibling of q171's integrity audit (which
    * proves the FKs hold) and q167's TTL planner (which scopes deletion
    * by age instead of by key).
    *
    * Scale shape: one plan, one job (the q171 discipline): each table
    * contributes one LEFT-JOIN-flag + aggregate branch, the three 1-row
    * branches union. The seed and the deleted-order key set ride
    * broadcast joins here (bounded dimension-sized key sets); at 100 TB
    * the same plan runs them as shuffle equi-joins — the branch shape is
    * unchanged. All counts integer; fractions are single divisions. */
  def q199DeletionCascade(t: Tables): DataFrame = {
    val seed = t.customer.filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("del_cust"))
    val custBranch = t.customer
      .agg(sum(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("n_delete"),
        count(lit(1)).as("n_total"))
      .select(lit("customer").as("table_name"), col("n_delete"), col("n_total"))
    val flaggedOrders = t.orders
      .join(broadcast(seed), col("o_custkey") === col("del_cust"), "left")
      .select(col("o_orderkey"),
        when(col("del_cust").isNotNull, 1L).otherwise(0L).as("del"))
    val orderBranch = flaggedOrders
      .agg(sum(col("del")).as("n_delete"), count(lit(1)).as("n_total"))
      .select(lit("orders").as("table_name"), col("n_delete"), col("n_total"))
    val delOrders = flaggedOrders.filter(col("del") === 1L)
      .select(col("o_orderkey").as("del_order"))
    val lineBranch = t.lineitem
      .join(broadcast(delOrders), col("l_orderkey") === col("del_order"), "left")
      .agg(sum(when(col("del_order").isNotNull, 1L).otherwise(0L)).as("n_delete"),
        count(lit(1)).as("n_total"))
      .select(lit("lineitem").as("table_name"), col("n_delete"), col("n_total"))
    custBranch.unionByName(orderBranch).unionByName(lineBranch)
      .withColumn("frac_deleted",
        col("n_delete").cast("double") / col("n_total").cast("double"))
      .orderBy(col("table_name"))
  }

  /** q199 oracle: the same three flag-join branches unioned. */
  val q199DeletionCascadeSql: String =
    """WITH seed AS (SELECT c_custkey AS del_cust FROM customer WHERE c_acctbal < 0),
      |del_orders AS (
      |  SELECT o_orderkey FROM orders JOIN seed ON o_custkey = del_cust),
      |rows_ AS (
      |  SELECT 'customer' AS table_name,
      |    CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
      |    COUNT(*)::BIGINT AS n_total
      |  FROM customer
      |  UNION ALL
      |  SELECT 'orders',
      |    CAST(SUM(CASE WHEN s.del_cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(*)::BIGINT
      |  FROM orders LEFT JOIN seed s ON o_custkey = s.del_cust
      |  UNION ALL
      |  SELECT 'lineitem',
      |    CAST(SUM(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(*)::BIGINT
      |  FROM lineitem LEFT JOIN del_orders d ON l_orderkey = d.o_orderkey)
      |SELECT table_name, n_delete, n_total,
      |  CAST(n_delete AS DOUBLE) / CAST(n_total AS DOUBLE) AS frac_deleted
      |FROM rows_ ORDER BY table_name""".stripMargin
}
