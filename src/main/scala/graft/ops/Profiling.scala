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
}
