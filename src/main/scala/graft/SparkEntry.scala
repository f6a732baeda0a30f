package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a scale-factor directory; `oracleSql` carries the DuckDB
  * equivalent for hash-compared correctness. Non-SQL-expressible operators
  * (ML, LSH, sketches) appear in `queries` only and are oracled by specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03StarJoinRevenue(Tables(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    def t(fn: Tables => DataFrame): (SparkSession, String) => DataFrame =
      (s, dir) => fn(Tables(s, dir))
    Map(
      "q01_pricing_summary"  -> t(Relational.q01PricingSummary),
      "q02_filter_pushdown"  -> t(Relational.q02FilterPushdown),
      "q03_star_join"        -> t(Relational.q03StarJoinRevenue),
      "q04_broadcast_join"   -> t(Relational.q04BroadcastJoin),
      "q05_semi_join"        -> t(Relational.q05SemiJoin),
      "q06_anti_join"        -> t(Relational.q06AntiJoin),
      "q07_left_join_agg"    -> t(Relational.q07LeftJoinAgg),
      "q08_rollup"           -> t(Relational.q08Rollup),
      "q09_cube"             -> t(Relational.q09Cube),
      "q10_window_rank"      -> t(Relational.q10WindowRank),
      "q11_window_running"   -> t(Relational.q11WindowRunning),
      "q12_window_lag_lead"  -> t(Relational.q12WindowLagLead),
      "q13_global_topk"      -> t(Relational.q13GlobalTopK),
      "q14_distinct_agg"     -> t(Relational.q14DistinctAgg),
      "q15_union"            -> t(Relational.q15Union),
      "q16_set_ops"          -> t(Relational.q16SetOps),
      "q17_json_extract"     -> t(Relational.q17JsonExtract),
      "q18_date_trunc"       -> t(Relational.q18DateTrunc),
      "q19_case_when"        -> t(Relational.q19CaseWhen),
      "q20_string_funcs"     -> t(Relational.q20StringFuncs),
      "q21_having"           -> t(Relational.q21Having),
      "q22_above_cust_avg"   -> t(Relational.q22AboveCustomerAvg),
      "q23_approx_distinct"  -> t(Relational.qApproxDistinct),
    )
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"  -> Relational.q01Sql,
    "q02_filter_pushdown"  -> Relational.q02Sql,
    "q03_star_join"        -> Relational.q03Sql,
    "q04_broadcast_join"   -> Relational.q04Sql,
    "q05_semi_join"        -> Relational.q05Sql,
    "q06_anti_join"        -> Relational.q06Sql,
    "q07_left_join_agg"    -> Relational.q07Sql,
    "q08_rollup"           -> Relational.q08Sql,
    "q09_cube"             -> Relational.q09Sql,
    "q10_window_rank"      -> Relational.q10Sql,
    "q11_window_running"   -> Relational.q11Sql,
    "q12_window_lag_lead"  -> Relational.q12Sql,
    "q13_global_topk"      -> Relational.q13Sql,
    "q14_distinct_agg"     -> Relational.q14Sql,
    "q15_union"            -> Relational.q15Sql,
    "q16_set_ops"          -> Relational.q16Sql,
    "q17_json_extract"     -> Relational.q17Sql,
    "q18_date_trunc"       -> Relational.q18Sql,
    "q19_case_when"        -> Relational.q19Sql,
    "q20_string_funcs"     -> Relational.q20Sql,
    "q21_having"           -> Relational.q21Sql,
    "q22_above_cust_avg"   -> Relational.q22Sql,
  )
}
