package graft

/** GraftExtensions registers the native expressions as SQL functions.
  * Uses the shared suite session via registerInto — spark.sql.extensions
  * only binds at session creation, and the suites share one JVM session
  * (the config-wiring path is plain Spark; the builders are ours). */
class ExtensionsSpec extends SparkSpec {

  test("fuzz_ratio and cosine_sim are callable from spark.sql") {
    graft.plans.GraftExtensions.registerInto(spark)
    val r = spark.sql(
      "SELECT fuzz_ratio('abcdefghij', 'abcdefghiX') AS fr, " +
        "cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs")
      .head()
    assert(r.getInt(0) == 90)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}
