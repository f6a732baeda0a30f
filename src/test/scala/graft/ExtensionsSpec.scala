package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the native expressions as SQL functions —
  * needs its own session (extensions bind at session build). */
class ExtensionsSpec extends AnyFunSuite {

  test("fuzz_ratio and cosine_sim are callable from spark.sql") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT fuzz_ratio('abcdefghij', 'abcdefghiX') AS fr, " +
          "cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs")
        .head()
      assert(r.getInt(0) == 90)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    } finally spark.stop()
  }
}
