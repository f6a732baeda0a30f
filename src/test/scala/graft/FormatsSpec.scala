package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet (SURVEY S11 note): csv, json
  * and orc round-trips preserve the relational surface. */
class FormatsSpec extends SparkSpec {

  private lazy val nations = sf0001.nation

  private def roundTrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"fmt-$fmt").toString
    nations.write.mode("overwrite").format(fmt)
      .option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    assert(back.count() == nations.count())
    val a = back.select(col("n_nationkey").cast("int"), col("n_name"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    val b = nations.select(col("n_nationkey"), col("n_name"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(a == b, s"$fmt round-trip mismatch")
  }

  test("csv round-trip")  { roundTrip("csv") }
  test("json round-trip") { roundTrip("json") }
  test("orc round-trip")  { roundTrip("orc") }
}
