package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** S9/S10 (SURVEY §2.1): JSON sinks — the servers' web.json_response array
  * and the CLI's stdout JSON dump, as to_json/toJSON/write.json. */
class JsonSinkSpec extends SparkSpec {

  test("write.json round-trips a query result (S10)") {
    val dir = java.nio.file.Files.createTempDirectory("json-sink").toString
    val out = Relational.q01PricingSummary(sf0001)
    out.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == out.count())
    assert(back.columns.sorted.sameElements(out.columns.sorted))
  }

  test("toJSON produces the servers' array-of-objects shape (S9)") {
    val rows = Relational.q13GlobalTopK(sf0001).toJSON.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.startsWith("{") && r.contains("\"o_orderkey\""))
    }
  }

  test("to_json/from_json invert on a struct column (F14)") {
    import spark.implicits._
    val df = Seq((1L, "click", 2.5)).toDF("id", "kind", "v")
      .select(to_json(struct(col("id"), col("kind"), col("v"))).as("j"))
    val j = df.head().getString(0)
    assert(j == """{"id":1,"kind":"click","v":2.5}""")
    val back = df.select(from_json(col("j"),
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, kind STRING, v DOUBLE")).as("s"))
      .select("s.id", "s.kind", "s.v").head()
    assert(back.getLong(0) == 1L && back.getString(1) == "click" && back.getDouble(2) == 2.5)
  }
}
