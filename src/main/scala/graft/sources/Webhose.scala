package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Webhose-dump source (SURVEY.md §2.1 S1, reference pipeline.py:17-26):
  * a JSON document with root field `posts`, each post carrying
  * `thread.title_full` and `text`.
  *
  * Spark-first shape: multiLine JSON read (schema inferred), explode the
  * posts array, project P1 (pipeline.py:24-42) — title from the nested
  * thread struct, trimmed text, dense integer ids in post order (the
  * reference's running counter; row_number over the array position keeps
  * it deterministic, SURVEY T1 note).
  */
object Webhose {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    raw.select(posexplode(col("posts")).as(Seq("pos", "post")))
      .select(
        row_number().over(Window.orderBy(col("pos"))).cast("long").as("id"),
        col("post.thread.title_full").as("title"),
        trim(col("post.text")).as("text"))
  }
}
