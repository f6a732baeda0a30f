package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wikipedia API response shapes (SURVEY.md §2.1 S4; reference
  * wikipedia.py:10-42, /wikipedia endpoint realtimeapi.py:172-197 /
  * reddit_api.py:156-194).
  *
  * The HTTP fetch is driver-side in the reference and out of scope in a
  * zero-egress sandbox; these operators take the API's JSON (as a string /
  * file) and do the engine-side work: schema projection and the
  * original→thumbnail→null image fallback chain.
  */
object Wikipedia {

  /** Parse a `query.pages` API response (JSON string column) into rows of
    * (pageid, title, extract, image) with the reference's image fallback:
    * original.source, else thumbnail.source, else null
    * (realtimeapi.py:185-191). */
  def pages(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("multiLine", true).json(Seq(json).toDS)
    raw.select(explode(col("query.pages")).as("p"))
      .select(
        col("p.pageid").cast("long").as("pageid"),
        col("p.title").as("title"),
        col("p.extract").as("extract"),
        coalesce(col("p.original.source"), col("p.thumbnail.source"))
          .as("image"))
  }

  /** Parse a `parse.sections` response into (line, toclevel, pos) — the
    * input shape for ServerFlow.sectionsToQueries (realtimeapi.py:119-130). */
  def sections(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("multiLine", true).json(Seq(json).toDS)
    raw.select(posexplode(col("parse.sections")).as(Seq("pos", "s")))
      .select(col("s.line").as("line"),
        col("s.toclevel").cast("int").as("toclevel"),
        (col("pos") + 1).cast("int").as("pos"))
  }
}
