package graft.ops

import graft.functions.html
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The servers' dataflow, relationalized (SURVEY.md §3.2/§3.3): section
  * scoring and pruning (P7/W3), query construction (F8), source-domain
  * derivation (P3), parser-registry membership (P9), executor-side content
  * fetch with error-null semantics (S5/T1/P11), and CSS text extraction
  * (S6/S7).
  *
  * The HTTP sources themselves are out of scope in a zero-egress sandbox
  * (SURVEY §7.6): operators take the fetched payloads as DataFrames behind
  * the same interface, and the fetch stage accepts a pluggable fetcher
  * function executed inside mapPartitions — executor-side, partition-batched,
  * exactly where an HTTP client pool would live (T1: completion order
  * nondeterminism is replaced by deterministic ids, SURVEY's documented
  * semantic deviation).
  */
object ServerFlow {

  val ReservedSections: Seq[String] =
    Seq("External links", "References", "Bibliography", "Notes", "See also")

  /** P7: the reference's query_heuristic (reddit_api.py:55-66) — 0 for
    * reserved section names, 1 otherwise. */
  def sectionScore(line: Column): Column =
    when(line.isin(ReservedSections: _*), 0).otherwise(1)

  /** W3 + F8, reddit_api flavor (reddit_api.py:94-103): stable-sort
    * sections by score desc (original order preserved within ties — Python
    * sorted is stable), take 10, prepend the synthetic Uncategorized
    * section; F8 query string `"title" +"section"` from realtimeapi.py's
    * construct_query (realtimeapi.py:98-101). */
  def sectionsToQueries(sections: DataFrame, pageTitle: String,
      numQueries: Int = 10, sortByTocLevel: Boolean = false): DataFrame = {
    val pre = if (sortByTocLevel) // realtimeapi.py:121-123 pre-sort
      Window.orderBy(col("toclevel").desc, col("pos"))
    else Window.orderBy(col("pos"))
    val preRanked = sections
      .withColumn("pre_rank", row_number().over(pre))
    val w = Window.orderBy(col("score").desc, col("pre_rank"))
    val top = preRanked
      .withColumn("score", sectionScore(col("line")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= numQueries)
      .select(col("rank").cast("int").as("section_id"), col("line"))
    val uncategorized = sections.sparkSession.range(1)
      .select(lit(0).as("section_id"), lit("Uncategorized").as("line"))
    uncategorized.unionByName(top)
      .withColumn("query",
        concat(lit("\"" + pageTitle + "\" +\""), col("line"), lit("\"")))
      .orderBy(col("section_id"))
  }

  /** P3: source domain derivation (reddit.py:50-53) — drop the TLD, take
    * the last remaining label: mobile.nytimes.com → nytimes. */
  def sourceFromDomain(domain: Column): Column = {
    val parts = split(domain, "\\.")
    element_at(slice(parts, lit(1), size(parts) - 1), -1)
  }

  /** P9: parser-availability filter (reddit_api.py:43-44) — keep only
    * articles whose source has a registered parser. */
  def withRegisteredParser(articles: DataFrame, registry: Map[String, String]): DataFrame =
    articles.filter(col("source").isInCollection(registry.keys.toSeq))

  /** S7: CSS text extraction over (html, source) with the registry
    * broadcast in the UDF closure; exactly-one-match-or-null contract. */
  def extractBody(registry: Map[String, String]) =
    udf((doc: String, source: String) =>
      registry.get(source).flatMap(sel => html.extractText(doc, sel)).orNull)

  /** S5 + P11: content fetch via a pluggable fetcher inside mapPartitions
    * (executor-side I/O stage), then error-row filtering. The fetcher maps
    * a URL to Some(body) or None (4xx/parse failure — reddit_api.py:39-40).
    */
  def fetchContent(articles: DataFrame, fetcher: String => Option[String]): DataFrame = {
    val spark = articles.sparkSession
    import spark.implicits._
    val fetched = articles
      .select(col("id").cast("long"), col("url").cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // one fetcher per partition = one http client per task in a real
        // deployment; errors become nulls, filtered below (P11)
        rows.map { case (id, url) => (id, fetcher(url).orNull) }
      }
      .toDF("id", "body")
    articles.join(fetched, "id")
      .filter(col("body").isNotNull)
  }

  /** The whole `GET /search` dataflow (reddit_api.py:68-153, SURVEY §3.2),
    * composed: score+prune sections (P7/W3) → articles for those sections
    * (any source incl. the DSv2 feed) → greedy fuzzy title dedup (J2) →
    * fetch (S5) → registry filter + CSS extraction (P9/S7) → section
    * clusters (J1/P8) → LexRank top-3 joined summaries (M6/W2).
    *
    * @param articles (id, title, url, source, section_id)
    * @param fetcher  url → Some(html) | None (the HTTP stage)
    * @return (section_id, line, n_articles, summary) */
  def searchPipeline(sections: DataFrame, articles: DataFrame, pageTitle: String,
      registry: Map[String, String], fetcher: String => Option[String]): DataFrame = {
    val spark = articles.sparkSession
    import spark.implicits._
    val queries = sectionsToQueries(sections, pageTitle)
    val inScope = articles.join(
      queries.select(col("section_id"), col("line")), Seq("section_id"), "left_semi")
    // greedy keep-first dedup on titles, arrival order = id order
    val rows = inScope.select(col("id"), col("title")).as[(Long, String)].collect().toSeq
    val keptIds = Dedup.greedyFuzzyKeepIds(rows)
    val kept = inScope.filter(col("id").isInCollection(keptIds))
    val fetched = fetchContent(kept, fetcher).withColumnRenamed("body", "html")
    val clusters = articlesToClusters(fetched, registry)
    val members = clusters.select(col("section_id"),
        explode(col("articles")).as("a"))
      .select(col("section_id"), col("a.id"), col("a.text"))
    val summaries = Summarize.joinedSummaries(members, "section_id", "id", "text")
    clusters.select(col("section_id"), size(col("articles")).as("n_articles"))
      .join(queries.select(col("section_id"), col("line")), Seq("section_id"))
      .join(summaries, Seq("section_id"), "left")
      .orderBy(col("section_id"))
  }

  /** The full §3.2 tail over fixture data: dedup surviving articles →
    * extract body text per source → group into section clusters (J1) →
    * summarize (the LexRank stage is ops.Summarize — composed in
    * ServerFlowSpec). */
  def articlesToClusters(articles: DataFrame, registry: Map[String, String]): DataFrame = {
    val extract = extractBody(registry)
    val withBody = withRegisteredParser(articles, registry)
      .withColumn("text", extract(col("html"), col("source")))
      .filter(col("text").isNotNull)
    withBody
      .groupBy(col("section_id"))
      .agg(collect_list(struct(col("id"), col("title"), col("text"))).as("articles"))
      .filter(size(col("articles")) > 0) // P8
  }
}
