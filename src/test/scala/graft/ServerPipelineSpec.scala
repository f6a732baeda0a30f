package graft

import graft.functions.html
import graft.ops.ServerFlow
import graft.sources.FeedSource
import graft.sources.FeedSource.FeedRow

/** End-to-end §3.2 trace: Wikipedia sections → scored queries → DSv2 feed
  * source (pushdown) → greedy dedup → fetch → CSS extraction → section
  * clusters → LexRank top-3 summaries. Every stage is the real operator. */
class ServerPipelineSpec extends SparkSpec {

  test("full server search pipeline over the feed source") {
    import spark.implicits._

    val sections = Seq(
      ("History", 1, 1), ("Design", 2, 2), ("Reception", 1, 3),
      ("References", 1, 4), ("External links", 1, 5))
      .toDF("line", "toclevel", "pos")

    // one feed with 3 sections' worth of articles; one near-dup title pair;
    // one unknown source; one url that will fail to fetch
    FeedSource.feeds("search") = Seq(
      FeedRow(1, "City approves new transit plan for the north side", "u1", "bbc", 1),
      FeedRow(2, "City approves new transit plan for the north side!", "u2", "cnbc", 1), // dup → dropped
      FeedRow(3, "Completely different story about a museum opening", "u3", "cnbc", 1),
      FeedRow(4, "Design awards announced for the riverfront bridge", "u4", "bbc", 2),
      FeedRow(5, "Unknown-source article about anything at all", "u5", "nosuchsource", 2), // no parser
      FeedRow(6, "Critics praise the new concert hall acoustics", "u6", "bbc", 3),
      FeedRow(7, "Fetch will fail for this one unfortunately today", "u7", "bbc", 3)) // fetcher None

    val pages = Map(
      "u1" -> """<div class="story-body__inner">The council approved the transit plan. Work begins in spring. Commuters cheered the decision.</div>""",
      "u3" -> """<div id="article_body">The museum opened its doors. Visitors praised the new wing. Tickets sold out fast.</div>""",
      "u4" -> """<div class="story-body__inner">The bridge won a design award. Judges cited its elegant span. The city celebrated.</div>""",
      "u6" -> """<div class="story-body__inner">The concert hall opened. Critics praised the acoustics. The orchestra played to a full house.</div>""")

    val articles = spark.read.format("graft.sources.FeedSource")
      .option("feed", "search").load()
      .withColumnRenamed("section_id", "section_id")

    val out = ServerFlow.searchPipeline(sections, articles, "Test Topic",
      html.redditSelectors, pages.get).collect()

    // sections 1..3 got articles; reserved sections never queried
    val bySection = out.map(r => r.getInt(0) -> r).toMap
    assert(bySection.keySet.subsetOf(Set(1, 2, 3)))
    // section 1: dup dropped (id 2), id 1 + 3 survive fetch+parse
    assert(bySection(1).getInt(1) == 2, s"section 1: ${bySection(1)}")
    // section 2: unknown source dropped → only id 4
    assert(bySection(2).getInt(1) == 1)
    // section 3: failed fetch dropped → only id 6
    assert(bySection(3).getInt(1) == 1)
    // summaries are non-empty extracted text
    out.foreach { r =>
      val summary = r.getString(3)
      assert(summary != null && summary.nonEmpty)
    }
    assert(bySection(1).getString(3).contains("transit") ||
      bySection(1).getString(3).contains("museum"))
  }
}
