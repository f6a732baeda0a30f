package graft

import graft.functions.text
import graft.sources.Wikipedia

class WikipediaSpec extends SparkSpec {

  test("pages projection applies the original→thumbnail→null image fallback") {
    val json =
      """{"query": {"pages": [
        |  {"pageid": 1, "title": "Alpha", "extract": "About alpha.",
        |   "original": {"source": "http://img/orig1.jpg"},
        |   "thumbnail": {"source": "http://img/thumb1.jpg"}},
        |  {"pageid": 2, "title": "Beta", "extract": "About beta.",
        |   "thumbnail": {"source": "http://img/thumb2.jpg"}},
        |  {"pageid": 3, "title": "Gamma", "extract": "About gamma."}
        |]}}""".stripMargin
    val rows = Wikipedia.pages(spark, json).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getString(1)).toSeq == Seq("Alpha", "Beta", "Gamma"))
    assert(rows(0).getString(3) == "http://img/orig1.jpg")
    assert(rows(1).getString(3) == "http://img/thumb2.jpg")
    assert(rows(2).isNullAt(3))
  }

  test("q133 fallback ladder: all four availability states behave like pages()") {
    val rows = Wikipedia.qImageFallback(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val img = Option(r.getString(2))
      if (id % 4 == 0) assert(img.exists(_.contains("/orig/")), s"pageid $id: $img")
      else if (id % 2 == 0) assert(img.exists(_.contains("/thumb/")), s"pageid $id: $img")
      else assert(img.isEmpty, s"pageid $id should have no image, got $img")
    }
  }

  test("sections projection keeps document order positions") {
    val json =
      """{"parse": {"title": "Topic", "sections": [
        |  {"line": "History", "toclevel": 1},
        |  {"line": "Design", "toclevel": 2},
        |  {"line": "References", "toclevel": 1}
        |]}}""".stripMargin
    val rows = Wikipedia.sections(spark, json).collect().sortBy(_.getInt(2))
    assert(rows.map(_.getString(0)).toSeq == Seq("History", "Design", "References"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 1))
  }

  test("POS-filter tokens: NNP/NNS heuristic, len>2, query excluded, stemmed") {
    val toks = text.posFilterTokens(
      "The Senators debated new Policies on taxes in Washington",
      Set("washington"))
    // Senators (NNP) → senat, Policies (NNP) → polici/polic, taxes (NNS) → tax
    assert(toks.contains("tax"))
    assert(toks.exists(_.startsWith("senat")))
    assert(!toks.contains("washington"))  // query token excluded
    assert(!toks.contains("the"))         // len/case filtered
    assert(!toks.contains("debated"))     // verb-ish: not NNP/NNS
  }
}
