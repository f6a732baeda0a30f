package graft

import graft.sources.FeedSource
import graft.sources.FeedSource.FeedRow
import org.apache.spark.sql.functions._

class FeedSourceSpec extends SparkSpec {

  private def register(name: String): Unit =
    FeedSource.feeds(name) = (1L to 100L).map(i =>
      FeedRow(i, s"Title $i", s"http://u/$i",
        if (i % 3 == 0) "bbc" else if (i % 3 == 1) "cnn" else "reuters",
        (i % 5).toInt))

  private def read(name: String) =
    spark.read.format("graft.sources.FeedSource").option("feed", name).load()

  test("source whitelist filter is pushed into the source (S2/S3 semantics)") {
    register("f1")
    val df = read("f1").filter(col("source") === "bbc").select("id", "title")
    val rows = df.collect()
    assert(rows.length == 33)
    val (filters, _, cols) = FeedSource.lastPushed("f1")
    assert(filters.exists(_.contains("source")), s"filters pushed: $filters")
    assert(cols.sorted == Seq("id", "title"), s"columns pruned: $cols")
  }

  test("limit is pushed into the source (pageSize/limit param)") {
    register("f2")
    val df = read("f2").limit(7)
    assert(df.count() == 7)
    val (_, limit, _) = FeedSource.lastPushed("f2")
    assert(limit == 7, s"limit pushed: $limit")
  }

  test("non-pushable predicates still apply above the scan") {
    register("f3")
    // endsWith is not in the source's accepted set → Spark must re-apply it
    val rows = read("f3")
      .filter(col("source") === "cnn" && col("title").endsWith("1"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1).endsWith("1")))
    val (filters, _, _) = FeedSource.lastPushed("f3")
    assert(filters.exists(_.contains("source")))
    assert(!filters.exists(_.toLowerCase.contains("endswith")))
  }
}
