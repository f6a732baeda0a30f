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

  test("TopN is pushed into the source (sortBy+pageSize params, O2)") {
    register("f4")
    val df = read("f4")
      .orderBy(col("section_id").desc, col("id"))
      .limit(5)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(4)))
    // expected top-5 computed locally from the fixture
    val expect = FeedSource.feeds("f4")
      .sortBy(r => (-r.sectionId, r.id)).take(5)
      .map(r => (r.id, r.sectionId))
    assert(rows.toSeq == expect, s"got ${rows.toSeq}")
    // the TopN reached the source…
    val (orders, limit) = FeedSource.lastPushedTopN("f4")
    // Spark's defaults: ASC ⇒ NULLS FIRST, DESC ⇒ NULLS LAST
    assert(orders == Seq(("section_id", false, false), ("id", true, true)),
      s"orders: $orders")
    assert(limit == 5)
    // …and the plan has NO post-scan sort: the source's order is trusted
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort") && !plan.contains("TakeOrderedAndProject"),
      s"post-scan sort survived:\n$plan")
  }

  test("pushed TopN honors null ordering on nullable string keys") {
    // a feed with missing titles — the source comparator must both
    // null-guard (no NPE) and honor the requested NULLS FIRST/LAST,
    // because isPartiallyPushed=false drops Spark's own sort entirely
    FeedSource.feeds("f6") = (1L to 20L).map(i =>
      FeedRow(i, if (i % 4 == 0) null else s"Title $i", s"http://u/$i",
        "cnn", (i % 5).toInt))

    // ASC default = NULLS FIRST: the five null-title rows lead
    val ascTop = read("f6").orderBy(col("title")).limit(6)
      .collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(ascTop.count(_._2) == 5, s"nulls first: ${ascTop.toSeq}")
    val (ascOrders, _) = FeedSource.lastPushedTopN("f6")
    assert(ascOrders == Seq(("title", true, true)), s"orders: $ascOrders")

    // explicit ASC NULLS LAST: no null title in the top rows
    val lastTop = read("f6").orderBy(col("title").asc_nulls_last).limit(6)
      .collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(lastTop.forall(!_._2), s"nulls last: ${lastTop.toSeq}")
    val (lastOrders, _) = FeedSource.lastPushedTopN("f6")
    assert(lastOrders == Seq(("title", true, false)), s"orders: $lastOrders")

    // DESC default = NULLS LAST, and the non-null order matches Spark's
    val descTop = read("f6").orderBy(col("title").desc).limit(6)
      .collect().map(r => (if (r.isNullAt(1)) null else r.getString(1)))
    val expect = FeedSource.feeds("f6").map(_.title).filter(_ != null)
      .sorted(Ordering[String].reverse).take(6)
    assert(descTop.toSeq == expect, s"got ${descTop.toSeq}")
  }

  test("non-pushable sort keys keep the sort above the scan") {
    register("f5")
    // substring(title) is not a plain column — the source must reject the
    // TopN and Spark must sort above the scan
    val df = read("f5").orderBy(substring(col("title"), 7, 3)).limit(5)
    assert(df.collect().length == 5)
    assert(!FeedSource.lastPushedTopN.contains("f5"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("Sort"),
      s"expected an engine-side sort:\n$plan")
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
