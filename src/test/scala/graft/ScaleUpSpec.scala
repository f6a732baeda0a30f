package graft

import org.apache.spark.sql.functions._

/** Invariants of the ScaleUp synthetic-SF generator (the scaling-run
  * input, BENCH_NOTES r9): if these drift, the sf0.3 measurements stop
  * meaning what the notes claim they mean. */
class ScaleUpSpec extends SparkSpec {
  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scaleup-spec")
    ScaleUp.run(spark, "/root/testdata/sf0.001", d.toString, 2)
    d.toString
  }
  private def t(name: String) = spark.read.parquet(s"$outDir/$name.parquet")

  test("row counts scale by K (dims copied as-is), layout is single-file") {
    val src = Tables(spark, "/root/testdata/sf0.001")
    assert(t("lineitem").count() == 2 * src.lineitem.count())
    assert(t("documents").count() == 2 * src.documents.count())
    assert(t("events").count() == 2 * src.events.count())
    assert(t("region").count() == src.region.count())
    assert(t("nation").count() == src.nation.count())
    // driver layout: <name>.parquet is a FILE (streaming symlink path
    // and the single-row-group fanout behavior depend on it)
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(outDir, "events.parquet")))
  }

  test("keys stay unique and FKs stay consistent across copies") {
    val ev = t("events")
    assert(ev.select("event_id").distinct().count() == ev.count())
    val docs = t("documents")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    // every lineitem FK resolves (per-copy shift applied to both sides)
    val dangling = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(dangling == 0L)
    val danglingPart = t("lineitem").join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count()
    assert(danglingPart == 0L)
  }

  test("copy docs keep the token multiset but randomize adjacency") {
    val docs = t("documents")
    val n = Tables(spark, "/root/testdata/sf0.001").documents.count()
    val pairs = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
      .join(docs.filter(col("doc_id") >= 100000000L)
          .select((col("doc_id") - 100000000L).as("doc_id"),
            col("text").as("text2")),
        Seq("doc_id"))
      .select(
        sort_array(split(col("text"), " ")).as("w1"),
        sort_array(split(col("text2"), " ")).as("w2"),
        (col("text") === col("text2")).as("same"))
      .collect()
    assert(pairs.nonEmpty && n >= 100)
    // same multiset of words…
    assert(pairs.forall(r => r.getSeq[String](0) == r.getSeq[String](1)))
    // …but essentially never the same adjacency (1-word texts excepted)
    val sameCount = pairs.count(_.getBoolean(2))
    assert(sameCount <= pairs.length / 10,
      s"$sameCount of ${pairs.length} copy texts identical to source")
  }

  test("rotated embeddings keep dimension and norm") {
    val emb = t("embeddings")
    val bad = emb.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        expr("aggregate(embedding, 0D, (a, e) -> a + CAST(e AS DOUBLE) * CAST(e AS DOUBLE))").as("sq"))
      .groupBy(col("vec_id") % 100000000L).agg(
        countDistinct(col("dim")).as("dims"),
        (max(col("sq")) - min(col("sq"))).as("spread"))
      .filter(col("dims") > 1 || abs(col("spread")) > 1e-6)
      .count()
    assert(bad == 0L)
  }
}
