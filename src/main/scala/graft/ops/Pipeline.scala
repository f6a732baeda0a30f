package graft.ops

import graft.Tables
import graft.functions.text
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's batch pipeline, end to end (SURVEY.md §3.1,
  * pipeline.py:12-68 intent): articles → greedy fuzzy title dedup →
  * TF-IDF(titles) → k-means k=⌈n/4⌉ → group by cluster → LexRank over
  * member texts → top-1 summary sentence + top-1 title per cluster.
  *
  * Deviations from the reference text, by design (SURVEY §0): the broken
  * clustering code is replaced by its stated intent; the `text_content` /
  * `text` key mismatch is resolved to `text`; the pdb.set_trace() stop and
  * the dead code around the double return in summarize.py are dropped.
  */
object Pipeline {

  /** @param articles (id LONG, title STRING, text STRING)
    * @return summary rows: (cluster_id, n_articles, best_title,
    *         best_sentence) — summarize.py:20-23's {title, text} record. */
  def newsPipeline(articles: DataFrame, kmeansMaxIter: Int = 100,
      seed: Long = 42L): DataFrame = {
    val spark = articles.sparkSession
    import spark.implicits._

    // 1. greedy fuzzy dedup on titles (pipeline.py:27-35) — arrival order,
    //    keep-first, fuzz.ratio > 80. Driver-side by contract (bounded
    //    input; the scalable strategies live in ops.Dedup).
    val rows = articles.select(col("id"), col("title")).as[(Long, String)]
      .collect().toSeq
    // empty-input guard: the k-means/LexRank stages cannot fit on an
    // empty corpus — an empty article set is an empty summary table
    if (rows.isEmpty) {
      import org.apache.spark.sql.types._
      return graft.Tables.emptyFrame(spark, "cluster_id" -> IntegerType,
        "n_articles" -> LongType, "best_title" -> StringType,
        "best_sentence" -> StringType)
    }
    val keptIds = Dedup.greedyFuzzyKeepIds(rows)
    val kept = articles.filter(col("id").isInCollection(keptIds))

    // 2. TF-IDF over titles (cluster.py:25-30) with the reference tokenizer
    val feats = Clustering.tfidf(kept, "title")

    // 3. k-means k=⌈n/4⌉, k-means++ init, maxIter 100 (cluster.py:51-53)
    val n = keptIds.size
    val k = math.max(math.ceil(n / 4.0).toInt, 2)
    val km = new KMeans().setK(k).setMaxIter(kmeansMaxIter).setSeed(seed)
      .setFeaturesCol("tfidf").setPredictionCol("cluster_id")
    val clustered = km.fit(feats).transform(feats)
      .select(col("id"), col("title"), col("text"), col("cluster_id"))
      .cache() // consumed three times below (sizes, titles, sentences)

    // 4-5. LexRank over member sentences AND member titles per cluster
    //      (summarize.py:12-18: lexrank over sentence-split texts, head-1
    //      for the best sentence; lexrank(titles) head-1 for the title).
    //      Sentence explode is the U7 generator: one row per sentence,
    //      id = article_id·10^4 + position.
    val sentences = clustered
      .select(col("cluster_id"), col("id"),
        posexplode(text.sentences(col("text"))).as(Seq("pos", "sentence")))
      .select(col("cluster_id"),
        (col("id") * 10000 + col("pos")).as("sent_id"), col("sentence"))
    val bestText = Summarize.summarize(
      sentences, "cluster_id", "sent_id", "sentence", 1)
      .select(col("cluster_id"), col("sentence").as("best_sentence"))
    val bestTitle = Summarize.summarize(
      clustered.select(col("cluster_id"), col("id"), col("title")),
      "cluster_id", "id", "title", 1)
      .select(col("cluster_id"), col("title").as("best_title"))
    val sizes = clustered.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_articles"))

    sizes.join(bestTitle, Seq("cluster_id"), "left")
      .join(bestText, Seq("cluster_id"), "left")
      .orderBy(col("cluster_id"))
  }

  /** Pipeline over the documents table (flagship query): each document is
    * an article, its first 60 chars the "title". Capped to reference-scale
    * input (the greedy dedup stage is sequential by semantics). */
  def qNewsPipeline(t: Tables): DataFrame = {
    val articles = t.documents
      .filter(col("doc_id") < 200)
      .select(col("doc_id").as("id"),
        substring(col("text"), 1, 60).as("title"), col("text"))
    newsPipeline(articles, kmeansMaxIter = 20)
  }
}
