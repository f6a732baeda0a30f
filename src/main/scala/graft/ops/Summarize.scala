package graft.ops

import graft.Tables
import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LexRank extractive summarization (SURVEY.md §2.9 M6; reference
  * summarize.py:5-26 via the pinned sumpy lexrank, reddit_api.py:146-150).
  *
  * LexRank (Erkan & Radev 2004): sentences are nodes; edges connect
  * sentence pairs whose TF-IDF cosine exceeds a threshold; scores are the
  * stationary distribution of a random walk over that graph (PageRank with
  * damping). The summary is the top-k sentences per cluster (top-1
  * title/text in the CLI path, top-3 joined in the server path — W1/W2).
  *
  * Distribution: everything per-group is computed via group-keyed joins and
  * aggregations — thousands of clusters process in parallel, no per-cluster
  * driver work. The power iteration is a fixed-iteration driver loop over
  * one edges DataFrame (SURVEY §4 custom-concern 2), localCheckpoint-ed to
  * cut lineage; iterations cost one shuffle each regardless of cluster
  * count.
  */
object Summarize {

  /** Sentence-level TF (stemmed, stopword-filtered) as a token-count map. */
  private val tfMap = udf((tokens: Seq[String]) =>
    if (tokens == null) Map.empty[String, Int]
    else tokens.groupBy(identity).map { case (k, v) => k -> v.length })

  /** idf-weighted cosine between two token-count maps (LexRank eq. 3). */
  private val idfCosine = udf(
    (a: Map[String, Int], b: Map[String, Int], idf: Map[String, Double]) => {
      def w(m: Map[String, Int], t: String) = m.getOrElse(t, 0).toDouble * idf.getOrElse(t, 0.0)
      val terms = a.keySet ++ b.keySet
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      terms.foreach { t =>
        val x = w(a, t); val y = w(b, t)
        ab += x * y; aa += x * x; bb += y * y
      }
      if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
    })

  /** LexRank scores for (group, sentence) rows.
    *
    * @param sentences (groupCol, idCol, textCol) — one row per sentence
    * @return (group, id, score) — scores sum to ~1 within each group
    */
  def lexrank(sentences: DataFrame, groupCol: String, idCol: String,
      textCol: String, threshold: Double = 0.1, damping: Double = 0.85,
      iterations: Int = 12): DataFrame = {
    val g = col(groupCol).as("grp")
    val toks = sentences.select(g, col(idCol).as("sid"),
      text.stemTokens(text.removeStopwords(text.tokenize(col(textCol)))).as("toks"))

    // per-group smooth idf: log((N+1)/(df+1)) + 1
    val groupSizes = toks.groupBy(col("grp")).agg(count(lit(1)).as("n_sent"))
    val dfCounts = toks.select(col("grp"), col("sid"),
        explode(array_distinct(col("toks"))).as("term"))
      .groupBy(col("grp"), col("term")).agg(count(lit(1)).as("df"))
    val idfMaps = dfCounts.join(groupSizes, "grp")
      .withColumn("idf", log((col("n_sent") + 1).cast("double") / (col("df") + 1)) + 1)
      .groupBy(col("grp"))
      .agg(map_from_arrays(collect_list(col("term")), collect_list(col("idf"))).as("idf"))

    val vecs = toks.withColumn("tf", tfMap(col("toks"))).join(idfMaps, "grp")

    // intra-group sentence graph: cosine > threshold (both directions kept)
    val a = vecs.select(col("grp"), col("sid").as("src"), col("tf").as("tf_a"), col("idf"))
    val b = vecs.select(col("grp"), col("sid").as("dst"), col("tf").as("tf_b"))
    val edges = a.join(b, Seq("grp"))
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", idfCosine(col("tf_a"), col("tf_b"), col("idf")))
      .filter(col("sim") > threshold)
      .select(col("grp"), col("src"), col("dst"))
      .cache()
    val outDegree = edges.groupBy(col("grp"), col("src")).agg(count(lit(1)).as("deg"))

    // power iteration: s = (1-d)/n + d * Σ_in s_j/deg_j  (binary LexRank)
    var scores = vecs.select(col("grp"), col("sid"))
      .join(groupSizes, "grp")
      .withColumn("score", lit(1.0) / col("n_sent"))
      .select(col("grp"), col("sid"), col("score"))
    for (i <- 1 to iterations) {
      val contrib = edges
        .join(scores.select(col("grp"), col("sid").as("src"), col("score")), Seq("grp", "src"))
        .join(outDegree, Seq("grp", "src"))
        .groupBy(col("grp"), col("dst"))
        .agg(sum(col("score") / col("deg")).as("inflow"))
      scores = scores
        .join(contrib.select(col("grp"), col("dst").as("sid"), col("inflow")),
          Seq("grp", "sid"), "left")
        .join(groupSizes, "grp")
        .withColumn("score",
          (lit(1.0) - damping) / col("n_sent") + lit(damping) * coalesce(col("inflow"), lit(0.0)))
        .select(col("grp"), col("sid"), col("score"))
      if (i % 4 == 0) scores = scores.localCheckpoint()
    }
    scores.select(col("grp").as(groupCol), col("sid").as(idCol), col("score"))
  }

  /** LexRank with the per-group computation as an in-memory kernel inside
    * flatMapGroups: ONE shuffle (group the sentences), then each story
    * cluster — bounded by construction — computes its idf, cosine graph and
    * power iteration locally; thousands of groups run in parallel across
    * the cluster. This is the default: the iterative DataFrame variant
    * above (`lexrank`) exists for groups too large for one task, at the
    * cost of a shuffle per iteration. Same algorithm, same parameters. */
  def lexrankGrouped(sentences: DataFrame, groupCol: String, idCol: String,
      textCol: String, threshold: Double = 0.1, damping: Double = 0.85,
      iterations: Int = 20): DataFrame = {
    val spark = sentences.sparkSession
    import spark.implicits._
    // fan the (single-row-group) scan out before the tokenize→stem chain;
    // the groupByKey below re-shuffles by group anyway
    val fanned = sentences.repartition(spark.sparkContext.defaultParallelism)
    val toks = fanned.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        text.stemTokens(text.removeStopwords(text.tokenize(col(textCol)))))
      .as[(String, Long, Seq[String])]
    toks.groupByKey(_._1).flatMapGroups { (grp, iter) =>
      val sents = iter.toArray
      val n = sents.length
      // per-group smooth idf
      val dfCount = scala.collection.mutable.HashMap.empty[String, Int]
      sents.foreach(_._3.distinct.foreach(t =>
        dfCount.update(t, dfCount.getOrElse(t, 0) + 1)))
      val idf = dfCount.map { case (t, d) =>
        t -> (math.log((n + 1).toDouble / (d + 1)) + 1)
      }
      val vecs: Array[Map[String, Double]] = sents.map { s =>
        s._3.groupBy(identity).map { case (t, o) => t -> o.length * idf(t) }
      }
      val norms = vecs.map(v => math.sqrt(v.values.map(x => x * x).sum))
      def cos(i: Int, j: Int): Double = {
        if (norms(i) == 0.0 || norms(j) == 0.0) return 0.0
        val (small, big) = if (vecs(i).size < vecs(j).size) (vecs(i), vecs(j)) else (vecs(j), vecs(i))
        var s = 0.0
        small.foreach { case (t, x) => big.get(t).foreach(y => s += x * y) }
        s / (norms(i) * norms(j))
      }
      // binary adjacency over the threshold
      val adj = Array.fill(n)(List.newBuilder[Int])
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          if (cos(i, j) > threshold) { adj(i) += j; adj(j) += i }
          j += 1
        }
        i += 1
      }
      val neighbors = adj.map(_.result().toArray)
      val deg = neighbors.map(_.length)
      var score = Array.fill(n)(1.0 / n)
      var it = 0
      while (it < iterations) {
        val next = Array.fill(n)((1.0 - damping) / n)
        var u = 0
        while (u < n) {
          if (deg(u) > 0) {
            val share = damping * score(u) / deg(u)
            neighbors(u).foreach(v => next(v) += share)
          }
          u += 1
        }
        score = next
        it += 1
      }
      sents.indices.iterator.map(ix => (grp, sents(ix)._2, score(ix)))
    }.toDF(groupCol, idCol, "score")
  }

  /** Top-k summary rows per group by LexRank score (W1/W2): deterministic
    * tie-break on id. */
  def summarize(sentences: DataFrame, groupCol: String, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val scored = lexrankGrouped(sentences, groupCol, idCol, textCol)
      .join(sentences.select(col(groupCol), col(idCol), col(textCol)),
        Seq(groupCol, idCol))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank"), col(idCol),
        round(col("score"), 6).as("score"), col(textCol))
  }

  /** Query surface: each source is a "story cluster" of documents, each
    * document one sentence node (the synthetic corpus has no sentence
    * punctuation); emit the 3 most-central documents per source — the
    * server path's top-3 summary (reddit_api.py:148-149). */
  def qLexrankBySource(t: Tables): DataFrame =
    summarize(t.documents.select(col("source"), col("doc_id"), col("text")),
      "source", "doc_id", "text", 3)
      .select(col("source"), col("rank"), col("doc_id"), col("score"))
      .orderBy(col("source"), col("rank"))

  /** Concatenated top-3 summary text per group (reddit_api.py:148-150's
    * ' '.join of the top sentences), rank-ordered. */
  def joinedSummaries(sentences: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame =
    summarize(sentences, groupCol, idCol, textCol, 3)
      .groupBy(col(groupCol))
      // collect_list order is nondeterministic — sort the (rank, text)
      // structs before joining so the summary is rank-ordered.
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("rank"), col(textCol)))),
          s => s.getField(textCol)), " ").as("summary"))
}
