package graft

import graft.ops.{Clustering, Summarize}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  test("tfidf vectors are l2-normalized") {
    val res = Clustering.qTfidf(sf0001).collect()
    assert(res.length == 500)
    res.foreach { r =>
      val norm = r.getDouble(2)
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-6,
        s"doc ${r.getLong(0)} norm $norm")
    }
  }

  test("kmeans on embeddings: full partition, k clusters, deterministic") {
    // Note: the synthetic embeddings are isotropic noise (measured:
    // intra-label mean cosine ≈ inter-label ≈ 0), so label recovery is
    // impossible by construction — assert structure + determinism instead.
    val a = Clustering.qKmeansEmbeddings(sf0001).collect()
    assert(a.length == 500)
    val clusters = a.map(_.getInt(1)).distinct
    assert(clusters.length == 10, s"got ${clusters.length} clusters")
    val b = Clustering.qKmeansEmbeddings(sf0001).collect()
    assert(a.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getInt(1))).toSeq, "not deterministic")
  }

  test("kmeans ref-parity query partitions its input") {
    val res = Clustering.qKmeansDocsRef(sf0001).collect()
    assert(res.length == 200)
    assert(res.map(_.getLong(0)).distinct.length == 200)
    val k = res.map(_.getInt(1)).distinct.length
    assert(k > 10, s"expected ≥ ~n/4 clusters used, got $k")
  }

  test("lda assigns a topic in range to every doc") {
    val res = Clustering.qLdaTopics(sf0001).collect()
    assert(res.length == 500)
    assert(res.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 10))
  }

  test("lda topic keywords are real vocabulary words") {
    val kws = Clustering.ldaTopicKeywords(sf0001).collect()
    assert(kws.length == 10)
    kws.foreach { r =>
      val words = r.getSeq[String](1)
      assert(words.length == 10)
      assert(words.forall(_.nonEmpty))
    }
  }

  test("lexrank: top-3 per group, extractive, positive scores") {
    val res = Summarize.qLexrankBySource(sf0001).collect()
    val groups = res.groupBy(_.getString(0))
    assert(groups.nonEmpty)
    groups.foreach { case (src, rows) =>
      assert(rows.length <= 3, s"$src has ${rows.length} summary rows")
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
      assert(rows.forall(_.getDouble(3) > 0.0))
    }
    // extractive invariant: every summary doc belongs to its group
    val membership = sf0001.documents.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    res.foreach(r => assert(membership.contains((r.getString(0), r.getLong(2)))))
  }

  test("q102 pure-plan TF-IDF matches the spark.ml CountVectorizer+IDF pipeline") {
    import org.apache.spark.ml.feature.{CountVectorizer, IDF}
    import org.apache.spark.ml.linalg.SparseVector
    val t = sf0001
    val docs = t.documents
      .withColumn("tokens", graft.functions.text.tokenize(col("text")))
    val cv = new CountVectorizer().setInputCol("tokens").setOutputCol("tf").fit(docs)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(cv.transform(docs))
    val ml = idf.transform(cv.transform(docs)).select(col("doc_id"), col("tfidf"))
      .collect().map(r => r.getLong(0) -> r.getAs[SparseVector](1)).toMap
    val rows = Clustering.qTfidfExact(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sv = ml(r.getLong(0))
      val norm = math.sqrt(sv.values.map(x => x * x).sum)
      val top = if (sv.values.isEmpty) 0.0 else sv.values.max / norm
      assert(r.getLong(r.fieldIndex("n_terms")) == sv.indices.length.toLong)
      assert(math.abs(r.getDouble(r.fieldIndex("l2_norm")) - norm) < 1e-5,
        s"doc ${r.getLong(0)}: plan norm ${r.getDouble(r.fieldIndex("l2_norm"))} vs ml $norm")
      assert(math.abs(r.getDouble(r.fieldIndex("top_score")) - top) < 1e-5)
    }
  }

  test("joined summaries are rank-ordered concatenations") {
    val sents = sf0001.documents.filter(col("doc_id") < 50)
      .select(col("source"), col("doc_id"), col("text"))
    val joined = Summarize.joinedSummaries(sents, "source", "doc_id", "text")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getString(1).nonEmpty))
  }
}
