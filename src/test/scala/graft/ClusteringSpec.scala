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

  test("q119 deterministic Lloyd: monotone objective, inertia near spark.ml, repeatable") {
    val t = sf0001
    val fin = Clustering.qKmeansStep(t).collect()
    assert(fin.length == 500)
    val clusters = fin.map(_.getLong(1)).distinct
    assert(clusters.length >= 2 && clusters.length <= 8, s"${clusters.length} clusters")
    // spherical-k-means monotonicity: two update rounds must not worsen the
    // mean cosine-to-assigned-centroid vs assigning on the init centroids
    val init = Clustering.qKmeansStep(t, updates = 0).collect()
    def meanSim(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getDouble(2)).sum / rows.length
    assert(meanSim(fin) >= meanSim(init) - 1e-9,
      s"objective worsened: ${meanSim(init)} -> ${meanSim(fin)}")
    // quality tie to the spark.ml path (VERDICT r4 #2): L2 inertia of the
    // 2-update deterministic step within tolerance of a fully-iterated
    // spark.ml KMeans at the same k (isotropic-noise embeddings — neither
    // can reduce much, so the ratio is tight by construction)
    val vecs = t.embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val assignMap = fin.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dim = vecs.values.head.length
    val inertia = assignMap.groupBy(_._2).values.map { m =>
      val ids = m.keys.toSeq
      val mean = Array.tabulate(dim)(d => ids.map(vecs(_)(d)).sum / ids.size)
      ids.map { id =>
        val v = vecs(id)
        (0 until dim).map { d => val x = v(d) - mean(d); x * x }.sum
      }.sum
    }.sum
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = t.embeddings.repartition(8)
      .withColumn("features", array_to_vector(col("embedding")))
    val ml = new KMeans().setK(8).setMaxIter(30).setSeed(42L)
      .setFeaturesCol("features").fit(feats)
    val mlCost = ml.summary.trainingCost
    assert(inertia <= mlCost * 1.15,
      s"q119 inertia $inertia vs spark.ml $mlCost")
    // determinism: same assignments on a re-run
    val again = Clustering.qKmeansStep(t).collect()
    assert(fin.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
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

  test("q120 grouped kernel matches the iterative-DataFrame lexrank implementation") {
    val t = sf0001
    // two independent implementations of the same fixed-round power
    // iteration (in-task kernel vs per-round joins) must agree to float
    // noise on every score — catches formula drift in either one
    val kernel = Summarize.lexrankGrouped(
        t.documents.select(col("source"), col("doc_id"), col("text")),
        "source", "doc_id", "text", iterations = 10, stem = false)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val loop = Summarize.lexrank(
        t.documents.select(col("source"), col("doc_id"), col("text")),
        "source", "doc_id", "text", iterations = 10, stem = false)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(kernel.keySet == loop.keySet)
    val maxDelta = kernel.map { case (k, v) => math.abs(v - loop(k)) }.max
    assert(maxDelta < 1e-9, s"implementations diverge: max |delta| = $maxDelta")
    // and the gated query surface is structurally sound + deterministic
    val out = Summarize.qLexrankPower(t).collect()
    assert(out.length == 60)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to 3L))
    }
    assert(out.forall(_.getDouble(3) > 0.0))
  }

  test("group-size governor: bit-identical below cap, bounded trim above") {
    val t = sf0001
    val sents = t.documents.select(col("source"), col("doc_id"), col("text"))
    // below the cap (max source group = 25) the governed path is the
    // plain kernel, bit for bit
    val plain = Summarize.qLexrankPower(t).collect().map(_.toSeq).toSeq
    val governed = Summarize.qLexrankGoverned(t).collect().map(_.toSeq).toSeq
    assert(plain == governed, "governed lexrank != plain below cap")

    // above the cap: each group keeps exactly its cap smallest doc_ids,
    // and scores equal the plain kernel run on that trimmed subset
    val cap = 10
    val capped = Summarize.lexrankGoverned(sents, "source", "doc_id", "text",
        iterations = 10, stem = false, cap = cap)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expectIds = sents.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      // .toSeq before flatMap: a Map flatMapped to tuples collapses per
      // key (the round-5 Set.map dedup trap)
      .groupBy(_._1).toSeq.flatMap { case (_, g) => g.sortBy(_._2).take(cap).toSeq }.toSet
    assert(capped.keySet == expectIds, "governed kernel kept the wrong ids")
    val trimmed = t.documents
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("rn") <= cap)
      .select(col("source"), col("doc_id"), col("text"))
    val expectScores = Summarize.lexrankGrouped(trimmed, "source", "doc_id",
        "text", iterations = 10, stem = false)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped == expectScores, "governed scores != plain kernel on the trim")

    // the Affinity governors share the same contract
    val emb = t.embeddings.orderBy(col("vec_id")).limit(20)
      .select(lit("all").as("g"), col("vec_id"), col("embedding"))
    val apPlain = graft.ops.Affinity.apGrouped(emb, "g", "vec_id", "embedding")
      .collect().map(_.toSeq).toSeq
    val apGov = graft.ops.Affinity.apGoverned(emb, "g", "vec_id", "embedding")
      .collect().map(_.toSeq).toSeq
    assert(apPlain == apGov, "governed AP != plain below cap")
    val apCapped = graft.ops.Affinity.apGoverned(emb, "g", "vec_id", "embedding",
      cap = 8).collect().map(_.getLong(1)).toSet
    val apExpect = graft.ops.Affinity.apGrouped(
      emb.orderBy(col("vec_id")).limit(8), "g", "vec_id", "embedding")
      .collect().map(_.getLong(1)).toSet
    assert(apCapped == apExpect, "governed AP trim != 8 smallest ids")
  }

  test("q129 BoW corpus agrees with the CountVectorizer vectorization") {
    import org.apache.spark.ml.feature.CountVectorizer
    import org.apache.spark.ml.linalg.SparseVector
    val t = sf0001
    val rows = Clustering.qBowCorpus(t).collect()
    assert(rows.length == 500)
    val toks = t.documents.withColumn("tokens",
      graft.functions.text.removeStopwords(graft.functions.text.tokenize(col("text"))))
    val cv = new CountVectorizer().setInputCol("tokens").setOutputCol("tf").fit(toks)
    val ml = cv.transform(toks).select("doc_id", "tf").collect()
      .map(r => r.getLong(0) -> r.getAs[SparseVector](1)).toMap
    rows.foreach { r =>
      val v = ml(r.getLong(0))
      assert(r.getLong(1) == v.numNonzeros.toLong,
        s"doc ${r.getLong(0)}: n_terms vs CountVectorizer nnz")
      assert(r.getLong(2) == v.values.sum.toLong,
        s"doc ${r.getLong(0)}: n_tokens vs CountVectorizer mass")
      // bow pairs are "id:count" ascending by our alphabetic ids — counts
      // (id-order independent) must be the same multiset as the vector's
      val counts = r.getString(3).split(" ").map(_.split(":")(1).toLong).sorted.toSeq
      assert(counts == v.values.map(_.toLong).sorted.toSeq,
        s"doc ${r.getLong(0)}: count multiset differs")
    }
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

  test("q148 PCA power iteration: unit vector, nondecreasing Rayleigh, matches numpy-style recompute") {
    val t = sf0001
    val rows = Clustering.qPcaPower(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 3 * 64)
    val byRound = rows.groupBy(_._1).toSeq.sortBy(_._1)
    // v is unit-norm each round; lambda never decreases (power iteration)
    val lambdas = byRound.map(_._2.head._4)
    byRound.foreach { case (r, rs) =>
      val norm = math.sqrt(rs.map(_._3).map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4, s"round $r ‖v‖ = $norm")
    }
    lambdas.sliding(2).foreach(p => assert(p(1) >= p(0) - 1e-9,
      s"Rayleigh decreased: $lambdas"))
    // driver recompute of round 1 from raw embeddings (v0 = 0.125)
    val embs = t.embeddings.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val s = Array.tabulate(64) { j =>
      val vals = embs.map(e => e(j) * e.map(_ * 0.125).sum)
      BigDecimal(vals.sum / vals.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val norm1 = math.sqrt(s.map(x => x * x).sum)
    val v1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    s.map(_ / norm1).zip(v1).zipWithIndex.foreach { case ((e, g), j) =>
      assert(math.abs(e - g) < 1e-5, s"dim ${j + 1}: recompute $e vs $g")
    }
  }

  test("q149 ABTT: residual energy = norm² − proj², ordered by |proj|, removal reduces energy") {
    val rows = Clustering.qAbttTop(sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 20)
    rows.foreach { case (id, proj, normSq, residSq) =>
      assert(math.abs(residSq - (normSq - proj * proj)) < 1e-12, s"vec $id")
      assert(residSq >= 0 && residSq < normSq, s"vec $id energy not reduced")
    }
    val absProj = rows.map(r => math.abs(r._2))
    absProj.sliding(2).foreach(p => assert(p(1) <= p(0) + 1e-12, "not |proj|-ordered"))
  }

  test("q132 NMF step: positive factors, differentiated topics, error decreases") {
    val t = sf0001
    val out = Clustering.qNmfStep(t).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) > 0.0, s"non-positive weight in $r"))
    // topics must be differentiated: more than one topic wins some doc's argmax
    val argmax = out.groupBy(_.getLong(0)).values
      .map(_.maxBy(r => (r.getDouble(2), -r.getLong(1))).getLong(1)).toSet
    assert(argmax.size >= 2, s"degenerate topic assignment: $argmax")
    // multiplicative updates must reduce Frobenius reconstruction error
    def frob(rounds: Int): Double = {
      val (v, w, h) = Clustering.nmfFactors(t, 4, rounds)
      val wh = w.join(h, "i").groupBy(col("doc_id"), col("tid"))
        .agg(sum(col("w") * col("h")).as("wh"))
      v.join(wh, Seq("doc_id", "tid"), "full")
        .select(sum(pow(coalesce(col("c"), lit(0.0)) - coalesce(col("wh"), lit(0.0)), 2)))
        .collect()(0).getDouble(0)
    }
    val (e0, e2) = (frob(0), frob(2))
    assert(e2 < e0, s"reconstruction error did not decrease: $e0 -> $e2")
  }

  test("q178 drift: halves partition each label; same-half drift is 1") {
    val t = sf0001
    val out = Clustering.qEmbeddingDrift(t).collect()
    assert(out.nonEmpty)
    val perLabel = t.embeddings.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perLabel(r.getInt(0)))
      // random-noise halves still point the same general way (positive,
      // well below 1); identical halves would give exactly 1
      val c = r.getDouble(3)
      assert(c > -1.0 && c < 1.0)
    }
  }

  test("q157 silhouette matches a from-scratch centroid-silhouette recompute") {
    val t = sf0001
    val got = Clustering.qSilhouette(t).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val rows = t.embeddings.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    assert(got.map(_._2).sum == rows.length)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = rows.groupBy(_._2).map { case (l, vs) =>
      l -> Array.tabulate(vs.head._3.length) { d => r6(vs.map(_._3(d)).sum / vs.length) }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ip = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { ip += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      ip / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = rows.map { case (_, l, e) =>
      val a = 1.0 - cos(e, cents(l))
      val b = cents.filter(_._1 != l).values.map(c => 1.0 - cos(e, c)).min
      (l, r6((b - a) / math.max(a, b)))
    }.groupBy(_._1).map { case (l, ss) =>
      l -> ss.map(s => BigDecimal(s._2)).sum.toDouble / ss.length
    }
    got.foreach { case (l, _, ms) =>
      assert(math.abs(ms - expect(l)) < 1e-12, s"label $l: $ms vs ${expect(l)}")
      assert(ms >= -1.0 && ms <= 1.0)
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

  test("q120 oracle contract: no pair cosine sits on the 0.1 edge threshold") {
    // The kernel sums cosine terms in HashMap iteration order while the
    // oracle's dots CTE aggregates in its own order — the edge set (and
    // so the whole hash gate) is stable ONLY when no pair's similarity
    // lies within float-reassociation distance of the threshold. Pin
    // that precondition with an independent recompute of the oracle's
    // tf-idf/dots/norms pipeline (q120 runs stem=false).
    Seq(sf0001, sf001).foreach { t =>
      val toks = t.documents.select(col("source").as("grp"),
          col("doc_id").as("sid"),
          explode(graft.functions.text.removeStopwords(
            graft.functions.text.tokenize(col("text")))).as("term"))
      val tf = toks.groupBy("grp", "sid", "term")
        .agg(count(lit(1)).cast("double").as("tf"))
      val nd = t.documents.groupBy(col("source").as("grp"))
        .agg(count(lit(1)).as("n"))
      val dfc = tf.groupBy("grp", "term").agg(count(lit(1)).as("df"))
      val w = tf.join(dfc, Seq("grp", "term")).join(nd, Seq("grp"))
        .select(col("grp"), col("sid"), col("term"),
          (col("tf") * (log((col("n") + 1).cast("double") /
            (col("df") + 1).cast("double")) + lit(1.0))).as("w"))
      val norms = w.groupBy("grp", "sid")
        .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      val dots = w.select(col("grp"), col("sid").as("a"), col("term"), col("w").as("wa"))
        .join(w.select(col("grp"), col("sid").as("b"), col("term"), col("w").as("wb")),
          Seq("grp", "term"))
        .filter(col("a") < col("b"))
        .groupBy("grp", "a", "b").agg(sum(col("wa") * col("wb")).as("dot"))
      val minGap = dots
        .join(norms.select(col("grp"), col("sid").as("a"), col("nrm").as("na")), Seq("grp", "a"))
        .join(norms.select(col("grp"), col("sid").as("b"), col("nrm").as("nb")), Seq("grp", "b"))
        .select(abs(col("dot") / (col("na") * col("nb")) - lit(0.1)).as("gap"))
        .agg(min(col("gap"))).head().getDouble(0)
      assert(minGap > 1e-9,
        s"${t.sfDir}: a pair cosine sits $minGap from the 0.1 threshold — " +
          "the q120 edge set is no longer float-order-robust")
    }
  }

  test("q153 oracle contract: non-zero norms; center cosines off the .5-micro boundary") {
    // q153's cross-engine determinism = round(6) per cosine BEFORE max.
    // Two unstated preconditions (the AffinitySpec recipe): (1) no
    // zero-norm embedding — cosine would be NaN and NaN ordering
    // diverges between Spark and DuckDB; (2) no point-center cosine
    // exactly on a .5-micro rounding boundary, where round() itself
    // diverges (the q152/q176 invariant).
    Seq(sf0001, sf001).foreach { t =>
      val emb = t.embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val zeroNorm = emb.select(col("vec_id"),
          expr("aggregate(e, 0D, (acc, x) -> acc + x * x)").as("sq"))
        .filter(col("sq") <= 0.0).count()
      assert(zeroNorm == 0L, s"${t.sfDir}: zero-norm embeddings break q153's cosine")
      val centers = Clustering.qKcenter(t)
        .select(col("center")).distinct()
        .join(emb.withColumnRenamed("vec_id", "center"), Seq("center"))
        .select(col("e").as("c"))
      val boundaryDist = emb.crossJoin(broadcast(centers))
        .select((graft.plans.CosineSim.cosineD(col("e"), col("c")) * 1e6).as("m"))
        .select(abs(col("m") - floor(col("m")) - lit(0.5)).as("d"))
        .agg(min(col("d"))).head().getDouble(0)
      assert(boundaryDist > 1e-6,
        s"${t.sfDir}: a center cosine sits $boundaryDist micro-units from a " +
          ".5 rounding boundary — round(6) could diverge cross-engine")
    }
  }

  test("q233/q234: NMI and ARI recompute from the assignment contingency") {
    val t = sf0001
    val assign = Clustering.qKmeansStep(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = t.embeddings.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val cells = assign.groupBy { case (v, c) => (c, labels(v)) }
      .map { case (k, vs) => (k, vs.length.toLong) }
    val n = assign.length.toLong
    val ni = cells.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val nj = cells.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
    def r6(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val iMicro = cells.map { case ((c, l), nij) =>
      r6(nij.toDouble / n * math.log(n.toDouble * nij / (ni(c).toDouble * nj(l))) * 1e6)
    }.sum
    val hcMicro = ni.values.map(v => r6(-(v.toDouble / n) * math.log(v.toDouble / n) * 1e6)).sum
    val hlMicro = nj.values.map(v => r6(-(v.toDouble / n) * math.log(v.toDouble / n) * 1e6)).sum
    val nmiRow = Clustering.qClusterNmi(t).head()
    assert(nmiRow.getLong(0) == n)
    assert(nmiRow.getLong(1) == iMicro, s"i_micro ${nmiRow.getLong(1)} want $iMicro")
    assert(nmiRow.getLong(2) == hcMicro && nmiRow.getLong(3) == hlMicro)
    val nmi = nmiRow.getDouble(4)
    assert(nmi >= 0.0 && nmi <= 1.0 + 1e-9)
    assert(math.abs(nmi - iMicro / math.sqrt(hcMicro.toDouble * hlMicro)) < 1e-12)

    def c2(x: Long): Long = x * (x - 1) / 2
    val sij = cells.values.map(c2).sum
    val sa = ni.values.map(c2).sum
    val sb = nj.values.map(c2).sum
    val n2 = c2(n)
    val ariRow = Clustering.qClusterAri(t).head()
    assert((ariRow.getLong(1), ariRow.getLong(2), ariRow.getLong(3), ariRow.getLong(4))
      == ((sij, sa, sb, n2)))
    val expd = sa.toDouble * sb / n2
    val ari = (sij - expd) / ((sa + sb) / 2.0 - expd)
    assert(math.abs(ariRow.getDouble(5) - ari) < 1e-12)
    assert(ariRow.getDouble(5) >= -1.0 && ariRow.getDouble(5) <= 1.0)
  }

  test("q271 facility location: matches an in-memory greedy; gains non-increasing") {
    val t = sf0001
    val got = Clustering.qFacilityLocation(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val vecs = t.embeddings.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // half away from zero (Math.round is half-up; cosines can be negative)
    def micro(x: Double): Long = {
      val m = x * 1000000.0
      (if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)).toLong
    }
    val poolV = vecs.filter(_._1 < 64)
    val sm = poolV.map { case (cid, c) =>
      cid -> vecs.map { case (x, e) => x -> micro(cos(e, c)) }.toMap
    }.toMap
    var cov = vecs.map(_._1 -> 0L).toMap
    var picked = Set.empty[Long]
    var coverage = 0L
    val expected = (1L to 8L).map { r =>
      val (cid, gain) = sm.keys.filterNot(picked).toSeq.map { c =>
        c -> vecs.map { case (x, _) => math.max(sm(c)(x) - cov(x), 0L) }.sum
      }.minBy { case (c, g) => (-g, c) }
      picked += cid
      coverage += gain
      cov = cov.map { case (x, v) => x -> math.max(v, sm(cid)(x)) }
      (r, cid, gain, coverage)
    }
    assert(got.toSeq == expected)
    // submodularity: marginal gains are non-increasing down the greedy order
    val gains = got.map(_._3)
    gains.zip(gains.tail).foreach { case (a, b) => assert(a >= b, "gains increased") }
  }

  test("q277 cluster labels: matches an in-memory c-TF-IDF recompute") {
    val t = sf0001
    val asg = Clustering.qKmeansStep(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // vec_id -> cid
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => asg.contains(d._1))
    val ct = docs.flatMap { case (id, txt) =>
      txt.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)
        .map(term => (asg(id), term))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nCl = ct.keys.map(_._1).toSeq.distinct.size.toLong
    val tot = ct.values.sum
    val a = tot.toDouble / nCl.toDouble
    val ft = ct.toSeq.groupBy(_._1._2).map { case (term, rows) =>
      term -> rows.map(_._2).sum
    }
    def micro(x: Double): Long = {
      val m = x * 1000000.0
      (if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)).toLong
    }
    val weights = ct.map { case ((cid, term), tf) =>
      (cid, term, tf, ft(term), tf * micro(math.log(1.0 + a / ft(term).toDouble)))
    }.toSeq
    val expected = weights.groupBy(_._1).toSeq.flatMap { case (cid, rows) =>
      rows.sortBy { case (_, term, _, _, w) => (-w, term) }.take(5).zipWithIndex
        .map { case ((_, term, tf, f, w), i) => (cid, (i + 1).toLong, term, tf, f, w) }
    }.sortBy(r => (r._1, r._2))
    val got = Clustering.qClusterLabels(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected)
  }

  test("q266 embedding outliers: recompute from the q119 assignment") {
    val t = sf0001
    // q119 exposes round(sim, 6); rebuild the micro key from it — the
    // decimal image equals round(sim·1e6) exactly on the micro grid
    val assign = Clustering.qKmeansStep(t).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000)).toLong))
    val n = assign.length.toLong
    val budget = 5L * n / 100L
    val outliers = assign.sortBy { case (v, _, sm) => (sm, v) }
      .take(budget.toInt).map(_._1).toSet
    val got = Clustering.qEmbeddingOutliers(t).collect()
    assert(got.map(_.getLong(1)).sum == n)
    assert(got.map(_.getLong(2)).sum == budget)
    val byCid = assign.groupBy(_._2)
    got.foreach { r =>
      val cid = r.getLong(0)
      val members = byCid(cid)
      assert(r.getLong(1) == members.length.toLong)
      assert(r.getLong(2) == members.count(m => outliers(m._1)).toLong)
      assert(r.getLong(3) == members.map(_._3).sum)
      assert(r.getDouble(4) ==
        r.getLong(3).toDouble / (1000000.0 * r.getLong(1).toDouble))
    }
  }

  test("q313 DBSCAN: matches an in-memory density recompute") {
    val t = sf0001
    import graft.functions.fasthash
    val emb = t.embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val ids = emb.keys.toSeq.sorted
    val pairs = for {
      i <- ids; j <- ids if i < j
      if fasthash.cosine(emb(i), emb(j)) > 0.4
    } yield (i, j)
    val deg = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    pairs.foreach { case (a, b) => deg(a) += 1L; deg(b) += 1L }
    val cores = ids.filter(deg(_) >= 3L).toSet
    // components over the core-core subgraph
    val parent = collection.mutable.Map[Long, Long]() ++ cores.map(c => c -> c)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.filter(p => cores(p._1) && cores(p._2)).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val coreLab = cores.map(c => c -> find(c)).toMap
    val adj = collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val got = Clustering.qDbscan(t).collect()
    assert(got.length == ids.length)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == deg(id))
      if (cores(id)) {
        assert(r.getString(2) == "core"); assert(r.getLong(3) == coreLab(id))
      } else {
        val nbCores = adj(id).filter(cores.contains)
        if (nbCores.nonEmpty) {
          assert(r.getString(2) == "border")
          assert(r.getLong(3) == nbCores.map(coreLab).min)
        } else {
          assert(r.getString(2) == "noise"); assert(r.isNullAt(3))
        }
      }
    }
    // every cluster label is itself a core member of that cluster
    val labels = got.filter(!_.isNullAt(3)).map(_.getLong(3)).distinct
    labels.foreach(l => assert(cores(l) && coreLab(l) == l))
  }
}
