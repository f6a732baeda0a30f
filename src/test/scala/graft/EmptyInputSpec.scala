package graft

import graft.ops.{Clustering, Layout, Pipeline, Profiling, Similarity, TextAnalysis}
import java.nio.file.Files

/** Empty-input contract: every query that fits an ML model, fetches a
  * scalar parameter driver-side, or reads back a derived layout must
  * return a correctly-typed EMPTY result on a 0-row source, not throw
  * (spark.ml fit, getLong/getTimestamp on NULL aggregates, ANSI
  * divide-by-zero on constant-folded literals, and schema inference on
  * a data-file-less parquet write are all crash paths without guards).
  *
  * The fixture is a scale-factor directory with the real sf0.001 schemas
  * and zero rows — exactly what a date-filtered partition of an otherwise
  * healthy 100 TB lake looks like.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty-sf").toString
    // copy each table's RAW schema via a bare read — whatever type the
    // reader gives events.ts, Tables.normalizeEventTs dispatches on it
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
        .limit(0).write.parquet(s"$dir/$n.parquet")
    }
    dir
  }

  private lazy val et: Tables = Tables(spark, emptyDir)

  test("ml-fit wrappers return typed empty frames") {
    assert(Clustering.qTfidf(et).collect().isEmpty)
    assert(Clustering.qKmeansDocsRef(et).collect().isEmpty)
    assert(Clustering.qKmeansEmbeddings(et).collect().isEmpty)
    assert(Clustering.qLdaTopics(et).collect().isEmpty)
    assert(Similarity.qKnnIvf(et).collect().isEmpty)
    assert(Similarity.qKnnPq(et).collect().isEmpty)
    assert(TextAnalysis.qHybridRrf(et).collect().isEmpty)
    assert(TextAnalysis.qLogitClassifier(et).collect().isEmpty)
  }

  test("scalar-parameter queries survive NULL aggregates") {
    assert(Profiling.qDriftPsi(et).collect().isEmpty)
    assert(TextAnalysis.qBm25(et).collect().isEmpty)
    assert(streaming.Events.qRecentWindow(et).collect().isEmpty)
  }

  test("partition-pruned scan reads a data-file-less layout") {
    assert(Layout.q93PartitionPrune(et).collect().isEmpty)
  }

  test("round-6 additions return empty results on empty sources") {
    assert(TextAnalysis.qRepetitionFilter(et).collect().isEmpty)
    assert(TextAnalysis.qDupSpans(et).collect().isEmpty)
    assert(TextAnalysis.qMixtureSchedule(et).collect().isEmpty)
    assert(TextAnalysis.qBudgetSelect(et).collect().isEmpty)
    assert(graft.ops.Dedup.qLeakSafeSplit(et).collect().isEmpty)
    assert(Similarity.qBitextMine(et).collect().isEmpty)
    assert(graft.ops.Multimodal.qFrameSample(et).collect().isEmpty)
    assert(Clustering.qPcaPower(et).collect().isEmpty)
    assert(Clustering.qAbttTop(et).collect().isEmpty)
    assert(TextAnalysis.qBigramLm(et).collect().isEmpty)
    assert(Clustering.qKcenter(et).collect().isEmpty)
    assert(graft.ops.Layout.q154ZorderLayout(et).collect().isEmpty)
    assert(graft.ops.Layout.q155CompactionPlan(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qCmsFreq(et).collect().isEmpty)
    assert(Clustering.qSilhouette(et).collect().isEmpty)
    assert(graft.ops.Relational.q158SnapshotDiff(et).collect().isEmpty)
    assert(graft.streaming.Events.q159LambdaView(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qDailyTrend(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qMadAnomaly(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qGapFill(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qCoOccurrence(et).collect().isEmpty)
    assert(Similarity.qKnnBinary(et).collect().isEmpty)
    assert(Similarity.qRetrievalMetrics(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qTtlPlan(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qPseudonymize(et).collect().isEmpty)
    assert(graft.ops.Affinity.qAffinityProp(et).collect().isEmpty)
    assert(graft.ops.Affinity.qAgglomerative(et).collect().isEmpty)
    assert(TextAnalysis.qConcatChunks(et).collect().isEmpty)
    assert(graft.ops.EventAnalytics.qAudienceOverlap(et).collect().isEmpty)
    assert(TextAnalysis.qParetoFrontier(et).collect().isEmpty)
    // the A/B readout keeps its single row (null stats) on empty input
    assert(graft.ops.EventAnalytics.qAbTest(et).collect().length == 1)
    assert(TextAnalysis.qNgramNovelty(et).collect().isEmpty)
    // FK audit keeps its 7 edge rows (vacuous integrity on empty tables)
    val fk = Profiling.q171FkAudit(et).collect()
    assert(fk.length == 7 && fk.forall(r => r.getLong(3) == 0L && r.getBoolean(5)))
    // chi-square keeps its single (null-stat) readout row; Benford empties
    assert(Profiling.q173ChiSquare(et).collect().length == 1)
    assert(Profiling.q174Benford(et).collect().isEmpty)
    assert(graft.ops.Relational.q175WeightedMedian(et).collect().isEmpty)
    // the correlation matrix keeps its 6 (null-r) pair rows on empty input
    assert(graft.ops.Relational.q176Correlation(et).collect().length == 6)
    assert(graft.ops.EventAnalytics.qRollingActive(et).collect().isEmpty)
    assert(Clustering.qEmbeddingDrift(et).collect().isEmpty)
    // FD discovery keeps its 5 candidate rows with zero counts (the
    // qSplitContamination precedent: vacuous FDs hold on empty input)
    val fd = Profiling.q162FdDiscovery(et).collect()
    assert(fd.length == 5 && fd.forall(r => r.getLong(3) == 0L && r.getBoolean(5)))
    // the contamination audit keeps its two method rows with zero counts
    val audit = graft.ops.Dedup.qSplitContamination(et).collect()
    assert(audit.length == 2 && audit.forall(_.getLong(1) == 0L))
  }

  test("composed pipeline returns an empty summary table") {
    val docs = et.documents
      .selectExpr("doc_id as id", "substring(text, 1, 40) as title", "text")
    assert(Pipeline.newsPipeline(docs).collect().isEmpty)
  }
}
