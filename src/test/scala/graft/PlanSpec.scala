package graft

import graft.ops.{Relational, Similarity}
import graft.plans.IndelRatio
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions (SURVEY.md §4): the optimizations the
  * engine relies on at 100 TB must be visible in the plan, not assumed. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: filters and projection push into the parquet scan") {
    val p = plan(Relational.q02FilterPushdown(sf0001))
    assert(p.contains("PushedFilters"), p.take(800))
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    // column pruning: the scan must not read the unused money columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_discount"),
      s"scan reads pruned columns: $readSchema")
  }

  test("q154/q155: layout queries prune their scans to the key columns") {
    // z-order audit reads ONLY (custkey, orderdate) — the Morton math is
    // scan-stage expressions, never a wide row
    val p154 = plan(ops.Layout.q154ZorderLayout(sf0001))
    val rs154 = p154.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs154.contains("o_totalprice") && !rs154.contains("o_orderpriority"),
      s"q154 scan reads pruned columns: $rs154")
    // compaction planner reads ONLY (doc_id, n_chars) — never the text
    val p155 = plan(ops.Layout.q155CompactionPlan(sf0001))
    val rs155 = p155.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs155.contains("text"), s"q155 scan reads text: $rs155")
  }

  test("q176: the moment matrix is ONE two-phase aggregate, no join") {
    val p = plan(Relational.q176Correlation(sf0001))
    // partial-aggregate before the single exchange; no join of any kind
    assert(p.contains("HashAggregate"), p.take(500))
    assert(!p.contains("Join"), "correlation matrix should not plan a join")
    val exchanges = p.linesIterator.count(l => l.contains("Exchange") &&
      !l.contains("ReusedExchange"))
    assert(exchanges <= 2, s"too many exchanges ($exchanges) for a 1-row aggregate")
  }

  test("q03: dimension joins broadcast; fact join shuffles") {
    val p = plan(Relational.q03StarJoinRevenue(sf0001))
    assert(p.contains("BroadcastHashJoin"), "no broadcast join in star query")
  }

  test("q13: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q13GlobalTopK(sf0001))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("q117: vocab top-k cut plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(graft.ops.TextAnalysis.qZipfFit(sf0001))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q128: band stacking stays a single projection (no union re-execution)") {
    // the 4 band keys come from one explode(array(...)) projection; a
    // 4-way union of selects recomputes the whole signature pipeline per
    // branch (differing band literals defeat exchange reuse — measured
    // 5 s vs 2 s in round 5). Guard against the refactor coming back.
    val p = plan(graft.ops.Dedup.qLshCandidatesGate(sf0001))
    assert(!p.contains("Union"), "q128 plans a Union — band stacking regressed:\n" + p.take(800))
  }

  test("q01: aggregation is two-phase (partial before the exchange)") {
    val p = plan(Relational.q01PricingSummary(sf0001))
    assert(p.contains("HashAggregate"), "no hash aggregate")
    assert(p.contains("Exchange hashpartitioning"), "no shuffle by group keys")
  }

  test("IndelRatio is codegen'd inline (no ScalaUDF / codegen fallback)") {
    import spark.implicits._
    val df = Seq(("abcdefghij", "abcdefghiX")).toDF("a", "b")
      .select(IndelRatio.fuzzRatio(col("a"), col("b")).as("r"))
    assert(df.head().getInt(0) == 90)
    val p = plan(df)
    assert(!p.contains("ScalaUDF"), "IndelRatio fell back to UDF path")
    // interpreted parity with the UDF/driver implementation
    val fr = graft.functions.text.fuzzRatio("kitten", "sitting")
    val viaExpr = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(IndelRatio.fuzzRatio(col("a"), col("b"))).head().getInt(0)
    assert(fr == viaExpr)
  }

  test("IndelRatio fast paths match the reference formula on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    // deterministic xorshift; covers bit-parallel (≤64), DP (>64), unicode
    var s = 0x12345L
    def next(n: Int): Int = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; math.floorMod(s, n).toInt }
    val alphabets = Seq("ab", "abcdefg", "abcdefghijklmnopqrstuvwxyz 0123", "äöüabc日本")
    for (_ <- 1 to 300) {
      val alpha = alphabets(next(alphabets.size))
      def mk(maxLen: Int) = (0 until next(maxLen)).map(_ => alpha(next(alpha.length))).mkString
      val (x, y) = (mk(90), mk(90))
      val want = graft.functions.text.fuzzRatio(x, y)
      val got = IndelRatio.ratio(UTF8String.fromString(x), UTF8String.fromString(y))
      assert(got == want, s"ratio('$x','$y'): got $got want $want")
    }
  }

  test("Levenshtein64 matches UTF8String.levenshteinDistance on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.plans.Levenshtein64
    // deterministic xorshift; covers the bit-parallel path (shorter ≤64),
    // the long fallback, empties, and the non-ASCII fallback
    var s = 0xBEEFL
    def next(n: Int): Int = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; math.floorMod(s, n).toInt }
    val alphabets = Seq("ab", "abcdefg", "abcdefghijklmnopqrstuvwxyz 0123", "äöüabc日本")
    for (_ <- 1 to 400) {
      val alpha = alphabets(next(alphabets.size))
      def mk(maxLen: Int) = (0 until next(maxLen)).map(_ => alpha(next(alpha.length))).mkString
      val (x, y) = (mk(90), mk(90))
      val (ux, uy) = (UTF8String.fromString(x), UTF8String.fromString(y))
      val got = Levenshtein64.dist(ux, uy)
      val want = ux.levenshteinDistance(uy)
      assert(got == want, s"lev('$x','$y'): got $got want $want")
    }
    // codegen path: no UDF fallback and a known value
    import spark.implicits._
    val df = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(Levenshtein64.lev(col("a"), col("b")).as("d"))
    assert(df.head().getInt(0) == 3)
    assert(!plan(df).contains("ScalaUDF"), "Levenshtein64 fell back to UDF path")
  }

  test("knn brute force broadcasts the probe side") {
    // assert on the PRE-BARRIER generator: qKnnBruteForce now reads the
    // session-cached exactTopK localCheckpoint (a LogicalRDD scan — the
    // r11 plan-assert rule), so the broadcast lives in the builder plan
    val p = plan(Similarity.bruteForceTopK(sf0001.embeddings,
      sf0001.embeddings.filter(col("vec_id") < 10), 10))
    assert(p.contains("Broadcast"), "probes not broadcast")
  }

  test("CosineSim is codegen'd inline and matches the kernel arithmetic") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = Array(0.1f, 0.2f, -0.3f, 0.9f)
    val b = Array(0.5f, -0.4f, 0.2f, 0.1f)
    val viaExpr = Seq((a, b)).toDF("a", "b")
      .select(graft.plans.CosineSim.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(viaExpr == graft.functions.fasthash.cosine(a, b))
    assert(graft.plans.CosineSim.sim(
      ArrayData.toArrayData(a), ArrayData.toArrayData(b)) == viaExpr)
    val p = plan(Similarity.qKnnBruteForce(sf0001))
    assert(!p.contains("ScalaUDF"), "cosine still evaluated via UDF path")
  }

  test("q61: pivot with declared values is a single scan of lineitem") {
    val df = Relational.q61Pivot(sf0001)
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if r.getClass.getSimpleName == "LogicalRelation" => r
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
    // one aggregation pass, no join back
    assert(!plan(df).contains("Join"), "pivot should not plan a join")
  }

  test("q63: the sampling predicate stays in the scan stage (no pre-sort shuffle)") {
    val p = plan(Relational.q63HashSample(sf0001))
    // exactly one exchange: the range partitioning for the final sort;
    // sampling itself must not add a shuffle
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"sampling added shuffles:\n${p.take(1200)}")
  }
}
