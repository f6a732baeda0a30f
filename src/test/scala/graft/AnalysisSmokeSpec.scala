package graft

/** All-queries analysis gate (VERDICT r7 item 4): an environment shift —
  * e.g. Spark 4.1.2 changing the events.parquet read type — killed 32
  * queries at ANALYSIS time without any code change. This spec forces
  * analysis of every `SparkEntry.queries` entry against sf0.001, so a
  * schema/type flip surfaces at round start instead of in the driver's
  * correctness sweep.
  *
  * Queries that do eager work at DataFrame-construction time (streaming
  * AvailableNow passes, star contraction, ML fits) pay that work here at
  * the smallest SF — that is the point: construction IS their analysis
  * surface, and q101's silent wrong answers lived exactly there.
  */
class AnalysisSmokeSpec extends SparkSpec {

  test("every SparkEntry query analyzes against sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, "/root/testdata/sf0.001").queryExecution.analyzed
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.toString.linesIterator.next()}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }
}
