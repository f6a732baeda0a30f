package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger scale factor from an existing testdata dir
  * (VERDICT r8 item 7 — a measured scaling data point for the suite's
  * 100 TB design arguments, since the driver ships sf0.1 as its largest).
  *
  * `runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf0.3 3` unions K
  * key-shifted copies of every table, preserving the driver layout exactly
  * (one single-row-group parquet FILE per table — so the fanout invariant
  * and the streaming symlink path behave identically at the new SF):
  *  - every key column (custkey/orderkey/partkey/suppkey/event_id/doc_id/
  *    vec_id/user_id) shifts by copy*100M, keeping FK joins consistent
  *    within each copy and ids globally unique;
  *  - tiny dims (region, nation) are copied as-is, like TPC-H;
  *  - document text gets a per-copy suffix (a verbatim copy would triple
  *    the exact-dup population and distort dedup timings);
  *  - embeddings rotate by copy index (distinct vectors, identical norms);
  *  - events keep their timestamps: K× event density per window is the
  *    realistic scaling shape for a stream table.
  */
object ScaleUp {
  private val Offset = 100000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf0.3"
    val k = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // Write as a single parquet FILE named <name>.parquet (driver layout):
    // coalesce(1) into a temp dir, then move the lone part file into place.
    def writeFile(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-scaleup-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      require(part.length == 1, s"$name: expected 1 part file, got ${part.length}")
      val out = java.nio.file.Paths.get(dst, s"$name.parquet")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.move(java.nio.file.Paths.get(part(0)), out,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      println(s"[scaleup] $name -> $out")
    }

    def shifted(df: DataFrame, keys: Seq[String])(extra: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map { i =>
        val base = keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Offset)))
        extra(base, i)
      }.reduce(_ unionByName _)

    def identityExtra(d: DataFrame, @annotation.unused i: Int): DataFrame = d

    writeFile(read("region"), "region")
    writeFile(read("nation"), "nation")
    writeFile(shifted(read("customer"), Seq("c_custkey"))(identityExtra), "customer")
    writeFile(shifted(read("supplier"), Seq("s_suppkey"))(identityExtra), "supplier")
    writeFile(shifted(read("part"), Seq("p_partkey"))(identityExtra), "part")
    writeFile(shifted(read("orders"), Seq("o_orderkey", "o_custkey"))(identityExtra), "orders")
    writeFile(shifted(read("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey"))(identityExtra), "lineitem")
    writeFile(shifted(read("events"), Seq("event_id", "user_id"))(identityExtra), "events")
    writeFile(shifted(read("documents"), Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" v$i")))
        .withColumn("n_chars", col("n_chars") + lit(3L))
    }, "documents")
    writeFile(shifted(read("embeddings"), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        concat(slice(col("embedding"), lit(i + 1), size(col("embedding")) - lit(i)),
          slice(col("embedding"), lit(1), lit(i))))
    }, "embeddings")

    spark.stop()
  }
}
