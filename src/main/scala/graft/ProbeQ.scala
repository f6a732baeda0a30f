package graft
import org.apache.spark.sql.SparkSession
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    args.foreach { qname =>
      val fn = SparkEntry.queries(qname)
      // warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        System.err.println(f"[probe] $qname rep$rep construct ${(t1-t0)/1e9}%.2f s action ${(t2-t1)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
