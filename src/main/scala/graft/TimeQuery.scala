package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named SparkEntry queries against SPARK_GRAFT_SF_DIR
  * (default sf0.1), one warm run at sf0.001 first, like graft.Bench.
  * Usage: runMain graft.TimeQuery <query> [query ...] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save() // JIT warm
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        System.err.println(f"TIME $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
