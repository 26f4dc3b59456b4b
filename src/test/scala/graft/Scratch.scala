package graft
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase profiler (not part of the shipped surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    SparkEntry.queries("t_pagerank")(s, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    for (round <- 1 to 2) {
      System.err.println(s"=== round $round ===")
      def t(name: String) = s.read.parquet(s"$sfDir/$name.parquet")
      val cs = phase("edges construct+noop") {
        val cs = t("orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t("lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("a"),
            concat(lit("s"), col("l_suppkey")).as("b"))
          .distinct()
        cs.write.mode("overwrite").format("noop").save()
        cs
      }
      val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
      phase("pageRank string ids") {
        graft.ops.Graph.pageRank(edges, "a", "b", iterations = 3)
          .orderBy(col("rank").desc, col("node"))
          .limit(50)
          .write.mode("overwrite").format("noop").save()
      }
      // integer-id variant: custkey*2 / suppkey*2+1, decode at the end
      val csI = t("orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t("lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
      val edgesI = csI.unionByName(csI.select(col("b").as("a"), col("a").as("b")))
      val edgesE = csI.select(explode(array(
          struct(col("a"), col("b")),
          struct(col("b").as("a"), col("a").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
      phase("pageRank int ids + explode symmetrize") {
        graft.ops.Graph.pageRank(edgesE, "a", "b", iterations = 3)
          .select(
            when(col("node") % 2 === 0, concat(lit("c"), expr("node div 2")))
              .otherwise(concat(lit("s"), expr("(node - 1) div 2"))).as("node"),
            col("rank"))
          .orderBy(col("rank").desc, col("node"))
          .limit(50)
          .write.mode("overwrite").format("noop").save()
      }
      phase("pageRank int ids") {
        graft.ops.Graph.pageRank(edgesI, "a", "b", iterations = 3)
          .select(
            when(col("node") % 2 === 0, concat(lit("c"), (col("node") / 2).cast("long")))
              .otherwise(concat(lit("s"), ((col("node") - 1) / 2).cast("long"))).as("node"),
            col("rank"))
          .orderBy(col("rank").desc, col("node"))
          .limit(50)
          .write.mode("overwrite").format("noop").save()
      }
    }
    s.stop()
  }
}
