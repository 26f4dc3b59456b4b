package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only generator for the round-17 larger-SF perf spot-check: writes
  * `/tmp/sfbig` = sf0.1 replicated `factor` times with shifted ids (plus
  * the small dimension tables copied as-is), so data-bound behavior can
  * be separated from the sf0.1 fixed overheads. Not part of any gate. */
object BigGen {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(16)
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/sfbig"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def rep(name: String, idCols: Seq[String], shift: Long): Unit = {
      val t = s.read.parquet(s"$src/$name.parquet")
      val copies = (0 until factor).map { k =>
        idCols.foldLeft(t) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * shift)) }
      }
      copies.reduce(_ unionByName _)
        .repartition(8)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"$name x$factor written")
    }
    rep("documents", Seq("doc_id"), 10000000L)
    rep("embeddings", Seq("vec_id"), 10000000L)
    rep("orders", Seq("o_orderkey"), 100000000L)
    rep("lineitem", Seq("l_orderkey"), 100000000L)
    for (small <- Seq("region", "nation", "customer", "supplier", "part",
        "events")) {
      s.read.parquet(s"$src/$small.parquet")
        .write.mode("overwrite").parquet(s"$out/$small.parquet")
      println(s"$small copied")
    }
    s.stop()
  }
}
