package graft
import org.apache.spark.sql.SparkSession
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("v_diff_numeric", "q1_agg", "q5_join", "t_ann_topk", "v_missing_first")
    for (q <- qs) {
      println(s"\n########## $q ##########")
      println(SparkEntry.queries(q)(s, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    s.stop()
  }
}
