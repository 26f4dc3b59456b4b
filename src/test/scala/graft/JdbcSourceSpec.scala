package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{SourceSpec, ValidationConfig}
import graft.core.ValidationJob
import graft.sources.SourceReader

/** Real JDBC source path (S1-S5) against embedded Derby — the reference's
  * actual shape: one live database side, one other-backend side. Covers
  * dbtable reads, fetchsize, partitioned parallel reads, and a full
  * cross-backend ValidationJob (jdbc vs parquet). */
class JdbcSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val dbPath = {
    val dir = java.nio.file.Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE items (pk INT NOT NULL, val VARCHAR(32), amt DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
    for (i <- 1 to 500) {
      ps.setInt(1, i)
      ps.setString(2, s"name_$i")
      ps.setDouble(3, i * 1.5)
      ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
    s"jdbc:derby:$dir/db"
  }

  private def jdbcSpec(extra: Map[String, String] = Map.empty) = SourceSpec(
    format = "jdbc",
    options = Map(
      "url" -> dbPath,
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "dbtable" -> "items",
      "fetchsize" -> "100") ++ extra)

  test("jdbc source reads through SourceReader") {
    val df = SourceReader.read(spark, jdbcSpec())
    assert(df.count() == 500)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("pk", "val", "amt"))
  }

  test("partitioned parallel jdbc read splits into numPartitions") {
    val df = SourceReader.read(spark, jdbcSpec(Map(
      "partitionColumn" -> "pk", "lowerBound" -> "1",
      "upperBound" -> "500", "numPartitions" -> "4")))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 500)
  }

  test("manual-query escape hatch pushes SQL to the source") {
    val df = SourceReader.read(spark, SourceSpec(
      format = "jdbc",
      options = Map("url" -> dbPath,
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver"),
      query = Some("SELECT pk, val FROM items WHERE pk <= 10")))
    assert(df.count() == 10 && df.columns.length == 2)
  }

  test("cross-backend validation: jdbc (Derby) vs parquet") {
    // parquet side: same rows except pk=7 value changed, pk=500 missing
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    (1 to 499).map(i => (i, if (i == 7) "changed" else s"name_$i"))
      .toDF("pk", "val").write.parquet(s"$dir/t")
    val cfg = ValidationConfig(
      first = jdbcSpec(),
      second = SourceSpec("parquet", path = Some(s"$dir/t")),
      firstName = "derby", secondName = "parquet",
      compositeIdColumns = Seq("pk"), checkColumn = "val",
      dataType = "string", threshold = 1.0)
    val (out, summary) = ValidationJob.run(spark, cfg, writeReports = false)
    assert(out.missingInSecond.as[String].collect().toSeq == Seq("500"))
    assert(out.missingInFirst.count() == 0)
    assert(out.differing.select("id").as[String].collect().toSeq == Seq("7"))
    val s0 = summary.collect()(0)
    assert(s0.getAs[Long]("n_first") == 500 && s0.getAs[Long]("n_differing") == 1)
  }
}
