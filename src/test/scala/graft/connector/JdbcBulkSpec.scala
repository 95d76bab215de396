package graft.connector

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class JdbcBulkSpec extends AnyFunSuite with SparkSpec {

  test("bulk append writes partitions in parallel over JDBC") {
    val url = "jdbc:derby:memory:graft_bulk;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE nations (n_nationkey INT, n_name VARCHAR(50))")
    c.commit(); c.close()

    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .selectExpr("CAST(n_nationkey AS INT) AS n_nationkey", "n_name")
    JdbcBulk.append(df, url, "nations", numPartitions = 4)

    val c2 = DriverManager.getConnection(url)
    val rs = c2.createStatement().executeQuery("SELECT count(*) FROM nations")
    rs.next()
    assert(rs.getInt(1) == 25)
    c2.close()
  }
}
