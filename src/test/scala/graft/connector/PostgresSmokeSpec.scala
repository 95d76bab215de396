package graft.connector

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Live-Postgres smoke for [[PostgresJdbcDialect]]. Canceled (not
  * failed) when no pgjdbc driver or no server is reachable — the same
  * posture as the reference's own Postgres integration test, which
  * skips without a local server
  * (`/root/reference/tests/test_postgres_connector.py:48`). Point
  * `GRAFT_PG_URL` at a server (e.g.
  * `jdbc:postgresql://localhost:5432/graft?user=graft&password=x`)
  * to run it for real; the SQL-text parity of the dialect is covered
  * unconditionally in DerbyConnectorSpec's exact-string tests.
  */
class PostgresSmokeSpec extends AnyFunSuite with SparkSpec {

  private def strDf(pairs: (String, Seq[String])*): DataFrame = {
    val rows = pairs.head._2.indices.map(i => Row(pairs.map(_._2(i)): _*))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(pairs.map(p => StructField(p._1, StringType, nullable = true))))
  }

  test("insert_and_retrieve_ids round-trip against a live Postgres (skipped without one)") {
    val driverPresent =
      try { Class.forName("org.postgresql.Driver"); true }
      catch { case _: ClassNotFoundException => false }
    assume(driverPresent, "no pgjdbc driver on the classpath")
    val url = sys.env.getOrElse("GRAFT_PG_URL", "")
    assume(url.nonEmpty, "GRAFT_PG_URL not set")

    val setup = DriverManager.getConnection(url)
    try {
      val st = setup.createStatement()
      st.execute("DROP TABLE IF EXISTS graft_smoke_b")
      st.execute("DROP TABLE IF EXISTS graft_smoke_a")
      st.execute("CREATE TABLE graft_smoke_a (id SERIAL PRIMARY KEY, a VARCHAR(50) NOT NULL UNIQUE)")
      st.execute(
        "CREATE TABLE graft_smoke_b (a_id INT REFERENCES graft_smoke_a (id), b VARCHAR(50) NOT NULL UNIQUE)")
      st.close()
    } finally setup.close()

    val data = strDf("a" -> Seq("one", "two", "three"))
    Connector.withConnection(spark, url, PostgresJdbcDialect,
      schemaPattern = "public") { c =>
      val replaced = c.insertAndRetrieveIds(data, "graft_smoke_a", "a_id")
      assert(replaced.columns.contains("a_id"))
      assert(replaced.count() == 3)
      // conflict-ignore: re-inserting the same rows must not duplicate
      val again = c.insertAndRetrieveIds(data, "graft_smoke_a", "a_id")
      assert(again.select("a_id").distinct().count() == 3)
    }
  }
}
