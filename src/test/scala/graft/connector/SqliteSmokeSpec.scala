package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Armed end-to-end coverage for the reference's PRIMARY backend
  * (`sql_autoloader/sqlite_connector.py:173-204`). This environment
  * ships no sqlite-jdbc jar (offline, unmanaged Spark classpath), so
  * the test CANCELS (not fails) on the driver-presence guard — the
  * mirror image of PostgresSmokeSpec, and of the reference skipping
  * its own Postgres integration without a server
  * (`tests/test_postgres_connector.py:48`). Drop any sqlite-jdbc jar
  * on the test classpath and this runs for real with zero edits:
  * file-backed database, full insert/retrieve lifecycle, conflict-
  * ignore re-insert. The SQL-text parity of [[SqliteDialect]] /
  * [[SqliteJdbcDialect]] is covered unconditionally in
  * DerbyConnectorSpec's exact-string tests.
  */
class SqliteSmokeSpec extends AnyFunSuite with SparkSpec {

  private def strDf(pairs: (String, Seq[String])*): DataFrame = {
    val rows = pairs.head._2.indices.map(i => Row(pairs.map(_._2(i)): _*))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(pairs.map(p => StructField(p._1, StringType, nullable = true))))
  }

  test("insert_and_retrieve_ids round-trip against sqlite-jdbc (skipped without the driver)") {
    val driverPresent =
      try { Class.forName("org.sqlite.JDBC"); true }
      catch { case _: ClassNotFoundException => false }
    assume(driverPresent, "no sqlite-jdbc driver on the classpath")

    val dbFile = Files.createTempFile("graft_sqlite_smoke", ".db")
    val url = s"jdbc:sqlite:$dbFile"
    val setup = java.sql.DriverManager.getConnection(url)
    try {
      val st = setup.createStatement()
      st.execute("CREATE TABLE smoke_a (id INTEGER PRIMARY KEY AUTOINCREMENT, " +
        "a TEXT NOT NULL UNIQUE)")
      st.execute("CREATE TABLE smoke_b (a_id INT REFERENCES smoke_a (id), " +
        "b TEXT NOT NULL UNIQUE)")
      st.close()
    } finally setup.close()

    try {
      val data = strDf("a" -> Seq("one", "two", "three"))
      // sqlite-jdbc exposes tables under a null schema; "%" matches it
      // through the standard JDBC pattern rules
      Connector.withConnection(spark, url, SqliteJdbcDialect,
        schemaPattern = "%") { c =>
        val replaced = c.insertAndRetrieveIds(data, "smoke_a", "a_id")
        assert(replaced.columns.contains("a_id"))
        assert(replaced.count() == 3)
        // INSERT OR IGNORE: re-inserting the same rows must not duplicate
        val again = c.insertAndRetrieveIds(data, "smoke_a", "a_id")
        assert(again.select("a_id").distinct().count() == 3)
      }
    } finally Files.deleteIfExists(dbFile)
  }
}
