package graft.connector

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft._

/** Ports of the reference's production-bug regression suite
  * (`/root/reference/tests/test_bugs.py`) that exercise the connector
  * end-to-end (planner-level cases live in PlannerSpec).
  */
class BugZooSpec extends AnyFunSuite with SparkSpec {

  private var dbCounter = 100
  private def freshDb(): String = {
    dbCounter += 1
    s"jdbc:derby:memory:graft_bug_$dbCounter;create=true"
  }

  private def ddl(url: String, statements: String*): Unit = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    statements.foreach(st.execute)
    st.close(); c.commit(); c.close()
  }

  private def df(schema: Seq[(String, String)], rows: Seq[Seq[Any]]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2),
      StructType(schema.map {
        case (n, "int") => StructField(n, IntegerType, nullable = true)
        case (n, _)     => StructField(n, StringType, nullable = true)
      }))

  test("duplicates+missings: exact compare raises, non-exact loads (test_bugs.py:115-142)") {
    val url = freshDb()
    ddl(url,
      "CREATE TABLE a (id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, a INT NOT NULL UNIQUE)",
      "CREATE TABLE b (a_id INT REFERENCES a (id), b INT NOT NULL UNIQUE)",
      "CREATE TABLE c (a_id INT REFERENCES a (id), c VARCHAR(20) NOT NULL UNIQUE)")
    val data = df(
      Seq("a" -> "int", "b" -> "int", "c" -> "str"),
      Seq(Seq(1, 2, null), Seq(1, 2, "a")))

    intercept[CompareNoExactMatchError] {
      Connector.withConnection(spark, url)(c => c.load(data))
    }
    // rollback wiped the failed attempt; non-exact load succeeds
    Connector.withConnection(spark, url)(c => c.load(data, exact = false))
  }

  test("raw FK ids: bare ambiguous, prefixed loads (test_bugs.py:223-252)") {
    val url = freshDb()
    ddl(url,
      "CREATE TABLE a (id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, a VARCHAR(20) NOT NULL UNIQUE)",
      "CREATE TABLE b (id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, " +
        "a_id INT REFERENCES a (id), b VARCHAR(20) NOT NULL UNIQUE)",
      "CREATE TABLE c (a_id INT REFERENCES a (id), b_id INT REFERENCES b (id), " +
        "c VARCHAR(20) NOT NULL UNIQUE)",
      // Derby enforces FKs (SQLite's pragma is off in the reference
      // test) — pre-populate the referenced rows
      "INSERT INTO a (a) VALUES ('x'), ('y'), ('z')",
      "INSERT INTO b (a_id, b) VALUES (1, 'p'), (2, 'q'), (3, 'r')")
    val data = df(
      Seq("a_id" -> "int", "b_id" -> "int", "c" -> "str"),
      Seq(Seq(1, 1, "one"), Seq(2, 2, "two"), Seq(3, 3, "three")))

    intercept[ColumnIsAmbiguousError] {
      Connector.withConnection(spark, url)(c => c.load(data))
    }
    Connector.withConnection(spark, url) { c =>
      c.load(data, columns = Map("a_id" -> "c.a_id"), compare = false)
      val back = JdbcFrames.queryToDataFrame(spark, c.conn,
        "SELECT a_id, b_id, c FROM c ORDER BY a_id", lowercaseLabels = true)
      assert(back.count() == 3)
      assert(back.collect().map(_.getString(2)).toSeq == Seq("one", "two", "three"))
    }
  }
}
