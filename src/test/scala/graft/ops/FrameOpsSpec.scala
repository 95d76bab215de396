package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft._

/** Ports of `/root/reference/tests/test_dataframe_operations.py` and
  * `tests/test_connector.py:20-40` (preprocess/postprocess).
  */
class FrameOpsSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  private def df(pairs: (String, Seq[Any])*) = {
    val names = pairs.map(_._1)
    val rows = pairs.head._2.indices.map(i => Row(pairs.map(_._2(i)): _*))
    val fields = pairs.map { case (n, vs) =>
      val dt = vs.find(_ != null) match {
        case Some(_: Int)    => org.apache.spark.sql.types.IntegerType
        case Some(_: Long)   => org.apache.spark.sql.types.LongType
        case Some(_: Double) => org.apache.spark.sql.types.DoubleType
        case _               => org.apache.spark.sql.types.StringType
      }
      org.apache.spark.sql.types.StructField(n, dt, nullable = true)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(fields))
  }

  test("preprocess renames and dedups (connector.py:26-40)") {
    val d = df("a" -> Seq("x", "x", "y"), "b" -> Seq(1, 1, 2))
    val out = FrameOps.preprocess(d, Map("a" -> "naam"))
    assert(out.columns.toSeq == Seq("naam", "b"))
    assert(out.count() == 2)
  }

  test("postprocess inverts rename only for present columns (connector.py:43-59)") {
    val d = df("naam" -> Seq("x"), "b" -> Seq(1))
    val out = FrameOps.postprocess(d.drop("b"), Map("a" -> "naam", "c" -> "gone"))
    assert(out.columns.toSeq == Seq("a"))
  }

  test("preprocess∘postprocess restores names (test_connector.py:20-40)") {
    val d = df("a" -> Seq("x", "y"), "b" -> Seq(1, 2))
    val m = Map("a" -> "t.a", "b" -> "t.b")
    val out = FrameOps.postprocess(FrameOps.preprocess(d, m), m)
    assert(out.columns.toSeq == Seq("a", "b"))
  }

  test("hasNulls (dataframe_operations.py:12-16)") {
    assert(FrameOps.hasNulls(df("a" -> Seq(null, "x"))))
    assert(!FrameOps.hasNulls(df("a" -> Seq("x", "y"))))
    // empty frame counts as has-nulls in the reference
    assert(FrameOps.hasNulls(df("a" -> Seq("x")).filter(lit(false))))
  }

  test("getRows projects and dedups (dataframe_operations.py:59-76)") {
    val d = df("a" -> Seq("x", "x"), "b" -> Seq(1, 1), "c" -> Seq(9, 8))
    val out = FrameOps.getRows(d, Seq("a", "b"))
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.count() == 1)
    intercept[IllegalArgumentException](FrameOps.getRows(d, Seq("nope")))
  }

  test("matchTypes casts to target schema (dataframe_operations.py:79-103)") {
    val target = df("a" -> Seq(1), "b" -> Seq("s"))
    val dbLike = df("a" -> Seq("2"), "b" -> Seq("t"))
    val out = FrameOps.matchTypes(dbLike, target.schema)
    assert(out.schema("a").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("matchTypes raises MatchDatatypesError-labeled on an impossible cast " +
    "(dataframe_operations.py:101-103), even with ANSI off") {
    val target = df("a" -> Seq(1))
    val dbLike = df("a" -> Seq("not-a-number"))
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      // ANSI off is the dangerous mode: a bare cast would silently
      // null the value; the guard must still fail loudly
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val e = intercept[Exception](
        FrameOps.matchTypes(dbLike, target.schema).collect())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("MatchDatatypesError")),
        s"expected MatchDatatypesError-labeled failure, got: $e")
      // nulls pass through untouched — only non-null corruption raises
      val okNull = df("a" -> Seq[String](null))
      assert(FrameOps.matchTypes(okNull, target.schema).collect()(0).isNullAt(0))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("mergeIds joins ids null-safely (dataframe_operations.py:106-161)") {
    val data = df("naam" -> Seq("een", "twee", null))
    val dbRows = df("id" -> Seq(1, 2, 3), "naam" -> Seq("een", "twee", null))
    val out = FrameOps.mergeIds(data, dbRows, "id", "a")
    assert(out.columns.toSeq == Seq("naam", "id"))
    assert(out.count() == 3)
    // null joined to null (nulls_equal=True)
    assert(out.filter(col("naam").isNull && col("id") === 3).count() == 1)
  }

  test("mergeIds rejects missing ids (MissingKeysAfterMergeError)") {
    val data = df("naam" -> Seq("een", "onbekend"))
    val dbRows = df("id" -> Seq(1), "naam" -> Seq("een"))
    intercept[MissingKeysAfterMergeError](
      FrameOps.mergeIds(data, dbRows, "id", "a"))
  }

  test("mergeIds duplication guard (dataframe_operations.py:143-148)") {
    val data = df("naam" -> Seq("een"))
    val dbRows = df("id" -> Seq(1, 2), "naam" -> Seq("een", "een"))
    intercept[AssertionError](FrameOps.mergeIds(data, dbRows, "id", "a"))
    val out = FrameOps.mergeIds(data, dbRows, "id", "a", allowDuplication = true)
    assert(out.count() == 2)
  }

  test("compareFrames exact (dataframe_operations.py:19-56)") {
    val a = df("x" -> Seq("1", "2"), "y" -> Seq("a", null))
    val sameSet = df("x" -> Seq("2", "1", "1"), "y" -> Seq(null, "a", "a"))
    FrameOps.compareFrames(a, sameSet, exact = true) // set-equal, dups ignored

    val extra = df("x" -> Seq("1", "2", "3"), "y" -> Seq("a", null, "c"))
    intercept[CompareNoExactMatchError](
      FrameOps.compareFrames(a, extra, exact = true))
  }

  test("compareFrames non-exact drops nulls then requires containment") {
    val a = df("x" -> Seq("1", "2"), "y" -> Seq("a", null))
    val dbOnlyFull = df("x" -> Seq("1", "9"), "y" -> Seq("a", "z"))
    // row ("2", null) dropped before check; ("1","a") present -> ok
    FrameOps.compareFrames(a, dbOnlyFull, exact = false)

    val dbMissing = df("x" -> Seq("9"), "y" -> Seq("z"))
    intercept[CompareMissingRowsError](
      FrameOps.compareFrames(a, dbMissing, exact = false))
  }

  test("dropReplaced tolerant of absent columns (test_bugs.py:192-220)") {
    val d = df("a" -> Seq("x"), "b" -> Seq(1))
    assert(FrameOps.dropReplaced(d, Seq("b", "absent")).columns.toSeq == Seq("a"))
  }
}
