package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CDC changelog materialization: last-writer-wins, delete semantics,
  * insert-then-delete churn, and the apply ≡ fold-per-op law.
  */
class ChangelogSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // base snapshot: keys 1..4
  private def base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "tag", "v")

  // changelog: k=2 updated twice (seq 5 wins), k=3 deleted,
  // k=5 inserted, k=6 inserted then deleted, k=4 untouched... k=1
  // updated then deleted then re-inserted (seq 9 wins).
  private def log = Seq(
    (2L, 1L, "U", "b1", 21L),
    (2L, 5L, "U", "b2", 22L),
    (3L, 2L, "D", "c", 30L),
    (5L, 3L, "I", "e", 50L),
    (6L, 4L, "I", "f", 60L),
    (6L, 6L, "D", "f", 60L),
    (1L, 7L, "U", "a1", 11L),
    (1L, 8L, "D", "a1", 11L),
    (1L, 9L, "I", "a2", 12L))
    .toDF("k", "seq", "op", "tag", "v")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  test("apply: last writer wins, deletes drop, untouched pass through") {
    val out = Changelog.apply(base, log, "k", "seq", "op")
    assert(out.columns.toSeq == Seq("k", "tag", "v"))
    assert(snap(out) == Set(
      (1L, "a2", 12L),  // U,D,I chain — final insert wins
      (2L, "b2", 22L),  // second update wins
      (4L, "d", 40L),   // untouched
      (5L, "e", 50L)))  // new insert
    // 3 deleted, 6 inserted-then-deleted: both absent
  }

  test("apply equals the sequential per-op fold") {
    // the one-shot batch apply must agree with replaying the log one
    // operation at a time in seq order (the semantic definition)
    val ops = log.orderBy("seq").collect()
    val folded = ops.foldLeft(base) { (acc, r) =>
      val k = r.getLong(0)
      val rest = acc.filter(col("k") =!= k)
      if (r.getString(2) == "D") rest
      else rest.unionByName(
        Seq((k, r.getString(3), r.getLong(4))).toDF("k", "tag", "v"))
    }
    assert(snap(Changelog.apply(base, log, "k", "seq", "op")) ==
      snap(folded))
  }

  test("apply with an empty changelog is the identity") {
    val out = Changelog.apply(base, log.limit(0), "k", "seq", "op")
    assert(snap(out) == snap(base))
  }

  test("netEffect classifies all four outcomes") {
    val out = Changelog.netEffect(
      base.select("k"), log, "k", "seq", "op")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(out == Map(
      1L -> ((3L, "I", "update")),  // in base, survives → update
      2L -> ((2L, "U", "update")),
      3L -> ((1L, "D", "delete")),
      5L -> ((1L, "I", "insert")),
      6L -> ((2L, "D", "noop"))))   // churn: never reaches the base
  }

  test("conflicts: only doubly-touched keys, delete_delete separated") {
    val txnA = Seq(
      (1L, 1L, "U", "a", 1L), (2L, 2L, "D", "b", 2L),
      (3L, 3L, "U", "c", 3L), (3L, 4L, "D", "c", 3L), // A's winner: D
      (7L, 5L, "U", "g", 7L))                          // A-only
      .toDF("k", "seq", "op", "tag", "v")
    val txnB = Seq(
      (1L, 11L, "D", "a", 1L), (2L, 12L, "D", "b", 2L),
      (3L, 13L, "D", "c", 3L),
      (9L, 14L, "I", "i", 9L))                         // B-only
      .toDF("k", "seq", "op", "tag", "v")
    val got = Changelog.conflicts(txnA, txnB, "k", "seq", "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, "U", "D", "write_write"),
      (2L, "D", "D", "delete_delete"),
      (3L, "D", "D", "delete_delete"))) // A's U superseded by its own D
  }

  test("netEffect names match what apply does") {
    val applied = Changelog.apply(base, log, "k", "seq", "op")
      .select("k").as[Long].collect().toSet
    val net = Changelog.netEffect(base.select("k"), log, "k", "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val baseKeys = Set(1L, 2L, 3L, 4L)
    for ((k, n) <- net) n match {
      case "delete" => assert(baseKeys(k) && !applied(k), s"k=$k")
      case "noop"   => assert(!baseKeys(k) && !applied(k), s"k=$k")
      case "update" => assert(baseKeys(k) && applied(k), s"k=$k")
      case "insert" => assert(!baseKeys(k) && applied(k), s"k=$k")
    }
  }
}
