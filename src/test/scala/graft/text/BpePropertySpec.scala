package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property layer for the BPE trainer: the distributed implementation
  * must equal an independent sequential in-test reference (plain
  * Scala, no Spark, no shared code) on randomized corpora — merges,
  * final segmentation, and the saved-merges replay. Seeded Gen chain
  * like FrameOpsPropertySpec (scalatestplus is unavailable offline).
  */
class BpePropertySpec extends AnyFunSuite with SparkSpec {

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 7)
    // tight alphabet forces merge collisions, runs, and ties
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(1, 8)
    docs <- Gen.listOfN(nDocs, for {
      nw <- Gen.choose(1, 10)
      ws <- Gen.listOfN(nw, wordGen)
    } yield ws.mkString(" "))
  } yield docs

  /** Sequential reference: census → k rounds of (count adjacent pairs
    * weighted by freq; argmax by (n desc, lhs, rhs); greedy
    * left-to-right merge). Independent of the production code.
    */
  private def reference(
      docs: Seq[String], k: Int, minFreq: Long,
  ): (Seq[(String, String, Long)], Map[String, List[String]]) = {
    val census = docs.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var seg: Map[String, List[String]] =
      census.keys.map(w => w -> w.map(_.toString).toList).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    (1 to k).foreach { _ =>
      if (!done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, syms) <- seg; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
          counts((a, b)) = counts.getOrElse((a, b), 0L) + census(w)
        if (counts.isEmpty) done = true
        else {
          val ((a, b), n) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          if (n < minFreq) done = true
          else {
            merges += ((a, b, n))
            seg = seg.map { case (w, syms) =>
              val out = scala.collection.mutable.ListBuffer.empty[String]
              for (x <- syms) {
                if (out.nonEmpty && out.last == a && x == b)
                  out(out.length - 1) = a + b
                else out += x
              }
              w -> out.toList
            }
          }
        }
      }
    }
    (merges.toSeq, seg)
  }

  private def iterate[A](gen: Gen[A], n: Int)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(11L)
    (1 to n).foreach { _ =>
      body(gen.pureApply(params, seed))
      seed = seed.next
    }
  }

  test("trainer ≡ sequential reference on random corpora (merges, segmentation, replay)") {
    import spark.implicits._
    iterate(corpusGen, 8) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val census = Bpe.wordCensus(df, "text")
      val (merges, seg) = Bpe.train(census, numMerges = 4)
      val (wantMerges, wantSeg) = reference(docs, k = 4, minFreq = 2L)
      assert(merges == wantMerges, s"corpus $docs: merges $merges != $wantMerges")
      val gotSeg = seg.collect()
        .map(r => r.getAs[String]("word") -> r.getSeq[String](2).toList).toMap
      assert(gotSeg == wantSeg, s"corpus $docs: seg $gotSeg != $wantSeg")
      val replayed = Bpe.segmentWords(census.select("word"),
        merges.map(m => (m._1, m._2)))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(replayed == wantSeg, s"corpus $docs: replay $replayed != $wantSeg")
    }
  }
}
