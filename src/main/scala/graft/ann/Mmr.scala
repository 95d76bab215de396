package graft.ann

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance — greedy diversified top-k over a
  * retrieved candidate set: pick the most relevant candidate first,
  * then repeatedly the one maximizing
  * `λ·rel − (1−λ)·max_sim_to_already_selected` — the standard
  * redundancy remover for RAG context assembly and diverse few-shot
  * example selection (near-duplicate passages burn context tokens;
  * MMR spends them on coverage).
  *
  * Scale shape: the EXPENSIVE part is candidate retrieval, which is
  * any of the library's top-k paths ([[Ann.bruteForceTopK]],
  * [[Ann.lshTopK]], [[Binary.hammingRerank]]); MMR itself runs on
  * the retrieved `kCand` candidates — a BOUNDED set (tens), so the
  * pairwise-sim frame is kCand² rows computed in Spark and the
  * greedy loop is a bounded driver fold (the BPE-argmax /
  * union-find-arm precedent; nothing corpus-sized ever reaches the
  * driver).
  *
  * Engine-exactness: rel and sim are the library's engine-exact
  * cosines; each round's objective is `0.5·rel − 0.5·msim` in that
  * IEEE op order (λ = 0.5, binary-exact); ties break by id
  * ascending. The oracle unrolls the k rounds as chained CTEs
  * (the BPE-trainer rendering pattern).
  *
  * Output: `(rank, neighbor_id, rel, mmr)` — `mmr` is null for the
  * rank-1 pick (chosen by pure relevance).
  */
object Mmr {

  /** Diversify one query's candidate list. `candidates` must expose
    * `(neighbor_id, score)` (a top-k output filtered to one query);
    * `vectors` maps ids to embeddings for the pairwise sims.
    */
  def diversify(
      candidates: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String, k: Int, lambda: Double = 0.5,
  ): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val spark = candidates.sparkSession
    val cand = candidates.select(col("neighbor_id"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    require(cand.length <= 1000,
      s"MMR candidate set ${cand.length} exceeds the bounded-driver cap")
    val ids = cand.map(_._1).toSet
    // one query's list only: duplicate neighbor ids mean the caller
    // passed a multi-query top-k frame, which would silently collapse
    require(ids.size == cand.length,
      s"duplicate neighbor_id in MMR candidates (${cand.length} rows, " +
        s"${ids.size} distinct) — filter the top-k frame to ONE query first")
    val v = vectors.select(col(idCol).as("id"), col(vecCol))
      .filter(col("id").isInCollection(ids))
    val simRows = v.as("a").join(v.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        Ann.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    def sim(a: Long, b: Long): Double =
      if (a == b) 1.0 else simRows.getOrElse((math.min(a, b), math.max(a, b)), 0.0)

    var selected = Vector.empty[(Long, Double, Option[Double])]
    var remaining = cand.sortBy { case (id, s) => (-s, id) }.toVector
    while (selected.size < math.min(k, cand.length)) {
      if (selected.isEmpty) {
        val (id, s) = remaining.head
        selected :+= ((id, s, None))
        remaining = remaining.filterNot(_._1 == id)
      } else {
        val scored = remaining.map { case (id, s) =>
          val msim = selected.map(t => sim(id, t._1)).max
          (id, s, lambda * s - (1 - lambda) * msim)
        }
        val best = scored.minBy { case (id, _, m) => (-m, id) }
        selected :+= ((best._1, best._2, Some(best._3)))
        remaining = remaining.filterNot(_._1 == best._1)
      }
    }
    val rows = selected.zipWithIndex.map { case ((id, r, m), i) =>
      Row(i + 1, id, r, m.map(java.lang.Double.valueOf).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("neighbor_id", LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("mmr", DoubleType, nullable = true))))
  }

  /** DuckDB rendering of [[diversify]] over a single-query
    * brute-force candidate list: query `queryId`, `kCand` candidates,
    * `k` diversified picks, λ = 0.5 — k rounds unrolled as chained
    * CTEs.
    */
  def diversifySql(queryId: Long, kCand: Int, k: Int, dim: Int = 64): String = {
    val nz = s"${Ann.dotSql("embedding", "embedding", dim)} > 0"
    val base =
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings
         |  WHERE vec_id = $queryId AND $nz),
         |c AS (SELECT vec_id AS id, embedding AS cv FROM embeddings
         |  WHERE vec_id <> $queryId AND $nz),
         |cand AS (SELECT id, cv, ${Ann.cosineSql("qv", "cv", dim)} AS rel
         |  FROM c CROSS JOIN q
         |  ORDER BY rel DESC, id LIMIT $kCand),
         |sims AS (SELECT a.id AS ia, b.id AS ib,
         |    ${Ann.cosineSql("a.cv", "b.cv", dim)} AS sim
         |  FROM cand a JOIN cand b ON a.id < b.id),
         |s1 AS (SELECT id, rel FROM cand ORDER BY rel DESC, id LIMIT 1)""".stripMargin
    val rounds = (2 to k).map { r =>
      val selected = (1 until r).map(i => s"SELECT id FROM s$i").mkString(" UNION ALL ")
      s"""m$r AS (SELECT cand.id, cand.rel,
         |    (SELECT max(sims.sim)
         |     FROM (${selected}) s(sid)
         |     JOIN sims ON (sims.ia = least(s.sid, cand.id)
         |               AND sims.ib = greatest(s.sid, cand.id))) AS msim
         |  FROM cand WHERE cand.id NOT IN (${selected})),
         |s$r AS (SELECT id, rel, 0.5 * rel - 0.5 * msim AS mmr FROM m$r
         |  ORDER BY mmr DESC, id LIMIT 1)""".stripMargin
    }
    val sel = (s"SELECT 1 AS rank, id AS neighbor_id, rel, NULL::DOUBLE AS mmr FROM s1" +:
      (2 to k).map(r =>
        s"SELECT $r AS rank, id AS neighbor_id, rel, mmr FROM s$r"))
      .mkString("\nUNION ALL ")
    (base +: rounds).mkString(",\n") + "\n" + sel + "\nORDER BY rank"
  }
}
