package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive-training triplet mining — the table an embedding
  * trainer actually consumes: for each anchor, a POSITIVE (its
  * nearest neighbor by exact cosine, the standard self-supervised
  * choice when no labels exist) and `k` hash-drawn NEGATIVES
  * ([[graft.ops.Shuffling.negativeSample]] — rank equi-join, no
  * all-pairs). A negative that collides with the positive is dropped
  * (it would be a false negative); self-collisions are already gone.
  *
  * Scale shape: the positive pass is one top-1 retrieval per anchor
  * (swap [[Ann.lshTopK]]/[[Binary.hammingRerank]] for the brute pass
  * at corpus scale — same output shape), the negative pass is the
  * rank join, and assembly is one anchor-keyed equi-join of two
  * anchor×k-bounded frames.
  *
  * Output: `(anchor_id, pos_id, j, neg_id)`.
  */
object Triplets {

  def mine(
      anchors: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, seed: Long,
  ): DataFrame = {
    val pos = Ann.bruteForceTopK(anchors, corpus, idCol, vecCol, k = 1)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("pos_id"))
    val neg = graft.ops.Shuffling.negativeSample(
      anchors, idCol, corpus, idCol, k, seed)
    pos.join(neg, Seq("anchor_id"))
      .filter(col("neg_id") =!= col("pos_id"))
      .select(col("anchor_id"), col("pos_id"), col("j"), col("neg_id"))
  }

  /** DuckDB rendering of [[mine]] over `embeddings(vec_id,
    * embedding)` with anchors restricted by `anchorWhere`.
    */
  def mineSql(anchorWhere: String, k: Int, seed: Long, dim: Int = 64): String = {
    val nz = s"${Ann.dotSql("embedding", "embedding", dim)} > 0"
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  $anchorWhere AND $nz),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
       |  WHERE $nz),
       |scored AS (SELECT query_id, neighbor_id,
       |    ${Ann.cosineSql("qv", "cv", dim)} AS score
       |  FROM q JOIN c ON query_id <> neighbor_id),
       |pos AS (SELECT query_id AS anchor_id, neighbor_id AS pos_id
       |  FROM (SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id) AS rnk
       |    FROM scored) r WHERE rnk = 1),
       |neg AS (SELECT * FROM (
       |  ${graft.ops.Shuffling.negativeSampleSql(anchorWhere, k, seed)}) n)
       |SELECT anchor_id, pos_id, j, neg_id
       |FROM pos JOIN neg USING (anchor_id)
       |WHERE neg_id <> pos_id
       |ORDER BY anchor_id, j""".stripMargin
  }
}
