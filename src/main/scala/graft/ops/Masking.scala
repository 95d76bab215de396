package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Sketches
import graft.text.TextFunctions

/** Span-corruption planning (T5/UL2-style denoising objectives): pick
  * ~`pct`% of token positions by a DETERMINISTIC per-(doc, position)
  * hash coin, then merge adjacent picks into contiguous mask spans —
  * the `(start, len)` plan a training-example writer consumes to cut
  * sentinel-delimited inputs/targets. Hash-keyed rather than RNG so
  * the plan is reproducible run-over-run, shardable (no RNG state
  * crosses partitions — the [[Sampling]] argument), and
  * oracle-checkable value-for-value.
  *
  * Span merging is the classic gaps-and-islands: island id =
  * `pos − row_number()` within the document's picked positions, one
  * doc-keyed window — at 100 TB the window partitions by document
  * (bounded by doc length), never globally.
  *
  * Output: `(id, span_idx, start_tok, span_len)` — 1-based token
  * positions, `span_idx` 1-based in position order.
  */
object Masking {

  /** Deterministic coin: true iff md5(`id:pos:salt`) lands below
    * `pct` of the 60-bit hash span scaled to percent (integer
    * compare, engine-exact).
    */
  private def picked(id: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column, pct: Int, salt: Long) =
    Sketches.kmvHash(concat_ws(":", id.cast("string"),
      pos.cast("string"), lit(salt.toString))) % 100 < pct

  /** Mask-span plan over whitespace tokens of `textCol`. */
  def spanPlan(
      df: DataFrame, idCol: String, textCol: String,
      pct: Int = 15, salt: Long = 42L): DataFrame = {
    require(pct >= 1 && pct <= 99, s"pct $pct must be in [1, 99]")
    val positions = df.select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(lower(col(textCol))))
          .as(Seq("p0", "__tok")))
      .select(col("id"), (col("p0") + 1).as("pos"))
      .filter(picked(col("id"), col("pos"), pct, salt))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    positions
      .withColumn("__island", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).cast("int").as("start_tok"),
        count(lit(1)).cast("int").as("span_len"))
      .withColumn("span_idx", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("start_tok"))).cast("int"))
      .select(col("id"), col("span_idx"), col("start_tok"), col("span_len"))
  }

  /** DuckDB rendering of [[spanPlan]] over `documents(doc_id, text)`
    * restricted by `whereClause`.
    */
  def spanPlanSql(
      whereClause: String, pct: Int = 15, salt: Long = 42L): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "lower(text)")
    val (hash, _) = Sketches.kmvHashSql(
      s"(CAST(id AS VARCHAR) || ':' || CAST(pos AS VARCHAR) || ':' || '$salt')")
    s"""WITH d AS (SELECT doc_id AS id, $toks AS t FROM documents $whereClause),
       |p AS (SELECT id, CAST(i AS INT) AS pos
       |  FROM d, unnest(range(1, len(t) + 1)) AS u(i)),
       |picked AS (SELECT id, pos FROM p WHERE $hash % 100 < $pct),
       |isl AS (SELECT id, pos,
       |    pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS island
       |  FROM picked),
       |sp AS (SELECT id, island, CAST(min(pos) AS INT) AS start_tok,
       |    CAST(count(*) AS INT) AS span_len
       |  FROM isl GROUP BY id, island)
       |SELECT id, CAST(row_number() OVER (PARTITION BY id
       |    ORDER BY start_tok) AS INT) AS span_idx, start_tok, span_len
       |FROM sp ORDER BY id, span_idx""".stripMargin
  }
}
