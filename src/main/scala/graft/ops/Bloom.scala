package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter join pruning — the runtime-filter
  * pattern every warehouse engine plays at scale (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injects exactly this
  * shape into shuffle joins): when the dimension side of a semi join
  * is too large to broadcast AS ROWS but its KEY SET compresses into
  * a few KB of bloom bits, broadcast the bits instead, drop
  * non-matching fact rows MAP-SIDE, and let the exact join shuffle
  * only the survivors. False positives are fine — the exact join
  * removes them — so the final result is identical to the plain
  * join; what changes is the bytes moved: O(survivors), not O(fact).
  *
  * Determinism: where engine-native bloom filters hash privately,
  * this one is md5-keyed ([[Sketches.kmvHash]] per probe seed) with
  * a pinned layout — `m` bits as `m/32` BIGINT words of 32 bits each (bit 63 is
  * never used: DuckDB range-checks signed shifts, so `1 << 63`
  * would raise there while Spark wraps silently), probe `i` sets
  * bit `h_i mod m` where `h_i = kmvHash("bI:" || key)` — so even the
  * intermediate SURVIVOR COUNTS hash-match DuckDB ([[statsSql]]):
  * the gate pins the filter arithmetic itself, not just the
  * FP-insensitive final join.
  *
  * Execution shape: the word table collects to a driver array
  * (`m/32` longs — a few KB, the sanctioned bounded collect; Spark's
  * native runtime filter ships the same object via broadcast) and
  * membership evaluates as a pure codegen'd expression per fact row
  * (k `element_at` + AND-mask tests against an array literal) — no
  * explode, no join, no shuffle for the prefilter.
  */
object Bloom {

  /** Hash `i` of a key: the library's md5 device, probe-seeded. */
  private def hashI(key: Column, i: Int, m: Int): Column =
    Sketches.kmvHash(concat(lit(s"b$i:"), key.cast("string"))) % m

  private def hashISql(key: String, i: Int, m: Int): String = {
    val (hi, _) = Sketches.kmvHashSql(s"'b$i:' || CAST($key AS VARCHAR)")
    s"($hi % $m)"
  }

  /** `(word_idx, word)` 32-bits-per-word bit table of the dim key set (null keys
    * dropped — a null never joins anyway).
    */
  def bitsFrame(
      dim: DataFrame, keyCol: String, m: Int = 4096, k: Int = 3): DataFrame = {
    require(m % 32 == 0 && m > 0, s"m $m must be a positive multiple of 32")
    require(k >= 1 && k <= 8, s"k $k must be in [1, 8]")
    dim.filter(col(keyCol).isNotNull)
      .select(explode(array(
        (0 until k).map(i => hashI(col(keyCol), i, m)): _*)).as("pos"))
      .select(expr("pos div 32").as("word_idx"),
        call_function("shiftleft", lit(1L),
          expr("pos % 32").cast("int")).as("bit"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("bit")).as("word"))
  }

  /** The bit table as a dense driver array (`m/32` longs, a few KB —
    * the broadcast-object form).
    */
  def bits(dim: DataFrame, keyCol: String, m: Int = 4096, k: Int = 3): Array[Long] = {
    val words = new Array[Long](m / 32)
    bitsFrame(dim, keyCol, m, k).collect().foreach { r =>
      words(r.getAs[Long]("word_idx").toInt) = r.getAs[Long]("word")
    }
    words
  }

  /** Pure-expression membership test of `key` against a built word
    * array — all `k` probe bits must be set.
    */
  def mightContain(key: Column, words: Array[Long], m: Int, k: Int): Column = {
    val arr = typedLit(words.toSeq)
    (0 until k).map { i =>
      val pos = hashI(key, i, m)
      (element_at(arr, shiftright(pos, 5).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (pos % 32).cast("int"))) =!= 0L)
    }.reduce(_ && _)
  }

  /** Bloom-pruned LEFT SEMI join: fact rows whose `factKey` appears
    * in `dim.dimKey` — result identical to the plain semi join; the
    * bloom prefilter only changes how many rows reach the shuffle.
    */
  def semiJoin(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      m: Int = 4096, k: Int = 3): DataFrame = {
    val words = bits(dim, dimKey, m, k)
    fact.filter(mightContain(col(factKey), words, m, k))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }

  /** Prefilter effectiveness census: `(n_fact, n_bloom_pass, n_true,
    * n_false_pos)` over the fact rows — all-integer, so the bloom
    * arithmetic itself sits under the hash gate (a false positive
    * count is a function of the pinned hash layout, not chance).
    */
  def stats(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      m: Int = 4096, k: Int = 3): DataFrame = {
    val words = bits(dim, dimKey, m, k)
    val keys = dim.select(col(dimKey).as(factKey)).distinct()
      .withColumn("__in_dim", lit(1))
    fact.select(col(factKey))
      .withColumn("__pass",
        when(mightContain(col(factKey), words, m, k), 1L).otherwise(0L))
      .join(keys, Seq(factKey), "left")
      .agg(count(lit(1)).as("n_fact"),
        sum(col("__pass")).as("n_bloom_pass"),
        sum(when(col("__in_dim").isNotNull, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("__pass") === 1L && col("__in_dim").isNull, 1L)
          .otherwise(0L)).as("n_false_pos"))
  }

  /** DuckDB rendering of [[stats]]: `factSql` yields fact keys as
    * `fk`, `dimSql` yields dim keys as `dk`.
    */
  def statsSql(
      factSql: String, dimSql: String, m: Int = 4096, k: Int = 3): String = {
    val posRows = (0 until k)
      .map(i => s"SELECT ${hashISql("dk", i, m)} AS pos FROM dk")
      .mkString("\n    UNION ALL ")
    val probes = (0 until k).map { i =>
      val h = hashISql("f.fk", i, m)
      s"""EXISTS (SELECT 1 FROM words w
         |      WHERE w.word_idx = $h // 32
         |        AND (w.word & (1::BIGINT << ($h % 32))) <> 0)""".stripMargin
    }.mkString("\n    AND ")
    s"""WITH dk AS MATERIALIZED (SELECT DISTINCT dk FROM ($dimSql) q
       |  WHERE dk IS NOT NULL),
       |pos AS (
       |    $posRows),
       |words AS MATERIALIZED (SELECT pos // 32 AS word_idx,
       |    bit_or(1::BIGINT << (pos % 32)) AS word
       |  FROM pos GROUP BY 1),
       |f AS MATERIALIZED (SELECT fk FROM ($factSql) q),
       |flag AS (SELECT f.fk,
       |    CASE WHEN $probes THEN 1 ELSE 0 END AS pass,
       |    CASE WHEN f.fk IN (SELECT dk FROM dk) THEN 1 ELSE 0 END AS hit
       |  FROM f)
       |SELECT CAST(count(*) AS BIGINT) AS n_fact,
       |  CAST(SUM(pass) AS BIGINT) AS n_bloom_pass,
       |  CAST(SUM(hit) AS BIGINT) AS n_true,
       |  CAST(SUM(CASE WHEN pass = 1 AND hit = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_false_pos
       |FROM flag""".stripMargin
  }

  /** DuckDB rendering of [[semiJoin]]'s RESULT (bloom-invisible by
    * construction): the plain semi join.
    */
  def semiJoinSql(factSql: String, dimSql: String): String =
    s"""SELECT q.* FROM ($factSql) q
       |WHERE q.fk IN (SELECT dk FROM ($dimSql) d WHERE dk IS NOT NULL)
       |ORDER BY 1, 2""".stripMargin
}
