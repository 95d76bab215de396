package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Fuzzy (edit-distance) near-duplicate pairs: all document pairs
  * whose NORMALIZED text prefixes are within `maxDist` Levenshtein
  * edits — the classic record-linkage primitive (typo'd reposts,
  * OCR jitter, template fills) that set-similarity misses because a
  * single in-word edit changes every shingle containing it.
  *
  * All-pairs Levenshtein is O(n²·L²) and unthinkable at corpus scale;
  * this uses LENGTH-BAND BLOCKING: two strings within `maxDist` edits
  * differ in length by at most `maxDist`, so each document joins as a
  * "point" in its own length band and replicates as an "interval"
  * over the bands its length ± `maxDist` can reach (≤
  * 2·maxDist/bandWidth + 2 copies — pick `bandWidth > maxDist` to
  * keep it at 2–3). A pair meets in exactly ONE band (the point
  * side's), so no post-dedup is needed; `id_a < id_b` keeps one
  * orientation. The exact distance then re-checks every candidate
  * with Spark's threshold-bounded `levenshtein(l, r, maxDist)` —
  * early-exits above the bound instead of filling the full DP table.
  *
  * Length alone is a weak key on uniform corpora (every same-length
  * pair is a candidate) — `prefixBlock > 0` adds the first k
  * normalized characters as a second equality key, trading recall for
  * candidate volume exactly like MinHash banding trades it: pairs
  * whose edit touches the first k chars are missed. Compose with
  * [[Dedup.minhashLshPairs]] when full recall matters.
  *
  * 100 TB shape: one shuffled equi-join on (band[, prefix]); constant
  * per-document replication; per-candidate cost bounded by the
  * threshold DP cutoff. Hot bands (a dominant document length) are
  * plain equi-join skew — AQE's skew split applies.
  */
object Fuzzy {

  /** Returns `(id_a, id_b, dist)` with `id_a < id_b` and
    * `dist <= maxDist`, distances measured on
    * `substring(normalize(text), 1, prefixLen)` (lower-cased,
    * whitespace-collapsed). `prefixLen` bounds the DP cost per
    * candidate; raise it for long-document fidelity.
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, prefixLen: Int = 64, bandWidth: Int = 8,
      prefixBlock: Int = 0,
  ): DataFrame = {
    require(maxDist >= 0, s"maxDist $maxDist must be >= 0")
    require(prefixLen > 0, s"prefixLen $prefixLen must be positive")
    require(bandWidth > 0, s"bandWidth $bandWidth must be positive")
    require(prefixBlock >= 0, s"prefixBlock $prefixBlock must be >= 0")

    val norm = substring(
      regexp_replace(lower(trim(col(textCol))), "\\s+", " "), 1, prefixLen)
    val base = df.select(col(idCol).as("__id"), norm.as("__t"))
      .withColumn("__len", length(col("__t")))

    // point side: own band only
    val pts = base.select(
      col("__id").as("id_b"), col("__t").as("__tb"), col("__len").as("__lb"),
      expr(s"__len div $bandWidth").as("__band"),
      substring(col("__t"), 1, math.max(prefixBlock, 1)).as("__pb"))
    // interval side: every band reachable within maxDist
    val ivs = base.select(
      col("__id").as("id_a"), col("__t").as("__ta"), col("__len").as("__la"),
      explode(sequence(
        expr(s"greatest(__len - $maxDist, 0) div $bandWidth"),
        expr(s"(__len + $maxDist) div $bandWidth"))).as("__band"),
      substring(col("__t"), 1, math.max(prefixBlock, 1)).as("__pa"))

    val blocked =
      if (prefixBlock > 0)
        ivs.join(pts, ivs("__band") === pts("__band") &&
          ivs("__pa") === pts("__pb") && ivs("id_a") < pts("id_b"))
      else
        ivs.join(pts, ivs("__band") === pts("__band") && ivs("id_a") < pts("id_b"))

    blocked
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .withColumn("dist", expr(s"levenshtein(__ta, __tb, $maxDist)"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
