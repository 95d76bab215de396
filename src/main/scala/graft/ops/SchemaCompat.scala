package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-compatibility checking between two schema manifests — the
  * data-contract gate a pipeline runs before publishing a new table
  * version: will yesterday's readers still work (BACKWARD
  * compatibility), and can yesterday's writers still feed it
  * (FORWARD)? The Avro/Protobuf registry rules, expressed over
  * `(col_name, dtype, nullable)` manifest rows so any catalog export
  * can feed it:
  *
  *   - column DROPPED: breaks backward (old readers select it); old
  *     writers still producing it is fine (forward-compatible);
  *   - column ADDED: readers ignore it (backward ok); breaks forward
  *     unless nullable (old writers don't produce it);
  *   - type CHANGED: backward-compatible only along the sanctioned
  *     WIDENING chain (int -> bigint, float -> double, numeric ->
  *     string at the edge); ANY retype breaks forward (old writers
  *     emit the old type); narrowing/cross-family breaks both;
  *   - nullability LOOSENED (required -> nullable): fine both ways;
  *     TIGHTENED: old writers' nulls now violate — breaks forward.
  *
  * Output: one row per column in either version with its change kind
  * and both verdicts; the table-level verdict is a downstream
  * `bool_and`.
  *
  * Scale: manifests are METADATA (one row per column) — the full
  * outer join is trivial at any table width; the operator exists so
  * the contract decision is a QUERY (hash-gateable, auditable,
  * joinable against a registry) rather than code buried in a publish
  * script.
  */
object SchemaCompat {

  /** The widening chain: `from -> to` casts old readers survive.
    * Kept deliberately small and explicit — a compat gate that
    * silently blesses exotic coercions is worse than none.
    */
  val widenings: Seq[(String, String)] = Seq(
    ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
    ("float", "double"),
    ("smallint", "string"), ("int", "string"), ("bigint", "string"),
    ("float", "string"), ("double", "string"))

  /** `prev`/`next` manifests: `(col_name, dtype, nullable)` rows.
    * Returns `(col_name, change, backward_ok, forward_ok)` —
    * `change` in {same, widened, retyped, added, dropped,
    * null_loosened, null_tightened}.
    */
  def diff(prev: DataFrame, next: DataFrame): DataFrame = {
    val widenKeys = widenings.map { case (f, to) => s"$f>$to" }
    val p = prev.select(col("col_name"), col("dtype").as("p_type"),
      col("nullable").cast("boolean").as("p_null"))
    val n = next.select(col("col_name"), col("dtype").as("n_type"),
      col("nullable").cast("boolean").as("n_null"))
    p.join(n, Seq("col_name"), "full_outer")
      .select(col("col_name"), col("n_null"),
        when(col("p_type").isNull, lit("added"))
          .when(col("n_type").isNull, lit("dropped"))
          .when(col("p_type") === col("n_type") &&
            col("p_null") === col("n_null"), lit("same"))
          .when(col("p_type") === col("n_type") &&
            !col("p_null") && col("n_null"), lit("null_loosened"))
          .when(col("p_type") === col("n_type"), lit("null_tightened"))
          .when(concat(col("p_type"), lit(">"), col("n_type"))
            .isin(widenKeys: _*), lit("widened"))
          .otherwise(lit("retyped")).as("change"))
      .select(col("col_name"), col("change"),
        col("change").isin("same", "added", "widened",
          "null_loosened", "null_tightened").as("backward_ok"),
        (col("change").isin("same", "null_loosened", "dropped") ||
          (col("change") === "added" && col("n_null"))).as("forward_ok"))
  }

  /** DuckDB rendering of [[diff]] over two manifest CTEs named
    * `prev_m` / `next_m` with the same `(col_name, dtype, nullable)`
    * shape (splice after them in a WITH).
    */
  def diffSql: String = {
    val widenPred = widenings
      .map { case (f, to) => s"(p_type = '$f' AND n_type = '$to')" }
      .mkString("(", " OR ", ")")
    s"""SELECT col_name, change,
       |  change IN ('same', 'added', 'widened', 'null_loosened',
       |    'null_tightened') AS backward_ok,
       |  (change IN ('same', 'null_loosened', 'dropped')
       |    OR (change = 'added' AND n_null)) AS forward_ok
       |FROM (
       |  SELECT COALESCE(p.col_name, n.col_name) AS col_name, n_null,
       |    CASE WHEN p.col_name IS NULL THEN 'added'
       |         WHEN n.col_name IS NULL THEN 'dropped'
       |         WHEN p_type = n_type AND p_null = n_null THEN 'same'
       |         WHEN p_type = n_type AND NOT p_null AND n_null
       |           THEN 'null_loosened'
       |         WHEN p_type = n_type THEN 'null_tightened'
       |         WHEN $widenPred THEN 'widened'
       |         ELSE 'retyped' END AS change
       |  FROM (SELECT col_name, dtype AS p_type, nullable AS p_null
       |      FROM prev_m) p
       |  FULL OUTER JOIN (SELECT col_name, dtype AS n_type,
       |      nullable AS n_null FROM next_m) n
       |    ON p.col_name = n.col_name) d""".stripMargin
  }
}
