package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the corpus→context-window step
  * of retrieval/embedding pipelines: each document becomes overlapping
  * fixed-size token windows (`chunkTokens` wide, advancing by
  * `stride`), the unit that embedding models and retrieval indexes
  * consume. Complements [[graft.ops.Packing]] (which packs WHOLE
  * documents into training sequences; chunking SPLITS single documents
  * into bounded windows). The reference project has no text pipeline;
  * this extends SURVEY §2.5's text-analysis category.
  *
  * 100 TB shape: strictly map-only — tokenize, generate window starts
  * with `sequence`, `explode`, `slice`. No shuffle, no window
  * function, no state; output size is the intrinsic result size
  * (~tokens/stride windows per document) and each output row is
  * bounded by `chunkTokens`, so executor memory is bounded regardless
  * of document length skew. Parallelism is the scan's; a downstream
  * `repartition` is the caller's choice, not imposed here.
  */
object Chunking {

  /** Overlapping token windows per document. Windows start at token
    * offsets `0, stride, 2·stride, …` strictly below the token count;
    * each spans `[start, start + chunkTokens)` clipped to the
    * document, so the last window(s) may be short. A document with no
    * tokens produces NO rows (there is nothing to embed). Output:
    * `(idCol, chunk_id, start_tok, n_tokens, chunk_text)` with
    * `chunk_id = start_tok / stride` (0-based, dense per document)
    * and `chunk_text` the window's tokens joined by single spaces
    * (whitespace runs are canonicalized by tokenization, as
    * everywhere in the library — [[TextFunctions.tokens]]).
    *
    * `stride > chunkTokens` is allowed (gapped sampling of long
    * documents); `stride < chunkTokens` is the RAG-overlap shape.
    */
  def slidingWindows(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int,
  ): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens $chunkTokens must be >= 1")
    require(stride >= 1, s"stride $stride must be >= 1")
    Seq("__toks", "__n", "__start", "__c",
        "chunk_id", "start_tok", "n_tokens", "chunk_text")
      .foreach(c => require(!df.columns.contains(c),
        s"slidingWindows reserves column name $c; rename it in the input"))
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as("__start"))
      .select(col(idCol),
        (col("__start") / lit(stride)).cast("int").as("chunk_id"),
        col("__start").cast("int").as("start_tok"),
        slice(col("__toks"), col("__start") + 1, lit(chunkTokens))
          .as("__c"))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("__c")).as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  /** Scalar (one-column) form of [[slidingWindows]] for the SQL front
    * door: an `array<struct<chunk_id,start_tok,n_tokens,chunk_text>>`
    * per row, so pure-SQL users can `LATERAL explode(chunk_windows
    * (text, 32, 24))`. Agrees exactly with [[slidingWindows]]
    * (ChunkingSpec pins it).
    *
    * Implementation note: higher-order lambdas re-evaluate captured
    * expressions per element (SCALE.md), so the token array and each
    * window's slice are LET-BOUND through single-element
    * `transform(array(…), x => …)` wrappers — lambda-variable
    * references are cheap; a captured `tokens(text)` inside the
    * per-window lambda would re-tokenize the document once per
    * window. HOF lambdas are still interpreted (CodegenFallback):
    * for corpus-scale chunking prefer [[slidingWindows]], whose
    * post-explode projection stays in whole-stage codegen.
    */
  def windowsOf(text: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens >= 1, s"chunkTokens $chunkTokens must be >= 1")
    require(stride >= 1, s"stride $stride must be >= 1")
    element_at(
      transform(array(TextFunctions.tokens(text)), tk =>
        transform(
          // sequence floors at 0 for empty docs; the filter drops the
          // degenerate start-0 entry when there are no tokens at all
          filter(
            sequence(lit(0), greatest(size(tk) - 1, lit(0)), lit(stride)),
            st => st < size(tk)),
          st => element_at(
            transform(array(slice(tk, st + 1, lit(chunkTokens))), c =>
              struct(
                (st / lit(stride)).cast("int").as("chunk_id"),
                st.cast("int").as("start_tok"),
                size(c).as("n_tokens"),
                concat_ws(" ", c).as("chunk_text"))),
            1))),
      1)
  }

  /** DuckDB rendering of [[slidingWindows]] over `documents(doc_id,
    * text)` restricted by `whereClause` (a full `WHERE ...` clause
    * or "").
    */
  def slidingWindowsSql(
      chunkTokens: Int, stride: Int, whereClause: String): String = {
    require(chunkTokens >= 1 && stride >= 1,
      s"chunkTokens $chunkTokens and stride $stride must be >= 1")
    val toks = TextFunctions.tokensSql.replace("TXT", "text")
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents $whereClause),
       |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), $stride)) AS st
       |  FROM d WHERE len(toks) > 0),
       |c AS (SELECT doc_id, st,
       |  list_slice(toks, st + 1, st + $chunkTokens) AS ch FROM s)
       |SELECT doc_id, CAST(st // $stride AS INT) AS chunk_id,
       |  CAST(st AS INT) AS start_tok,
       |  CAST(len(ch) AS INT) AS n_tokens,
       |  array_to_string(ch, ' ') AS chunk_text
       |FROM c""".stripMargin
  }
}
